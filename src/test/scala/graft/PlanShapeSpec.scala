package graft

/** Plan-shape regression tests: the scale-critical physical-plan
  * properties the engine is designed around, asserted so a refactor
  * can't silently lose them (SURVEY.md §4). */
class PlanShapeSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: filter and projection reach the parquet scan") {
    val plan = formatted("q01_scan_projection")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      plan)
    // pruned read schema: only the 4 referenced columns
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
        "l_extendedprice:double,l_shipdate:timestamp"), plan)
  }

  test("q07: dimension joins broadcast (no shuffle join)") {
    val plan = formatted("q07_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q22: top-1 plans as TakeOrderedAndProject, not a global sort") {
    val plan = formatted("q22_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q24: ts range filter pushes down on the fixture's ts encoding") {
    // eventsBetween filters the RAW ts column with a literal of its own
    // footer type (nanos long / NTZ timestamp / TZ timestamp) BEFORE
    // normalization, so the range reaches the parquet scan as a pushed
    // filter on every encoding the fixture has shipped (VERDICT r7 #1's
    // done-criterion: the native-timestamp path must keep the pushdown
    // the nanos path had)
    val plan = formatted("q24_intersect")
    assert(plan.contains(
      "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), plan)
    assert(plan.contains("LessThan(ts,"), plan)
  }

  test("q36d: cell-blocked near-dup plans no cartesian product") {
    // round 9: the last corpus-wide crossJoin in the tree was replaced
    // by trained-cell confinement — the pair join must key on cell_id
    // (shuffled hash, one reused exchange), never CartesianProduct /
    // BroadcastNestedLoopJoin over the corpus
    val plan = formatted("q36d_embedding_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("q83: index scan is partition-pruned to the batch's buckets") {
    val plan = formatted("q83_corpus_merge")
    // the static bucket IN filter must land as a PartitionFilter on the
    // stored index's scan (corpusMerge collects the batch's <=64
    // buckets precisely so pruning never depends on DPP heuristics)
    assert(plan.contains("PartitionFilters: [bucket"), plan)
  }

  test("q87e: manifest read-back scan is partition-pruned to the " +
    "batch's kb buckets") {
    // the incremental funnel's final stage counts from the STORE; its
    // scan must carry the collected kb set as a PartitionFilter (the
    // q83 static-IN shape — earlier stages hide behind checkpoints,
    // so the read-back is the one scan in the declared tree)
    val plan = formatted("q87e_incremental_funnel")
    assert(plan.contains("PartitionFilters: [kb"), plan)
  }

  test("q85: band-index scan is partition-pruned to the batch's keys") {
    val plan = formatted("q85_neardup_merge")
    // the collected kb bucket set must land as a PartitionFilter on
    // the stored band index's scan (neardupMerge's static IN, the q83
    // shape), and the band-key joins must be hash joins with the
    // verify in the join condition — never a corpus-side broadcast or
    // nested loop
    assert(plan.contains("PartitionFilters: [kb"), plan)
    // Spark renders the static bucket-set filter as INSET only past
    // inSetConversionThreshold (default 10); a small batch touching
    // <= 10 buckets renders `kb#... IN (...)` — both are the same
    // static pruning, so accept either
    assert(plan.contains("INSET") || plan.contains(" IN ("), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q89: cluster merge prunes the band index and plans no cartesian") {
    // the merge materializes its edge plan before CC, so the final
    // query plan can't show the band joins — pin the edge plan
    // directly: the stored band read partition-filters on the batch's
    // kb set, the verify joins are hash joins, no nested loop. The
    // final merged-table plan must also stay cartesian-free.
    import org.apache.spark.sql.functions.col
    val docs = ops.Tables.documents(spark, sf)
    val store = graft.util.Ephemeral.fixedDir("graft_nd_cluster_q89")
    ops.Dedup.neardupClusterStoreWrite(
      docs.filter(col("doc_id") < 250), store)
    val edgePlan = ops.Dedup.clusterMergeNewEdgesPlan(spark, store,
        docs.filter(col("doc_id") >= 250))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(edgePlan.contains("PartitionFilters: [kb"), edgePlan)
    assert(edgePlan.contains("ShuffledHashJoin"), edgePlan)
    assert(!edgePlan.contains("CartesianProduct"), edgePlan)
    assert(!edgePlan.contains("BroadcastNestedLoopJoin"), edgePlan)
    val merged = formatted("q89_cluster_merge")
    assert(!merged.contains("CartesianProduct"), merged)
    assert(!merged.contains("BroadcastNestedLoopJoin"), merged)
  }

  test("q61d: unified merge prunes every family index and plans no " +
    "cartesian") {
    // the q89 pin lifted to the five-family store: each standing index
    // read partition-filters on the batch's kb set (five pruned scans
    // in ONE edge plan), every verify is a hash join, no nested loop
    import org.apache.spark.sql.functions.col
    val docs = ops.Tables.documents(spark, sf)
    val emb = ops.Tables.embeddings(spark, sf)
    val imgSigs = functions.Multimodal.imageSignatures(
      functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = functions.Multimodal.audioSignatures(
      functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = graft.util.Ephemeral.fixedDir("graft_uni_cluster_q61d")
    ops.UnifiedClusters.unifiedClusterStoreWrite(
      docs.filter(col("doc_id") < 250),
      emb.filter(col("vec_id") < 250),
      imgSigs.filter(col("doc_id") < 50),
      audSigs.filter(col("doc_id") < 32), store)
    val edgePlan = ops.UnifiedClusters.unifiedMergeNewEdgesPlan(spark,
        store, docs.filter(col("doc_id") >= 250),
        emb.filter(col("vec_id") >= 250),
        imgSigs.filter(col("doc_id") >= 50),
        audSigs.filter(col("doc_id") >= 32))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // one pruned scan per standing band family still in the returned
    // tree (shingle, simhash, img_ahash, ehash — the emb_lsh band
    // scan's pruning is pinned on the candidate plan below, because
    // layout v2 materializes the collision set before the verify) ...
    assert(edgePlan.sliding("PartitionFilters: [kb".length)
      .count(_ == "PartitionFilters: [kb") >= 4, edgePlan)
    // ... plus the kv-pruned emb_vec side-table read feeding the
    // post-collision dot verify
    assert(edgePlan.contains("PartitionFilters: [kv"), edgePlan)
    assert(edgePlan.contains("ShuffledHashJoin"), edgePlan)
    assert(!edgePlan.contains("CartesianProduct"), edgePlan)
    assert(!edgePlan.contains("BroadcastNestedLoopJoin"), edgePlan)
    // the slimmed band table carries NO vector column, and the
    // candidate plan partition-prunes the standing band read
    val bandSchema = spark.read.parquet(s"$store/emb_lsh").schema
    assert(!bandSchema.fieldNames.contains("qe"), bandSchema.treeString)
    val candPlan = ops.UnifiedClusters.lshCrossCandidates(
        spark.read.schema("vec_id BIGINT, band INT, bkey BIGINT, kb INT")
          .parquet(s"$store/emb_lsh")
          .filter(col("kb").isin(0 to 63: _*)),
        graft.ops.Similarity.lshBandRows(emb.filter(col("vec_id") >= 250))
          .withColumn("kb", org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(col("band"),
              col("bkey")),
            org.apache.spark.sql.functions.lit(64)).cast("int")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(candPlan.contains("PartitionFilters: [kb"), candPlan)
    assert(candPlan.contains("ShuffledHashJoin"), candPlan)
    assert(!candPlan.contains("CartesianProduct"), candPlan)
    val merged = formatted("q61d_unified_cluster_merge")
    assert(!merged.contains("CartesianProduct"), merged)
    assert(!merged.contains("BroadcastNestedLoopJoin"), merged)
  }

  test("q87g: the unified admission screen's drop plan prunes every " +
    "family index and plans no cartesian") {
    // the q61d pin applied to the ADMISSION path (round 16): the
    // weld drop-id plan against the q87g store, driven with the
    // declared batch (text docs + re-keys + media rows), must carry
    // the four band-family kb partition filters, the kv-pruned
    // emb_vec side read, hash-join verifies, and no nested loop
    import org.apache.spark.sql.functions.col
    val dir = graft.util.Ephemeral.fixedDirBuiltOnce(
      graft.util.Ephemeral.sfKey("q87g_pristine", sf))(
      d => ops.Dedup.incrementalUnifiedStoresBuild(spark, sf, d))
    val docs = ops.TextAnalysis.injectPii(ops.Tables.documents(spark, sf))
    val batch = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + ops.Dedup.ReKeyOffset))
      .unionByName(ops.Dedup.mediaBatchDocs(spark))
    val ids = batch.select(col("doc_id"))
    val batchEmb = ops.Tables.embeddings(spark, sf)
      .join(ids.withColumnRenamed("doc_id", "vec_id"),
        Seq("vec_id"), "left_semi")
    val batchImg = ops.Dedup.mediaBatchImgSigs(spark)
      .join(ids, Seq("doc_id"), "left_semi")
    val batchAud = ops.Dedup.mediaBatchAudSigs(spark)
      .join(ids, Seq("doc_id"), "left_semi")
    // the pruned-scan shapes are pinned on the new-edges PLAN the drop
    // set derives from: since round 18 unifiedWeldDropIds materializes
    // the family branches as concurrent jobs (the clusterMergeNewEdges
    // convention — materialization hides the scan shape from the final
    // tree), and unifiedMergeNewEdgesPlan is the same branches fused
    val dropPlan = ops.UnifiedClusters.unifiedMergeNewEdgesPlan(spark,
        s"$dir/unified", batch, batchEmb, batchImg, batchAud)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(dropPlan.sliding("PartitionFilters: [kb".length)
      .count(_ == "PartitionFilters: [kb") >= 4, dropPlan)
    assert(dropPlan.contains("PartitionFilters: [kv"), dropPlan)
    assert(dropPlan.contains("ShuffledHashJoin"), dropPlan)
    assert(!dropPlan.contains("CartesianProduct"), dropPlan)
    assert(!dropPlan.contains("BroadcastNestedLoopJoin"), dropPlan)
    // and the declared drop wrapper itself plans no nested loop over
    // its materialized family leaves
    val dropTree = ops.UnifiedClusters.unifiedWeldDropIds(spark,
        s"$dir/unified", batch, batchEmb, batchImg, batchAud)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!dropTree.contains("CartesianProduct"), dropTree)
    assert(!dropTree.contains("BroadcastNestedLoopJoin"), dropTree)
  }

  test("q84: the panel ADC side prunes cells and broadcast-joins the LUT") {
    // the whole 8-probe panel shares ONE partition-pruned read of the
    // union of probed cells (cell_id is the store's partition column),
    // and the per-(probe, m, code) lookup table joins as a broadcast —
    // the corpus-sized side never shuffles for the LUT. Since the
    // candidate table is materialized once for both adc tiers (the
    // rank-prefix share), the pruned scan lives in the CANDIDATE
    // plan, not the final declared tree — assert it there.
    val store = graft.util.Ephemeral.fixedDir("graft_ivfpq_store_q74")
    graft.ops.Similarity.ivfPqWrite(spark, sf, store)
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val cand = graft.ops.Similarity.panelAdc(spark, store, emb,
      graft.ops.Similarity.ProbePanel, nprobe = 4, k = 40, m = 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(cand.contains("PartitionFilters: [cell_id"), cand)
    assert(cand.contains("BroadcastHashJoin"), cand)
    assert(!cand.contains("CartesianProduct"), cand)
    // the final declared tree keeps the rerank side's P x c
    // candidate/probe joins BROADCAST against the corpus-sized vector
    // scan (the hits/audit joins over P x k rows plan as sort-merge
    // statically and are AQE-shrunk at runtime — bounded either way;
    // the LSH side's bit_count probe is legitimately a broadcast
    // nested loop)
    val plan = formatted("q84_ann_recall")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q86/q87: audit and funnel compose without corpus-wide loops") {
    // both are compositions of declared operators — the assertion is
    // that composition introduces no cartesian/nested-loop join and
    // the funnel's decontamination side broadcasts the bench dictionary
    val recall = formatted("q86_neardup_recall")
    assert(!recall.contains("CartesianProduct"), recall)
    assert(!recall.contains("BroadcastNestedLoopJoin"), recall)
    val funnel = formatted("q87_curation_funnel")
    assert(!funnel.contains("CartesianProduct"), funnel)
    assert(!funnel.contains("BroadcastNestedLoopJoin"), funnel)
    assert(funnel.contains("BroadcastExchange"), funnel)
  }

  test("q37: brute-force top-k broadcasts the 1-row query vector") {
    val plan = formatted("q37_similarity_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("long_array_dot"), plan)
  }

  test("q59: split assignment is row-local — no hash shuffle at all") {
    val plan = formatted("q59_hash_split")
    assert(!plan.contains("hashpartitioning"), plan)
    // only doc_id + source leave the scan
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      plan)
  }

  test("q65b: scan decontamination has no hash exchange at all") {
    val plan = formatted("q65b_decontaminate_scan")
    // the corpus side is project+filter over the scan: the eval set is a
    // literal array, the overlap count runs as the codegen'd merge — the
    // only exchanges are docTokens' scan-balancing round-robin and the
    // presentation sort's range partitioning
    assert(!plan.contains("hashpartitioning"), plan)
    assert(plan.contains("sorted_long_array_intersect_size"), plan)
    // the threshold filter must sit ABOVE the explode(array(..)) barrier
    // — if the Generate disappears, PushDownPredicates re-substitutes
    // the merge tree into a scan-stage filter (28x, see decontaminateScan)
    assert(plan.contains("Generate"), plan)
  }

  test("q78: overlapping chunker is row-local — no hash shuffle") {
    val plan = formatted("q78_chunk_overlap")
    assert(!plan.contains("hashpartitioning"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
  }

  test("q79: centroid table broadcasts back onto the vector scan") {
    val plan = formatted("q79_embedding_outliers")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("long_array_dot"), plan)
  }

  test("q45d: ahash index scan is partition-pruned to the batch's " +
    "buckets; the popcount verifies inside shuffle-hash band joins") {
    val plan = formatted("q45d_image_merge")
    // ahashMerge's collected kb set must land as a PartitionFilter on
    // the stored band index's scan (the q83/q85 static-IN shape)
    assert(plan.contains("PartitionFilters: [kb"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q100: affinity model broadcasts (materialized once); the " +
    "declared tree pays one partial-agg'd shuffle (the per-doc fold)") {
    val plan = formatted("q100_target_affinity")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the model (and the totals over it) live in the materialized
    // subtree; the declared tree's only hash exchange is the per-doc
    // aggregate
    val shuffles = "hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"$shuffles hash exchanges:\n$plan")
  }

  test("q101: model and quota broadcast; the corpus pays the per-doc " +
    "fold plus ONE ranking-window exchange") {
    val plan = formatted("q101_affinity_select")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // q100's per-doc aggregate + the per-source admission window — the
    // totals/quota subtrees collect driver-side, never in this tree
    val shuffles = "hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"$shuffles hash exchanges:\n$plan")
  }

  test("q101b: the global budget never plans a single-partition " +
    "window — the cumulative sum runs per-pid with a broadcast offset") {
    val plan = formatted("q101b_affinity_select_global")
    // the naive global cumulative window is Window over Exchange
    // SinglePartition — the one shape this operator exists to avoid;
    // the distributed form windows PARTITIONED BY pid (parallel) and
    // joins the per-partition offsets as a broadcast local relation
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q98: the kNN vote is row-local — no hash shuffle at all") {
    val plan = formatted("q98_knn_label_prop")
    // the seed panel rides as KnnMajorityLabel's reference arrays, so
    // the corpus side is project+filter over the scan; the only
    // exchange is the presentation sort's range partitioning (the q65b
    // posture)
    assert(!plan.contains("hashpartitioning"), plan)
    assert(plan.contains("knn_majority_label"), plan)
  }

  test("q45g: audio admission keeps the q45d shape through the " +
    "generalized trio — pruned index scan, in-join popcount verify") {
    val plan = formatted("q45g_audio_merge")
    assert(plan.contains("PartitionFilters: [kb"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q45e: singleton complement is a LEFT ANTI equi join — no " +
    "quadratic join anywhere, no forced broadcast of the clustered set") {
    val plan = formatted("q45e_image_clusters")
    // deliberately NOT pinned to BroadcastHashJoin: the clustered set
    // is a corpus FRACTION on a dedup-heavy corpus, so the declared
    // plan must not hint broadcast — AQE converts at runtime when the
    // set is genuinely small (review finding, round 12)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q99: re-rank broadcasts the ADC candidate cut") {
    val plan = formatted("q99_adc_rerank")
    // the c-row candidate table broadcasts against the raw-vector
    // scan; the final top-k is TakeOrderedAndProject, never a global
    // sort
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("long_array_dot"), plan)
  }

  test("q60: quota sampling is one shuffle (window on source)") {
    val plan = formatted("q60_source_quota")
    val shuffles = "hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, plan)
  }

  test("q58: df dictionary broadcasts; rank window adds no exchange") {
    val plan = formatted("q58_tfidf_topk")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // exchanges: tokens->(doc_id,term) agg, tf materialization by
    // doc_id (which the window then reuses), term dictionary agg —
    // and nothing else
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, plan)
  }

  test("q62: quality filter reads only (doc_id, text), no hash shuffle") {
    val plan = formatted("q62_quality_filter")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
    // row-local rules: the only exchanges are the scan-parallelism
    // round-robin repartition and the presentation sort
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("q62b: repetition filter is row-local — no hash shuffle") {
    val plan = formatted("q62b_repetition_filter")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("q69: pii scrub is row-local — no hash shuffle") {
    val plan = formatted("q69_pii_scrub")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("q63: both windows share the single lang shuffle") {
    val plan = formatted("q63_stratified_sample")
    val shuffles = "hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      plan)
  }

  test("q37b/q36f: sign-LSH runs as the codegen expression, not HOF trees") {
    // the round-3 regression shipped one interpreted aggregate(zip_with)
    // per plane; the signature must stay a single codegen'd expression
    for (q <- Seq("q37b_similarity_lsh", "q36f_embedding_neardup_lsh")) {
      val plan = formatted(q)
      assert(plan.contains("sign_lsh_signature"), s"$q:\n$plan")
      assert(!plan.contains("aggregate(zip_with"), s"$q:\n$plan")
      assert(plan.contains("long_array_dot"), s"$q:\n$plan")
    }
  }

  test("q36f: band self-join reuses one exchange of the banded table") {
    val df = SparkEntry.queries("q36f_embedding_neardup_lsh")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the join's two sides are the same banded plan: one computed
    // exchange on (band, bkey), the second side a ReusedExchange
    assert("ReusedExchange".r.findAllIn(finalPlan).size >= 1, finalPlan)
    assert(finalPlan.contains("ShuffledHashJoin"), finalPlan)
  }

  test("q36e: one shingling pass — shingle exchanges shared via AQE reuse") {
    // The sharing property is a RUNTIME one (AQE exchange reuse), so
    // assert on the executed adaptive plan, not the static formatted one
    // (which legitimately prints one subtree copy per consumer). The
    // executed plan must contain exactly ONE scan-parallelism RoundRobin
    // exchange and ONE doc_id repartition — every other consumer of the
    // hashed-shingle table reads them as ReusedExchange, i.e. the
    // scan+shingling+digest pass physically runs once.
    val df = SparkEntry.queries("q36e_near_dup_prefix")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def computed(marker: String): Int =
      finalPlan.linesIterator
        .count(l => l.contains(marker) && !l.contains("ReusedExchange"))
    assert(computed("REPARTITION_BY_NUM") === 1, finalPlan)
    assert(computed("REPARTITION_BY_COL") === 1, finalPlan)
    assert("ReusedExchange".r.findAllIn(finalPlan).size >= 4, finalPlan)
    assert(finalPlan.contains("sorted_long_array_intersect_size"), finalPlan)
  }

  test("q71: boilerplate dictionary broadcasts against the corpus side") {
    val plan = formatted("q71_boilerplate_fraction")
    // the df>=K head joins back as a broadcast — the corpus-sized
    // shingle table must never sort-merge on the shingle hash
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
  }

  test("q72: unigram model broadcasts; corpus positions never shuffle") {
    val plan = formatted("q72_corpus_freq_score")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only hash shuffles are the two aggregates (token model,
    // per-doc stats) — position rows reach them as partial aggregates
    assert(plan.contains("partial_count"), plan)
  }

  test("q66b: quota broadcasts; corpus pays one hash shuffle (window)") {
    val plan = formatted("q66b_token_mix")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the driver-side quota derivation leaves exactly ONE corpus hash
    // exchange: the per-source cumulative-sum window (the second
    // exchange is the presentation sort's range partitioning)
    val hashExchanges = "Arguments: hashpartitioning".r
      .findAllIn(plan).size
    assert(hashExchanges === 1, plan)
  }

  test("q92: standing tf model broadcasts into the score join") {
    val plan = formatted("q92_tf_store_score")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the model side is the store READ (parquet), not an in-query
    // retrain of the position rows
    assert(plan.contains("graft_tf_store_q92"), plan)
  }

  test("q73: PQ codebook broadcasts; distances run as LongArrayDot") {
    val plan = formatted("q73_pq_encode")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the argmin is a plain partial-agg'd integer min, and the distance
    // kernel is the codegen expression, not an interpreted HOF tree
    assert(plan.contains("partial_min"), plan)
    assert(plan.contains("long_array_dot"), plan)
    assert(!plan.contains("aggregate(zip_with"), plan)
  }

  test("q71: df aggregate and probe join share one shingling pass") {
    // runtime property (AQE exchange reuse), same method as the q36e
    // test: the hot-set broadcast build and the probe side both hang
    // off docTokens' one scan-parallelism exchange
    val df = SparkEntry.queries("q71_boilerplate_fraction")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val computed = finalPlan.linesIterator
      .count(l => l.contains("REPARTITION_BY_NUM") &&
        !l.contains("ReusedExchange"))
    assert(computed === 1, finalPlan)
    assert("ReusedExchange".r.findAllIn(finalPlan).size >= 1, finalPlan)
  }

  test("q95: snapshot diff joins hash projections, text never moves") {
    val plan = formatted("q95_snapshot_diff")
    // each snapshot side reduces to (doc_id, source, sha256) BEFORE the
    // full-outer join — the scan reads only the three needed columns
    // (lang/n_chars pruned) and the join itself carries no text column
    assert(plan.contains(
      "ReadSchema: struct<doc_id:bigint,text:string,source:string>"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val joinSection = plan.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("Join"))
      .mkString("\n")
    assert(!joinSection.contains("text#"), plan)
  }

  test("q96: split labels computed row-locally on the pair set") {
    // the split is a pure hash of doc_id (Sampling.splitOf), so the
    // audit adds NO join beyond the near-dup pass itself: exactly the
    // q36e join count, and no join keyed on a split/bucket column
    val plan = formatted("q96_split_leakage")
    assert(!plan.contains("CartesianProduct"), plan)
    val base = formatted("q36e_near_dup_prefix")
    def joins(p: String): Int =
      p.linesIterator.count(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
          l.contains("BroadcastHashJoin"))
    assert(joins(plan) == joins(base), plan)
  }

  test("q97: shard audit reads two columns, one corpus exchange") {
    val plan = formatted("q97_shard_balance")
    // the scan reads only the shard key input and the token source;
    // the corpus-sized exchange is the one partial-agg'd groupBy —
    // everything after runs over nShards rows
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("q61b: non-canonical id set anti-joins as a broadcast") {
    val plan = formatted("q61b_canonical_corpus")
    assert(plan.contains("BroadcastHashJoin LeftAnti BuildRight")
      || plan.contains("BroadcastHashJoin [doc_id"), plan)
    assert(!plan.contains("SortMergeJoin LeftAnti"), plan)
  }
}
