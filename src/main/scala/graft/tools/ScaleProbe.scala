package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (VERDICT r14 #4): ONE measured scale point above sf0.1.
  *
  * Synthesizes a `mult`x corpus from a base scale factor's documents +
  * embeddings (replicas get disjoint id ranges; text goes through a
  * replica-specific letter rotation and a replica salt token, embedding
  * arrays through a replica-specific element rotation — so WITHIN a
  * replica the near-dup/cluster structure of the base corpus is
  * preserved exactly, while ACROSS replicas exact/near-dup similarity
  * is destroyed: corpus grows ~linearly in documents AND in pair-graph
  * size, the way a real corpus scales, instead of multiplying the dup
  * fraction), then drives the three paths the 100 TB arguments lean on
  * hardest and prints wall times + store file counts:
  *
  *   1. unified five-family store BUILD over the 95% corpus slice
  *   2. one unified MERGE of the remaining 5% batch + re-keyed exact
  *      duplicates (the daily-ingest shape), then the store read-back
  *   3. the q87c extended funnel over the full synthetic corpus
  *   4. one IVF-PQ layout rebuild over all synthetic vectors
  *
  * Usage: runMain graft.tools.ScaleProbe <baseSfDir> <mult> <workDir>
  * Results recorded in SCALE.md ("Measured scale point").
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args(1).forall(_.isDigit),
      "usage: runMain graft.tools.ScaleProbe <baseSfDir> <mult> <workDir>")
    val Array(base, multS, work) = args.take(3)
    val mult = multS.toInt
    // the letter rotation is identity at k = multiples of the
    // 11-letter alphabet (and the dim-64 embedding rotation at
    // multiples of 64/gcd(7,64)); past that, cross-replica similarity
    // would silently survive and the linear-pair-graph claim breaks
    require(mult >= 1 && mult <= 11,
      s"mult $mult out of range: replica perturbations are only " +
        "non-identity for k in 1..10 (11-letter rotation alphabet)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scale] $what ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def pqFiles(dir: String): Int = {
      val f = new java.io.File(dir)
      if (!f.exists()) 0
      else if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
      // null guard (round-15 ADVICE): listFiles() returns null on an
      // unreadable/concurrently-removed dir — report 0, don't NPE
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(c => pqFiles(c.getPath)).sum
    }

    // -- 1. synthesize ----------------------------------------------
    val docs0 = spark.read.parquet(s"$base/documents.parquet")
      .filter(col("doc_id").isNotNull)
    val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
    val dStride = docs0.agg(max("doc_id")).head.getLong(0) + 1
    val vStride = emb0.agg(max("vec_id")).head.getLong(0) + 1
    val alpha = "etaonrishdl" // 11 letters: shift k identity iff k % 11 == 0
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val dim = emb0.select(size(col("embedding"))).head.getInt(0)
    val docs = (0 until mult).map { k =>
      val base = docs0.withColumn("doc_id", col("doc_id") + lit(k * dStride))
      if (k == 0) base
      else base.withColumn("text",
        concat(lit(s"rk$k "), translate(col("text"), alpha, rot(alpha, k))))
    }.reduce(_ unionByName _)
    val emb = (0 until mult).map { k =>
      val off = (k * 7) % dim // identity iff 7k % dim == 0 (k=0 for k<=10)
      val b = emb0.withColumn("vec_id", col("vec_id") + lit(k * vStride))
      if (off == 0) b
      else b.withColumn("embedding",
        concat(slice(col("embedding"), off + 1, dim - off),
          slice(col("embedding"), 1, off)))
    }.reduce(_ unionByName _)
    timed(s"gen.documents x$mult") {
      docs.coalesce(4).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
    }
    timed(s"gen.embeddings x$mult") {
      emb.coalesce(4).write.mode("overwrite")
        .parquet(s"$work/embeddings.parquet")
    }
    val allDocs = spark.read.parquet(s"$work/documents.parquet")
    val allEmb = spark.read.parquet(s"$work/embeddings.parquet")
    val nDocs = allDocs.count(); val nVecs = allEmb.count()
    println(s"[scale] corpus: $nDocs docs, $nVecs vectors (dim $dim)")

    // -- 2. unified store build (95%) + one 5% merge ------------------
    val dCut = (dStride * mult * 95L) / 100L
    val vCut = (vStride * mult * 95L) / 100L
    val nRekey = (dStride * mult / 100L).toInt // 1% planted exact dups
    val imgSigs = graft.functions.Multimodal.imageSignatures(
      graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = graft.functions.Multimodal.audioSignatures(
      graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = s"$work/unified_store"
    timed("uni.build (95% corpus, 5 families)") {
      graft.ops.UnifiedClusters.unifiedClusterStoreWrite(
        allDocs.filter(col("doc_id") < dCut),
        allEmb.filter(col("vec_id") < vCut), imgSigs, audSigs, store)
    }
    val batchDocs = allDocs.filter(col("doc_id") >= dCut)
      .unionByName(allDocs.filter(col("doc_id") < nRekey)
        .withColumn("doc_id", col("doc_id") + graft.ops.Dedup.ReKeyOffset))
    val batchEmb = allEmb.filter(col("vec_id") >= vCut)
    val empSig = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ahash",
          org.apache.spark.sql.types.LongType))))
    timed("uni.merge (5% batch + 1% re-keys)") {
      graft.ops.UnifiedClusters.unifiedClusterStoreUpdate(spark, store,
        batchDocs, batchEmb, empSig,
        empSig.withColumnRenamed("ahash", "ehash"))
    }
    val nClusters = timed("uni.readback") {
      graft.ops.UnifiedClusters.unifiedClustersFromStore(spark, store)
        .count()
    }
    println(s"[scale] unified store: $nClusters clusters; file counts: " +
      Seq("shingle", "simhash", "emb_lsh", "emb_vec", "img_ahash",
        "ehash", "edges", "clusters")
        .map(t => s"$t=${pqFiles(s"$store/$t")}").mkString(" "))

    // -- 3. q87c extended funnel over the full corpus -----------------
    val funnel = timed("funnel.q87c (full corpus)") {
      graft.ops.Dedup.curationFunnelExtended(
        graft.ops.TextAnalysis.injectPii(allDocs)).collect()
    }
    funnel.foreach(r => println(s"[scale]   funnel ${r.mkString(" ")}"))

    // -- 4. IVF-PQ rebuild over all vectors ---------------------------
    val ivf = s"$work/ivf_store"
    timed("ivf.rebuild (all vectors)") {
      graft.ops.Similarity.ivfPqWriteDf(allEmb, ivf, dim = dim)
    }
    println(s"[scale] ivf store: vectors files=${pqFiles(s"$ivf/vectors")}" +
      s" total files=${pqFiles(ivf)}")

    // -- 5. daily-cadence paths (round 16, verdict r15 #3): the
    //       queries a deployment runs every day, vs the rare
    //       build/rebuild above ------------------------------------
    // (a) one IVF-PQ ADC probe against the synthetic-scale store —
    //     the per-query latency of the canonical layout
    val queryVec = allEmb.filter(col("vec_id") === 0)
      .select(graft.functions.VectorFunctions
        .quantize(col("embedding")).as("qe"))
      .head().getSeq[Long](0).toArray
    val nProbeHits = timed("ivf.probe (ADC, nprobe=4, k=10)") {
      graft.ops.Similarity.ivfPqProbe(spark, ivf, queryVec,
        nprobe = 4, k = 10, excludeVecId = Some(0L)).count()
    }
    println(s"[scale] ivf probe hits: $nProbeHits")
    // (b) the q84-style recall audit at scale: exact panel top-10 vs
    //     the stored layout's ADC top-10 (one pruned scan per method)
    val recall = timed("ivf.recall_panel (exact vs ADC, 8 probes)") {
      import spark.implicits._
      val exact = graft.ops.Similarity.panelExact(
        allEmb, graft.ops.Similarity.ProbePanel, 10).localCheckpoint()
      val adc = graft.ops.Similarity.panelAdc(spark, ivf, allEmb,
        graft.ops.Similarity.ProbePanel, nprobe = 4, k = 10, m = 8)
      graft.ops.Similarity.panelHits("ivfpq_adc", adc, exact,
          graft.ops.Similarity.ProbePanel.toDF("probe_id"))
        .agg(min(col("hits")), sum(col("hits"))).head()
    }
    println(s"[scale] ivf recall panel: min_hits=${recall.get(0)} " +
      s"sum_hits=${recall.get(1)} (of 8 probes x 10)")
    // (c) the incremental-funnel admission: ONE batch (the 5% slice +
    //     re-keys) against a standing store built over the 95% slice —
    //     the q87e/s23 steady state at synthetic scale
    val incStore = s"$work/inc_store"
    timed("incfunnel.store_build (95% corpus)") {
      graft.ops.Dedup.incrementalStoresBuildFrom(spark,
        allDocs.filter(col("doc_id") < dCut), incStore)(surv =>
        graft.ops.Dedup.neardupIndexWrite(surv, s"$incStore/neardup"))
    }
    val stages = timed("incfunnel.admission (5% batch + 1% re-keys)") {
      val frames = graft.ops.Dedup.incrementalFunnelFrames(spark,
        incStore, batchDocs)
      val admitted = graft.ops.Dedup.manifestAppendReadBack(spark,
        incStore, frames.last._3, frames.head._3)
      graft.ops.Dedup.funnelCounts(
        frames :+ ((7, "manifest_append", admitted))).collect()
    }
    stages.foreach(r => println(s"[scale]   admission ${r.mkString(" ")}"))
    println(s"[scale] inc store files: exact=${pqFiles(s"$incStore/exact")}" +
      s" neardup=${pqFiles(s"$incStore/neardup")}" +
      s" manifest=${pqFiles(s"$incStore/manifest")}")

    // -- 6. round-17 paths (verdict r16 #5): the retraction family
    //       and the unified-funnel steady state — the two paths
    //       added in rounds 16-17 without scale evidence ------------
    // (a) q87h-style funnel-store retraction: 1% of the standing
    //     corpus deleted from the §5c stores (which carry the round-17
    //     hash ledger, so the carrier lookup is hb-pruned — no corpus
    //     text rescan; text reads only for deleted + promoted docs)
    val delCut = dStride * mult / 100L
    val scrubbed95 = graft.ops.TextAnalysis.piiScrubText(
      allDocs.filter(col("doc_id") < dCut)).localCheckpoint()
    timed("incfunnel.retract (1% of standing corpus)") {
      graft.ops.Dedup.incrementalStoresRetract(spark, incStore,
        scrubbed95,
        allDocs.filter(col("doc_id") < delCut).select(col("doc_id")))
    }
    println("[scale] inc store files after retract: " +
      s"exact=${pqFiles(s"$incStore/exact")}" +
      s" neardup=${pqFiles(s"$incStore/neardup")}" +
      s" manifest=${pqFiles(s"$incStore/manifest")}" +
      s" hashes=${pqFiles(s"$incStore/hashes")}")
    // (b) q61f-style unified-store retraction against the §2 store:
    //     the same 1% doc/vector slice plus the media signatures in
    //     range — touched buckets only, CC re-run over touched
    //     components' surviving edges
    timed("uni.retract (1% docs + vectors, in-range media sigs)") {
      graft.ops.UnifiedClusters.unifiedClusterStoreRetract(spark, store,
        allDocs.filter(col("doc_id") < delCut),
        allEmb.filter(col("vec_id") < delCut),
        imgSigs.filter(col("doc_id") < 10),
        audSigs.filter(col("doc_id") < 10))
    }
    val nClustersAfter = timed("uni.readback after retract") {
      graft.ops.UnifiedClusters.unifiedClustersFromStore(spark, store)
        .count()
    }
    println(s"[scale] unified clusters after retract: $nClustersAfter" +
      s" (was $nClusters)")
    // (c) the q87g/s24 steady state: ONE daily batch admitted through
    //     the five-family unified screen against a standing store
    //     built over the 95% slice — the fused screen+update
    val uniInc = s"$work/uni_inc_store"
    timed("unifunnel.store_build (95% corpus, unified nd-store)") {
      graft.ops.Dedup.incrementalStoresBuildFrom(spark,
        allDocs.filter(col("doc_id") < dCut), uniInc) { surv =>
        val survIds = surv.select(col("doc_id"))
        graft.ops.UnifiedClusters.unifiedClusterStoreWrite(
          surv,
          allEmb.filter(col("vec_id") < vCut)
            .join(survIds.withColumnRenamed("doc_id", "vec_id"),
              Seq("vec_id"), "left_semi"),
          imgSigs.join(survIds, Seq("doc_id"), "left_semi"),
          audSigs.join(survIds, Seq("doc_id"), "left_semi"),
          s"$uniInc/unified")
      }
    }
    val uniStages =
      timed("unifunnel.admission (5% batch + 1% re-keys, fused)") {
        val frames = graft.ops.Dedup.incrementalFunnelFrames(spark,
          uniInc, batchDocs,
          ndScreen = Some(("unified_screen", (s2: DataFrame) => {
            val ids = s2.select(col("doc_id"))
            val drops = graft.ops.UnifiedClusters
              .unifiedClusterStoreUpdateWithDrops(spark,
                s"$uniInc/unified", s2,
                allEmb.join(ids.withColumnRenamed("doc_id", "vec_id"),
                  Seq("vec_id"), "left_semi"),
                imgSigs.join(ids, Seq("doc_id"), "left_semi"),
                audSigs.join(ids, Seq("doc_id"), "left_semi"))
            s2.join(drops, Seq("doc_id"), "left_anti")
          })))
        val admitted = graft.ops.Dedup.manifestAppendReadBack(spark,
          uniInc, frames.last._3, frames.head._3)
        graft.ops.Dedup.funnelCounts(
          frames :+ ((7, "manifest_append", admitted))).collect()
      }
    uniStages.foreach(r =>
      println(s"[scale]   uni admission ${r.mkString(" ")}"))
    spark.stop()
  }
}
