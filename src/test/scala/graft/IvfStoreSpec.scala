package graft

import graft.ops.{Similarity, Tables}
import graft.functions.VectorFunctions.quantize
import org.apache.spark.sql.functions._

/** IVF stored layout (Similarity.ivfWrite/ivfProbe): cell assignment is
  * a write-time partition column, so a probe reads only the nprobe
  * matching parquet partitions — directory pruning, not a filter over a
  * full scan. Asserts (1) result parity with the per-query IVF (q37c),
  * (2) the cell predicate runs as a PartitionFilter, (3) only files from
  * the probed cells' directories are read. */
class IvfStoreSpec extends SparkSpec {

  test("stored IVF probe prunes partitions and matches q37c") {
    val store = java.nio.file.Files.createTempDirectory("ivf_").toString
    Similarity.ivfWrite(spark, sf, store)

    // query vector 0, quantized — same probe q37c runs per-query
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(quantize(col("embedding")).as("qe"))
      .collect().head.getSeq[Long](0).toArray
    val probe = Similarity.ivfProbe(spark, store, qv,
      excludeVecId = Some(0L))

    // (1) identical result to the per-query formulation
    val expected = SparkEntry.queries("q37c_similarity_ivf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val got = probe.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === expected)

    // (2) the cell filter is a partition filter on the scan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(plan).isDefined,
      s"cell_id not pushed as a partition filter:\n$plan")

    // (3) only files under the probed cells' directories are read:
    // the executed scan's numFiles metric, not inputFiles (which lists
    // the relation pre-pruning)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val finalPlan = probe.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scanned = finalPlan.collectLeaves().collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("vectors")) =>
        f.metrics("numFiles").value
    }
    val allFiles = spark.read.parquet(s"$store/vectors").inputFiles.length
    assert(scanned.nonEmpty)
    assert(scanned.head > 0 && scanned.head < allFiles,
      s"probe scanned ${scanned.head} of $allFiles files — no pruning")
  }

  test("stored IVF-PQ probe prunes partitions and stores no vectors") {
    val store = java.nio.file.Files.createTempDirectory("ivfpq_").toString
    Similarity.ivfPqWrite(spark, sf, store)

    // the cells persist codes only — the raw/quantized embedding never
    // reaches the vectors table (the whole point of PQ compression)
    val cols = spark.read.parquet(s"$store/vectors").columns.toSet
    assert(cols === Set("vec_id", "label", "codes", "cell_id"), cols)

    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(quantize(col("embedding")).as("qe"))
      .collect().head.getSeq[Long](0).toArray
    val probe = Similarity.ivfPqProbe(spark, store, qv,
      excludeVecId = Some(0L))
    assert(probe.count() === 10)

    // cell predicate pushed as a partition filter, same as the IVF store
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(plan).isDefined,
      s"cell_id not pushed as a partition filter:\n$plan")
    // the ADC lookup table joins as a broadcast (the corpus side never
    // shuffles before its per-vector partial-agg sum)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ivfAppend equals full rebuild; ivfCompact bounds cell files") {
    val emb = Tables.embeddings(spark, sf)
    val storeFull = java.nio.file.Files
      .createTempDirectory("ivf_full_").toString
    Similarity.ivfWriteDf(emb, storeFull)
    val storeInc = java.nio.file.Files
      .createTempDirectory("ivf_inc_").toString
    val batch = col("vec_id") >= 16 && col("vec_id") % 5 === 0
    Similarity.ivfWriteDf(emb.filter(!batch), storeInc)
    Similarity.ivfAppend(spark, storeInc, emb.filter(batch))
    // append-equals-rebuild: identical probe answers
    val qv = emb.filter(col("vec_id") === 0)
      .select(quantize(col("embedding")).as("qe"))
      .collect().head.getSeq[Long](0).toArray
    def probeRows(store: String) =
      Similarity.ivfProbe(spark, store, qv, excludeVecId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(probeRows(storeInc) === probeRows(storeFull))
    // a few more appends accumulate files; compact bounds them to one
    // per cell, idempotently, and the probe answer is unchanged
    (0 until 3).foreach { _ =>
      Similarity.ivfAppend(spark, storeInc,
        emb.filter(col("vec_id") === 1L))
    }
    def maxFiles: Int = new java.io.File(s"$storeInc/vectors")
      .listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("cell_id="))
      .map(_.listFiles().count(f =>
        f.isFile && f.getName.endsWith(".parquet"))).max
    assert(maxFiles > 1)
    assert(Similarity.ivfCompact(spark, storeInc,
      maxFilesPerCell = 1).nonEmpty)
    assert(maxFiles === 1)
    assert(Similarity.ivfCompact(spark, storeInc,
      maxFilesPerCell = 1).isEmpty)
    // compaction's DISTINCT collapsed the triple-appended vec 1
    assert(spark.read.parquet(s"$storeInc/vectors")
      .filter(col("vec_id") === 1L).count() === 1L)
    assert(probeRows(storeInc) === probeRows(storeFull))
  }

  test("ivfPqAppend lands codes against the frozen model; " +
    "retrain-then-rebuild equals a from-scratch build (q91)") {
    val emb = Tables.embeddings(spark, sf)
    val drift = col("vec_id") >= 16 && col("vec_id") % 3 === 1
    val store = java.nio.file.Files
      .createTempDirectory("ivfpq_retrain_").toString
    Similarity.ivfPqWriteDf(emb.filter(!drift), store)
    Similarity.ivfPqAppend(spark, store, emb.filter(drift))
    // the frozen-model append covers the full corpus exactly once,
    // codes-only (no raw vectors slip in through the append path)
    val vecs = spark.read.parquet(s"$store/vectors")
    assert(vecs.count() === emb.count())
    assert(vecs.select("vec_id").distinct().count() === emb.count())
    assert(vecs.columns.toSet ===
      Set("vec_id", "label", "codes", "cell_id"))
    def rows(dir: String, t: String, order: Seq[String]): Seq[String] =
      spark.read.parquet(s"$dir/$t")
        .orderBy(order.map(col): _*).collect().map(_.toString).toSeq
    // retrain on corpus ∪ batch and rebuild in place; a never-appended
    // from-scratch build over the same corpus must be table-for-table
    // identical (the q88 append-equals-rebuild property lifted to the
    // model tables — what makes the q91 'after' phase oracle-closed)
    Similarity.ivfPqWriteDf(emb, store)
    val scratch = java.nio.file.Files
      .createTempDirectory("ivfpq_scratch_").toString
    Similarity.ivfPqWriteDf(emb, scratch)
    assert(rows(store, "vectors", Seq("vec_id")) ===
      rows(scratch, "vectors", Seq("vec_id")))
    assert(rows(store, "centroids", Seq("cell_id")) ===
      rows(scratch, "centroids", Seq("cell_id")))
    assert(rows(store, "codebook", Seq("m", "seed")) ===
      rows(scratch, "codebook", Seq("m", "seed")))
    // the code store compacts like every standing index: replayed
    // appends accumulate files, the pruned rewrite bounds them to one
    // per cell, DISTINCT reclaims the duplicate code rows, and the
    // table is value-identical after
    (0 until 3).foreach { _ =>
      Similarity.ivfPqAppend(spark, store,
        emb.filter(col("vec_id") === 1L))
    }
    assert(Similarity.ivfPqCompact(spark, store,
      maxFilesPerCell = 1).nonEmpty)
    assert(Similarity.ivfPqCompact(spark, store,
      maxFilesPerCell = 1).isEmpty)
    assert(spark.read.parquet(s"$store/vectors")
      .filter(col("vec_id") === 1L).count() === 1L)
    assert(rows(store, "vectors", Seq("vec_id")) ===
      rows(scratch, "vectors", Seq("vec_id")))
  }

  test("ivfRetract equals survivors-only rebuild, replays " +
    "idempotently, deletes emptied cells, and empties fully") {
    val emb = Tables.embeddings(spark, sf)
    val del = col("vec_id") >= 16 && col("vec_id") % 7 === 2
    val store = java.nio.file.Files
      .createTempDirectory("ivf_retract_").toString
    Similarity.ivfWriteDf(emb, store)
    Similarity.ivfRetract(spark, store, emb.filter(del))
    def vrows(dir: String): Seq[String] =
      spark.read.parquet(s"$dir/vectors")
        .select(col("vec_id"), col("label"), col("qe"),
          col("cell_id").cast("long"))
        .orderBy("vec_id").collect().map(_.toString).toSeq
    // retract-equals-rebuild: seeds survive, so the survivors-only
    // build derives the SAME centroids and the same assignment
    val rebuilt = java.nio.file.Files
      .createTempDirectory("ivf_rebuild_").toString
    Similarity.ivfWriteDf(emb.filter(!del), rebuilt)
    assert(vrows(store) === vrows(rebuilt))
    // replay: re-delivering the same retraction changes nothing
    Similarity.ivfRetract(spark, store, emb.filter(del))
    assert(vrows(store) === vrows(rebuilt))
    // emptied cell: delete EVERY remaining member of a cell that does
    // not hold probe vector 0 — its directory must be gone (a ghost
    // dir would keep serving retracted rows), loudly not silently
    val assigned = spark.read.parquet(s"$store/vectors")
      .select(col("vec_id"), col("cell_id").cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val cell0 = assigned.find(_._1 == 0L).get._2
    val victim = assigned.map(_._2).distinct.filter(_ != cell0).head
    val victimIds = assigned.filter(_._2 == victim).map(_._1).toSet
    Similarity.ivfRetract(spark, store,
      emb.filter(col("vec_id").isin(victimIds.toSeq: _*)))
    assert(!new java.io.File(s"$store/vectors/cell_id=$victim").exists)
    val qv = emb.filter(col("vec_id") === 0)
      .select(quantize(col("embedding")).as("qe"))
      .collect().head.getSeq[Long](0).toArray
    val probed = Similarity.ivfProbe(spark, store, qv,
      excludeVecId = Some(0L)).collect()
    assert(probed.nonEmpty &&
      probed.forall(r => !victimIds.contains(r.getLong(0))))
    // full retraction: every cell empties, and the schema'd probe
    // read sees an empty store instead of throwing
    Similarity.ivfRetract(spark, store, emb)
    assert(Similarity.ivfProbe(spark, store, qv).collect().isEmpty)
  }

  test("ivfPqRetract deletes exactly the retracted code rows under " +
    "the frozen model") {
    val emb = Tables.embeddings(spark, sf)
    val del = col("vec_id") >= 16 && col("vec_id") % 7 === 2
    val store = java.nio.file.Files
      .createTempDirectory("ivfpq_retract_").toString
    Similarity.ivfPqWriteDf(emb, store)
    def rows(t: String, order: Seq[String]): Seq[String] =
      spark.read.parquet(s"$store/$t")
        .orderBy(order.map(col): _*).collect().map(_.toString).toSeq
    val before = spark.read.parquet(s"$store/vectors")
      .select(col("vec_id"), col("label"), col("codes"),
        col("cell_id").cast("long"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.toString))
    val centBefore = rows("centroids", Seq("cell_id"))
    val cbBefore = rows("codebook", Seq("m", "seed"))
    Similarity.ivfPqRetract(spark, store, emb.filter(del))
    // rows-exact: the surviving table is the pristine table minus the
    // retracted ids — codes and cells untouched (the trained model is
    // FROZEN by contract; a survivors-only retrain would differ)
    val delIds = emb.filter(del).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val after = spark.read.parquet(s"$store/vectors")
      .select(col("vec_id"), col("label"), col("codes"),
        col("cell_id").cast("long"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(after === before.filterNot(p => delIds(p._1)).map(_._2).toSeq)
    assert(rows("centroids", Seq("cell_id")) === centBefore)
    assert(rows("codebook", Seq("m", "seed")) === cbBefore)
  }
}
