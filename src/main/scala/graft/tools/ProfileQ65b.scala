package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only: stage-isolating timings for the q65b scan-decontamination
  * shape (shingle+sort cost vs merge-vs-literal cost vs filter).
  * Usage: runMain graft.tools.ProfileQ65b <sfDir>
  */
object ProfileQ65b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[p65b] $label rep=$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }

    val docs = graft.ops.Tables.documents(spark, sfDir)
    val toks = docs
      .filter(col("doc_id").isNotNull && col("source") =!= "src0")
      .repartition(32)
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    val shingled = toks.select(col("doc_id"), col("source"),
      sort_array(array_distinct(transform(
        transform(sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))),
        h => xxhash64(h)))).as("hs"))

    // eval set, built once
    val bench = graft.ops.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isNotNull && col("source") === "src0")
      .select(split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(explode(array_distinct(transform(
        transform(sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))),
        h => xxhash64(h)))).as("h"))
      .distinct().as[Long].collect().sorted
    println(s"[p65b] eval hashes: ${bench.length}")

    time("A shingle+sort only")(shingled.select(size(col("hs"))).agg(sum("size(hs)")).head().getLong(0))
    val merged = shingled.select(col("doc_id"), col("source"),
      graft.functions.SortedLongArrayIntersectSize(col("hs"),
        typedLit(bench)).as("n_shared"))
    time("B merge no filter")(merged.agg(sum("n_shared")).head().getLong(0))
    time("C merge + filter")(merged.filter(col("n_shared") >= 10).count())
    time("D full q65b")(
      graft.ops.Dedup.queries("q65b_decontaminate_scan")(spark, sfDir).count())
    // E: the merge routed through an inline explode(array(..)) Generate —
    // the filter on the generator output cannot be pushed below it
    val gen = shingled.select(col("doc_id"), col("source"),
      explode(array(graft.functions.SortedLongArrayIntersectSize(col("hs"),
        typedLit(bench)))).as("n_shared"))
    time("E generate barrier + filter")(
      gen.filter(col("n_shared") >= 10).count())
    spark.stop()
  }
}
