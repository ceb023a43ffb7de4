package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q36e prefix-filter pipeline,
  * plus an A/B/C of the hashed-shingle exchange placement feeding it
  * (none vs repartition(h) vs repartition(doc_id)) — the round-3
  * repartition(h) pre-satisfied q36's join but cost q36e a full
  * shingle-row exchange its consumers never needed. */
object ProfileQ36e {
  def time(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[prof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mirrors Dedup.docTokens EXACTLY (including the isnotnull(doc_id)
    // that enables AQE exchange reuse) — a drifted copy here would A/B a
    // plan that differs from the shipped one in the property under test
    def docTokens: DataFrame = graft.ops.Tables.documents(spark, d)
      .filter(col("doc_id").isNotNull)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    def shingleExpr(w: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1),
          element_at(w, i + 2), element_at(w, i + 3)))
    def sh: DataFrame = docTokens.select(col("doc_id"),
      explode(array_distinct(
        transform(shingleExpr(col("w")), h => xxhash64(h)))).as("h"))

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("q36e[sh raw]")(
        graft.ops.Dedup.nearDupPairsPrefixFrom(sh).count())
      time("q36e[sh repartition(h)]")(
        graft.ops.Dedup.nearDupPairsPrefixFrom(
          sh.repartition(col("h"))).count())
      time("q36e[sh repartition(doc_id)]")(
        graft.ops.Dedup.nearDupPairsPrefixFrom(
          sh.repartition(col("doc_id"))).count())
      time("q36 (for the 2x target)")(
        graft.SparkEntry.queries("q36_near_dup")(spark, d).count())
      time("q36e (shipped)")(
        graft.SparkEntry.queries("q36e_near_dup_prefix")(spark, d).count())
    }
    spark.stop()
  }
}
