package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of q36 with and without the repartition(h)
  * materialization of the hashed-shingle table (same JVM, alternating
  * reps, so machine drift hits both arms equally). */
object AbQ36 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docTokens: DataFrame = graft.ops.Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    def shingleExpr(w: Column): Column =
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1),
          element_at(w, i + 2), element_at(w, i + 3)))
    def shRaw: DataFrame = docTokens.select(col("doc_id"),
      explode(array_distinct(
        transform(shingleExpr(col("w")), h => xxhash64(h)))).as("h"))

    def q36(sh: DataFrame): DataFrame = {
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      val pairs = sh.as("a").hint("shuffle_hash")
        .join(sh.as("b").hint("shuffle_hash"), col("a.h") === col("b.h"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(cnt.select(col("doc_id").as("doc_a"), col("c").as("n_a")), "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("c").as("n_b")), "doc_b")
        .filter(col("inter") / (col("n_a") + col("n_b") - col("inter")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
    }

    for (r <- 1 to 6) {
      for ((label, sh) <- Seq(
        ("plain   ", shRaw),
        ("repart_h", shRaw.repartition(col("h"))))) {
        val t0 = System.nanoTime()
        val n = q36(sh).count()
        println(f"[ab] rep=$r $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
