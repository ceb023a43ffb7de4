package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q36e prefix-filter pipeline. */
object ProfileQ36e {
  def time(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[prof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docTokens: DataFrame = graft.ops.Tables.documents(spark, d)
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

    for (_ <- 1 to 2) {
      time("sh")(sh.count())
      val freq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      time("freq")(freq.count())
      val docAgg = sh.join(broadcast(freq), "h")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("h"))))
          .as("arr"))
        .select(col("doc_id"),
          transform(col("arr"), x => x.getField("h")).as("set"),
          size(col("arr")).cast("long").as("c"))
      time("docAgg")(docAgg.count())
      val prefix = docAgg.select(col("doc_id"), col("c"),
        posexplode(slice(col("set"), lit(1),
          (size(col("set")).cast("long") / lit(2L)).cast("int") + 1))
          .as(Seq("p", "h")))
      time("prefix")(prefix.count())
      val rawPairs = prefix.as("a").hint("shuffle_hash")
        .join(prefix.as("b").hint("shuffle_hash"), col("a.h") === col("b.h"))
        .filter(col("a.doc_id") < col("b.doc_id"))
      time("rawPairRows")(rawPairs.count())
      val cand = rawPairs
        .filter(
          greatest(col("a.c"), col("b.c")) <= least(col("a.c"), col("b.c")) * 2 &&
          (lit(1) + least(col("a.c") - col("a.p") - 1,
            col("b.c") - col("b.p") - 1)) * 3 >= col("a.c") + col("b.c"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      time("cand")(cand.count())
      time("full")(graft.SparkEntry.queries("q36e_near_dup_prefix")(spark, d).count())
    }
    spark.stop()
  }
}
