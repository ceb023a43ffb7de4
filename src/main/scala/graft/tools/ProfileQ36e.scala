package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stagewise profile of q36e at a given sf dir. */
object ProfileQ36e {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.ops.Tables.documents(spark, d)
    t("docs.count")(docs.count())
    val sh = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("w")) - 3),
          i => concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))))
          .as("shingle"))
    t("shingle rows (no distinct)")(println("  n=" + sh.count()))
    val shd = sh.distinct().persist()
    t("distinct shingles")(println("  n=" + shd.count()))
    val freq = shd.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    t("freq")(freq.count())
    val docAgg = shd.join(broadcast(freq), "shingle")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("arr"))
      .select(col("doc_id"),
        transform(col("arr"), x => x.getField("shingle")).as("set"),
        size(col("arr")).cast("long").as("c"))
      .persist()
    t("docAgg")(docAgg.count())
    val prefix = docAgg.select(col("doc_id"),
      explode(slice(col("set"), lit(1),
        (size(col("set")).cast("long") / lit(2L)).cast("int") + 1))
        .as("shingle"))
    t("prefix rows")(println("  n=" + prefix.count()))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.shingle") === col("b.shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    t("cand")(println("  n=" + cand.count()))
    val out = cand
      .join(docAgg.select(col("doc_id").as("doc_a"), col("set").as("set_a"),
        col("c").as("n_a")), "doc_a")
      .join(docAgg.select(col("doc_id").as("doc_b"), col("set").as("set_b"),
        col("c").as("n_b")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .filter(col("inter") / (col("n_a") + col("n_b") - col("inter")) >= 0.5)
    t("verify+out")(println("  n=" + out.count()))
    spark.stop()
  }
}
