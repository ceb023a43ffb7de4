package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stagewise profile of the q36b MinHash+LSH pipeline. */
object ProfileQ36b {
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
    t("warmup docs.count")(docs.count())

    val base = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    val sh = base.select(col("doc_id"),
      explode(transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3))))
        .as("shingle"))
    t("shingles count")(println("  n=" + sh.count()))
    val digests = (0 until 2).map(g =>
      sha2(concat(lit(s"s$g:"), col("shingle")).cast("binary"), 256))
    val sliced = sh.select(
      col("doc_id") +: (0 until 16).map(j =>
        conv(substring(digests(j / 8), 1 + 8 * (j % 8), 8), 16, 10)
          .cast("long").as(s"x$j")): _*)
    t("sliced count")(sliced.count())
    val sig = sliced.groupBy(col("doc_id")).agg(
      array((0 until 16).map(j => min(col(s"x$j"))): _*).as("mins"))
    t("sig count (no persist)")(sig.count())
    val sigP = sig.persist()
    t("sig persist materialize")(sigP.count())
    val bands = sigP.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          element_at(col("mins"), 2 * b + 1).as("k1"),
          element_at(col("mins"), 2 * b + 2).as("k2"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.k1").as("k1"), col("bb.k2").as("k2"))
    t("bands count")(bands.count())
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.k1") === col("y.k1") &&
          col("x.k2") === col("y.k2"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    t("cand count")(println("  n=" + cand.count()))
    val nMatch = aggregate(
      zip_with(col("a_mins"), col("b_mins"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val out = cand
      .join(sigP.select(col("doc_id").as("doc_a"), col("mins").as("a_mins")),
        "doc_a")
      .join(sigP.select(col("doc_id").as("doc_b"), col("mins").as("b_mins")),
        "doc_b")
      .withColumn("n_match", nMatch)
      .filter(col("n_match") * 2 >= 16)
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(col("n_match") / lit(16.0), 4).as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    t("full out count")(println("  n=" + out.count()))
    t("e2e fresh (query fn)")(println("  n=" +
      graft.SparkEntry.queries("q36b_minhash_lsh")(spark, d).count()))
    spark.stop()
  }
}
