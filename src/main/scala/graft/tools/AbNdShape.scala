package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of the near-dup pair primitive's round-17
  * shape change (VERDICT r17 #3). Arms, same JVM, alternating reps so
  * machine drift hits both equally:
  *   r16     — hashedShingles + separate per-doc count aggregate +
  *             two post-aggregation attach joins (the pre-r17 shape,
  *             reconstructed from commit 08066f0)
  *   current — hashedShinglesWithCount (carried c) + sizedAtHalf
  *             PPJoin prune inside the self join (Dedup.nearDupPairs
  *             as shipped)
  * Usage: runMain graft.tools.AbNdShape [sfDir] [reps]
  */
object AbNdShape {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Tables}

    def docs: DataFrame = Tables.documents(spark, d)

    // the r16 shape, verbatim from 08066f0 (modulo the shared helpers)
    def nearDupPairsR16(docs: DataFrame): DataFrame = {
      val sh = Dedup.hashedShingles(docs).repartition(col("h"))
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      val pairs = Dedup.shingleSelfJoin(sh, 1)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(cnt.select(col("doc_id").as("doc_a"), col("c").as("n_a")),
          "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("c").as("n_b")),
          "doc_b")
        .withColumn("jaccard",
          round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4))
        .filter(col("inter") / (col("n_a") + col("n_b") - col("inter"))
          >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
          col("n_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }

    // one untimed warm pass per arm (JIT parity with the Bench method)
    nearDupPairsR16(docs).count()
    Dedup.nearDupPairs(docs).count()
    for (r <- 1 to reps) {
      for ((label, df) <- Seq(
        ("r16_shape", nearDupPairsR16(docs)),
        ("current  ", Dedup.nearDupPairs(docs)))) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[abnd] rep=$r $label rows=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
