package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: measure effect of a tiny-sf warmup on the sf0.1 timings. */
object WarmTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q36_near_dup", "q36b_minhash_lsh", "q36c_simhash",
      "q36e_near_dup_prefix", "q37_similarity_topk", "q41_lang_id")
    val t0 = System.nanoTime()
    for (n <- names)
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
    println(f"[warm] warmup at sf0.001: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    for (n <- names) {
      val t1 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"[warm] $n rows=$c sec=${(System.nanoTime() - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
