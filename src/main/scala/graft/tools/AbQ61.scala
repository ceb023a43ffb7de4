package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B q61 under conf variants (AQE, shuffle partitions). */
object AbQ61 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q61_dedup_clusters")(spark, d).count()
      println(f"[ab] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    run("warmup1")
    run("warmup2")
    run("base-aqe-32")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    run("aqe-sp8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("noaqe-sp8")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    run("noaqe-sp32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    run("base-aqe-32-again")
    spark.stop()
  }
}
