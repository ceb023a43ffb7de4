package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B q61 jump-loop vs star-contraction CC (round 8), after
  * the earlier conf sweeps (AQE, shuffle width) bottomed out at the
  * jump loop's 5-round scheduler floor. */
object AbQ61 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(tag: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q61_dedup_clusters")(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag rows=$n sec=$sec%.3f")
      sec
    }
    def algo(a: String): Unit = spark.conf.set("spark.graft.cc.algo", a)
    // warm both code paths' codegen/JIT before any measured run
    algo("jump"); run("warmup-jump")
    algo("star"); run("warmup-star")
    val reps = 3
    val jump = (1 to reps).map { i => algo("jump"); run(s"jump-$i") }.min
    val star = (1 to reps).map { i => algo("star"); run(s"star-$i") }.min
    val jump2 = (1 to reps).map { i => algo("jump"); run(s"jump2-$i") }.min
    println(f"[ab] MIN jump=${math.min(jump, jump2)}%.3f star=$star%.3f")
    spark.stop()
  }
}
