package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B q61 jump-loop vs star-contraction CC (round 8), after
  * the earlier conf sweeps (AQE, shuffle width) bottomed out at the
  * jump loop's 5-round scheduler floor. */
object AbQ61 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
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
    def fuse(on: Boolean): Unit =
      spark.conf.set("spark.graft.cc.star.fuse", if (on) "on" else "off")
    // warm all code paths' codegen/JIT before any measured run
    algo("jump"); run("warmup-jump")
    algo("star"); fuse(false); run("warmup-star")
    fuse(true); run("warmup-star-fused")
    val reps = 3
    def block(tag: String)(prep: => Unit): Double =
      (1 to reps).map { i => prep; run(s"$tag-$i") }.min
    val nofuse1 = block("star-nofuse") { algo("star"); fuse(false) }
    val fused1 = block("star-fused") { algo("star"); fuse(true) }
    val nofuse2 = block("star-nofuse2") { algo("star"); fuse(false) }
    val fused2 = block("star-fused2") { algo("star"); fuse(true) }
    println(f"[ab] MIN star-nofuse=${math.min(nofuse1, nofuse2)}%.3f " +
      f"star-fused=${math.min(fused1, fused2)}%.3f")
    spark.stop()
  }
}
