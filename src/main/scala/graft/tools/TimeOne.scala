package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries repeatedly.
  * Usage: runMain graft.tools.TimeOne <sfDir> <reps> <name> [name ...]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; r <- 1 to reps) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name rep=$r rows=$n sec=$dt%.3f")
    }
    spark.stop()
  }
}
