package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: verify q14b's within_2pct sketch assertion holds at every
  * scale factor (HLL++ is deterministic per input set, so one green run
  * per SF proves the property is stable, not flaky). */
object CheckQ14b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val rows = graft.SparkEntry.queries("q14b_approx_distinct")(spark, d)
        .collect()
      val allIn = rows.forall(_.getBoolean(2))
      println(s"[q14b] $sf rows=${rows.length} all_within_2pct=$allIn")
      rows.foreach(r => println(s"[q14b]   $r"))
      // sketch-only timing (ADVICE r4): what production pays without the
      // declared query's exact-count cross-check branch
      import org.apache.spark.sql.functions._
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.ops.Tables.events(spark, d)
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.005)
            .as("approx_users"))
          .count()
        val t1 = System.nanoTime()
        graft.SparkEntry.queries("q14b_approx_distinct")(spark, d).count()
        val t2 = System.nanoTime()
        println(f"[q14b] $sf run$run sketch_only=${(t1 - t0) / 1e9}%.3f " +
          f"declared=${(t2 - t1) / 1e9}%.3f sec")
      }
    }
    spark.stop()
  }
}
