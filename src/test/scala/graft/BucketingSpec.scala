package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Scale pattern: bucketed storage co-locates join keys at WRITE time, so
  * repeated joins on the bucket key run with zero shuffle exchanges —
  * at 100 TB this converts the dominant per-query cost into a one-time
  * layout cost. Asserted on the physical plan, not timings. */
class BucketingSpec extends SparkSpec {

  private def countShuffles(p: SparkPlan): Int = {
    val self = p match {
      case _: ShuffleExchangeExec => 1
      case _ => 0
    }
    self + p.children.map(countShuffles).sum
  }

  test("join on bucketed tables plans with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ops.Tables.orders(spark, sf)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    ops.Tables.lineitem(spark, sf)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // disable broadcast so the join must pick a co-location-aware plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan
      val shufflesBeforeAgg = countShuffles(plan)
      // only the final 1-group aggregation may shuffle; the JOIN itself
      // must not (bucket layout already co-locates both sides)
      assert(shufflesBeforeAgg <= 1,
        s"expected bucketed join without shuffle, got:\n$plan")
      assert(joined.count() === 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
