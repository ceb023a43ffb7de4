package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * timestamp is at-or-before the left row's timestamp, within the same key
  * group (ref rg.py:72-82, README.md:19-21 — "the last merge commit before
  * each nightly CI run").
  *
  * Spark has no native as-of join, so this composes built-ins: tag both
  * sides, union them, and take a running `last(_, ignoreNulls)` over a
  * window partitioned by the keys and ordered by (ts, side, tieBreak).
  * Cost model: ONE shuffle on the keys (the window exchange) — no per-row
  * subquery, no broadcast of the right side, no cartesian blow-up. At
  * 100 TB this is the same shuffle a plain equi-join on the keys would do,
  * which is the best achievable without pre-bucketed storage.
  */
object AsofJoin {

  /** @param keys      equi-key columns present on BOTH sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name (also carried to output)
    * @param rightVals right columns to carry (beside rightTs); must not
    *                  collide with left column names
    * @param tieBreak  right columns breaking equal-timestamp ties
    *                  (ascending; the greatest wins, deterministically)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val carried = (rightVals :+ rightTs).distinct
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftNonKey = left.columns.filterNot(keys.contains).toSeq
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1)
    // so "at-or-before" is inclusive.
    val leftTagged = left.select(
      keys.map(col) ++
        leftNonKey.map(col) ++
        carried.map(c => lit(null).cast(rightTypes(c)).as(c)) :+
        lit(1).as("__side") :+
        col(leftTs).as("__ats"): _*)
    val rightTagged = right.select(
      keys.map(col) ++
        leftNonKey.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        carried.map(col) :+
        lit(0).as("__side") :+
        col(rightTs).as("__ats"): _*)

    val order: Seq[Column] =
      col("__ats") +: col("__side") +: tieBreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = carried.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side", "__ats")
  }
}
