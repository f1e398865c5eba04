package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, the latest right value
  * whose (ts, tie) is strictly before the left row's (ts, tie),
  * per key.
  *
  * Planned as ONE shuffle: tag the sides, union them, and run a
  * single `last(…, ignoreNulls)` window over (key) ordered by
  * (ts, tie) with a rows-preceding frame. No range predicate, no
  * nested loop, no per-key driver logic — the classic union-window
  * as-of, which scales as a plain keyed sort at 100 TB. Spark lacks
  * this operator natively (pandas-on-Spark's merge_asof plans a range
  * join); composing it from window primitives keeps Catalyst in
  * charge of the physical plan.
  */
object AsofJoin {

  /** @param left     probe side (rows to enrich)
    * @param right    reference side (values to look up)
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    event-time column name (both sides)
    * @param tieCol   unique tiebreak column name (both sides)
    * @param valueCol right-side column to carry; emitted as
    *                 `asof_<valueCol>` (null when no prior right row)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    // Every left column rides through the union (null-filled on right
    // rows), so the output is left.* + asof_<valueCol> — no second
    // join needed to recover the probe row's own data.
    val anchor = (keys :+ tsCol :+ tieCol).toSet
    val extras = left.columns.filterNot(anchor.contains).toSeq
    val sel: Seq[Column] = keys.map(col) ++ Seq(col(tsCol), col(tieCol))
    val taggedRight = right.select(
      sel ++ extras.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        :+ col(valueCol).as("__v") :+ lit(0).as("__side"): _*)
    val taggedLeft = left.select(
      sel ++ extras.map(col)
        :+ lit(null).cast(right.schema(valueCol).dataType).as("__v")
        :+ lit(1).as("__side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof",
        last(when(col("__side") === 0, col("__v")), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(sel ++ extras.map(col) :+ col("__asof").as(s"asof_$valueCol"): _*)
  }
}
