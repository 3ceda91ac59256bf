package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join (DuckDB v1.1 `ASOF JOIN`, SURVEY §2.2 "Joins" — no Spark
  * builtin). Backward as-of: for each left row, the most recent right
  * row with `rightTime <= leftTime` within the same key group.
  *
  * Implementation is the scalable union+window formulation, NOT a
  * range cross-join: both sides are unioned, shuffled ONCE by the join
  * key, sorted by time within each partition, and right-side values
  * are carried forward with `last(_, ignoreNulls=true)`. Cost is one
  * shuffle + one sort — survives 100TB inputs where an inequality
  * nested-loop join would not; skewed keys are handled by AQE.
  */
object AsOfJoin {

  /** Backward as-of (`leftTime >= rightTime`, most recent right row).
    * @param rightCols right columns to carry onto each left row (they
    *   must not collide with left column names).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, rightCols,
      forward = false)

  /** Forward as-of (`leftTime <= rightTime`, earliest upcoming right
    * row).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, rightCols,
      forward = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val key = "__asof_key"
    val time = "__asof_t"
    val side = "__asof_side"
    // inclusive match at equal time: backward needs right BEFORE left
    // in the ascending sort; forward needs right AFTER left.
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)

    val l = left
      .withColumn(key, col(leftKey))
      .withColumn(time, col(leftTime))
      .withColumn(side, lit(leftSide))
      .select(Seq(key, time, side).map(col) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(key, col(rightKey))
      .withColumn(time, col(rightTime))
      .withColumn(side, lit(rightSide))
      .select(Seq(key, time, side).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col): _*)

    // Deterministic total order: ties between right rows at the same
    // (key, time) resolve by the carried columns themselves.
    val ordered = Seq(time, side).map(col) ++ rightCols.map(col)
    val w =
      if (forward)
        Window.partitionBy(col(key)).orderBy(ordered.map(_.asc): _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(col(key)).orderBy(ordered.map(_.asc): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      val agg = if (forward) first(col(c), ignoreNulls = true)
        else last(col(c), ignoreNulls = true)
      df.withColumn(c, agg.over(w))
    }
    carried.filter(col(side) === leftSide).drop(key, time, side)
  }
}
