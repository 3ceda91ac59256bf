package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small relational operators DuckDB/pg expose as syntax and Spark
  * expresses as plan shapes (SURVEY §2.2).
  */
object RelationalOps {

  /** `SELECT DISTINCT ON (keys) ... ORDER BY keys, tiebreak` (pg-ism
    * DuckDB supports): one row per key group, picked by the tiebreak
    * order — a ranking window + filter, one shuffle on the keys.
    */
  def distinctOn(df: DataFrame, keys: Seq[String],
      tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
