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

  /** DuckDB `a POSITIONAL JOIN b`: pair the i-th row of each side, the
    * shorter side padded with NULLs. Inherently order-defined, so this
    * is the one operator family where RDD zipWithIndex is the right
    * tool (per-partition index offsets in one extra pass, no single-
    * partition collapse the row_number-without-partition form forces);
    * the pairing itself is an index equi-join Catalyst plans normally.
    */
  def positionalJoin(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    def withPos(df: DataFrame, posCol: String): DataFrame = {
      val schema = df.schema.add(posCol, LongType, nullable = false)
      val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i)
      }
      df.sparkSession.createDataFrame(rdd, schema)
    }
    withPos(a, "__pos")
      .join(withPos(b, "__pos"), Seq("__pos"), "full_outer")
      .orderBy(col("__pos"))
      .drop("__pos")
  }
}
