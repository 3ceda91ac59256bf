package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the parity corpus (SURVEY §5 item 2 — every
  * query exists twice: DataFrame-API here, DuckDB SQL in the paired
  * oracle map; the driver hash-compares both at sf0.01).
  */
object QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Run a SQL-surface query: register views, apply dialect rewrites,
    * delegate to Catalyst (mirrors reference cpp:52 Prepare).
    */
  def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(s, dir)
    Engine.query(s, q)
  }

  /** Deterministic double sum: exact decimal accumulation then one
    * correctly-rounded conversion back (float-sum order trap,
    * SURVEY §7).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(30,8)")).cast("double")

  /** Deterministic average built from the exact sum. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Tie-free ordering key for min_by/max_by/arg-extremes: zero-padded
    * value + primary key, lexicographically ordered the same way in
    * Spark and the oracle.
    */
  def tieKey(value: Column, pk: Column): Column =
    format_string("%020.4f-%010d", value, pk)
}
