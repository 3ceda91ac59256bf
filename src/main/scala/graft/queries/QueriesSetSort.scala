package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Set operations + sort/limit/offset/sampling/distinct
  * (SURVEY §2.2 "Set operations", "Sort / limit / top-k / sampling").
  */
object QueriesSetSort {

  val defs: Map[String, Q] = Map(
    "q_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.union(p).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),
    "q_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.union(p).distinct().orderBy(col("k"))
    }),
    "q_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.intersect(p).orderBy(col("k"))
    }),
    "q_intersect_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200).select(col("l_partkey").as("k"))
      val b = t(s, dir, "lineitem")
        .filter(col("l_orderkey").between(100, 400))
        .select(col("l_partkey").as("k"))
      a.intersectAll(b).orderBy(col("k"))
    }),
    "q_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.except(p).orderBy(col("k"))
    }),
    "q_except_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200).select(col("l_partkey").as("k"))
      val b = t(s, dir, "lineitem")
        .filter(col("l_orderkey").between(100, 400))
        .select(col("l_partkey").as("k"))
      a.exceptAll(b).orderBy(col("k"))
    }),
    // Multi-key sort with NULLS placement (DuckDB defaults NULLS LAST
    // both directions; Spark needs it explicit — SURVEY §2.2 sorts).
    "q_orderby_nulls" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
          col("c_acctbal"))
        .orderBy(col("seg").asc_nulls_last, col("c_acctbal").desc_nulls_last,
          col("c_custkey"))
        .limit(200)
    }),
    "q_limit_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(100).limit(25)
    }),
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // TABLESAMPLE: inherently engine-specific RNG → no SQL oracle
    // (driver rows-only check); spec asserts the sampled fraction.
    "q_sample" -> ((s, dir) => {
      t(s, dir, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY k ORDER BY k""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS k FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_partkey AS k FROM lineitem WHERE l_orderkey < 200
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_orderkey BETWEEN 100 AND 400
        |ORDER BY k""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_except_all" ->
      """SELECT l_partkey AS k FROM lineitem WHERE l_orderkey < 200
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_orderkey BETWEEN 100 AND 400
        |ORDER BY k""".stripMargin,
    "q_orderby_nulls" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey
        |LIMIT 200""".stripMargin,
    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 25 OFFSET 100""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
