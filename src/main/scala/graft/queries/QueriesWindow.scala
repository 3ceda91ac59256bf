package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDsl._

/** Window functions (SURVEY §2.2 "Window functions"): ranking,
  * offsets, frames (ROWS + RANGE), running aggregates. Ordering keys
  * always end in a unique column so row-dependent functions are
  * deterministic; window double-sums use exact decimal accumulation
  * (DuckDB's segment-tree frame evaluation would otherwise reassociate
  * float adds).
  */
object QueriesWindow {

  val defs: Map[String, Q] = Map(
    // Ranking family. rank/dense_rank exercise real ties (l_quantity);
    // row_number/ntile get a fully unique order.
    "q_window_rank" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      val unique = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      val tied = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      l.select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          row_number().over(unique).as("rn"),
          rank().over(tied).as("rk"),
          dense_rank().over(tied).as("drk"),
          ntile(4).over(unique).as("quartile"),
          round(percent_rank().over(tied), 6).as("prk"),
          round(cume_dist().over(tied), 6).as("cd"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),
    // Offset family: lag/lead/first/last/nth over each customer's
    // order history.
    "q_window_offsets" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          first(col("o_orderkey")).over(wf).as("first_order"),
          last(col("o_orderkey")).over(wf).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    // ROWS frame: moving sum/avg over the 3-row trailing window.
    "q_window_frames_rows" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(30,8)")).over(w)
            .cast("double").as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    // RANGE frame: value-based window over the price domain.
    "q_window_frames_range" -> ((s, dir) => {
      val w = Window.orderBy(col("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_range"))
        .orderBy(col("o_orderkey"))
    }),
    // GLOBAL-order cumulative sum via the two-pass range-partitioned
    // operator — same semantics as `sum(v) OVER (ORDER BY k)` but no
    // single-partition WindowExec anywhere in the plan (the oracle IS
    // the one-stream window form; PlanAuditSpec gates the plan shape).
    "q_running_global" -> ((s, dir) => {
      ScaleOps.runningSum(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          Seq("o_orderkey"), "o_totalprice")
        .select(col("o_orderkey"),
          col("run_sum").cast("double").as("run_sum"))
        .orderBy(col("o_orderkey"))
    }),
    // Running totals over the whole history (cumulative frame).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(30,8)")).over(w)
            .cast("double").as("run_sum"),
          row_number().over(w).as("rn"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER u AS rn,
        |  rank() OVER t AS rk,
        |  dense_rank() OVER t AS drk,
        |  ntile(4) OVER u AS quartile,
        |  round(percent_rank() OVER t, 6) AS prk,
        |  round(cume_dist() OVER t, 6) AS cd
        |FROM lineitem WHERE l_quantity >= 48
        |WINDOW
        |  u AS (PARTITION BY l_returnflag
        |        ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
        |  t AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
        |ORDER BY l_returnflag, rn""".stripMargin,
    "q_window_offsets" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frames_rows" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS mov_sum,
        |  count(*) OVER w AS mov_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frames_range" ->
      """SELECT o_orderkey, o_totalprice,
        |  count(*) OVER w AS n_in_range
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_running_global" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    OVER (ORDER BY o_orderkey) AS DOUBLE) AS run_sum
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderstatus, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS run_sum,
        |  row_number() OVER w AS rn
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin
  )
}
