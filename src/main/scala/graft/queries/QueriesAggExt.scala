package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Aggregation surface beyond the flagship (SURVEY §2.2 "Aggregation"):
  * distinct aggs, grouping sets/rollup/cube, HAVING/FILTER, ordered-set
  * stats, arg-extremes, list/string aggregation, bit/bool aggs.
  */
object QueriesAggExt {

  val defs: Map[String, Q] = Map(
    // count(DISTINCT …) — Expand-based distinct aggregation.
    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    // ROLLUP with grouping() marker.
    "q_agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_linestatus")).cast("int").as("g"))
        .orderBy(col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last, col("g"))
    }),
    // CUBE.
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)
    }),
    // GROUPING SETS through the SQL surface.
    "q_agg_groupingsets" -> ((s, dir) => sql(s, dir,
      """SELECT n_regionkey, n_name, count(*) AS n
        |FROM nation
        |GROUP BY GROUPING SETS ((n_regionkey), (n_name))
        |ORDER BY n_regionkey ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin)),
    // HAVING + FILTER(WHERE) clause.
    "q_agg_having_filter" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"))
        .filter(col("n") > 100)
        .orderBy(col("o_orderpriority"))
    }),
    // Moments: stddev/variance/corr/covar (rounded — libm last-bit).
    "q_agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 6)
            .as("cov_pq"))
        .orderBy(col("l_returnflag"))
    }),
    // Ordered-set aggregates: median / interpolated quantile.
    "q_agg_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(median(col("o_totalprice")), 4).as("med_price"),
          round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
          round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))
        .orderBy(col("o_orderstatus"))
    }),
    // arg-extremes with a tie-free composite key.
    "q_agg_minmax_by" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"),
            tieKey(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          min_by(col("o_orderkey"),
            tieKey(col("o_totalprice"), col("o_orderkey"))).as("bottom_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("o_orderstatus"))
    }),
    // list/string aggregation, deterministically ordered.
    "q_agg_collect" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          to_json(array_sort(collect_list(col("n_name")))).as("names"),
          concat_ws(",", array_sort(collect_list(col("n_name"))))
            .as("names_csv"))
        .orderBy(col("n_regionkey"))
    }),
    // bool_and/bool_or + bit_and/bit_or/bit_xor.
    "q_agg_boolbit" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          bool_and(col("n_nationkey") >= 0).as("all_nonneg"),
          bool_or(col("n_nationkey") > 20).as("any_big"),
          bit_and(col("n_nationkey")).as("b_and"),
          bit_or(col("n_nationkey")).as("b_or"),
          bit_xor(col("n_nationkey")).as("b_xor"))
        .orderBy(col("n_regionkey"))
    }),
    // HLL sketch — implementations differ between engines by design,
    // so no SQL oracle (driver records rows-only); asserted ±5% vs the
    // exact count in the scalatest spec instead.
    "q_agg_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping(l_linestatus) AS INT) AS g
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, g""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "q_agg_groupingsets" ->
      """SELECT n_regionkey, n_name, count(*) AS n
        |FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_name))
        |ORDER BY n_regionkey NULLS LAST, n_name NULLS LAST""".stripMargin,
    "q_agg_having_filter" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f
        |FROM orders GROUP BY o_orderpriority
        |HAVING count(*) > 100 ORDER BY o_orderpriority""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 6) AS cov_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_quantiles" ->
      """SELECT o_orderstatus,
        |  round(median(o_totalprice), 4) AS med_price,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_minmax_by" ->
      """SELECT o_orderstatus,
        |  max_by(o_orderkey, printf('%020.4f-%010d', o_totalprice, o_orderkey)) AS top_order,
        |  min_by(o_orderkey, printf('%020.4f-%010d', o_totalprice, o_orderkey)) AS bottom_order,
        |  max(o_totalprice) AS max_price,
        |  min(o_totalprice) AS min_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_collect" ->
      """SELECT n_regionkey,
        |  to_json(list(n_name ORDER BY n_name)) AS names,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names_csv
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_agg_boolbit" ->
      """SELECT n_regionkey,
        |  bool_and(n_nationkey >= 0) AS all_nonneg,
        |  bool_or(n_nationkey > 20) AS any_big,
        |  bit_and(n_nationkey) AS b_and,
        |  bit_or(n_nationkey) AS b_or,
        |  bit_xor(n_nationkey) AS b_xor
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
  )
}
