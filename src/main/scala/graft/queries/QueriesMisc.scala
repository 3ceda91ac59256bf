package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Final §2.2 checklist items: mode, custom UDAF, NATURAL/USING joins,
  * UNION BY NAME, named WINDOW clause.
  */
object QueriesMisc {

  val defs: Map[String, Q] = Map(
    // mode() ordered-set aggregate — l_linenumber's count distribution
    // is strictly decreasing, so the mode is tie-free at every SF.
    "q_agg_mode" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(mode(col("l_linenumber")).as("mode_ln"))
        .orderBy(col("l_returnflag"))
    }),
    // custom typed Aggregator through the SQL surface.
    "q_agg_geomean" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderstatus, round(geomean(o_totalprice), 3) AS gm
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),
    // NATURAL join.
    "q_join_natural" -> ((s, dir) => sql(s, dir,
      """SELECT c_custkey, n_name
        |FROM (SELECT c_custkey, c_nationkey AS n_nationkey FROM customer) c
        |NATURAL JOIN nation
        |ORDER BY c_custkey""".stripMargin)),
    // USING join.
    "q_join_using" -> ((s, dir) => sql(s, dir,
      """SELECT rk, n_name, r_name
        |FROM (SELECT n_regionkey AS rk, n_name FROM nation) n
        |JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)
        |ORDER BY n_name""".stripMargin)),
    // UNION (ALL) BY NAME — column-name-based set union.
    "q_union_byname" -> ((s, dir) => {
      val a = t(s, dir, "nation").filter(col("n_nationkey") < 2)
        .select(col("n_nationkey").as("k"), col("n_name").as("nm"))
      val b = t(s, dir, "nation").filter(col("n_nationkey") === 3)
        .select(col("n_name").as("nm"), col("n_nationkey").as("k"))
      a.unionByName(b).orderBy(col("k"))
    }),
    // try_* arithmetic: ANSI-mode-safe forms matching DuckDB's
    // NULL-on-div-zero semantics (SURVEY §7 semantic-delta closure).
    "q_try_arith" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          try_divide(col("l_extendedprice"),
            col("l_quantity") - col("l_quantity")).as("div0"),
          try_divide(round(col("l_extendedprice"), 2), col("l_quantity"))
            .as("unit_price"),
          try_add(col("l_orderkey"), col("l_partkey")).as("k_sum"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(3000)
    }),
    // star EXCLUDE modifier (DuckDB) through the rewrite pre-pass.
    "q_star_exclude" -> ((s, dir) => sql(s, dir,
      """SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey""".stripMargin)),
    // pg/DuckDB DISTINCT ON: first row per key under the query ORDER
    // BY — rewritten to a QUALIFY row_number() window.
    "q_distinct_on_sql" -> ((s, dir) => sql(s, dir,
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),
    // GROUP BY ALL / ORDER BY ALL (DuckDB sugar Spark 4 also speaks
    // natively — parity checked against DuckDB's own evaluation).
    "q_orderby_all" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS tot
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)),
    // DuckDB COLUMNS(regex) star expression — bare form (regex is a
    // partial match, output keeps source column names).
    "q_columns_regex" -> ((s, dir) => sql(s, dir,
      """SELECT COLUMNS('_id$|^lang$') FROM documents
        |ORDER BY doc_id""".stripMargin)),
    // COLUMNS(*) threaded through an aggregate: one agg per source
    // column, result columns named after the source (DuckDB naming).
    "q_columns_agg" -> ((s, dir) => sql(s, dir,
      """SELECT lang, max(COLUMNS('^n_|^doc_id$')) FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin)),
    // named WINDOW clause shared by several window functions.
    "q_named_windows" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS run
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )

  val oracles: Map[String, String] = Map(
    // DuckDB evaluates DISTINCT ON / GROUP BY ALL natively — oracle
    // SQL is identical to the engine-side statement.
    "q_distinct_on_sql" ->
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_orderby_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS tot
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    // DuckDB evaluates COLUMNS natively — oracle SQL is identical.
    "q_columns_regex" ->
      """SELECT COLUMNS('_id$|^lang$') FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_columns_agg" ->
      """SELECT lang, max(COLUMNS('^n_|^doc_id$')) FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_agg_mode" ->
      """SELECT l_returnflag, mode(l_linenumber) AS mode_ln
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_geomean" ->
      """SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 3) AS gm
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_natural" ->
      """SELECT c_custkey, n_name
        |FROM (SELECT c_custkey, c_nationkey AS n_nationkey FROM customer) c
        |NATURAL JOIN nation
        |ORDER BY c_custkey""".stripMargin,
    "q_join_using" ->
      """SELECT rk, n_name, r_name
        |FROM (SELECT n_regionkey AS rk, n_name FROM nation) n
        |JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)
        |ORDER BY n_name""".stripMargin,
    "q_union_byname" ->
      """SELECT n_nationkey AS k, n_name AS nm FROM nation WHERE n_nationkey < 2
        |UNION ALL BY NAME
        |SELECT n_name AS nm, n_nationkey AS k FROM nation WHERE n_nationkey = 3
        |ORDER BY k""".stripMargin,
    "q_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / (l_quantity - l_quantity) AS div0,
        |  round(l_extendedprice, 2) / l_quantity AS unit_price,
        |  l_orderkey + l_partkey AS k_sum
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3000""".stripMargin,
    "q_star_exclude" ->
      "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey",
    "q_named_windows" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS run
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
