package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** CTEs & subqueries (SURVEY §2.2 "CTEs & subqueries"): WITH, scalar/
  * IN/EXISTS/correlated subqueries, LATERAL, recursive CTE (native
  * UnionLoop in Spark 4.1; [[RecursiveCte]] covers DataFrame-level
  * fixpoints).
  */
object QueriesSub {

  val defs: Map[String, Q] = Map(
    // Plain CTE through the SQL surface (Catalyst inlines it).
    "q_cte" -> ((s, dir) => sql(s, dir,
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 15)
        |SELECT c_custkey, c_name, big.n AS n
        |FROM customer JOIN big ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin)),
    // Uncorrelated scalar subquery in a predicate.
    "q_subquery_scalar" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.7 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),
    // IN / NOT IN subqueries.
    "q_subquery_in" -> ((s, dir) => sql(s, dir,
      """SELECT c_custkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey = 2)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),
    // Correlated scalar subquery (per-customer max order).
    "q_subquery_correlated" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    // LATERAL correlated subquery.
    "q_lateral" -> ((s, dir) => sql(s, dir,
      """SELECT r_name, x FROM region,
        |  LATERAL (SELECT min(n_name) AS x FROM nation
        |           WHERE n_regionkey = r_regionkey) t
        |ORDER BY r_name""".stripMargin)),
    // WITH RECURSIVE — Spark 4.1 executes this natively (UnionLoop),
    // one plan instead of a driver loop; the DataFrame-level fixpoint
    // operator (RecursiveCte, CompatSpec) remains for iterative
    // algorithms SQL can't express.
    "q_recursive_cte" -> ((s, dir) => sql(s, dir,
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100)
        |SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS cnt FROM t"""
        .stripMargin))
  )

  val oracles: Map[String, String] = Map(
    "q_cte" ->
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 15)
        |SELECT c_custkey, c_name, big.n AS n
        |FROM customer JOIN big ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.7 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT c_custkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey = 2)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_correlated" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_lateral" ->
      """SELECT r_name, x FROM region,
        |  LATERAL (SELECT min(n_name) AS x FROM nation
        |           WHERE n_regionkey = r_regionkey) t
        |ORDER BY r_name""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100)
        |SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS cnt FROM t""".stripMargin
  )
}
