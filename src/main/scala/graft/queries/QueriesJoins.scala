package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Join operators (SURVEY §2.2 "Joins"): every join kind the delegated
  * engine accepts over the wire, expressed Spark-first. Dimension
  * tables are explicitly broadcast; the multi-way join keeps the fact
  * table un-shuffled until the single aggregate shuffle.
  */
object QueriesJoins {

  val defs: Map[String, Q] = Map(
    // LEFT join with a genuinely null-producing side, aggregated.
    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),
    // RIGHT join (mirror image — planner flips it; semantics checked).
    "q_join_right" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),
    // FULL OUTER over two derived key sets with non-overlap each way.
    "q_join_full" -> ((s, dir) => {
      val lo = t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey").as("k")).distinct()
      val hi = t(s, dir, "orders").filter(col("o_orderkey").between(50, 149))
        .select(col("o_orderkey").as("k2")).distinct()
      lo.join(hi, lo("k") === hi("k2"), "full")
        .select(col("k"), col("k2"))
        .orderBy(col("k").asc_nulls_last, col("k2").asc_nulls_last)
    }),
    // LEFT SEMI (EXISTS rewrite target).
    "q_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    // LEFT ANTI (NOT EXISTS rewrite target): customers with no orders.
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    // CROSS join of the two tiny dims.
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val n = t(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n).orderBy(col("r_name"), col("n_name"))
    }),
    // Theta (non-equi) join: supplier pairs ordered by acctbal.
    "q_join_theta" -> ((s, dir) => {
      val s1 = t(s, dir, "supplier").select(
        col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
      val s2 = t(s, dir, "supplier").select(
        col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
      s1.join(s2, col("b1") < col("b2"))
        .select(col("k1"), col("k2"))
        .orderBy(col("k1"), col("k2"))
    }),
    // TPC-H Q5 shape: fact joined through 4 broadcast dims, one
    // aggregate shuffle at the end. At 100TB only lineitem is big —
    // every dim side fits the broadcast threshold.
    "q_join_multi" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(n("n_name"))
        .agg(dsum(l("l_extendedprice") * (lit(1) - l("l_discount")))
          .as("revenue"))
        .orderBy(col("n_name"))
    }),
    // ASOF JOIN (custom operator — union+window, single shuffle).
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"))
      AsOfJoin
        .backward(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderdate"))
        .select(col("event_id"), col("o_orderdate").as("last_order_date"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT lo.k AS k, hi.k2 AS k2 FROM
        |  (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey < 100) lo
        |  FULL OUTER JOIN
        |  (SELECT DISTINCT o_orderkey AS k2 FROM orders WHERE o_orderkey BETWEEN 50 AND 149) hi
        |  ON lo.k = hi.k2
        |ORDER BY k NULLS LAST, k2 NULLS LAST""".stripMargin,
    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2
        |FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal < s2.s_acctbal
        |ORDER BY k1, k2""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin
  )
}
