package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Classic TPC-H-shaped analytic joins (Q3/Q5/Q10 silhouettes over the
  * reduced star schema) — the canonical multi-join + filtered-agg
  * shapes a warehouse engine is judged on. Exercises Catalyst join
  * reordering across 3–6 tables, broadcast of every dim, pushdown of
  * the date/segment filters into the parquet scans, and partial
  * aggregation before the final shuffle.
  */
object QueriesAnalytics {

  val defs: Map[String, Q] = Map(
    // Q3 silhouette: segment-filtered revenue per order, top-10.
    "q_tpch_q3" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    // Q5 silhouette: local-supplier volume by nation, 6-table join.
    "q_tpch_q5" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    // Q10 silhouette: returned-item revenue per customer, top-20.
    "q_tpch_q10" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  val moreDefs: Map[String, Q] = Map(
    // Q14 silhouette: promo revenue share — fact ⋈ part dim with a
    // conditional aggregate ratio (the only query family touching
    // `part`, closing full-fixture coverage).
    "q_tpch_q14" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      val p = t(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))
              .cast("decimal(30,8)")).cast("double") /
            sum(rev.cast("decimal(30,8)")).cast("double"), 6)
            .as("promo_revenue_pct"),
          count(lit(1)).as("n_lines"))
    }),
    // Ordered funnel: earliest view -> first click after it -> first
    // purchase after that, per user; one row per stage with the user
    // count that reached it. Every join is user-keyed (no windows over
    // the full event stream), so the funnel scales with users.
    "q_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // Each stage frame is BOTH counted and joined into the next
      // stage; without a checkpoint the final union re-executes v's
      // lineage 3× and c's 2× (scan+agg each time). Lazy localCheckpoint
      // materializes each stage once, on first use.
      // Cluster caveat: local-checkpointed blocks live on executors and
      // are NOT recomputable on executor loss — on a real cluster use
      // reliable checkpoint (or persist + explicit unpersist) instead;
      // localCheckpoint is the right trade only for single-JVM local mode.
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("mv"))
        .localCheckpoint(eager = false)
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("mv"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("mc"))
        .localCheckpoint(eager = false)
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("mc"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("mp"))
      val stages = Seq(("view", v), ("click", c), ("purchase", p))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"),
          col("n_users"))
      }.reduce(_ unionAll _).orderBy(col("stage"))
    }),
    // Weekly cohort retention: cohort = week index of a user's first
    // event (pure integer date arithmetic — no engine week-numbering
    // conventions), cell = users from cohort w0 active at offset w-w0.
    "q_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
            .cast("bigint").as("w"))
        .distinct()
      val first = ev.groupBy(col("user_id")).agg(min(col("w")).as("w0"))
      ev.join(first, "user_id")
        .groupBy(col("w0").as("cohort_week"),
          (col("w") - col("w0")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    // Per-language length-outlier trim: drop docs above the in-language
    // p95 of n_chars (the usual heavy-tail cleanup); thresholds are one
    // row per language (broadcast), corpus side map-only. NOTE exact
    // `percentile` buffers each group's values — fine here and needed
    // for the oracle's quantile_cont to match bit-for-bit, but the
    // 100 TB path swaps in approx_percentile (t-digest: mergeable,
    // bounded memory) with everything else unchanged.
    "q_length_trim" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val thr = docs.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.95)).as("p95"))
      docs.join(broadcast(thr), "lang")
        .filter(col("n_chars") <= col("p95"))
        .groupBy(col("lang"), round(col("p95").cast("double"), 6).as("p95"))
        .agg(count(lit(1)).as("n_kept"), max(col("n_chars")).as("max_kept"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  round(100.0 *
        |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(30,8))) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE), 6)
        |    AS promo_revenue_pct,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS mv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id AS user_id, min(e.ts) AS mc
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.mv
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id AS user_id, min(e.ts) AS mp
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.mc
        |      GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT 'view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT 'click', count(*) FROM c
        |  UNION ALL SELECT 'purchase', count(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "q_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS w
        |  FROM events),
        |f AS (SELECT user_id, min(w) AS w0 FROM a GROUP BY user_id)
        |SELECT f.w0 AS cohort_week, a.w - f.w0 AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY f.w0, a.w - f.w0
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_length_trim" ->
      """WITH thr AS (
        |  SELECT lang, quantile_cont(n_chars, 0.95) AS p95
        |  FROM documents GROUP BY lang)
        |SELECT d.lang AS lang, round(CAST(t.p95 AS DOUBLE), 6) AS p95,
        |  count(*) AS n_kept, max(d.n_chars) AS max_kept
        |FROM documents d JOIN thr t ON d.lang = t.lang
        |WHERE d.n_chars <= t.p95
        |GROUP BY d.lang, round(CAST(t.p95 AS DOUBLE), 6)
        |ORDER BY d.lang""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
