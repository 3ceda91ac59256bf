package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability row from
  * SURVEY §2, expressed with the DataFrame/Dataset API (Spark-first,
  * not SQL translation); [[oracleSql]] carries the DuckDB-dialect
  * equivalent the driver runs as correctness oracle.
  *
  * Conventions (so the driver's sorted-column hash compare passes):
  *  - every computed column is aliased identically on both sides;
  *  - every query ends in a total ORDER BY (deterministic row set);
  *  - double aggregates go through an exact DECIMAL cast then back to
  *    double, so sum order cannot perturb low bits (SURVEY §7 traps).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum(double) with deterministic value: exact decimal accumulation,
    * then a single correctly-rounded conversion back to double.
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(30,8)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.defs ++ QueriesAgg.defs ++ QueriesJoins.defs ++
      QueriesAggExt.defs ++ QueriesWindow.defs ++ QueriesSetSort.defs ++
      QueriesScalar.defs ++ QueriesSub.defs ++ QueriesPipeline.defs ++
      QueriesSugar.defs ++ QueriesExtra.defs ++ QueriesMisc.defs ++
      QueriesAnalytics.defs ++ QueriesAnalytics.moreDefs ++ QueriesVocab9.defs ++
      QueriesCuration.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracles ++ QueriesAgg.oracles ++ QueriesJoins.oracles ++
      QueriesAggExt.oracles ++ QueriesWindow.oracles ++ QueriesSetSort.oracles ++
      QueriesScalar.oracles ++ QueriesSub.oracles ++ QueriesPipeline.oracles ++
      QueriesSugar.oracles ++ QueriesExtra.oracles ++ QueriesMisc.oracles ++
      QueriesAnalytics.oracles ++ QueriesVocab9.oracles ++
      QueriesCuration.oracles
}

/** Aggregation operators (SURVEY §2.2 "Aggregation"). */
object QueriesAgg {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(30,8)")).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: hash aggregate with partial/final over a scan
    // with filter pushdown; the grouping keys are low-cardinality so
    // map-side combine collapses almost everything before the shuffle.
    "q1_agg" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(col("l_quantity")))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

/** Scan / filter / projection / join / sort / limit operators
  * (SURVEY §2.2 "Scans", "Projection/filter", "Joins", "Sort/limit").
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Projection + filter with predicate pushdown to the parquet scan.
    "q_scan_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    // Equi-join fact->dim; dim side is tiny so it must broadcast.
    "q_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    // Top-k: ORDER BY + LIMIT fuses to TakeOrderedAndProject.
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  )
}
