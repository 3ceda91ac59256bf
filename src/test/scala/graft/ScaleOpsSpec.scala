package graft

import org.apache.spark.sql.functions._

/** Scale-out building blocks: bucketed exchange-free joins, salted
  * aggregation equivalence, binned range-join equivalence + plan shape.
  */
class ScaleOpsSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val o = Tables.load(s, sfDir, "orders")
    val l = Tables.load(s, sfDir, "lineitem")
    ScaleOps.writeBucketed(o.select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    ScaleOps.writeBucketed(l.select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 8)
    // force the sort-merge path (at spec scale the planner would
    // broadcast the tiny side and skip bucket co-location entirely)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("lineitem_b").join(s.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and it is still correct
      val expect = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE orders_b"); s.sql("DROP TABLE lineitem_b")
    }
  }

  test("salted aggregation equals plain aggregation") {
    val l = Tables.load(spark, sfDir, "lineitem")
    val salted = ScaleOps.saltedSum(l, "l_returnflag", "l_quantity")
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = l.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(30,8)")).cast("double"),
        count(lit(1)))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == plain)
  }

  test("binned range join equals nested-loop theta join, without BNLJ") {
    val s = spark
    import s.implicits._
    val points = Tables.load(s, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val ranges = Seq((1L, 0.0, 10.0), (2L, 8.0, 25.0), (3L, 40.0, 50.0))
      .toDF("range_id", "lo", "hi")
    val binned = ScaleOps.rangeJoinBinned(points, "l_quantity", ranges,
      "lo", "hi", binWidth = 5.0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      "binned range join must hash-join on bins")
    val exact = points.join(ranges,
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber", "range_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(key(binned) == key(exact))
  }

  test("spread: widens a one-task scan to defaultParallelism, identity elsewhere") {
    val s = spark
    // single-row-group parquet scan plans 1 partition -> spread widens
    val docs = Tables.load(s, sfDir, "documents")
    val widened = ScaleOps.spread(docs, Seq(col("doc_id")))
    assert(widened.rdd.getNumPartitions == s.sparkContext.defaultParallelism,
      "one-task scan must spread to defaultParallelism")
    // row set unchanged
    assert(widened.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // identity on frames that already shuffle (exchange present)
    val agged = docs.groupBy(col("lang")).count()
    assert(ScaleOps.spread(agged) eq agged)
    // identity on non-file-scan (in-memory) relations — the test-frame
    // and cached-frame guard
    import s.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(ScaleOps.spread(mem) eq mem)
  }
}
