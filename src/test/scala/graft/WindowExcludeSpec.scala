package graft

/** Window-frame EXCLUDE lowering (WindowExclude). Every value below
  * is pinned from a DuckDB 1.0 probe run (2026-08): the same
  * statements executed verbatim in DuckDB produce these rows.
  */
class WindowExcludeSpec extends SparkSpecBase {

  private def rows(sql: String): Seq[Seq[Any]] =
    Engine.query(spark, sql).collect().toSeq.map(_.toSeq)

  test("EXCLUDE CURRENT ROW over a bounded ROWS frame (sum, count)") {
    assert(rows(
      "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "1 FOLLOWING EXCLUDE CURRENT ROW) AS s " +
        "FROM (VALUES (1),(2),(3),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, 2L), Seq(2, 4L), Seq(3, 6L), Seq(4, 3L)))
    assert(rows(
      "SELECT x, count(*) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "1 FOLLOWING EXCLUDE CURRENT ROW) AS c " +
        "FROM (VALUES (1),(2),(3)) t(x) ORDER BY x")
      == Seq(Seq(1, 1L), Seq(2, 2L), Seq(3, 1L)))
  }

  test("EXCLUDE CURRENT ROW: whole-partition frame, empty residual NULL") {
    assert(rows(
      "SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS s " +
        "FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, 8L), Seq(2, 7L), Seq(2, 7L), Seq(4, 5L)))
    // single-row partition: residual frame empty → NULL (avg too)
    assert(rows(
      "SELECT g, x, avg(x) OVER (PARTITION BY g ORDER BY x RANGE BETWEEN " +
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) " +
        "AS a FROM (VALUES (1,1),(1,2),(1,2),(1,5),(2,10)) t(g,x) " +
        "ORDER BY g, x")
      == Seq(Seq(1, 1, 3.0), Seq(1, 2, 2.6666666666666665),
        Seq(1, 2, 2.6666666666666665), Seq(1, 5, 1.6666666666666667),
        Seq(2, 10, null)))
  }

  test("EXCLUDE GROUP drops the whole peer set incl. self") {
    assert(rows(
      "SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS s " +
        "FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, null), Seq(2, 1L), Seq(2, 1L), Seq(4, 5L)))
    assert(rows(
      "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x RANGE BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS a " +
        "FROM (VALUES (1,1),(1,2),(1,2),(1,5),(2,10)) t(g,x) ORDER BY g, x")
      == Seq(Seq(1, 1, null), Seq(1, 2, 1L), Seq(1, 2, 1L),
        Seq(1, 5, 5L), Seq(2, 10, null)))
  }

  test("EXCLUDE TIES keeps self, drops the other peers") {
    assert(rows(
      "SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s " +
        "FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, 1L), Seq(2, 3L), Seq(2, 3L), Seq(4, 9L)))
    assert(rows(
      "SELECT x, count(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW EXCLUDE TIES) AS c " +
        "FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, 1L), Seq(2, 2L), Seq(2, 2L), Seq(4, 4L)))
    assert(rows(
      "SELECT x, avg(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED " +
        "PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS a " +
        "FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x")
      == Seq(Seq(1, 2.25), Seq(2, 2.3333333333333335),
        Seq(2, 2.3333333333333335), Seq(4, 2.25)))
  }

  test("EXCLUDE NO OTHERS is the identity") {
    assert(rows(
      "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "1 FOLLOWING EXCLUDE NO OTHERS) AS s " +
        "FROM (VALUES (1),(2),(3)) t(x) ORDER BY x")
      == Seq(Seq(1, 3L), Seq(2, 6L), Seq(3, 5L)))
  }

  test("FILTER over windows lowers to CASE-wrapped arguments") {
    // DuckDB-probed: sum [(1,1),(2,4),(3,3)], count [(1,0),(2,1),(3,2)],
    // min [2,2,2]
    assert(rows(
      "SELECT x, sum(x) FILTER (WHERE x <> 2) OVER (ORDER BY x ROWS " +
        "BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s " +
        "FROM (VALUES (1),(2),(3)) t(x) ORDER BY x")
      == Seq(Seq(1, 1L), Seq(2, 4L), Seq(3, 3L)))
    assert(rows(
      "SELECT x, count(*) FILTER (WHERE x > 1) OVER (ORDER BY x) AS c " +
        "FROM (VALUES (1),(2),(3)) t(x) ORDER BY x")
      == Seq(Seq(1, 0L), Seq(2, 1L), Seq(3, 2L)))
    assert(rows(
      "SELECT x, min(x) FILTER (WHERE x > 1) OVER (ORDER BY x ROWS " +
        "BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS m " +
        "FROM (VALUES (1),(2),(3)) t(x) ORDER BY x")
      == Seq(Seq(1, 2), Seq(2, 2), Seq(3, 2)))
    // group-by FILTER (no OVER) keeps Spark's native path
    assert(rows(
      "SELECT sum(x) FILTER (WHERE x > 1) AS s " +
        "FROM (VALUES (1),(2),(3)) t(x)") == Seq(Seq(5L)))
    // a column merely NAMED distinct_flag is not a DISTINCT aggregate
    assert(rows(
      "SELECT count(distinct_flag) FILTER (WHERE x > 0) OVER " +
        "(ORDER BY x) AS c FROM (VALUES (1, 7),(2, 8)) t(x, distinct_flag) " +
        "ORDER BY x") == Seq(Seq(1L), Seq(2L)))
  }

  test("guard rails error loudly") {
    intercept[Exception](rows(
      "SELECT min(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "1 FOLLOWING EXCLUDE CURRENT ROW) FROM (VALUES (1)) t(x)"))
    intercept[Exception](rows(
      "SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 2 PRECEDING AND " +
        "1 PRECEDING EXCLUDE CURRENT ROW) FROM (VALUES (1)) t(x)"))
    intercept[Exception](rows(
      "SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "1 FOLLOWING EXCLUDE GROUP) FROM (VALUES (1)) t(x)"))
  }
}
