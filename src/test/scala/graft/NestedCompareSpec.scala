package graft

import org.apache.spark.sql.Row

/** DuckDB's sequential three-valued LIST/MAP/STRUCT comparison walk
  * and its NULLs-largest nested sort order, replaying the probe grid
  * run against DuckDB v1.0 this round (every expected value below is
  * the probed answer; the reference delegates comparison semantics
  * verbatim, src/duckdb_pgwire_extension.cpp:52). Spark's native
  * semantics treat NULL elements as ordinary smallest values — every
  * row here is a case where the engines would otherwise differ, plus
  * the clean-type cases that must STAY on Spark's native path.
  */
class NestedCompareSpec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head

  test("list equality: first NULL element halts with UNKNOWN (probed)") {
    val r = one(
      "SELECT [NULL] = [NULL, 2] a, [NULL, 1] = [NULL, 2] b, " +
        "[1, NULL] = [2, NULL] c, [[1, NULL]] = [[1, 2]] d, " +
        "[1, 2] = [1, 2] e, [1] = [1, NULL] f")
    assert(r.isNullAt(0), "length mismatch cannot rescue a NULL walk")
    assert(r.isNullAt(1), "later difference cannot rescue a NULL walk")
    assert(r.getBoolean(2) == false, "first definite inequality decides")
    assert(r.isNullAt(3), "the walk recurses into nested lists")
    assert(r.getBoolean(4) == true)
    assert(r.getBoolean(5) == false,
      "clean prefix + length mismatch is FALSE — the unwalked NULL never matters")
  }

  test("list ordering: inequality decides before a later NULL (probed)") {
    val r = one(
      "SELECT [2] < [1, NULL] a, [1] < [1, NULL] b, [NULL] < [1] c, " +
        "[NULL] > [1] d, [1, 2] <= [1, 2] e, [3, 1] >= [2, NULL] f")
    assert(r.getBoolean(0) == false, "2 vs 1 decides at position one")
    assert(r.getBoolean(1) == true, "exhaustion falls back to length")
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.getBoolean(4) == true)
    assert(r.getBoolean(5) == true, "3 vs 2 decides before the NULL")
  }

  test("struct equality is the same sequential walk (probed)") {
    val r = one(
      "SELECT {'a': NULL, 'b': 1} = {'a': NULL, 'b': 2} a, " +
        "{'a': 1, 'b': NULL} = {'a': 2, 'b': NULL} b, " +
        "{'a': 1} = {'a': 1} c")
    assert(r.isNullAt(0), "NULL field halts before the differing field")
    assert(r.getBoolean(1) == false)
    assert(r.getBoolean(2) == true)
  }

  test("maps compare as insertion-ordered entry lists (probed)") {
    val r = one(
      "SELECT MAP([1,2],[10,20]) = MAP([2,1],[20,10]) a, " +
        "MAP([1],[NULL]) = MAP([1],[NULL]) b, " +
        "MAP([1,2],[10,20]) = MAP([1,2],[10,20]) c")
    assert(r.getBoolean(0) == false, "entry order is significant")
    assert(r.isNullAt(1), "NULL values halt the walk")
    assert(r.getBoolean(2) == true)
  }

  test("IN over nested values is the 3VL OR of the walks (probed)") {
    val r = one(
      "SELECT [1, NULL] IN ([1, NULL], [2]) a, " +
        "[1] IN ([1], [2, NULL]) b, [2, 5] IN ([1], [2, NULL]) c")
    assert(r.isNullAt(0))
    assert(r.getBoolean(1) == true, "a definite hit wins over UNKNOWN")
    assert(r.isNullAt(2), "no hit + an UNKNOWN leg stays UNKNOWN")
  }

  test("ORDER BY: inner NULLs sort largest both directions; top-level NULL stays last (probed)") {
    val asc = Engine.query(spark,
      "SELECT v FROM (VALUES ([1]),([1,9]),([1,NULL]),([2,1]),([NULL]),(CAST(NULL AS INTEGER[]))) t(v) ORDER BY v")
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Any](0).toList)
    assert(asc.toList == List(List(1), List(1, 9), List(1, null),
      List(2, 1), List(null), null), asc.mkString(" | "))
    val desc = Engine.query(spark,
      "SELECT v FROM (VALUES ([1]),([1,9]),([1,NULL]),([2,1]),([NULL]),(CAST(NULL AS INTEGER[]))) t(v) ORDER BY v DESC")
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Any](0).toList)
    assert(desc.toList == List(List(null), List(2, 1), List(1, null),
      List(1, 9), List(1), null), desc.mkString(" | "))
  }

  test("ORDER BY struct: NULL field sorts after values (probed)") {
    val rows = Engine.query(spark,
      "SELECT v.a, v.b FROM (VALUES ({'a':1,'b':2}),({'a':1,'b':NULL})," +
        "({'a':NULL,'b':0})) t(v) ORDER BY v")
      .collect().map(r => (
        if (r.isNullAt(0)) null else r.getInt(0),
        if (r.isNullAt(1)) null else r.getInt(1)))
    assert(rows.toList == List((1, 2), (1, null), (null, 0)),
      rows.mkString(" | "))
  }

  test("struct-keyed joins keep the plain AND expansion: still an equi-join") {
    val l = Engine.query(spark,
      "SELECT named_struct('a', k, 'b', CAST(NULL AS INT)) s, x " +
        "FROM (VALUES (1, 10), (2, 20)) t(k, x)")
    val r = Engine.query(spark,
      "SELECT named_struct('a', k, 'b', CAST(NULL AS INT)) s, y " +
        "FROM (VALUES (1, 100), (3, 300)) t(k, y)")
    val j = l.join(r, l("s") === r("s"))
    val exec = j.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") &&
      !exec.contains("BroadcastNestedLoop"),
      "nullable-struct key must stay an extractable equi-join:\n" +
        exec.take(3000))
    // and under join 3VL, UNKNOWN rejects like FALSE: NULL fields both
    // sides -> no match rows (DuckDB probed: ON s1 = s2 drops them)
    assert(j.count() == 0)
  }

  test("clean non-nullable array comparisons stay on Spark's native path") {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val df = Engine.query(spark,
      "SELECT sequence(1, 3) = sequence(1, 3) AS v")
    val hasCustom = df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[DuckNestedCompare]))
    assert(!hasCustom,
      "non-nullable arrays must not pay the interpreted walk")
    assert(df.collect().head.getBoolean(0))
  }
}
