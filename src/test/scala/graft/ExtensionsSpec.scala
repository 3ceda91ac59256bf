package graft

import org.apache.spark.sql.SparkSession

/** SparkSessionExtensions integration: a session built with
  * GraftExtensions gets native functions, the generate_series TVF,
  * and the dialect parser with no graft.* calls at query time.
  */
class ExtensionsSpec extends SparkSpecBase {

  private lazy val ext: SparkSession = {
    val root = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(root)
    SparkSession.setActiveSession(root)
    s
  }

  test("injected native functions resolve in plain spark.sql") {
    val cos = ext.sql(
      "SELECT round(array_cosine_similarity(array(1.0f,0.0f), array(1.0f,0.0f)), 9) AS c")
      .collect().head.getDouble(0)
    assert(cos == 1.0)
    val sig = ext.sql(
      "SELECT size(minhash_signature(array(1L, 2L, 3L), 16)) AS n")
      .collect().head.getInt(0)
    assert(sig == 16)
  }

  test("generate_series is a real table function (inclusive, stepped)") {
    val rows = ext.sql("SELECT * FROM generate_series(0, 10)")
    assert(rows.columns.toSeq == Seq("generate_series"))
    assert(rows.count() == 11)
    val stepped = ext.sql(
      "SELECT generate_series AS g FROM generate_series(1, 9, 2)")
      .collect().map(_.getInt(0)).toSeq
    assert(stepped == Seq(1, 3, 5, 7, 9))
  }

  test("injected parser applies the dialect pre-pass to plain sql") {
    val r = ext.sql("SELECT 2::int8 AS a, 1.5::float8 AS b").collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 1.5)
    val q = ext.sql(
      """SELECT * FROM (VALUES (1, 10), (1, 20), (2, 5)) t(k, v)
        |QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) = 1
        |ORDER BY k""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(q == Seq((1, 20), (2, 5)))
  }
}
