package graft

import org.apache.spark.sql.Row

/** Round-12 surface pins: CTAS Count semantics (skipped IF NOT EXISTS
  * answers ZERO rows under the Count header; quoted table names),
  * alias() bare-expression render (DuckDB returns the expression's
  * own SQL text), bit_length/octet_length over the BIT-string model,
  * and json_transform key coercion. Every expected value probed on
  * DuckDB v1.0.
  */
class Round12Spec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head

  test("CTAS IF NOT EXISTS on an existing table: zero rows, Count header, table intact") {
    Engine.query(spark, "CREATE OR REPLACE TABLE r12_t1 AS SELECT 42 AS x, 43 AS y")
    val skipped = Engine.query(spark,
      "CREATE TABLE IF NOT EXISTS r12_t1 AS SELECT 5 AS z")
    assert(skipped.columns.toSeq == Seq("Count")) // probed: header stays
    assert(skipped.count() == 0L)                 // probed: zero rows
    val r = one("SELECT * FROM r12_t1")
    assert(r.getInt(0) == 42 && r.getInt(1) == 43)
    Engine.query(spark, "DROP TABLE r12_t1")
  }

  test("CTAS IF NOT EXISTS on a NEW table still answers Count") {
    Engine.query(spark, "DROP TABLE IF EXISTS r12_t2")
    val made = Engine.query(spark,
      "CREATE TABLE IF NOT EXISTS r12_t2 AS SELECT 1 AS v UNION ALL SELECT 2")
    assert(made.columns.toSeq == Seq("Count"))
    assert(made.collect().head.getLong(0) == 2L)
    Engine.query(spark, "DROP TABLE r12_t2")
  }

  test("CTAS with a quoted (reserved-word) table name answers Count") {
    // Spark's catalog only allows [A-Za-z0-9_] in table names, so the
    // quoted-name case that matters is a reserved word, not spaces
    Engine.query(spark, "DROP TABLE IF EXISTS `order`")
    val made = Engine.query(spark,
      "CREATE TABLE \"order\" AS SELECT 1 AS v UNION ALL SELECT 2")
    assert(made.columns.toSeq == Seq("Count"))
    assert(made.collect().head.getLong(0) == 2L)
    Engine.query(spark, "DROP TABLE `order`")
  }

  test("alias() bare complex expression renders the expression text") {
    // probed: SELECT alias(len('ab')) = "len('ab')", named alias(...)
    val df = Engine.query(spark, "SELECT alias(len('ab'))")
    assert(df.columns.toSeq == Seq("alias(len('ab'))"))
    assert(df.collect().head.getString(0) == "len('ab')")
    val df2 = Engine.query(spark, "SELECT alias(7)")
    assert(df2.columns.toSeq == Seq("alias(7)"))
    assert(df2.collect().head.getString(0) == "7")
  }

  test("alias() in value position yields the text; aliased forms unchanged") {
    // probed: upper(alias(7)) = '7' (alias returns the rendered text)
    assert(one("SELECT upper(alias(abc)) v").getString(0) == "ABC")
    assert(one("SELECT alias(7) AS v").getString(0) == "v")
    val bare = Engine.query(spark, "SELECT alias(7) c")
    assert(bare.columns.toSeq == Seq("c") &&
      bare.collect().head.getString(0) == "c")
    // select-item with trailing clause keyword still renders the text
    val kw = Engine.query(spark,
      "SELECT alias(x) FROM (SELECT 1 AS x) t")
    assert(kw.collect().head.getString(0) == "x")
  }

  test("bit_length/octet_length over BIT args follow the bit model") {
    // probed: bit_length('0101'::BIT)=4, octet_length=1; 9 bits → 2
    val r = one("SELECT bit_length('0101'::BIT) a, " +
      "octet_length('0101'::BIT) b, octet_length('010101010'::BIT) c, " +
      "bit_length(CAST('01' AS BIT)) d, " +
      "octet_length(bitstring('0101', 9)) e")
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 2L &&
      r.getLong(3) == 2L && r.getLong(4) == 2L)
  }

  test("bit_length/octet_length over VARCHAR/BLOB keep byte semantics") {
    // probed: bit_length('abc') = 24 (bytes×8); octet_length(BLOB) = bytes
    val r = one("SELECT bit_length('abc') a, " +
      "octet_length('abc'::BLOB) b")
    assert(r.getAs[Number]("a").longValue == 24L &&
      r.getAs[Number]("b").longValue == 3L)
  }

  test("json_transform with a typed-key MAP structure coerces keys") {
    val df = Engine.query(spark,
      "SELECT json_transform('{\"1\": \"10\", \"2\": \"20\"}', 'MAP<INT,INT>') m")
    val m = df.collect().head.getMap[Int, Int](0)
    assert(m == Map(1 -> 10, 2 -> 20))
  }
}
