package graft

import org.apache.spark.sql.Row

/** Round-10 statement/scoping wave, every pin probed on DuckDB v1.0
  * (2026-08-15 probe batches, all value-MATCH via
  * tools/check_conformance — durable rows wa_N, up_N, pv_N, cm_N in
  * tools/semantics_corpus.tsv): SELECT-list aliases in WHERE, the
  * SHOW statement family, COMMENT ON, UNPIVOT's MaxLogicalType
  * corners, FROM-position PIVOT/UNPIVOT subqueries, and
  * CREATE OR REPLACE TABLE with no space before the column list.
  */
class ShowCommentSpec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head
  private def rows(sql: String): Seq[Row] =
    Engine.query(spark, sql).collect().toSeq

  test("WHERE clause binds SELECT-list aliases like DuckDB (probed)") {
    // plain alias
    assert(one("SELECT a+1 AS b FROM (VALUES (1),(5)) t(a) WHERE b > 3")
      .getInt(0) == 6)
    // a REAL column wins the name collision
    assert(rows("SELECT a AS b FROM (VALUES (1,5),(2,-1)) t(a,b) " +
      "WHERE b > 0").map(_.getInt(0)) == Seq(1))
    // alias shadowing its own source column: table column wins
    assert(rows("SELECT a+1 AS a FROM (VALUES (1),(2),(3)) t(a) " +
      "WHERE a > 2").map(_.getInt(0)) == Seq(4))
    // lateral chains substitute transitively
    assert(rows("SELECT a+1 AS c, c+1 AS d FROM (VALUES (1),(2),(3)) t(a) " +
      "WHERE d > 3 ORDER BY a").map(_.getInt(1)) == Seq(4, 5))
    // the LAST duplicate alias wins (probed)
    assert(one("SELECT count(*) AS c FROM (SELECT a-100 AS x, a+2 AS x " +
      "FROM (VALUES (1),(2),(3)) t(a) WHERE x > 2) s").getLong(0) == 3L)
    // GROUP BY shape
    assert(one("SELECT a%2 AS p, count(*) AS c FROM " +
      "(VALUES (1,5),(2,-1),(3,2)) t(a,b) WHERE p=1 GROUP BY p")
      .getLong(1) == 2L)
    // inside larger expressions
    assert(rows("SELECT a+1 AS x FROM (VALUES (1),(2),(3)) t(a) " +
      "WHERE abs(x) > 2 AND x < 100 ORDER BY a").map(_.getInt(0)) ==
      Seq(3, 4))
    // qualified references never bind to aliases (DuckDB binder error)
    intercept[Exception](Engine.query(spark,
      "SELECT a+1 AS x FROM (VALUES (1)) t(a) WHERE t.x > 2").collect())
    // aggregates smuggled through an alias stay loud
    intercept[Exception](Engine.query(spark,
      "SELECT sum(a) AS s FROM (VALUES (1)) t(a) WHERE s > 0").collect())
  }

  test("SHOW TABLES / ALL TABLES / DATABASES / <target> (probed shapes)") {
    Engine.query(spark, "CREATE OR REPLACE TABLE show_t1(x INT, y VARCHAR)")
    try {
      val st = Engine.query(spark, "SHOW TABLES")
      assert(st.columns.toSeq == Seq("name"))
      val names = st.collect().map(_.getString(0)).toSeq
      assert(names.contains("show_t1"))
      assert(names == names.sorted)

      val at = Engine.query(spark, "SHOW ALL TABLES")
      assert(at.columns.toSeq == Seq("database", "schema", "name",
        "column_names", "column_types", "temporary"))
      val r = at.collect().find(_.getString(2) == "show_t1").get
      assert(r.getSeq[String](3) == Seq("x", "y"))
      assert(r.getSeq[String](4) == Seq("INTEGER", "VARCHAR"))

      assert(Engine.query(spark, "SHOW DATABASES").columns.toSeq ==
        Seq("database_name"))

      // SHOW <table> describes like DESCRIBE (six-column shape)
      val d = Engine.query(spark, "SHOW show_t1")
      assert(d.columns.toSeq == Seq("column_name", "column_type", "null",
        "key", "default", "extra"))
      assert(d.collect().map(_.getString(0)).toSeq == Seq("x", "y"))
    } finally Engine.query(spark, "DROP TABLE IF EXISTS show_t1")
  }

  test("COMMENT ON table/column/view; IS NULL clears; DATABASE is loud") {
    Engine.query(spark, "CREATE OR REPLACE TABLE cmt_t(a INT)")
    try {
      Engine.query(spark, "COMMENT ON TABLE cmt_t IS 'hello'")
      Engine.query(spark, "COMMENT ON COLUMN cmt_t.a IS 'acol'")
      assert(one("SELECT comment FROM duckdb_tables() " +
        "WHERE table_name='cmt_t'").getString(0) == "hello")
      assert(one("SELECT comment FROM duckdb_columns() " +
        "WHERE table_name='cmt_t' AND column_name='a'")
        .getString(0) == "acol")
      // escaped quote round-trips
      Engine.query(spark, "COMMENT ON TABLE cmt_t IS 'it''s'")
      assert(one("SELECT comment FROM duckdb_tables() " +
        "WHERE table_name='cmt_t'").getString(0) == "it's")
      Engine.query(spark, "COMMENT ON TABLE cmt_t IS NULL")
      assert(one("SELECT comment FROM duckdb_tables() " +
        "WHERE table_name='cmt_t'").isNullAt(0))
      // DuckDB itself: "not implemented" for databases — reproduced
      intercept[Exception](
        Engine.query(spark, "COMMENT ON DATABASE memory IS 'db'"))
    } finally Engine.query(spark, "DROP TABLE IF EXISTS cmt_t")
  }

  test("UNPIVOT coerces to DuckDB's MaxLogicalType (probed corners)") {
    Engine.query(spark, "CREATE OR REPLACE TABLE unp_t(id INT, a INT, b BIGINT)")
    Engine.query(spark, "CREATE OR REPLACE TABLE unp_f(id INT, a FLOAT, b INT)")
    Engine.query(spark, "CREATE OR REPLACE TABLE unp_b(id INT, a BOOLEAN, b INT)")
    try {
      Engine.query(spark, "INSERT INTO unp_t VALUES (1, 10, 20)")
      Engine.query(spark, "INSERT INTO unp_f VALUES (1, 1.5, 2)")
      Engine.query(spark, "INSERT INTO unp_b VALUES (1, true, 7)")
      // INT+BIGINT → BIGINT (the old lowering forced DOUBLE)
      assert(one("SELECT typeof(val) FROM (UNPIVOT unp_t ON a, b " +
        "INTO NAME k VALUE val) LIMIT 1").getString(0) == "BIGINT")
      // FLOAT+INT → FLOAT (Spark's own coercion would widen to DOUBLE)
      assert(one("SELECT typeof(val) FROM (UNPIVOT unp_f ON a, b " +
        "INTO NAME k VALUE val) LIMIT 1").getString(0) == "FLOAT")
      // BOOLEAN+INT → INTEGER (probed: the bool casts across)
      val bv = rows("SELECT val FROM (UNPIVOT unp_b ON a, b " +
        "INTO NAME k VALUE val) ORDER BY val").map(_.getInt(0))
      assert(bv == Seq(1, 7))
    } finally Seq("unp_t", "unp_f", "unp_b").foreach(t =>
      Engine.query(spark, s"DROP TABLE IF EXISTS $t"))
  }

  test("PIVOT/UNPIVOT compose as FROM-position subqueries (probed)") {
    Engine.query(spark, "CREATE OR REPLACE TABLE piv_s(g VARCHAR, k VARCHAR, v INT)")
    try {
      Engine.query(spark,
        "INSERT INTO piv_s VALUES ('x','a',1),('x','b',2),('y','a',3)")
      assert(rows("SELECT g, a FROM (PIVOT piv_s ON k USING sum(v)) " +
        "ORDER BY g").map(r => (r.getString(0), r.getLong(1))) ==
        Seq(("x", 1L), ("y", 3L)))
      // aliased, joined, and a '(PIVOT' inside a string stays a string
      assert(rows("SELECT u.kk FROM (UNPIVOT piv_s ON v INTO NAME kk " +
        "VALUE w) u ORDER BY u.kk").nonEmpty)
      assert(one("SELECT '(PIVOT in a string)' AS s").getString(0) ==
        "(PIVOT in a string)")
    } finally Engine.query(spark, "DROP TABLE IF EXISTS piv_s")
  }

  test("CREATE OR REPLACE TABLE with no space before the column list") {
    Engine.query(spark, "CREATE OR REPLACE TABLE cor_t(a INT)")
    try {
      Engine.query(spark, "INSERT INTO cor_t VALUES (1)")
      Engine.query(spark, "CREATE OR REPLACE TABLE cor_t(b VARCHAR)")
      assert(Engine.query(spark, "SELECT * FROM cor_t").columns.toSeq ==
        Seq("b"))
    } finally Engine.query(spark, "DROP TABLE IF EXISTS cor_t")
  }
}
