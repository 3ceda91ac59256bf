package graft

import org.apache.spark.sql.Row

/** Round-11 surface pins: string→STRUCT/LIST text casts
  * (functions/DuckTextCast) and implicit-lateral comma-unnest
  * (SqlRewrites.rewriteCommaUnnest). Every expected value probed on
  * DuckDB v1.0; the same grids replay value-compared via
  * tools/conformance_corpus.tsv (sc_* / cu_* rows).
  */
class Round11Spec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head
  private def rows(sql: String): Seq[Seq[String]] =
    Engine.query(spark, sql).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))

  test("struct text cast: keys any order, bare/quoted, missing→NULL") {
    val r = one("SELECT ('{\"b\": 2, \"a\": 1}'::STRUCT(a INT, b INT)).a x, " +
      "('{''a'': 1}'::STRUCT(a INT, b INT)).b y, " +
      "('{a: 1, t: two words}'::STRUCT(a INT, t VARCHAR)).t z")
    assert(r.getInt(0) == 1 && r.isNullAt(1) && r.getString(2) == "two words")
  }

  test("struct text cast: value quoting strips one layer, NULL after unquote") {
    val r = one("SELECT ('{''a'': ''hey there''}'::STRUCT(a VARCHAR)).a x, " +
      "('{''a'': ''NULL''}'::STRUCT(a VARCHAR)).a y, " +
      "('{''a'': null}'::STRUCT(a VARCHAR)).a z")
    assert(r.getString(0) == "hey there" && r.isNullAt(1) &&
      r.getString(2) == "null") // lowercase null is TEXT (probed)
  }

  test("struct text cast: integral rounds half away from zero; key case-sensitive") {
    val r = one("SELECT ('{''a'': 2.5, ''b'': -1.5}'::STRUCT(a INT, b INT)).a x, " +
      "('{''a'': 2.5, ''b'': -1.5}'::STRUCT(a INT, b INT)).b y")
    assert(r.getInt(0) == 3 && r.getInt(1) == -2)
    val e = intercept[Exception](
      Engine.query(spark, "SELECT '{''A'': 1}'::STRUCT(a INT) s").collect())
    assert(e.getMessage.contains("Conversion Error"))
  }

  test("struct text cast: TRY granularity — leaf null vs whole null") {
    val leaf = one("SELECT TRY_CAST('{''a'': zz, ''b'': 1}' AS " +
      "STRUCT(a INT, b INT)) s")
    val s = leaf.getStruct(0)
    assert(s.isNullAt(0) && s.getInt(1) == 1)
    val whole = one("SELECT TRY_CAST('{''A'': 1}' AS STRUCT(a INT)) s, " +
      "TRY_CAST('garbage' AS STRUCT(a INT)) t")
    assert(whole.isNullAt(0) && whole.isNullAt(1))
  }

  test("list text cast: quoted elements keep quotes; NULL exact-uppercase") {
    val r = one("SELECT ('[''a,b'', c]'::VARCHAR[]) x, " +
      "('[''NULL'', NULL]'::VARCHAR[]) y, ('[ ]'::INT[]) z")
    assert(r.getSeq[String](0) == Seq("'a,b'", "c"))
    assert(r.getSeq[String](1) == Seq("'NULL'", null))
    assert(r.getSeq[Int](2).isEmpty)
    // missing brackets are structural, not a 1-element parse
    val e = intercept[Exception](
      Engine.query(spark, "SELECT '1,2'::INT[] s").collect())
    assert(e.getMessage.contains("can't be cast"))
  }

  test("list/struct text cast: nesting both ways") {
    val r = one("SELECT ('[{''x'': 1}, {''x'': 2}]'::STRUCT(x INT)[]) s, " +
      "('{''a'': {''x'': 5}, ''l'': [1, 2]}'" +
      "::STRUCT(a STRUCT(x INT), l INT[])).l y")
    assert(r.getSeq[Row](0).map(_.getInt(0)) == Seq(1, 2))
    assert(r.getSeq[Int](1) == Seq(1, 2))
  }

  test("comma-unnest: implicit lateral, column named from simple arg") {
    spark.sql("SELECT 1 AS id, array(10, 20) AS arr UNION ALL SELECT 2, array(30)")
      .createOrReplaceTempView("cu_t")
    assert(rows("SELECT id, u FROM cu_t, unnest(arr) AS q(u) ORDER BY id, u")
      == Seq(Seq("1", "10"), Seq("1", "20"), Seq("2", "30")))
    // bare alias: output named after the source column (probed: u.arr)
    assert(rows("SELECT id, u.arr FROM cu_t, unnest(arr) u ORDER BY 1, 2")
      == Seq(Seq("1", "10"), Seq("1", "20"), Seq("2", "30")))
    // CROSS JOIN spelling, correlated computed arg
    assert(rows("SELECT id, v FROM cu_t CROSS JOIN unnest([id, id + 1]) " +
      "AS w(v) ORDER BY 1, 2")
      == Seq(Seq("1", "1"), Seq("1", "2"), Seq("2", "2"), Seq("2", "3")))
  }

  test("comma-unnest chains cross-product; SELECT-position still zips") {
    spark.sql("SELECT 1 AS id, array(10, 20) AS arr").createOrReplaceTempView("cu_z")
    // FROM-position chain: cartesian (probed)
    assert(rows("SELECT a, b FROM cu_z, unnest(arr) p(a), unnest(arr) q(b) " +
      "ORDER BY 1, 2").size == 4)
    // SELECT-position pair: zip, NULL-padded (unchanged by the
    // qualifier gate added for comma-unnest)
    assert(rows("SELECT unnest([1, 2, 3]) AS x, unnest([7]) AS y")
      == Seq(Seq("1", "7"), Seq("2", "NULL"), Seq("3", "NULL")))
  }

  test("DISTINCT ordered aggregate: key may match ANY argument, parsed-expr compare") {
    val base = " FROM (VALUES ('a',3),('b',2),('a',1),('c',2)) t(x,y)"
    // key == DISTINCT argument (classic form)
    assert(one(s"SELECT string_agg(DISTINCT x ORDER BY x) s$base")
      .getString(0) == "a,b,c")
    assert(one(s"SELECT string_agg(DISTINCT x ORDER BY x DESC) s$base")
      .getString(0) == "c,b,a")
    // key matches the SEPARATOR argument (probed: accepted)
    assert(one(s"SELECT string_agg(DISTINCT x, ';' ORDER BY ';') s$base")
      .getString(0).split(';').sorted.toSeq == Seq("a", "b", "c"))
    // whitespace-insensitive parsed-expression compare (probed)
    assert(one(s"SELECT string_agg(DISTINCT x || 'q' ORDER BY x||'q') s$base")
      .getString(0) == "aq,bq,cq")
    // list keeps distinct sorted order
    assert(one(s"SELECT list(DISTINCT y ORDER BY y DESC) l$base")
      .getSeq[Int](0) == Seq(3, 2, 1))
    // order-insensitive aggregate: ORDER BY dropped but rule enforced
    assert(one(s"SELECT sum(DISTINCT y ORDER BY y) v$base").getLong(0) == 6L)
  }

  test("DISTINCT ordered aggregate: key outside the argument list refuses (DuckDB binder parity)") {
    val base = " FROM (VALUES ('a',3),('b',2)) t(x,y)"
    for (q <- Seq(
        s"SELECT string_agg(DISTINCT x ORDER BY y) s$base",
        s"SELECT sum(DISTINCT y ORDER BY x) v$base",
        s"SELECT min(DISTINCT y ORDER BY x) v$base")) {
      val e = intercept[Exception](Engine.query(spark, q).collect())
      assert(e.getMessage.contains("In a DISTINCT aggregate, ORDER BY " +
        "expressions must appear in the argument list"), q)
    }
  }

  test("windowed inline ORDER BY refuses for every function (DuckDB parser parity)") {
    val base = " FROM (VALUES ('a',3),('b',2)) t(x,y)"
    for (q <- Seq(
        s"SELECT string_agg(x ORDER BY y) OVER (PARTITION BY y) s$base",
        s"SELECT list(y ORDER BY y DESC) OVER () s$base",
        s"SELECT sum(y ORDER BY y) OVER (ORDER BY y) s$base",
        s"SELECT string_agg(DISTINCT x ORDER BY x) OVER () s$base",
        s"SELECT first(x ORDER BY y) OVER (PARTITION BY y) s$base")) {
      val e = intercept[Exception](Engine.query(spark, q).collect())
      assert(e.getMessage.contains(
        "ORDER BY is not implemented for window functions!"), q)
    }
    // … while `over` stays a legal table alias (probed)
    assert(one("SELECT over.a FROM (SELECT 1 AS a ORDER BY a) over")
      .getInt(0) == 1)
  }
}
