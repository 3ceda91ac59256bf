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

  test("create_sort_key: DuckDB byte-encoding parity (probed grid)") {
    def bytes(sql: String): Seq[Int] =
      one(sql).getAs[Array[Byte]](0).map(_ & 0xff).toSeq
    def long(sql: String): Long = one(sql).getLong(0)
    // VARCHAR: marker, byte+1 payload, 0x00 terminator; DESC inverts
    // payload+terminator, NULLS FIRST swaps the marker
    assert(bytes("SELECT create_sort_key('ab', 'ASC NULLS LAST') v")
      == Seq(0x01, 0x62, 0x63, 0x00))
    assert(bytes("SELECT create_sort_key('ab', 'DESC NULLS LAST') v")
      == Seq(0x01, 0x9d, 0x9c, 0xff))
    assert(bytes("SELECT create_sort_key('ab', 'ASC NULLS FIRST') v")
      == Seq(0x02, 0x62, 0x63, 0x00))
    // NULL: marker only
    assert(bytes("SELECT create_sort_key(NULL::VARCHAR, 'ASC NULLS LAST') v")
      == Seq(0x02))
    // fixed-width BIGINT packing (INT = sign-flipped big-endian)
    assert(long("SELECT create_sort_key(123, 'ASC NULLS LAST') v")
      == 108086393120489472L)
    assert(long("SELECT create_sort_key(123, 'DESC NULLS LAST') v")
      == 108086388976517120L)
    assert(long("SELECT create_sort_key(true, 'ASC NULLS LAST', " +
      "false, 'ASC NULLS LAST') v") == 72340168526266368L)
    // BIGINT value = 9 bytes -> BLOB
    assert(bytes("SELECT create_sort_key(123::BIGINT, 'ASC NULLS LAST') v")
      == Seq(0x01, 0x80, 0, 0, 0, 0, 0, 0, 0x7b))
    // doubles: sign-flip positives, invert negatives, sentinels
    assert(bytes("SELECT create_sort_key(1.5::DOUBLE, 'ASC NULLS LAST') v")
      == Seq(0x01, 0xbf, 0xf8, 0, 0, 0, 0, 0, 0))
    assert(bytes("SELECT create_sort_key('nan'::DOUBLE, 'ASC NULLS LAST') v")
      == Seq(0x01) ++ Seq.fill(8)(0xff))
    // nested list with null element (nulls-are-largest markers)
    assert(bytes("SELECT create_sort_key([NULL::INT, 3], 'ASC NULLS LAST') v")
      == Seq(0x01, 0x02, 0x01, 0x80, 0, 0, 0x03, 0x00))
    // error parity
    val em = intercept[Exception](Engine.query(spark,
      "SELECT create_sort_key('a', 'NULLS LAST') v").collect())
    assert(em.getMessage.contains("must start with either ASC or DESC"))
    val ea = intercept[Exception](Engine.query(spark,
      "SELECT create_sort_key('a') v").collect())
    assert(ea.getMessage.contains("[key1, sort_specifier1"))
  }

  test("json_transform: per-leaf coercion; alias(): enclosing projection alias") {
    // quoted scalars coerce; a failing leaf nulls ONLY that leaf
    val r = one("""SELECT json_transform('{"a":"x","b":"7"}',""" +
      """'{"a":"BIGINT","b":"BIGINT"}') v""")
    val s = r.getStruct(0)
    assert(s.isNullAt(0) && s.getLong(1) == 7L)
    // VARCHAR leaf over an object keeps the raw JSON text
    assert(one("""SELECT json_transform('{"a":{"b":1}}',""" +
      """'{"a":"VARCHAR"}') v""").getStruct(0).getString(0) == """{"b":1}""")
    // strict errors on a failing leaf
    intercept[Exception](Engine.query(spark,
      """SELECT json_transform_strict('{"a":"x"}','{"a":"BIGINT"}') v"""
    ).collect())
    // alias(): enclosing alias wins (AS and bare forms); bare call
    // keeps the expression-name fallback
    assert(one("SELECT alias(7) AS v").getString(0) == "v")
    assert(one("SELECT alias(7) c").getString(0) == "c")
    assert(one("SELECT alias(7) FROM (SELECT 1)").getString(0) == "7")
  }

  test("CTAS and WITH-led INSERT answer DuckDB's Count column") {
    Engine.query(spark, "DROP TABLE IF EXISTS r11_ct")
    val ct = one("CREATE TABLE r11_ct AS SELECT 1 AS a UNION ALL SELECT 2")
    assert(ct.getLong(0) == 2L)
    val wi = one("WITH src AS (SELECT 3 AS a) INSERT INTO r11_ct " +
      "SELECT * FROM src")
    assert(wi.getLong(0) == 1L)
    assert(Engine.query(spark, "SELECT count(*) c FROM r11_ct")
      .collect().head.getLong(0) == 3L)
    Engine.query(spark, "DROP TABLE r11_ct")
  }
}
