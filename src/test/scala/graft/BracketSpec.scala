package graft

import org.apache.spark.sql.Row

/** DuckDB bracket syntax (BracketRewrite + SubscriptPoly/SlicePoly).
  * Every value pin below was probed on DuckDB (see Subscripts.scala
  * scaladoc): 1-based subscripts, inclusive slices, '' (not NULL) for
  * out-of-range string chars, list-wrapped map extraction.
  */
class BracketSpec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head

  // --- pure rewrite-shape assertions (no session needed) ---

  test("rewrite: list literal and ARRAY constructor") {
    assert(BracketRewrite.rewrite("SELECT [1, 2, 3]") == "SELECT array(1, 2, 3)")
    assert(BracketRewrite.rewrite("SELECT ARRAY[1, 2]") == "SELECT array(1, 2)")
  }

  test("rewrite: subscript vs literal disambiguation") {
    assert(BracketRewrite.rewrite("SELECT l[1] FROM t") ==
      "SELECT duck_subscript(l, 1) FROM t")
    // after a comma → literal; after an identifier → subscript
    assert(BracketRewrite.rewrite("SELECT f(x, [1,2])[1]") ==
      "SELECT duck_subscript(f(x, array(1,2)), 1)")
  }

  test("rewrite: slices with open bounds") {
    assert(BracketRewrite.rewrite("SELECT l[2:4]") == "SELECT duck_slice(l, 2, 4)")
    assert(BracketRewrite.rewrite("SELECT l[2:]") == "SELECT duck_slice(l, 2, -1)")
    assert(BracketRewrite.rewrite("SELECT l[:4]") == "SELECT duck_slice(l, 1, 4)")
    assert(BracketRewrite.rewrite("SELECT l[:]") == "SELECT duck_slice(l, 1, -1)")
  }

  test("rewrite: strings, quoted idents, comments, types untouched") {
    assert(BracketRewrite.rewrite("SELECT '[1]' AS s") == "SELECT '[1]' AS s")
    assert(BracketRewrite.rewrite("SELECT \"a[b]\" FROM t") ==
      "SELECT \"a[b]\" FROM t")
    assert(BracketRewrite.rewrite("SELECT x -- l[1]\nFROM t") ==
      "SELECT x -- l[1]\nFROM t")
    // array TYPES: empty brackets and ::-cast / AS-cast suffixes
    assert(BracketRewrite.rewrite("SELECT CAST(x AS INT[]) FROM t") ==
      "SELECT CAST(x AS INT[]) FROM t")
    assert(BracketRewrite.rewrite("SELECT x::int[3] FROM t") ==
      "SELECT x::int[3] FROM t")
    assert(BracketRewrite.rewrite("SELECT CAST(x AS INTEGER[3]) FROM t") ==
      "SELECT CAST(x AS INTEGER[3]) FROM t")
  }

  test("rewrite: chained subscripts and dotted/call primaries") {
    assert(BracketRewrite.rewrite("SELECT m['a'][1]") ==
      "SELECT duck_subscript(duck_subscript(m, 'a'), 1)")
    assert(BracketRewrite.rewrite("SELECT a.b[1]") ==
      "SELECT duck_subscript(a.b, 1)")
    assert(BracketRewrite.rewrite("SELECT split(s, ',')[1]") ==
      "SELECT duck_subscript(split(s, ','), 1)")
  }

  // --- end-to-end value pins (all probed on DuckDB) ---

  test("list subscript: 1-based, negative, 0 and OOR → NULL") {
    val r = one("SELECT ([1,2,3])[1] a, ([1,2,3])[-1] b, ([1,2,3])[0] c, " +
      "([1,2,3])[5] d, ([1,2,3])[NULL] e")
    assert(r.getInt(0) == 1 && r.getInt(1) == 3)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("string subscript: 1-based char, '' (not NULL) out of range") {
    val r = one("SELECT 'hello'[2] a, 'hello'[-1] b, 'hello'[0] c, 'hello'[99] d")
    assert(r.getString(0) == "e" && r.getString(1) == "o")
    assert(r.getString(2) == "" && r.getString(3) == "")
  }

  test("list slice: inclusive bounds, open bounds, NULL bound") {
    val r = one("SELECT [10,20,30,40][2:3] a, [10,20,30,40][2:] b, " +
      "[10,20,30,40][:2] c, [10,20,30,40][:] d, [10,20,30,40][2:NULL] e")
    assert(r.getSeq[Int](0) == Seq(20, 30))
    assert(r.getSeq[Int](1) == Seq(20, 30, 40))
    assert(r.getSeq[Int](2) == Seq(10, 20))
    assert(r.getSeq[Int](3) == Seq(10, 20, 30, 40))
    assert(r.isNullAt(4))
  }

  test("string slice: inclusive, negative-from-end") {
    val r = one("SELECT 'hello'[2:4] a, 'hello'[-3:] b, 'hello'[2:NULL] c")
    assert(r.getString(0) == "ell" && r.getString(1) == "llo")
    assert(r.isNullAt(2))
  }

  test("map subscript: LIST-wrapped value, [] when absent") {
    val r = one("SELECT map(array('a'), array(5))['a'] a, " +
      "map(array('a'), array(5))['z'] b")
    assert(r.getSeq[Int](0) == Seq(5))
    assert(r.getSeq[Int](1) == Seq.empty)
  }

  test("struct subscript by field name") {
    val r = one("SELECT named_struct('x', 1, 'y', 2)['y'] a")
    assert(r.getInt(0) == 2)
  }

  test("list_slice / array_slice aliases share slice semantics") {
    val r = one("SELECT list_slice([10,20,30], 2, 3) a, " +
      "array_slice('hello', 2, 4) b")
    assert(r.getSeq[Int](0) == Seq(20, 30))
    assert(r.getString(1) == "ell")
  }

  test("TIMESTAMPTZ / TIMETZ typed literals collapse to UTC spellings") {
    val r = one("SELECT TIMESTAMPTZ '2024-01-02 03:04:05' a")
    assert(r.getTimestamp(0).toString == "2024-01-02 03:04:05.0")
    // TIMETZ: DuckDB's default rendering carries an explicit offset;
    // both the plain and the offset-suffixed forms must parse, with
    // the offset folded into the UTC wall time (probed: DuckDB stores
    // TIMETZ '04:05:06+02' as UTC instant 02:05:06)
    val t = one("SELECT TIMETZ '03:04:05' a, TIMETZ '04:05:06+02' b, " +
      "TIMETZ '01:00:00-02:30' c")
    assert(t.get(0).toString == "03:04:05")
    assert(t.get(1).toString == "02:05:06")
    assert(t.get(2).toString == "03:30")
  }

  test("typed-literal / count() rewrites skip string literals") {
    val r = one("SELECT 'ts is timestamptz ' AS a, 'x timetz ''1'' y' AS b, " +
      "'count()' AS c")
    assert(r.getString(0) == "ts is timestamptz ")
    assert(r.getString(1) == "x timetz '1' y")
    assert(r.getString(2) == "count()")
  }

  test("zero-arg count() ≡ count(*)") {
    val n = one("SELECT count() n FROM range(5)").getLong(0)
    assert(n == 5L)
  }

  test("subscript over a real table column (events.tags-style)") {
    // split produces an array column; [i] must be 1-based on it
    val r = Engine.query(spark,
      "SELECT split('a,b,c', ',')[1] x, split('a,b,c', ',')[3] y, " +
        "split('a,b,c', ',')[4] z")
      .collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "c" && r.isNullAt(2))
  }

  test("rewrite: list comprehensions (DuckDB-probed shapes)") {
    assert(BracketRewrite.rewrite("SELECT [x + 1 FOR x IN [1,2,3]] AS r") ==
      "SELECT list_transform(array(1,2,3), x -> x + 1) AS r")
    assert(BracketRewrite.rewrite(
      "SELECT [x + 1 FOR x IN [1,2,3] IF x > 1] AS r") ==
      "SELECT list_transform(list_filter(array(1,2,3), x -> x > 1), " +
        "x -> x + 1) AS r")
    // a literal containing the WORD 'for' as a string stays a literal
    assert(BracketRewrite.rewrite("SELECT ['for', 'in']") ==
      "SELECT array('for', 'in')")
    // no FOR..IN shape → plain literal (for is a string here, not a token)
    assert(BracketRewrite.rewrite("SELECT [a, b] FROM t") ==
      "SELECT array(a, b) FROM t")
  }

  test("list comprehensions evaluate: map, filter, nesting, subscript") {
    val r = one("SELECT [x + 1 FOR x IN [1,2,3]] AS a, " +
      "[upper(s) FOR s IN ['a','b','c'] IF s <> 'b'] AS b, " +
      "[y * 2 FOR y IN [x FOR x IN [1,2,3,4] IF x < 3]] AS c, " +
      "[x FOR x IN [10,20,30]][2] AS d")
    assert(r.getSeq[Int](0) == Seq(2, 3, 4), r.toString)
    assert(r.getSeq[String](1) == Seq("A", "C"))
    assert(r.getSeq[Int](2) == Seq(2, 4))
    assert(r.getInt(3) == 20)
  }

  test("list comprehension over a real column") {
    val r = one("SELECT [upper(w) FOR w IN string_split('a b c', ' ') " +
      "IF w <> 'b'] AS r")
    assert(r.getSeq[String](0) == Seq("A", "C"))
  }
}
