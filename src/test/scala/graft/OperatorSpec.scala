package graft

import org.apache.spark.sql.Row

/** DuckDB operator spellings (BracketRewrite.rewriteOperators). Every
  * value below was probed on DuckDB v1.0 (see the rewriteOperators
  * scaladoc): the ~/~~/~~~ match family binds to the nearest primary,
  * an adjacent != is not-equal but a spaced `1 ! = 1` is factorial,
  * `@` refuses signed operands, and `-5!` is factorial(-5) = 1.
  */
class OperatorSpec extends SparkSpecBase {

  private def one(sql: String): Row =
    Engine.query(spark, sql).collect().head

  private def b(sql: String): Any = one(s"SELECT $sql AS v").get(0)

  test("~~ / !~~ / ~~* / !~~* LIKE family") {
    assert(b("'abcd' ~~ 'ab%'") == true)
    assert(b("'abcd' !~~ 'ab%'") == false)
    assert(b("'ABcd' ~~* 'ab%'") == true)
    assert(b("'ABcd' !~~* 'ab%'") == false)
    assert(b("'x' ~~ NULL") == null)
    // tight binding (probed): ('ab' ~~ 'a') || '%'
    assert(b("'ab' ~~ 'a' || '%'") == "false%")
  }

  test("~ / !~ regex FULL match; unary ~ stays bitwise NOT") {
    assert(b("'abcd' ~ 'bc'") == false) // full match, not partial
    assert(b("'abcd' ~ 'ab.*'") == true)
    assert(b("'abcd' !~ 'bc'") == true)
    assert(b("~5") == -6)
    assert(b("'ab' ~ 'a' || 'b'") == "falseb") // tight binding
  }

  test("~~~ GLOB: wildcard, set, range, escapes, malformed brackets") {
    val t = Seq(
      "'a.b' ~~~ 'a?b'" -> true, "'aXb' ~~~ 'a?b'" -> true,
      "'ab' ~~~ 'a[bc]'" -> true, "'ad' ~~~ 'a[bc]'" -> false,
      "'AB' ~~~ 'ab'" -> false, "'a/b' ~~~ 'a*b'" -> true,
      "'abc' ~~~ 'a**'" -> true, "'ab%c' ~~~ 'ab[%]c'" -> true,
      "'a' ~~~ '[a'" -> false, "'[a' ~~~ '[a'" -> false,
      "'!b' ~~~ '[!a]b'" -> true, "'ab' ~~~ '[!a]b'" -> false,
      "'a]b' ~~~ 'a[]]b'" -> true,
      "'-' ~~~ '[-a]'" -> true, "'a' ~~~ '[-a]'" -> true,
      // '[a-]' forms the range a..']' and never closes -> matches nothing
      "'a' ~~~ '[a-]'" -> false, "'-' ~~~ '[a-]'" -> false,
      "'^' ~~~ '[^]'" -> true, "'a' ~~~ '[^a]'" -> true, // ^ not negation
      "'[' ~~~ '[[]'" -> true, "'a' ~~~ '[b-a]'" -> false,
      "'b' ~~~ '[a-c-e]'" -> true, "'-' ~~~ '[a-c-e]'" -> true,
      "'e' ~~~ '[a-c-e]'" -> true, "'d' ~~~ '[a-c-e]'" -> false,
      "'' ~~~ ''" -> true, "'' ~~~ '*'" -> true, "'a' ~~~ ''" -> false,
      "'ab' ~~~ 'a\\b'" -> true, // backslash escapes
      // dangling escape matches nothing (spelled via chr(92): Spark's
      // lexer still eats \' as an escaped quote — the one string-
      // literal edge escapedStringLiterals doesn't align)
      "'a' ~~~ ('a' || chr(92))" -> false,
      "'abc' ~~~ NULL" -> null)
    for ((sql, want) <- t) assert(b(sql) == want, sql)
  }

  test("^@ starts-with") {
    assert(b("'abcd' ^@ 'ab'") == true)
    assert(b("'abcd' ^@ 'bc'") == false)
  }

  test("@ prefix abs") {
    assert(b("@ 7 + 1") == 8)
    assert(b("@(3-5)") == 2)
    assert(b("@NULL") == null)
  }

  test("postfix ! factorial (HUGEINT-exact through 33!)") {
    def d(s: String) = new java.math.BigDecimal(s)
    assert(one("SELECT 5! AS v").getDecimal(0).compareTo(d("120")) == 0)
    assert(one("SELECT 0! AS v").getDecimal(0).compareTo(d("1")) == 0)
    assert(one("SELECT (-1)! AS v").getDecimal(0).compareTo(d("1")) == 0)
    assert(one("SELECT -5! AS v").getDecimal(0).compareTo(d("1")) == 0)
    assert(one("SELECT (2+3)! AS v").getDecimal(0).compareTo(d("120")) == 0)
    assert(one("SELECT 21! AS v").getDecimal(0)
      .compareTo(d("51090942171709440000")) == 0)
    assert(one("SELECT 33! AS v").getDecimal(0)
      .compareTo(d("8683317618811886495518194401280000000")) == 0)
    assert(b("NULL!") == null)
    // an ADJACENT != is not-equal; a spaced `! =` is factorial-then-=
    assert(b("5!=5") == false)
    assert(b("1 != 1") == false)
    assert(b("1 ! = 1") == true)
  }

  test("list ops <@ @> && <-> <=> with DuckDB's NULL-element rules") {
    assert(b("[1,2] <@ [1,2,3]") == true)
    assert(b("[1,1] <@ [1,2,3]") == true)
    assert(b("[] <@ [1,2]") == true)
    assert(b("[1,2] <@ []") == false)
    assert(b("[NULL] <@ [1,2]") == true) // NULL elements ignored
    assert(b("[1,NULL] <@ [1,2]") == true)
    assert(b("NULL <@ [1,2]") == null) // NULL list still NULL
    assert(b("[1,2,3] @> [1,2]") == true)
    assert(b("[1,2] && [2,3]") == true)
    assert(b("[NULL] && [NULL]") == false)
    assert(b("[] && []") == false)
    assert(math.abs(b("[1.0,2.0] <-> [3.0,4.0]").asInstanceOf[Double]
      - 2.8284271247461903) < 1e-12)
    assert(math.abs(b("[1.0,2.0] <=> [3.0,4.0]").asInstanceOf[Double]
      - 0.9838699100999074) < 1e-9)
  }

  test("named spellings keep the NULL-element rules") {
    assert(b("list_has_all([1,2],[NULL])") == true)
    assert(b("list_has_all([1,2],[1,NULL])") == true)
    assert(b("list_has_all(NULL,[1])") == null)
    assert(b("list_has_any([NULL],[NULL])") == false)
    assert(b("list_has_any([1,NULL],[NULL,3])") == false)
  }

  test("operator-run lexing: pg trim rule and Spark-native ops pass through") {
    assert(b("2<-1") == false) // lexes as 2 < -1
    assert(b("3 << 2") == 12)
    assert(b("255 >> 3") == 31)
    assert(b("5 & 3") == 1)
    assert(b("5 | 3") == 7)
    assert(b("5 % 3") == 2)
    assert(b("'a' || 'b'") == "ab")
  }

  test(":: casts chain into operator operands") {
    assert(b("2::int ** 2") == 4.0)
    assert(b("'ab'::varchar ~ 'a.'") == true)
    // tight binding again: ('abcd' ~ 'a'::varchar) || 'b..'
    assert(b("'abcd' ~ 'a'::varchar || 'b..'") == "falseb..")
  }
}
