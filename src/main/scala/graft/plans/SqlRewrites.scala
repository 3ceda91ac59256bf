package graft

/** String-level pre-pass for pg/DuckDB dialect sugar Spark SQL lacks
  * (SURVEY §7 M4). Conservative: each rewrite only fires on patterns
  * Spark would otherwise reject, so valid Spark SQL passes through
  * byte-identical.
  *
  * Rewrites:
  *  - `FROM generate_series(a,b[,step])` → lateral explode(sequence)
  *  - pg type aliases in cast position (`::float8`, `CAST(x AS int8)`)
  *  - JSON arrows `expr ->> 'k'` / `expr -> 'k'` → get_json_object
  *  - `QUALIFY <pred>` → predicate injected into the main select's
  *    projection (full FROM scope, like DuckDB) + outer WHERE on the
  *    synthetic column; whole-query wrap as fallback for set ops
  */
object SqlRewrites {

  /** Columns the caller must drop from the final DataFrame. */
  final case class Rewritten(sql: String, dropCols: Seq[String])

  /** `FROM generate_series(a, b [, step])` (DuckDB/pg table function;
    * reference README.md:54, client/go/cmd/simple/main.go:27 —
    * inclusive bounds) → lateral explode of Spark's `sequence`.
    */
  private val genSeries =
    """(?i)(from|join)\s+generate_series\s*\(([^()]*)\)(\s+(?:as\s+)?(\w+))?""".r

  private val pgTypeAliases = Map(
    "int2" -> "smallint", "int4" -> "int", "int8" -> "bigint",
    "float4" -> "float", "float8" -> "double", "bool" -> "boolean",
    "bytea" -> "binary")
  private val aliasAlt = pgTypeAliases.keys.mkString("|")
  /** DuckDB star modifier `* EXCLUDE (cols)` → Spark's `* EXCEPT (cols)`. */
  private val starExclude = """(?i)\*\s+EXCLUDE\s*\(""".r

  private val castOp = s"""(?i)::\\s*($aliasAlt)\\b""".r
  private val castAs = s"""(?i)\\bAS\\s+($aliasAlt)\\s*\\)""".r

  /** single-level JSON arrows on a column/paren expr with a string or
    * integer key; `->>` and `->` both land on get_json_object (text).
    */
  private val jsonArrow =
    """([\w.)\]]+)\s*(->>|->)\s*(?:'([^']+)'|(\d+))""".r

  /** SQL identifier characters — keyword boundary checks must treat
    * `_` as a word char or identifiers like `__qualify` read as the
    * QUALIFY keyword on a second (idempotent) rewrite pass.
    */
  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** top-level QUALIFY clause (not inside parens — checked by paren
    * depth scan), with optional trailing ORDER BY / LIMIT kept outside.
    */
  private def findTopLevelQualify(sql: String): Option[Int] = {
    var depth = 0; var inS = false; var i = 0
    val upper = sql.toUpperCase
    while (i < sql.length) {
      val c = sql(i)
      if (inS) { if (c == '\'') inS = false }
      else c match {
        case '\'' => inS = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'Q' | 'q' if depth == 0 &&
            upper.startsWith("QUALIFY", i) &&
            (i == 0 || !isWordChar(sql(i - 1))) &&
            (i + 7 >= sql.length || !isWordChar(sql(i + 7))) =>
          return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** index of the first top-level (paren-depth 0, outside strings)
    * occurrence of any of `kws` (uppercase, word-boundary-checked),
    * scanning from `start`.
    */
  private def findTopLevelKeyword(s: String, start: Int,
      kws: Seq[String]): Option[Int] = {
    var depth = 0; var inS = false; var i = start
    val upper = s.toUpperCase
    while (i < s.length) {
      val c = s(i)
      if (inS) { if (c == '\'') inS = false }
      else c match {
        case '\'' => inS = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && kws.exists(k =>
            upper.startsWith(k, i) &&
            (i == 0 || !isWordChar(s(i - 1))) &&
            (i + k.length >= s.length || !isWordChar(s(i + k.length)))) =>
          return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  private def findTopLevelTrailing(s: String): Option[Int] =
    findTopLevelKeyword(s, 0, Seq("ORDER", "LIMIT"))

  /** Inject `(pred) AS __qualify` into the main select's projection
    * list (so the predicate is evaluated in the FROM scope, like
    * DuckDB's QUALIFY), then filter + drop it one level up. Returns
    * None when the main select can't be safely located: a top-level
    * set operation, or no top-level FROM. Note `* EXCEPT (c)` in the
    * select list also reads as a top-level set-op keyword — the
    * fallback is semantically fine there since `*` projects every
    * column the predicate could name.
    */
  private def injectQualify(before: String, pred: String): Option[String] = {
    if (findTopLevelKeyword(before, 0,
        Seq("UNION", "INTERSECT", "EXCEPT")).isDefined) return None
    val selPos = findTopLevelKeyword(before, 0, Seq("SELECT"))
      .getOrElse(return None)
    var j = selPos + "SELECT".length
    while (j < before.length && before(j).isWhitespace) j += 1
    val upper = before.toUpperCase
    var distinct = false
    if (upper.startsWith("DISTINCT", j) &&
        (j + 8 >= before.length || !isWordChar(before(j + 8)))) {
      distinct = true; j += 8
    } else if (upper.startsWith("ALL", j) &&
        (j + 3 >= before.length || !isWordChar(before(j + 3)))) j += 3
    val fromPos = findTopLevelKeyword(before, j, Seq("FROM"))
      .getOrElse(return None)
    // DISTINCT moves to the outer select: it must deduplicate the
    // qualify-filtered rows WITHOUT the synthetic column.
    val inner = before.substring(0, selPos) + "SELECT " +
      before.substring(j, fromPos) + s", ($pred) AS __qualify " +
      before.substring(fromPos)
    val outerSel = if (distinct) "SELECT DISTINCT" else "SELECT"
    Some(s"$outerSel * EXCEPT (__qualify) FROM (\n  $inner\n) WHERE __qualify")
  }

  def rewriteFull(sql: String): Rewritten = {
    val s1 = genSeries.replaceAllIn(sql, m => {
      val kw = m.group(1)
      val args = m.group(2)
      val alias = Option(m.group(4)).getOrElse("generate_series")
      java.util.regex.Matcher.quoteReplacement(
        s"$kw (SELECT explode(sequence($args)) AS $alias)")
    })
    val s1b = starExclude.replaceAllIn(s1, "* EXCEPT (")
    val s2 = castOp.replaceAllIn(s1b,
      m => "::" + pgTypeAliases(m.group(1).toLowerCase))
    val s3 = castAs.replaceAllIn(s2,
      m => "AS " + pgTypeAliases(m.group(1).toLowerCase) + ")")
    val s4 = jsonArrow.replaceAllIn(s3, m => {
      val op = m.group(2)
      val isNum = m.group(4) != null
      val lhs = m.group(1)
      // `x -> 2` is ambiguous with Spark lambda syntax — only `->>`
      // takes numeric subscripts; `->` requires a quoted key. A `)`
      // without its `(` means the regex bit off the tail of a paren
      // expression — leave those alone rather than mangle them.
      if ((op == "->" && isNum) ||
          lhs.count(_ == ')') > lhs.count(_ == '('))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val path = if (!isNum) s"$$.${m.group(3)}" else s"$$[${m.group(4)}]"
        java.util.regex.Matcher.quoteReplacement(
          s"get_json_object(${m.group(1)}, '$path')")
      }
    })
    findTopLevelQualify(s4) match {
      case None => Rewritten(s4, Nil)
      case Some(pos) =>
        val before = s4.substring(0, pos)
        val after = s4.substring(pos + "QUALIFY".length)
        // split predicate from trailing top-level ORDER BY / LIMIT
        val (pred, tail) = findTopLevelTrailing(after) match {
          case Some(idx) => (after.substring(0, idx), after.substring(idx))
          case None => (after, "")
        }
        // Preferred form: inject the predicate as an extra projected
        // column of the SAME select, so it sees the full FROM scope
        // (window exprs over unprojected columns work, matching
        // DuckDB) and — via Spark's lateral column alias resolution —
        // the select's own aliases too. Falls back to wrapping the
        // whole query when the main select can't be located (e.g. a
        // top-level set operation), where the predicate then sees
        // output columns only.
        val injected = injectQualify(before, pred)
        val wrapped = injected.getOrElse(
          s"""SELECT * EXCEPT (__qualify) FROM (
             |  SELECT __q.*, ($pred) AS __qualify FROM ($before) __q
             |) WHERE __qualify""".stripMargin)
        Rewritten(s"$wrapped $tail", Nil)
    }
  }

  def rewrite(sql: String): String = rewriteFull(sql).sql
}
