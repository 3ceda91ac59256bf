package graft

import scala.collection.mutable.ArrayBuffer

/** DuckDB in-aggregate ORDER BY → Spark, at the parser seam.
  *
  * DuckDB orders aggregate inputs inline — `string_agg(x, ',' ORDER BY
  * k DESC)`, `list(x ORDER BY k)`, `array_agg(...)` — a grammar Spark
  * does not have. Lowering: collect (key…, value) structs, sort with a
  * comparator lambda (per-key direction; DuckDB's default NULLS LAST
  * on BOTH directions, explicit NULLS FIRST/LAST honored — probed on
  * 1.0), then project values back out:
  *
  *   string_agg/group_concat/listagg → array_join over the sorted,
  *     NULL-skipping values (probed: string_agg drops NULL inputs);
  *     separator defaults to ','
  *   list/array_agg/collect_list → transform over the sorted structs
  *     (probed: list KEEPS NULL inputs)
  *
  * Ties order by arrival (both engines stable-sort; cross-partition
  * arrival is nondeterministic, so oracle rows use tie-free keys).
  *
  * DISTINCT + inline ORDER BY is lowered when every ORDER BY
  * expression appears in the argument list (whitespace-insensitive
  * compare — probed: DuckDB matches the PARSED expressions, so
  * `string_agg(DISTINCT x || 'q' ORDER BY x||'q')` is accepted);
  * otherwise it refuses with DuckDB's own binder message. Windowed
  * (`… OVER`) inline-ORDER-BY forms refuse with DuckDB's own parser
  * message for EVERY function name (probed on 1.1: the rejection is
  * grammar-level, `sum(y ORDER BY y) OVER (...)` included).
  */
object OrderedAgg {

  private val fns = Set("string_agg", "group_concat", "listagg",
    "list", "array_agg", "collect_list", "first", "last",
    "first_value", "last_value", "arbitrary", "any_value")
  private val stringFns = Set("string_agg", "group_concat", "listagg")
  /** first/last take the 1st / last element of the ordered values
    * (NULL values keep their sorted position — probed: `last(x ORDER
    * BY x)` over {3, NULL, 1} is NULL under NULLS LAST). any_value
    * picks the first NON-null of the ordered values (probed:
    * `any_value(x)` over {NULL, NULL, 7, 9} is 7).
    */
  private val pickFns = Set("first", "last", "first_value",
    "last_value", "arbitrary", "any_value")
  /** DuckDB accepts an inline ORDER BY in EVERY aggregate; for
    * order-INsensitive ones the clause is meaningless and simply
    * dropped (probed: `avg(v ORDER BY k)` parses and equals `avg(v)`).
    * Only names where dropping is semantics-preserving are listed —
    * unknown aggregates keep the stock parser's loud error.
    */
  private val dropOrderFns = Set("sum", "avg", "mean", "min", "max",
    "count", "stddev", "stddev_pop", "stddev_samp", "var_pop",
    "var_samp", "variance", "median", "mode", "product", "bit_and",
    "bit_or", "bit_xor", "bool_and", "bool_or", "entropy", "kurtosis",
    "skewness", "mad", "favg", "fsum", "sumkahan", "kahan_sum",
    "geomean", "geometric_mean", "arg_min", "arg_max", "argmin",
    "argmax", "min_by", "max_by", "approx_count_distinct",
    "approx_quantile", "reservoir_quantile", "quantile",
    "quantile_cont", "quantile_disc", "corr", "covar_pop",
    "covar_samp", "regr_slope", "regr_intercept", "regr_count",
    "regr_r2", "regr_avgx", "regr_avgy", "regr_sxx", "regr_syy",
    "regr_sxy", "count_if", "countif", "histogram", "bitstring_agg")

  /** Clause keywords that can directly precede a '(' without being a
    * function call (`FROM (SELECT … ORDER BY a) over` — `over` is a
    * legal alias in DuckDB, probed), so the scan must not treat the
    * parenthesized group as that keyword's argument list.
    */
  private val clauseKw = Set("from", "join", "in", "exists", "where",
    "on", "and", "or", "not", "values", "as", "lateral", "union",
    "intersect", "except", "all", "any", "some", "select", "having",
    "when", "then", "else", "case", "by", "like", "ilike", "between",
    "over", "filter", "distinct", "using", "window", "cross", "inner",
    "left", "right", "full", "natural", "asof", "positional")

  private sealed trait Tok { def start: Int; def end: Int }
  private case class Word(start: Int, end: Int, lower: String) extends Tok
  private case class Other(start: Int, end: Int) extends Tok
  private case class Punct(start: Int, end: Int, c: Char) extends Tok

  private def tokenize(s: String): ArrayBuffer[Tok] = {
    val toks = new ArrayBuffer[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val close = s.indexOf("*/", i + 2)
        i = if (close < 0) n else close + 2
      } else if (c == '\'') {
        val st = i; i += 1
        var done = false
        while (!done && i < n) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        toks += Other(st, i)
      } else if (c == '"' || c == '`') {
        val st = i; i += 1
        while (i < n && s.charAt(i) != c) i += 1
        i = math.min(i + 1, n)
        toks += Other(st, i)
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        toks += Word(st, i, s.substring(st, i).toLowerCase)
      } else if (c == '(' || c == ')') {
        toks += Punct(i, i + 1, c); i += 1
      } else { toks += Other(i, i + 1); i += 1 }
    }
    toks
  }

  def rewrite(sql: String): String = {
    val low = sql.toLowerCase
    if (!low.contains("order") ||
        (!fns.exists(low.contains) && !dropOrderFns.exists(low.contains) &&
          !low.contains("over")))
      return sql
    val toks = tokenize(sql)
    def matchClose(openIdx: Int): Int = {
      var depth = 0; var j = openIdx
      while (j < toks.length) {
        toks(j) match {
          case Punct(_, _, '(') => depth += 1
          case Punct(_, _, ')') => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    case class Span(from: Int, until: Int, text: String)
    val spans = new ArrayBuffer[Span]
    var i = 0
    while (i < toks.length) {
      (toks(i), toks.lift(i + 1)) match {
        case (Word(fnSt, _, fn), Some(Punct(_, _, '('))) if !clauseKw(fn) =>
          val open = i + 1
          val close = matchClose(open)
          if (close > 0) {
            // depth-0 ORDER BY inside the call?
            var ob = -1
            var depth = 0
            var j = open + 1
            while (j < close && ob < 0) {
              toks(j) match {
                case Punct(_, _, '(') => depth += 1
                case Punct(_, _, ')') => depth -= 1
                case Word(_, _, "order") if depth == 0 =>
                  toks.lift(j + 1) match {
                    case Some(Word(_, _, "by")) => ob = j
                    case _ =>
                  }
                case _ =>
              }
              j += 1
            }
            val windowed = toks.lift(close + 1) match {
              case Some(Word(_, _, "over")) => true
              case _ => false
            }
            // inline ORDER BY + OVER is a grammar-level rejection in
            // DuckDB for EVERY function (probed) — parity-refuse here,
            // since Spark's own parse error names the wrong construct
            if (ob >= 0 && windowed)
              throw new IllegalArgumentException(
                "Parser Error: ORDER BY is not implemented for window " +
                  "functions!")
            if (ob >= 0 && (fns(fn) || dropOrderFns(fn))) {
              val argsText = sql.substring(toks(open).end, toks(ob).start).trim
              val keysText = sql.substring(toks(ob + 1).end,
                toks(close).start).trim
              // word-boundary: a column named distinct_vals is not a
              // DISTINCT aggregate
              val distinct =
                "(?is)^distinct\\b".r.findFirstIn(argsText).isDefined
              val bareArgs = if (distinct)
                argsText.replaceFirst("(?is)^distinct\\s+", "")
              else argsText
              spans += Span(fnSt, toks(close).end,
                lowerCall(fn, bareArgs, keysText, distinct))
              i = close
            }
          }
        case _ =>
      }
      i += 1
    }
    if (spans.isEmpty) return sql
    val sb = new StringBuilder(sql)
    spans.sortBy(-_.from).foreach(s => sb.replace(s.from, s.until, s.text))
    sb.toString
  }

  /** DISTINCT: every ORDER BY expression must appear in the argument
    * list (the pg rule DuckDB inherits — probed: ANY argument
    * qualifies, separator constants included, compared on the parsed
    * expression so whitespace differences are immaterial).
    */
  private def checkDistinctKeys(argsText: Seq[String],
      keysText: String): Unit = {
    def canon(e: String) = e.toLowerCase.replaceAll("\\s+", "")
    val argSet = argsText.map(canon).toSet
    val keys = SqlRewrites.splitTop(keysText).map(parseKey)
    if (!keys.forall(k => argSet(canon(k.expr))))
      throw new IllegalArgumentException(
        "Binder Error: In a DISTINCT aggregate, ORDER BY expressions " +
          "must appear in the argument list")
  }

  private case class Key(expr: String, desc: Boolean, nullsFirst: Boolean)

  private def parseKey(k: String): Key = {
    var t = k.trim
    var nullsFirst = false
    var explicitNulls = false
    val nf = "(?i)\\s+nulls\\s+(first|last)\\s*$".r
    nf.findFirstMatchIn(t).foreach { m =>
      explicitNulls = true
      nullsFirst = m.group(1).equalsIgnoreCase("first")
      t = t.substring(0, m.start).trim
    }
    var desc = false
    val ad = "(?i)\\s+(asc|desc)\\s*$".r
    ad.findFirstMatchIn(t).foreach { m =>
      desc = m.group(1).equalsIgnoreCase("desc")
      t = t.substring(0, m.start).trim
    }
    // DuckDB default null order: NULLS LAST regardless of direction
    Key(t, desc, if (explicitNulls) nullsFirst else false)
  }

  private def lowerCall(fn: String, argsText: String,
      keysText: String, distinct: Boolean = false): String = {
    val distKw = if (distinct) "DISTINCT " else ""
    val args = SqlRewrites.splitTop(argsText).map(_.trim).filter(_.nonEmpty)
    // DISTINCT rule first — it applies to order-insensitive
    // aggregates too (probed: `sum(DISTINCT y ORDER BY x)` rejects)
    if (distinct) checkDistinctKeys(argsText = args, keysText = keysText)
    // order-insensitive aggregate: the ORDER BY is meaningless — drop
    if (dropOrderFns(fn)) return s"$fn($distKw$argsText)"
    require(args.nonEmpty, s"$fn(... ORDER BY ...): missing argument")
    val isString = stringFns(fn)
    val sep =
      if (!isString) {
        require(args.length == 1,
          s"$fn takes one argument before ORDER BY")
        "','"
      } else if (args.length >= 2) args(1)
      else "','"
    val pick = pickFns(fn)
    val value = args.head
    val keys = SqlRewrites.splitTop(keysText).map(parseKey)
    require(keys.nonEmpty, s"$fn: empty ORDER BY")
    val keyFields = keys.zipWithIndex
      .map { case (k, n) => s"(${k.expr}) AS __k$n" }
      .mkString(", ")
    val collected =
      s"collect_list(struct($keyFields, ($value) AS __v))"
    val cmp = keys.zipWithIndex.foldRight("0") { case ((k, n), rest) =>
      val (nullL, nullR) = if (k.nullsFirst) ("-1", "1") else ("1", "-1")
      val (lt, gt) = if (k.desc) ("1", "-1") else ("-1", "1")
      s"CASE WHEN __l.__k$n IS NULL AND __r.__k$n IS NULL THEN $rest " +
        s"WHEN __l.__k$n IS NULL THEN $nullL " +
        s"WHEN __r.__k$n IS NULL THEN $nullR " +
        s"WHEN __l.__k$n < __r.__k$n THEN $lt " +
        s"WHEN __l.__k$n > __r.__k$n THEN $gt ELSE $rest END"
    }
    // (DISTINCT argument-list rule already checked above; duplicate
    // structs are identical — array_distinct after the sort dedups
    // while keeping sorted order.)
    val sorted0 = s"array_sort($collected, (__l, __r) -> $cmp)"
    val sorted = if (distinct) s"array_distinct($sorted0)" else sorted0
    if (isString)
      s"array_join(transform(filter($sorted, __s -> __s.__v IS NOT NULL)," +
        s" __s -> CAST(__s.__v AS STRING)), $sep)"
    else if (pick) {
      if (fn == "any_value")
        // first NON-null of the ordered values (all-null group → NULL)
        s"try_element_at(filter(transform($sorted, __s -> __s.__v), " +
          s"__v -> __v IS NOT NULL), 1)"
      else {
        val idx = if (fn == "last" || fn == "last_value") "-1" else "1"
        s"element_at(transform($sorted, __s -> __s.__v), $idx)"
      }
    } else
      s"transform($sorted, __s -> __s.__v)"
  }
}
