package graft

import scala.collection.mutable.ArrayBuffer

/** DuckDB window-frame `EXCLUDE` clause → Spark, at the parser seam.
  *
  * DuckDB (delegated surface, forwarded verbatim at cpp:52) accepts
  * `agg(x) OVER (... frame EXCLUDE CURRENT ROW | GROUP | TIES |
  * NO OTHERS)`. Spark's window grammar has no EXCLUDE, so the clause
  * is lowered algebraically for the decomposable aggregates:
  *
  *   sum  EXCLUDE CURRENT ROW → sum(x) OVER w − coalesce(x, 0),
  *                              NULL when no non-NULL x remains
  *   sum  EXCLUDE GROUP       → … − sum(x) over the PEER window
  *                              (partition keys + order exprs)
  *   sum  EXCLUDE TIES        → GROUP form with self added back
  *   count / avg              → same shapes over counts / quotient
  *   EXCLUDE NO OTHERS        → clause dropped (it is the default)
  *
  * Exactness: probed on DuckDB 1.0 (2026-08 probe grid: empty
  * residual frame → NULL for sum/avg, 0 stays for count; TIES keeps
  * self; GROUP drops self). The subtraction form is value-exact for
  * integral arguments; for floating args it can differ from a direct
  * reduced-frame sum in the last ulp (documented — the oracle row
  * pins integer columns).
  *
  * Guard rails (loud errors, never silent wrongness):
  *  - only sum/count/avg rewrite; min/max & friends are not
  *    subtraction-decomposable → error naming the operator;
  *  - the frame must provably CONTAIN the current row (default
  *    frame, UNBOUNDED PRECEDING..CURRENT ROW/UNBOUNDED FOLLOWING,
  *    or ROWS n PRECEDING..m FOLLOWING) — EXCLUDE on a frame not
  *    containing self is a no-op DuckDB honors but the subtraction
  *    would corrupt → error;
  *  - GROUP/TIES additionally require a peer-aligned frame (RANGE,
  *    or unbounded both ends) — a bounded ROWS frame can cut a peer
  *    group in half → error.
  */
object WindowExclude {

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

  /** `agg(args) FILTER (WHERE c) OVER (…)` — DuckDB allows the
    * aggregate FILTER clause on window functions; Spark only in
    * GROUP BY. Lowering: wrap every argument in
    * `CASE WHEN (c) THEN arg END` (aggregates skip NULL, so the
    * filtered-out rows vanish; `count(*)` wraps a literal 1) and drop
    * the clause. Probed on DuckDB 1.0 (sum/count/min grid). Group-by
    * FILTER (no OVER after it) is untouched — Spark handles it.
    */
  def rewriteFilter(sql: String): String = {
    val low = sql.toLowerCase
    if (!low.contains("filter") || !low.contains("over")) return sql
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
    def matchOpenBack(closeIdx: Int): Int = {
      var depth = 0; var j = closeIdx
      while (j >= 0) {
        toks(j) match {
          case Punct(_, _, ')') => depth += 1
          case Punct(_, _, '(') => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j -= 1
      }
      -1
    }
    case class Span(from: Int, until: Int, text: String)
    val spans = new ArrayBuffer[Span]
    var i = 0
    while (i < toks.length) {
      (toks(i), toks.lift(i + 1), toks.lift(i - 1)) match {
        case (Word(_, _, "filter"), Some(Punct(_, _, '(')),
            Some(Punct(_, _, ')'))) =>
          val fOpen = i + 1
          val fClose = matchClose(fOpen)
          val isWindow = fClose > 0 && (toks.lift(fClose + 1) match {
            case Some(Word(_, _, "over")) => true
            case _ => false
          })
          val hasWhere = toks.lift(fOpen + 1) match {
            case Some(Word(_, _, "where")) => true
            case _ => false
          }
          if (isWindow && hasWhere) {
            val cond = sql.substring(toks(fOpen + 1).end,
              toks(fClose).start).trim
            val aOpen = matchOpenBack(i - 1)
            val fnTok = if (aOpen > 0) toks(aOpen - 1) else null
            fnTok match {
              case Word(fnSt, _, _) =>
                val args = sql.substring(toks(aOpen).end,
                  toks(i - 1).start).trim
                val fnName = sql.substring(fnSt, toks(aOpen).start).trim
                val wrapped =
                  if (args == "*") s"(CASE WHEN ($cond) THEN 1 END)"
                  else {
                    // keyword check needs the word boundary — a column
                    // named distinct_flag is NOT a DISTINCT aggregate
                    val distinctKw = "(?is)^distinct\\b".r
                    val (prefix, rest) =
                      if (distinctKw.findFirstIn(args).isDefined)
                        ("DISTINCT ", distinctKw.replaceFirstIn(args, "").trim)
                      else ("", args)
                    prefix + SqlRewrites.splitTop(rest)
                      .map(a => s"(CASE WHEN ($cond) THEN (${a.trim}) END)")
                      .mkString(", ")
                  }
                spans += Span(fnSt, toks(fClose).end, s"$fnName($wrapped)")
                i = fClose
              case _ =>
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

  def rewrite(sql: String): String = {
    val low = sql.toLowerCase
    if (!low.contains("exclude") || !low.contains("over")) return sql
    val toks = tokenize(sql)

    def matchClose(openIdx: Int): Int = {
      var depth = 0; var j = openIdx
      while (j < toks.length) {
        toks(j) match {
          case Punct(_, _, '(') => depth += 1
          case Punct(_, _, ')') =>
            depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    def matchOpenBack(closeIdx: Int): Int = {
      var depth = 0; var j = closeIdx
      while (j >= 0) {
        toks(j) match {
          case Punct(_, _, ')') => depth += 1
          case Punct(_, _, '(') =>
            depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j -= 1
      }
      -1
    }

    // collect rewrites right-to-left so positions stay valid
    case class Span(from: Int, until: Int, text: String)
    val spans = new ArrayBuffer[Span]

    var i = 0
    while (i < toks.length) {
      (toks(i), toks.lift(i + 1)) match {
        case (Word(_, _, "over"), Some(Punct(_, _, '('))) =>
          val open = i + 1
          val close = matchClose(open)
          if (close < 0) return sql
          // depth-0 EXCLUDE inside the spec?
          var e = -1
          var depth = 0
          var j = open + 1
          while (j < close && e < 0) {
            toks(j) match {
              case Punct(_, _, '(') => depth += 1
              case Punct(_, _, ')') => depth -= 1
              case Word(_, _, "exclude") if depth == 0 => e = j
              case _ =>
            }
            j += 1
          }
          if (e >= 0) {
            val kind = toks.slice(e + 1, close).collect {
              case Word(_, _, w) => w }.mkString(" ")
            // the aggregate call directly before OVER
            val fnRepl = (toks.lift(i - 1) match {
              case Some(Punct(_, _, ')')) =>
                val fo = matchOpenBack(i - 1)
                (if (fo > 0) toks(fo - 1) match {
                  case Word(st, _, fn) => Some((st, fn,
                    sql.substring(toks(fo).end, toks(i - 1).start).trim))
                  case _ => None
                } else None)
              case _ => None
            }).getOrElse(throw new IllegalArgumentException(
              "window EXCLUDE: expected aggregate(...) OVER (...)"))
            val (fnStart, fn, arg) = fnRepl
            val spec = sql.substring(toks(open).end, toks(e).start).trim
            val text = lower(fn, arg, spec, kind)
            spans += Span(fnStart, toks(close).end, text)
            i = close // skip past this spec
          }
        case _ =>
      }
      i += 1
    }

    if (spans.isEmpty) return sql
    val sb = new StringBuilder(sql)
    spans.sortBy(-_.from).foreach(s => sb.replace(s.from, s.until, s.text))
    // a rewritten spec can itself contain another OVER (not EXCLUDE
    // though) — single pass is enough; nested EXCLUDE in subqueries
    // was collected in the same scan
    sb.toString
  }

  /** Build the replacement expression for one `fn(arg) OVER (spec
    * EXCLUDE kind)` occurrence.
    */
  private def lower(fn: String, arg: String, spec: String,
      kind: String): String = {
    val w = s"($spec)"
    if (kind == "no others") return s"$fn($arg) OVER $w"
    require(kind == "current row" || kind == "group" || kind == "ties",
      s"window EXCLUDE: unknown exclusion '$kind'")
    val fnLow = fn.toLowerCase
    if (fnLow != "sum" && fnLow != "count" && fnLow != "avg")
      throw new IllegalArgumentException(
        s"window EXCLUDE is supported for sum/count/avg, not $fn " +
          "(not subtraction-decomposable)")
    if ("(?is)^distinct\\b".r.findFirstIn(arg.trim).isDefined)
      throw new IllegalArgumentException(
        "window EXCLUDE: DISTINCT aggregates are not subtraction-decomposable")

    // --- frame validation -------------------------------------------------
    val specLow = spec.toLowerCase
    val frameIdx = Seq("rows", "range", "groups")
      .map(k => ("\\b" + k + "\\b").r.findFirstMatchIn(specLow)
        .map(_.start).getOrElse(-1))
      .filter(_ >= 0).sorted.headOption
    val frame = frameIdx.map(spec.substring(_).trim.toLowerCase
      .replaceAll("\\s+", " ")).getOrElse("")
    val containsSelf = frame match {
      case "" => true // default frame ends at CURRENT ROW
      case f if f.endsWith("current row") && f.contains("unbounded preceding") => true
      case f if f.contains("unbounded preceding") && f.endsWith("unbounded following") => true
      case f if f.matches("rows between (\\d+|unbounded) preceding and (\\d+|unbounded) following") => true
      case f if f.matches("(rows|range) unbounded preceding") => true
      case _ => false
    }
    if (!containsSelf) throw new IllegalArgumentException(
      s"window EXCLUDE: frame '$frame' may not contain the current row — " +
        "the algebraic lowering requires it (use a self-containing frame)")
    if (kind != "current row") {
      val peerAligned = frame.isEmpty || frame.startsWith("range") ||
        (frame.contains("unbounded preceding") &&
          frame.endsWith("unbounded following"))
      if (!peerAligned) throw new IllegalArgumentException(
        s"window EXCLUDE $kind: frame '$frame' is a bounded ROWS frame — " +
          "peer groups can straddle its edges; use a RANGE frame")
    }

    // --- peer window (partition keys + bare order expressions) ------------
    def clause(name: String): Option[String] = {
      val m = ("\\b" + name + "\\s+by\\b").r.findFirstMatchIn(specLow)
      m.map { mm =>
        val from = mm.end
        val until = Seq(
          "\\border\\s+by\\b".r.findAllMatchIn(specLow).map(_.start)
            .find(_ > from), frameIdx.filter(_ > from))
          .flatten.sorted.headOption.getOrElse(spec.length)
        spec.substring(from, until).trim
      }
    }
    val partCols = clause("partition")
    val orderCols = clause("order").map(o => SqlRewrites.splitTop(o)
      .map(_.trim.replaceAll("(?i)\\s+(asc|desc)\\b", "")
        .replaceAll("(?i)\\s+nulls\\s+(first|last)\\b", "").trim)
      .mkString(", "))
    val peerKeys = (partCols.toSeq ++ orderCols.toSeq).mkString(", ")
    val p = if (peerKeys.isEmpty) "()" else s"(PARTITION BY $peerKeys)"

    // --- algebra ----------------------------------------------------------
    val isStar = arg.trim == "*"
    val a = s"($arg)"
    val selfCnt = if (isStar) "1" else s"(CASE WHEN $a IS NULL THEN 0 ELSE 1 END)"
    val selfVal = if (isStar) "NULL" else s"coalesce($a, 0)"
    def cnt(over: String) =
      if (isStar) s"(count(*) OVER $over)" else s"(count$a OVER $over)"
    def sm(over: String) = s"(coalesce(sum$a OVER $over, 0))"
    val (exCnt, exSum) = kind match {
      case "current row" => (s"(${cnt(w)} - $selfCnt)",
        s"(${sm(w)} - $selfVal)")
      case "group" => (s"(${cnt(w)} - ${cnt(p)})",
        s"(${sm(w)} - ${sm(p)})")
      case "ties" => (s"(${cnt(w)} - ${cnt(p)} + $selfCnt)",
        s"(${sm(w)} - ${sm(p)} + $selfVal)")
    }
    fnLow match {
      case "count" => exCnt
      case "sum" => s"(CASE WHEN $exCnt = 0 THEN NULL ELSE $exSum END)"
      case "avg" =>
        s"(CASE WHEN $exCnt = 0 THEN NULL ELSE $exSum / $exCnt END)"
    }
  }
}
