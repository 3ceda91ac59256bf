package graft

import scala.collection.mutable.ArrayBuffer

/** DuckDB bracket syntax → Spark, at the parser seam.
  *
  * DuckDB (the reference's whole SQL surface, forwarded verbatim at
  * src/duckdb_pgwire_extension.cpp:52) uses `[...]` three ways:
  *   1. list literals        `[1, 2, 3]`, `ARRAY[1, 2, 3]`
  *   2. subscripts           `l[1]` — 1-BASED (Spark's is 0-based!)
  *   3. slices               `l[2:4]`, `l[2:]`, `l[:4]`, `l[:]`
  * Spark parses (1) not at all and (2) with different semantics — the
  * silent off-by-one is the worst possible wire bug — so this pass
  * rewrites all three before the stock parser sees the text:
  *   1. → `array(1, 2, 3)`
  *   2. → `duck_subscript(l, 1)`   ([[SubscriptPoly]])
  *   3. → `duck_slice(l, 2, 4)`    ([[SlicePoly]]; open bounds → 1/-1)
  *
  * A `[` opens a literal when the previous significant token cannot
  * end an expression (an operator, `(`, `,`, a keyword like SELECT/
  * WHEN/AND, or the ARRAY constructor keyword); it is a subscript when
  * the previous token can (identifier, `)`, `]`, `}`, or a string
  * literal). Empty brackets (`INT[]` array types) and brackets right
  * after a `::` cast's type name (`x::int[3]` is a TYPE in DuckDB, not
  * a subscript) are left untouched. Strings, quoted identifiers and
  * comments are never rewritten.
  */
object BracketRewrite {

  /** Keywords after which a `[` must be a literal opener (the word
    * cannot end an expression). "array" is special-cased: the ARRAY[..]
    * constructor keyword itself is dropped, its bracket becomes the
    * array( call. "end" is deliberately absent — `CASE..END[i]`
    * subscripts the CASE's value.
    */
  private val literalOpenerKw: Set[String] = Set(
    "select", "where", "when", "then", "else", "and", "or", "not", "in",
    "by", "having", "on", "as", "all", "distinct", "case", "union",
    "intersect", "except", "limit", "offset", "values", "qualify",
    "like", "ilike", "between", "returning", "exclude", "replace",
    "filter", "partition", "order", "using", "if", "is", "unnest",
    "set", "return", "array",
    // IS [NOT] DISTINCT FROM [1,2] — the list after FROM is a literal
    // (no DuckDB form subscripts the FROM keyword itself)
    "from")

  /** Type names whose bracket suffix is an ARRAY TYPE (CAST targets),
    * never a subscript: `CAST(x AS INTEGER[3])`.
    */
  private val typeNames: Set[String] = Set(
    "int", "integer", "bigint", "smallint", "tinyint", "hugeint",
    "ubigint", "uinteger", "usmallint", "utinyint", "varchar", "text",
    "string", "char", "double", "float", "real", "decimal", "numeric",
    "boolean", "bool", "date", "timestamp", "timestamptz", "time",
    "blob", "bytea", "interval", "uuid", "json")

  private sealed trait Tok { def start: Int; def end: Int }
  private case class Word(start: Int, end: Int, lower: String) extends Tok
  private case class Str(start: Int, end: Int) extends Tok
  private case class QIdent(start: Int, end: Int) extends Tok
  private case class Punct(start: Int, end: Int, text: String) extends Tok

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
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
        toks += Str(st, i)
      } else if (c == '"' || c == '`') {
        val st = i; i += 1
        while (i < n && s.charAt(i) != c) i += 1
        i = math.min(i + 1, n)
        toks += QIdent(st, i)
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        toks += Word(st, i, s.substring(st, i).toLowerCase)
      } else if (c.isDigit) {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.')) i += 1
        // a number can end an expression → modeled as a Word that is
        // never a literal-opener keyword
        toks += Word(st, i, s.substring(st, i))
      } else if (c == ':' && i + 1 < n && s.charAt(i + 1) == ':') {
        toks += Punct(i, i + 2, "::"); i += 2
      } else {
        toks += Punct(i, i + 1, c.toString); i += 1
      }
    }
    toks
  }

  private case class Edit(pos: Int, end: Int, text: String, seq: Int)

  /** DuckDB list comprehension inside a literal bracket:
    *   `[E FOR v IN L]`      → `list_transform(L, v -> E)`
    *   `[E FOR v IN L IF C]` → `list_transform(list_filter(L, v -> C),
    *                              v -> E)`
    * (single variable only — DuckDB v1.x has no nested FOR or tuple
    * binding). Returns None when the bracket's depth-0 tokens don't
    * match the `FOR <ident> IN` shape, so ordinary literals containing
    * a stray `for` word fall back to the array( path. Fragments are
    * rewritten recursively (nested brackets, nested comprehensions).
    */
  private def comprehensionText(sql: String,
      toks: ArrayBuffer[Tok], openIdx: Int, closeIdx: Int): Option[String] = {
    var depth = 0
    var forIdx = -1; var inIdx = -1; var ifIdx = -1
    var j = openIdx + 1
    while (j < closeIdx) {
      toks(j) match {
        case Punct(_, _, "[" | "(" | "{") => depth += 1
        case Punct(_, _, "]" | ")" | "}") => depth -= 1
        case Word(_, _, "for") if depth == 0 && forIdx < 0 => forIdx = j
        case Word(_, _, "in") if depth == 0 && forIdx >= 0 && inIdx < 0 =>
          inIdx = j
        case Word(_, _, "if") if depth == 0 && inIdx >= 0 && ifIdx < 0 =>
          ifIdx = j
        case _ =>
      }
      j += 1
    }
    if (forIdx < 0 || inIdx != forIdx + 2 || forIdx == openIdx + 1)
      return None
    val varName = toks(forIdx + 1) match {
      case Word(st, en, _) => sql.substring(st, en)
      case QIdent(st, en) => sql.substring(st, en)
      case _ => return None
    }
    val eS = rewrite(sql.substring(toks(openIdx).end, toks(forIdx).start).trim)
    val lEnd = if (ifIdx >= 0) toks(ifIdx).start else toks(closeIdx).start
    val lS = rewrite(sql.substring(toks(inIdx).end, lEnd).trim)
    if (eS.isEmpty || lS.isEmpty) return None
    val src = if (ifIdx >= 0) {
      val cS = rewrite(
        sql.substring(toks(ifIdx).end, toks(closeIdx).start).trim)
      if (cS.isEmpty) return None
      s"list_filter($lS, $varName -> $cS)"
    } else lS
    Some(s"list_transform($src, $varName -> $eS)")
  }

  /** DuckDB brace literals → Spark constructors, innermost-first so
    * nested values rewrite before their parents:
    *   `{'a': 1, 'b': 'x'}`   → `named_struct('a', 1, 'b', 'x')`
    *   `MAP {'k1': 5, 'k2': 7}` → `map(array('k1','k2'), array(5,7))`
    * Runs before [[rewrite]] (a value may be a `[...]` list literal;
    * a brace result may be subscripted — `{'a':1}['a']` chains through
    * the `)` branch of primaryStart afterwards).
    */
  def rewriteBraces(sql: String): String = {
    var cur = sql
    var guard = 0
    while (cur.indexOf('{') >= 0 && guard < 64) {
      val next = rewriteInnermostBraces(cur)
      if (next == cur) return cur
      cur = next; guard += 1
    }
    cur
  }

  /** DuckDB operator spellings Spark lacks (or worse, parses
    * DIFFERENTLY). Arithmetic:
    *   `a // b` → `divide(a, b)`   (truncated int division on
    *              integers, plain division on floats — [[DividePoly]])
    *   `a ** b` → `power(a, b)`
    *   `a ^ b`  → `power(a, b)`    (pg/DuckDB power; Spark's `^` is
    *              bitwise XOR — the silent-wrong-answer case)
    * Pattern matching (all probed on DuckDB v1.0):
    *   `a ~~ b` / `a !~~ b`   → (NOT) LIKE       (tight-bound, see below)
    *   `a ~~* b` / `a !~~* b` → (NOT) ILIKE
    *   `a ~ b` / `a !~ b`     → (NOT) regexp_full_match (FULL match:
    *              'abcd' ~ 'bc' is FALSE; binary only — a unary `~`
    *              stays Spark's bitwise NOT, which matches DuckDB's)
    *   `a ~~~ b` → duck_glob(a, b)  (GLOB: case-sensitive, `*`/`?`/
    *              `[set]`/`[!set]`, backslash escapes)
    *   `a ^@ b`  → startswith(a, b)
    * List/vector (macro surface `l1 OP l2` in duckdb_functions()):
    *   `a <@ b`  → list_has_all(b, a)   (a contained-in b)
    *   `a @> b`  → list_has_all(a, b)
    *   `a && b`  → list_has_any(a, b)
    *   `a <-> b` → list_distance(a, b)
    *   `a <=> b` → list_cosine_similarity(a, b)  (DuckDB has no
    *              null-safe-equal spelled <=>; in this dialect the
    *              token can only be the list op)
    * Unary:
    *   `@a` → abs(a)  (prefix; DuckDB does NOT bind over a unary
    *          sign — `@-5` errors — so neither do we)
    *   `a!` → duck_factorial(a)  (postfix; an ADJACENT `!=` is
    *          not-equal, but a spaced `5 ! = 120` is factorial-then-=
    *          — probed: `1 ! = 1` is true, `1 != 1` is false)
    * Probed precedence: ALL of these bind to the nearest primary —
    * `'ab' ~~ 'a' || '%'` is `('ab' ~~ 'a') || '%'` = 'false%', and
    * a unary minus binds INTO the operand (-2**2 = 4, -5! = 1) — so
    * the primary-span replacement IS DuckDB's binding. Operator runs
    * are lexed maximal-munch with the pg trailing +/- trim rule
    * (`2<-1` is `2 < -1`; `2<->1` is list_distance and errors on
    * ints, as in DuckDB). One operator rewrites per pass, leftmost
    * first, to a fixpoint — which reproduces left associativity. The
    * `^`-as-XOR Spark spelling is therefore unavailable; DuckDB's
    * xor() function is the supported spelling (documented divergence).
    */
  /** run text → replacement builder, exact-match after the trim rule */
  private val binOps: Map[String, (String, String) => String] = Map(
    "**" -> ((l, r) => s"power($l, $r)"),
    "^" -> ((l, r) => s"power($l, $r)"),
    "//" -> ((l, r) => s"divide($l, $r)"),
    "~~" -> ((l, r) => s"($l LIKE $r)"),
    "!~~" -> ((l, r) => s"($l NOT LIKE $r)"),
    "~~*" -> ((l, r) => s"($l ILIKE $r)"),
    "!~~*" -> ((l, r) => s"($l NOT ILIKE $r)"),
    "~" -> ((l, r) => s"regexp_full_match($l, $r)"),
    "!~" -> ((l, r) => s"(NOT regexp_full_match($l, $r))"),
    "~~~" -> ((l, r) => s"duck_glob($l, $r)"),
    "^@" -> ((l, r) => s"startswith($l, $r)"),
    "<@" -> ((l, r) => s"list_has_all($r, $l)"),
    "@>" -> ((l, r) => s"list_has_all($l, $r)"),
    "&&" -> ((l, r) => s"list_has_any($l, $r)"),
    "<->" -> ((l, r) => s"list_distance($l, $r)"),
    "<=>" -> ((l, r) => s"list_cosine_similarity($l, $r)"),
    // Spark HAS << and >> operators, but its lexer stops lexing >>
    // as shift-right once the statement mentioned array/map/struct
    // (the nested-type `ARRAY<ARRAY<INT>>` close hack) — and the
    // bracket pass emits array(...) everywhere, so the function
    // spellings are the only reliable ones
    "<<" -> ((l, r) => s"shiftleft($l, $r)"),
    ">>" -> ((l, r) => s"shiftright($l, $r)"))

  /** chars that may join an operator run (single-char Punct tokens) */
  private val opChars = "~!@^&<>=*/-"
  /** pg lexer: a multi-char op ending in +/- keeps its tail only when
    * it contains one of these (so `<-` lexes as `<` then unary `-`) */
  private val pgOpSpecials = "~!@#%^&|`?"

  private def prevEndsOperand(toks: ArrayBuffer[Tok], ti: Int): Boolean =
    ti > 0 && (toks(ti - 1) match {
      case Punct(_, _, p) => p == ")" || p == "]" || p == "}"
      case Word(_, _, w) => !literalOpenerKw.contains(w)
      case _: Str | _: QIdent => true
    })

  /** cheap pre-scan: does the text contain any spelling this pass
    * could rewrite? (strings included — the token pass skips them;
    * this only gates the tokenize cost) */
  def hasOperatorTrigger(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '^' || c == '~' || c == '@') return true
      if (c == '!' && (i + 1 >= n || s.charAt(i + 1) != '=')) return true
      if (i + 1 < n) {
        val d = s.charAt(i + 1)
        if ((c == '*' && d == '*') || (c == '/' && d == '/') ||
            (c == '&' && d == '&') || (c == '<' && d == '<') ||
            (c == '>' && d == '>')) return true
        if (c == '<' && (d == '-' || d == '=') && i + 2 < n &&
            s.charAt(i + 2) == '>') return true
      }
      // word operator: SIMILAR TO (cheap case-insensitive scan)
      if ((c == 's' || c == 'S') && i + 7 <= n &&
          s.regionMatches(true, i, "similar", 0, 7)) return true
      i += 1
    }
    false
  }

  def rewriteOperators(sql: String): String = {
    var cur = sql
    var guard = 0
    while (guard < 64) {
      val next = rewriteFirstOperator(cur)
      if (next == cur) return cur
      cur = next; guard += 1
    }
    cur
  }

  private def rewriteFirstOperator(sql: String): String = {
    val toks = tokenize(sql)
    def closeOf(openIdx: Int, open: String, close: String): Int = {
      var depth = 0; var j = openIdx
      while (j < toks.length) {
        toks(j) match {
          case Punct(_, _, `open`) => depth += 1
          case Punct(_, _, `close`) =>
            depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    def openOf(closeIdx: Int, open: String, close: String): Int = {
      var depth = 0; var j = closeIdx
      while (j >= 0) {
        toks(j) match {
          case Punct(_, _, `close`) => depth += 1
          case Punct(_, _, `open`) =>
            depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j -= 1
      }
      -1
    }
    /** char start of the primary ending at token index p, or -1 */
    def leftOperandStart(p: Int): Int = {
      var j = p
      var start = -1
      var continue = true
      while (continue && j >= 0) {
        continue = false
        toks(j) match {
          case Punct(_, _, ")") =>
            val o = openOf(j, "(", ")")
            if (o < 0) return -1
            start = toks(o).start; j = o - 1
            toks.lift(j) match {
              case Some(Word(st, _, w))
                  if !literalOpenerKw.contains(w) && w != "end" =>
                start = st; j -= 1
                // chain left through `.` member access AND `::` casts
                // with a parameterized type (`x::DECIMAL(4,1) ** 2`
                // must take x's cast, not the bare type call)
                if (toks.lift(j).exists {
                  case Punct(_, _, "." | "::") => true; case _ => false
                }) { j -= 1; continue = true }
              case _ =>
            }
          case Punct(_, _, "]") =>
            val o = openOf(j, "[", "]")
            if (o < 0) return -1
            start = toks(o).start; j = o - 1; continue = true
          case Word(st, _, w) =>
            if (start >= 0 && literalOpenerKw.contains(w)) { /* chain ends */ }
            else {
              start = st; j -= 1
              // chain left through `.` member access and `::` casts
              // (`x::int ~ 'p'` regexes x's cast, not the type name)
              if (toks.lift(j).exists {
                case Punct(_, _, "." | "::") => true; case _ => false
              }) { j -= 1; continue = true }
            }
          case QIdent(st, _) => start = st; j -= 1
          case Str(st, _) => start = st; j -= 1
          case _ => if (start < 0) return -1
        }
      }
      // a UNARY sign binds into the operand (probed: -2**2 = 4)
      if (start >= 0) toks.lift(j) match {
        case Some(Punct(sp, _, "-" | "+")) =>
          val unary = j == 0 || (toks(j - 1) match {
            case Word(_, _, w) => literalOpenerKw.contains(w)
            case Punct(_, _, pp) => pp != ")" && pp != "]" && pp != "}"
            case _ => false
          })
          if (unary) sp else start
        case _ => start
      } else start
    }
    /** char end of the primary starting at token index q, or -1 */
    def rightOperandEnd(q0: Int, skipSigns: Boolean = true): Int = {
      var j = q0
      // leading unary signs
      while (skipSigns && j < toks.length && (toks(j) match {
        case Punct(_, _, "-" | "+") => true; case _ => false
      })) j += 1
      if (j >= toks.length) return -1
      // primary
      toks(j) match {
        case Punct(_, _, "(") =>
          val c = closeOf(j, "(", ")"); if (c < 0) return -1; j = c
        case Punct(_, _, "[") =>
          val c = closeOf(j, "[", "]"); if (c < 0) return -1; j = c
        case Word(_, _, _) =>
          if (toks.lift(j + 1).exists {
            case Punct(_, _, "(") => true; case _ => false
          }) {
            val c = closeOf(j + 1, "(", ")"); if (c < 0) return -1; j = c
          }
        case QIdent(_, _) | Str(_, _) =>
        case _ => return -1
      }
      // postfix chains: .field, ::type casts, subscripts, calls
      var more = true
      while (more && j + 1 < toks.length) {
        more = false
        toks(j + 1) match {
          case Punct(_, _, "." | "::") if j + 2 < toks.length =>
            j += 2; more = true
          case Punct(_, _, "[") =>
            val c = closeOf(j + 1, "[", "]")
            if (c >= 0) { j = c; more = true }
          case Punct(_, _, "(") =>
            val c = closeOf(j + 1, "(", ")")
            if (c >= 0) { j = c; more = true }
          case _ =>
        }
      }
      toks(j).end
    }
    var ti = 0
    while (ti < toks.length) {
      // word operator first: `x [NOT] SIMILAR TO re` — DuckDB lowers
      // SIMILAR TO to a full regex match (probed; regexp_full_match)
      toks(ti) match {
        case Word(sSt, _, "similar") if (toks.lift(ti + 1) match {
              case Some(Word(_, _, "to")) => true
              case _ => false
            }) && (prevEndsOperand(toks, ti) ||
              (toks.lift(ti - 1).exists {
                case Word(_, _, "not") => true
                case _ => false
              } && prevEndsOperand(toks, ti - 1))) =>
          val negated = toks.lift(ti - 1) match {
            case Some(Word(_, _, "not")) => true
            case _ => false
          }
          val leftEndIdx = if (negated) ti - 2 else ti - 1
          val opTextStart = if (negated) toks(ti - 1).start else sSt
          var ls = leftOperandStart(leftEndIdx)
          // || binds tighter than SIMILAR TO on the LEFT too — keep
          // consuming `operand ||` chains so `a || b SIMILAR TO p`
          // matches the concatenated value, not b alone (which would
          // silently concat the boolean into a string)
          var extendedL = true
          while (extendedL && ls >= 0) {
            extendedL = false
            var k = leftEndIdx
            while (k >= 0 && toks(k).start >= ls) k -= 1
            if (k >= 1) (toks(k - 1), toks(k)) match {
              case (Punct(_, e1, "|"), Punct(s2, _, "|")) if s2 == e1 =>
                val ls2 = leftOperandStart(k - 2)
                if (ls2 >= 0 && ls2 < ls) { ls = ls2; extendedL = true }
              case _ =>
            }
          }
          val opEnd = toks(ti + 1).end
          var re = rightOperandEnd(ti + 2)
          // SIMILAR TO binds looser than || — keep consuming
          // `|| operand` so a concatenated pattern stays whole
          var extended = true
          while (extended && re > opEnd) {
            extended = false
            var j = ti + 2
            while (j < toks.length && toks(j).start < re) j += 1
            if (j + 1 < toks.length) (toks(j), toks(j + 1)) match {
              case (Punct(_, e1, "|"), Punct(s2, e2, "|")) if s2 == e1 =>
                val re2 = rightOperandEnd(j + 2)
                if (re2 > e2) { re = re2; extended = true }
              case _ =>
            }
          }
          if (ls >= 0 && re > opEnd && leftEndIdx >= 0) {
            val left = sql.substring(ls, opTextStart).trim
            val right = sql.substring(opEnd, re).trim
            val sb2 = new StringBuilder(sql)
            sb2.replace(ls, re,
              if (negated) s"(NOT regexp_full_match($left, $right))"
              else s"regexp_full_match($left, $right)")
            return sb2.toString
          }
        case _ =>
      }
      // maximal adjacent run of single-char operator puncts, then the
      // pg trailing +/- trim rule, then an EXACT table lookup (known
      // multi-char Spark ops like <= >= <> << >> || != -> ->> fail the
      // lookup and pass through untouched)
      val run: Option[(Int, String)] = toks(ti) match {
        case Punct(s, e, t)
            if t.length == 1 && opChars.indexOf(t.charAt(0)) >= 0 =>
          val sb = new StringBuilder(t)
          var end = e
          var j = ti + 1
          var go = true
          while (go && j < toks.length) {
            toks(j) match {
              case Punct(s2, e2, t2) if s2 == end && t2.length == 1 &&
                  opChars.indexOf(t2.charAt(0)) >= 0 =>
                sb.append(t2); end = e2; j += 1
              case _ => go = false
            }
          }
          var text = sb.toString
          while (text.length > 1 && (text.last == '+' || text.last == '-') &&
              !text.exists(c => pgOpSpecials.indexOf(c) >= 0))
            text = text.substring(0, text.length - 1)
          Some((s, text))
        case _ => None
      }
      run match {
        case Some((opStart, text)) =>
          val opEnd = opStart + text.length // runs are 1-char tokens
          val after = ti + text.length
          if (binOps.contains(text) &&
              (text != "~" || prevEndsOperand(toks, ti))) {
            val ls = leftOperandStart(ti - 1)
            val re = rightOperandEnd(after)
            if (ls >= 0 && re > opEnd) {
              val left = sql.substring(ls, opStart).trim
              val right = sql.substring(opEnd, re).trim
              val sb = new StringBuilder(sql)
              sb.replace(ls, re, binOps(text)(left, right))
              return sb.toString
            }
          } else if (text == "@" && !prevEndsOperand(toks, ti)) {
            // prefix abs; DuckDB's @ refuses a signed operand (probed
            // @-5 errors) so the no-sign right-span variant is used
            val re = rightOperandEnd(after, skipSigns = false)
            if (re > opEnd) {
              val sb = new StringBuilder(sql)
              sb.replace(opStart, re,
                s"abs(${sql.substring(opEnd, re).trim})")
              return sb.toString
            }
          } else if (text == "!" && prevEndsOperand(toks, ti)) {
            // postfix factorial (an adjacent != never reaches here —
            // its run fails the table lookup). The left span keeps a
            // unary sign: -5! is factorial(-5) = 1 (probed).
            val ls = leftOperandStart(ti - 1)
            if (ls >= 0) {
              val sb = new StringBuilder(sql)
              sb.replace(ls, opEnd,
                s"duck_factorial(${sql.substring(ls, opStart).trim})")
              return sb.toString
            }
          }
          ti = math.max(after, ti + 1)
        case None =>
          ti += 1
      }
    }
    sql
  }

  private def rewriteInnermostBraces(sql: String): String = {
    val toks = tokenize(sql)
    var ti = 0
    while (ti < toks.length) {
      toks(ti) match {
        case Punct(bst, _, "{") =>
          // matching close + innermost check
          var depth = 0; var j = ti; var close = -1
          var innermost = true
          while (j < toks.length && close < 0) {
            toks(j) match {
              case Punct(_, _, "{") =>
                depth += 1
                if (j != ti) innermost = false
              case Punct(_, _, "}") =>
                depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close >= 0 && innermost && close > ti + 1) {
            // split content into top-level `key : value` pairs
            val pairs = ArrayBuffer.empty[(String, String)]
            var d = 0
            var k = ti + 1
            var keyStart = toks(ti + 1).start
            var colonAt = -1
            var ok = true
            def flush(endPos: Int): Unit = {
              if (colonAt < 0) { ok = false }
              else {
                pairs += ((sql.substring(keyStart, colonAt).trim,
                  sql.substring(colonAt + 1, endPos).trim))
                colonAt = -1
              }
            }
            while (k < close && ok) {
              toks(k) match {
                case Punct(_, _, "(" | "[" | "{") => d += 1
                case Punct(_, _, ")" | "]" | "}") => d -= 1
                case Punct(p, _, ":") if d == 0 =>
                  if (colonAt < 0) colonAt = p
                case Punct(p, e, ",") if d == 0 =>
                  flush(p); if (k + 1 < close) keyStart = toks(k + 1).start
                  val _ = e
                case _ =>
              }
              k += 1
            }
            if (ok) flush(toks(close).start)
            if (ok && pairs.nonEmpty) {
              // MAP {..} when the previous significant token is `map`
              val (isMap, from) = if (ti > 0) toks(ti - 1) match {
                case Word(wst, _, "map") => (true, wst)
                case _ => (false, bst)
              } else (false, bst)
              def quoteKey(key: String): String =
                if (key.startsWith("'") || key.forall(_.isDigit)) key
                else s"'$key'" // bare identifier keys are quoted names
              val repl =
                if (isMap)
                  pairs.map(_._1).mkString("map(array(", ", ", "), ") +
                    pairs.map(_._2).mkString("array(", ", ", "))")
                else
                  pairs.map { case (key, v) => s"${quoteKey(key)}, $v" }
                    .mkString("named_struct(", ", ", ")")
              val sb = new StringBuilder(sql)
              sb.replace(from, toks(close).end, repl)
              return sb.toString // one innermost group per pass
            }
          }
        case _ =>
      }
      ti += 1
    }
    sql
  }

  def rewrite(sql: String): String = {
    if (sql.indexOf('[') < 0) return sql
    val toks = tokenize(sql)
    val edits = new ArrayBuffer[Edit]
    var seq = 0

    def matchClose(openIdx: Int): Int = {
      // token index of the `]` matching toks(openIdx); -1 if unbalanced
      var depth = 0
      var j = openIdx
      while (j < toks.length) {
        toks(j) match {
          case Punct(_, _, "[") => depth += 1
          case Punct(_, _, "]") =>
            depth -= 1
            if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }

    def matchOpenBack(closeIdx: Int, open: String, close: String): Int = {
      var depth = 0
      var j = closeIdx
      while (j >= 0) {
        toks(j) match {
          case Punct(_, _, `close`) => depth += 1
          case Punct(_, _, `open`) =>
            depth -= 1
            if (depth == 0) return j
          case _ =>
        }
        j -= 1
      }
      -1
    }

    /** Token index where the subscripted primary starts, or -1 when
      * the shape isn't one we rewrite (e.g. a `::`-cast type suffix).
      * Walks the chain leftwards: `a.b`, `f(x)`, `m['a'][1]`,
      * `('lit')`, `{'a':1}`, `CASE..END`.
      */
    def primaryStart(beforeIdx: Int): Int = {
      var j = beforeIdx
      var start = -1
      var continue = true
      while (continue && j >= 0) {
        continue = false
        toks(j) match {
          case Punct(_, _, ")") =>
            val o = matchOpenBack(j, "(", ")")
            if (o < 0) return -1
            start = toks(o).start; j = o - 1
            // a call: include the function name and keep chaining
            if (j >= 0) toks(j) match {
              case Word(st, _, w) if !literalOpenerKw.contains(w) && w != "end" =>
                start = st; j -= 1
                toks.lift(j) match {
                  case Some(Punct(_, _, ".")) => j -= 1; continue = true
                  case _ =>
                }
              case _ =>
            }
          case Punct(_, _, "]") =>
            val o = matchOpenBack(j, "[", "]")
            if (o < 0) return -1
            start = toks(o).start; j = o - 1; continue = true // chain: m['a'][1]
          case Punct(_, _, "}") =>
            val o = matchOpenBack(j, "{", "}")
            if (o < 0) return -1
            start = toks(o).start; j = o - 1
            toks.lift(j) match { // MAP {'k':v}['k']
              case Some(Word(st, _, "map")) => start = st
              case _ =>
            }
          case Word(_, _, "end") if j != beforeIdx =>
            // reached END mid-chain — the chain ends here
          case Word(_, _, "end") =>
            // CASE .. END[i]: the primary is the whole CASE expression
            var depth = 1
            j -= 1
            while (depth > 0 && j >= 0) {
              toks(j) match {
                case Word(_, _, "end") => depth += 1
                case Word(_, _, "case") => depth -= 1
                case _ =>
              }
              if (depth > 0) j -= 1
            }
            if (j < 0) return -1
            start = toks(j).start; j -= 1
          case Word(st, _, w) =>
            if (start >= 0 && literalOpenerKw.contains(w)) {
              // chained onto a keyword (SELECT [..][1]) — chain ends
            } else {
              start = st; j -= 1
              // dotted chain a.b[1]; a `::` cast type suffix is a TYPE
              // in DuckDB (x::int[3]) — bail, leave the bracket alone
              toks.lift(j) match {
                case Some(Punct(_, _, ".")) => j -= 1; continue = true
                case Some(Punct(_, _, "::")) => return -1
                case _ =>
              }
            }
          case QIdent(st, _) =>
            start = st; j -= 1
            toks.lift(j) match {
              case Some(Punct(_, _, ".")) => j -= 1; continue = true
              case Some(Punct(_, _, "::")) => return -1
              case _ =>
            }
          case Str(st, _) => start = st; j -= 1
          // a non-chaining token (',', '(', an operator …) ends the
          // chain; only a chain that never found a primary is a bail
          case _ => if (start < 0) return -1
        }
      }
      start
    }

    var ti = 0
    while (ti < toks.length) {
      toks(ti) match {
        case Punct(bst, _, "[") =>
          val closeIdx = matchClose(ti)
          if (closeIdx < 0) return sql // unbalanced: leave untouched
          val prev = if (ti == 0) None else Some(toks(ti - 1))
          val isLiteral = prev match {
            case None => true
            case Some(Word(_, _, w)) => literalOpenerKw.contains(w)
            case Some(Punct(_, _, p)) =>
              p != ")" && p != "]" && p != "}" // operators, '(', ',', ':' …
            case Some(_: Str) | Some(_: QIdent) => false
          }
          if (isLiteral) {
            comprehensionText(sql, toks, ti, closeIdx) match {
              case Some(txt) =>
                // list comprehension `[E FOR v IN L (IF C)?]` — the
                // span is replaced wholesale (E and L swap sides, so
                // point edits can't express it); inner brackets were
                // rewritten recursively, skip their tokens
                edits += Edit(bst, toks(closeIdx).end, txt, { seq += 1; seq })
                ti = closeIdx
              case None =>
                prev match {
                  case Some(Word(wst, wend, "array")) =>
                    // ARRAY[1,2] — drop the keyword, the bracket IS the call
                    edits += Edit(wst, wend, "", { seq += 1; seq })
                  case _ =>
                }
                edits += Edit(bst, bst + 1, "array(", { seq += 1; seq })
                val cl = toks(closeIdx)
                edits += Edit(cl.start, cl.end, ")", { seq += 1; seq })
                // nested brackets are classified on their own turn
            }
          } else if (closeIdx == ti + 1) {
            // empty brackets: an ARRAY TYPE (INT[]), never a subscript
          } else {
            // type suffix guard: CAST(x AS INTEGER[3])
            val isTypeSuffix = prev match {
              case Some(Word(_, _, w)) if typeNames.contains(w) =>
                ti >= 2 && (toks(ti - 2) match {
                  case Word(_, _, "as") => true
                  case Punct(_, _, "::") => true
                  case _ => false
                })
              case _ => false
            }
            if (!isTypeSuffix) {
              val ps = primaryStart(ti - 1)
              if (ps >= 0) {
                // depth-0 colon inside the bracket ⇒ slice
                var colonIdx = -1
                var colonIdx2 = -1
                var depth = 0
                var j = ti + 1
                var colons = 0
                while (j < closeIdx) {
                  toks(j) match {
                    case Punct(_, _, "[") | Punct(_, _, "(") => depth += 1
                    case Punct(_, _, "]") | Punct(_, _, ")") => depth -= 1
                    case Punct(_, _, ":") if depth == 0 =>
                      colons += 1
                      if (colonIdx < 0) colonIdx = j
                      else if (colonIdx2 < 0) colonIdx2 = j
                    case _ =>
                  }
                  j += 1
                }
                val cl = toks(closeIdx)
                if (colons == 0) {
                  edits += Edit(ps, ps, "duck_subscript(", { seq += 1; seq })
                  edits += Edit(bst, bst + 1, ", ", { seq += 1; seq })
                  edits += Edit(cl.start, cl.end, ")", { seq += 1; seq })
                } else if (colons == 1) {
                  val co = toks(colonIdx)
                  val loEmpty = colonIdx == ti + 1
                  val hiEmpty = colonIdx == closeIdx - 1
                  edits += Edit(ps, ps, "duck_slice(", { seq += 1; seq })
                  edits += Edit(bst, bst + 1, if (loEmpty) ", 1" else ", ",
                    { seq += 1; seq })
                  edits += Edit(co.start, co.end,
                    if (hiEmpty) ", -1" else ", ", { seq += 1; seq })
                  edits += Edit(cl.start, cl.end, ")", { seq += 1; seq })
                } else if (colons == 2 && colonIdx2 != closeIdx - 1) {
                  // [a:b:s] stepped slice (DuckDB; probed semantics in
                  // SlicePoly.steppedSlice). An EMPTY step is a DuckDB
                  // syntax error too — left untouched → loud error.
                  val co1 = toks(colonIdx)
                  val co2 = toks(colonIdx2)
                  val loEmpty = colonIdx == ti + 1
                  val hiEmpty = colonIdx2 == colonIdx + 1
                  edits += Edit(ps, ps, "duck_slice(", { seq += 1; seq })
                  edits += Edit(bst, bst + 1, if (loEmpty) ", 1" else ", ",
                    { seq += 1; seq })
                  edits += Edit(co1.start, co1.end,
                    if (hiEmpty) ", -1" else ", ", { seq += 1; seq })
                  edits += Edit(co2.start, co2.end, ", ", { seq += 1; seq })
                  edits += Edit(cl.start, cl.end, ")", { seq += 1; seq })
                }
                // other colon counts — not bridged, left untouched
              }
            }
          }
        case _ =>
      }
      ti += 1
    }

    if (edits.isEmpty) return sql
    // Apply right-to-left. Same-position pure insertions (nested
    // subscript chains all insert at the shared primary start): the
    // LATER-discovered bracket is the OUTER wrapper and must end up
    // leftmost, so it is applied LAST at that position (pos desc,
    // seq ASC — each later application pushes earlier text right).
    val ordered = edits.sortBy(e => (-e.pos, e.seq))
    val sb = new StringBuilder(sql)
    for (e <- ordered) sb.replace(e.pos, e.end, e.text)
    sb.toString
  }
}
