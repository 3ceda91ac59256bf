package graft

import java.util.concurrent.ConcurrentHashMap

/** DuckDB `CREATE [OR REPLACE] MACRO` — scalar and TABLE macros
  * (delegated surface; the bridge forwards the statements verbatim at
  * src/duckdb_pgwire_extension.cpp:52).
  *
  * A DuckDB macro is a named SQL expression template with positional
  * parameters and `name := default` optional parameters, expanded at
  * bind time. The Spark-native equivalent is expansion at the same
  * point our other dialect sugar runs — a pre-parse rewrite in
  * [[Engine.query]] — so the expanded text flows through SqlRewrites
  * and Catalyst exactly like hand-written SQL (and the optimizer sees
  * the full expression: pushdown/pruning/codegen apply as if the user
  * had inlined it, which is also how DuckDB binds macros).
  *
  * Expansion is textual with paren/quote-aware argument scanning and
  * identifier-boundary parameter substitution; parameters inside
  * string literals of the body are left alone by the literal-skipping
  * scanner. Nested/recursive macros expand iteratively with a depth
  * cap (DuckDB rejects recursive macros at creation; we reject at
  * expansion).
  */
object Macros {

  final case class MacroDef(params: Seq[String],
      defaults: Map[String, String], body: String, isTable: Boolean)

  private val registry = new ConcurrentHashMap[String, MacroDef]()

  private def norm(n: String): String =
    n.toLowerCase.stripPrefix("\"").stripSuffix("\"")

  def isEmpty: Boolean = registry.isEmpty

  def define(name: String, paramList: String, body: String,
      isTable: Boolean, orReplace: Boolean): Unit = {
    val k = norm(name)
    if (registry.containsKey(k) && !orReplace)
      throw new IllegalArgumentException(s"macro $name already exists")
    val trimmed = paramList.trim
    val raw = if (trimmed.isEmpty) Seq.empty[String]
      else splitTopLevel(trimmed).map(_.trim)
    val params = raw.map(_.split(":=")(0).trim)
    require(params.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"macro parameters must be identifiers: $paramList")
    val defaults = raw.collect {
      case p if p.contains(":=") =>
        val Array(n, v) = p.split(":=", 2)
        norm(n.trim) -> v.trim
    }.toMap
    registry.put(k, MacroDef(params.map(norm), defaults, body.trim, isTable))
  }

  def drop(name: String, ifExists: Boolean): Unit =
    if (registry.remove(norm(name)) == null && !ifExists)
      throw new IllegalArgumentException(s"macro $name does not exist")

  /** Expand every registered-macro invocation in `sql`; repeats until
    * a fixpoint (nested macros) with a depth cap of 10.
    */
  def expand(sql: String): String = {
    if (registry.isEmpty) return sql
    var cur = sql
    var depth = 0
    var changed = true
    while (changed && depth < 10) {
      val next = expandOnce(cur)
      changed = next != cur
      cur = next
      depth += 1
    }
    if (changed) throw new IllegalStateException(
      "macro expansion did not terminate (recursive macro?)")
    cur
  }

  private def expandOnce(sql: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') { // skip string/quoted-ident literals
        val close = skipQuoted(sql, i)
        out.append(sql, i, close)
        i = close
      } else if (Character.isJavaIdentifierStart(c) &&
          (i == 0 || !isIdentTail(sql.charAt(i - 1)))) {
        var j = i + 1
        while (j < n && isIdentTail(sql.charAt(j))) j += 1
        val word = sql.substring(i, j)
        var k = j
        while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
        val m = registry.get(norm(word))
        // a qualified reference `db.name(...)` is not a macro call
        val qualified = i > 0 && sql.charAt(i - 1) == '.'
        if (m != null && !qualified && k < n && sql.charAt(k) == '(') {
          val close = matchParen(sql, k)
          val argText = sql.substring(k + 1, close - 1)
          out.append(substitute(m, argText, word))
          i = close
        } else {
          out.append(word)
          i = j
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  private def substitute(m: MacroDef, argText: String, name: String): String = {
    val args = if (argText.trim.isEmpty) Seq.empty[String]
      else splitTopLevel(argText).map(_.trim)
    val named = args.collect {
      case a if a.matches("(?s)[A-Za-z_][A-Za-z0-9_]*\\s*:=.*") =>
        val Array(n, v) = a.split(":=", 2)
        norm(n.trim) -> v.trim
    }.toMap
    val positional = args.takeWhile(
      !_.matches("(?s)[A-Za-z_][A-Za-z0-9_]*\\s*:=.*"))
    if (positional.size + named.size != args.size)
      throw new IllegalArgumentException(
        s"macro $name: positional args must precede named args")
    val unknown = named.keySet.diff(m.params.toSet)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"macro $name has no parameter ${unknown.mkString(", ")}")
    val doublyBound = m.params.take(positional.size).filter(named.contains)
    if (doublyBound.nonEmpty) throw new IllegalArgumentException(
      s"macro $name: parameter ${doublyBound.mkString(", ")} bound both " +
        "positionally and by name")
    val binding = m.params.zipWithIndex.map { case (p, idx) =>
      val v = if (idx < positional.size) positional(idx)
        else named.getOrElse(p, m.defaults.getOrElse(p,
          throw new IllegalArgumentException(
            s"macro $name: missing argument for parameter $p")))
      p -> v
    }.toMap
    if (positional.size > m.params.size)
      throw new IllegalArgumentException(
        s"macro $name expects ${m.params.size} arguments, got ${args.size}")
    var body = m.body
    // identifier-boundary substitution, literal-aware: rebuild the body
    // skipping quoted regions so a param name inside a string constant
    // stays text
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'' || c == '"') {
        val close = skipQuoted(body, i)
        sb.append(body, i, close)
        i = close
      } else if (Character.isJavaIdentifierStart(c) &&
          (i == 0 || !isIdentTail(body.charAt(i - 1)))) {
        var j = i + 1
        while (j < body.length && isIdentTail(body.charAt(j))) j += 1
        val word = body.substring(i, j)
        // a qualified reference `t.col` is a column of `t`, never the
        // macro parameter — same guard as expandOnce's macro-name check
        val qualified = i > 0 && body.charAt(i - 1) == '.'
        binding.get(norm(word)) match {
          case Some(arg) if !qualified => sb.append("(").append(arg).append(")")
          case _ => sb.append(word)
        }
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    body = sb.toString
    // parenthesized either way: a scalar body is an expression term, a
    // TABLE body becomes a FROM-position subquery
    s"($body)"
  }

  private def isIdentTail(c: Char): Boolean =
    Character.isJavaIdentifierPart(c) // letters, digits, _

  /** index just past the closing quote — handles both escape dialects
    * a literal can arrive in: pg-style `''` doubling AND Spark's
    * default backslash escapes (`\'`), since the expanded text is
    * parsed by Spark.
    */
  private def skipQuoted(s: String, open: Int): Int = {
    val q = s.charAt(open)
    var i = open + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) i += 2 // backslash escape
      else if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2 // '' doubling
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** index just past the paren matching s(open)=='('. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') i = skipQuoted(s, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i + 1 }
        i += 1
      }
    }
    throw new IllegalArgumentException(s"unbalanced parens after $open in: $s")
  }

  /** split on commas at paren depth 0, quote-aware. */
  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') i = skipQuoted(s, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) { parts += s.substring(start, i); start = i + 1 }
        i += 1
      }
    }
    parts += s.substring(start)
    parts.result()
  }
}
