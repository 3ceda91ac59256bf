package graft

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `regexp_replace` semantics, probed 2026-08:
  *
  *  - replaces the FIRST match by default; the `g` flag replaces all
  *    (Spark's builtin always replaces all — a silent divergence);
  *  - the replacement uses RE2's `\1` backreferences (`\\1` stays
  *    literal text) where Java uses `$1` — converted at eval;
  *  - flags: i (case-insensitive), c (case-sensitive — the default),
  *    s (dotall), m/n (multiline), g (global), others error loudly
  *    like DuckDB's "Unrecognized Regex option".
  */
case class DuckRegexpReplace(subject: Expression, regexp: Expression,
    replacement: Expression, global: Boolean, inlineFlags: String)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = replacement
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_replace"

  @transient private lazy val cachedPattern: Pattern = regexp match {
    case Literal(p, StringType) if p != null =>
      Pattern.compile(prefix + p.toString)
    case _ => null
  }

  private def prefix: String =
    if (inlineFlags.isEmpty) "" else s"(?$inlineFlags)"

  override protected def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val pat = if (cachedPattern != null) cachedPattern
      else Pattern.compile(prefix + p.toString)
    val repl = DuckRegexpReplace.toJavaReplacement(r.toString)
    val m = pat.matcher(s.toString)
    UTF8String.fromString(if (global) m.replaceAll(repl) else m.replaceFirst(repl))
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): DuckRegexpReplace =
    copy(subject = f, regexp = s, replacement = t)
}

object DuckRegexpReplace {

  /** RE2 replacement syntax → Java: `\N` → `$N`, `\\` → literal
    * backslash, a literal `$` escapes. */
  def toJavaReplacement(r: String): String = {
    val sb = new java.lang.StringBuilder(r.length + 8)
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n.isDigit) { sb.append('$').append(n); i += 2 }
        else if (n == '\\') { sb.append("\\\\"); i += 2 }
        else { sb.append('\\').append('\\').append(n); i += 2 }
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse a DuckDB regexp options string: (global?, java inline
    * flags). Unknown options error with DuckDB's message. */
  def parseFlags(flags: String): (Boolean, String) = {
    var global = false
    val inline = new java.lang.StringBuilder
    flags.foreach {
      case 'g' => global = true
      case 'i' => inline.append('i')
      case 's' => inline.append('s')
      case 'm' | 'n' => inline.append('m')
      case 'c' => // case-sensitive: the default
      case other => throw new IllegalArgumentException(
        s"Unrecognized Regex option $other")
    }
    (global, inline.toString)
  }

  /** Replace-ALL via Spark's own RegExpReplace expression, BYPASSING
    * the SQL registry: Spark 4's functions.* API resolves by NAME
    * through the registry, so the DuckDB-semantics override above
    * would otherwise hijack internal operators that rely on Spark's
    * replace-all default (it broke fingerprint/PII redaction when the
    * override landed). */
  def sparkReplaceAll(c: org.apache.spark.sql.Column, pattern: String,
      replacement: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.RegExpReplace(
        ColumnBridge.expression(c),
        Literal(UTF8String.fromString(pattern), StringType),
        Literal(UTF8String.fromString(replacement), StringType)))
  }

  /** prepend the java inline-flag group to a pattern expression */
  def withFlags(pattern: Expression, flags: Expression): Expression =
    flags match {
      case Literal(f, StringType) if f != null =>
        val (global, inline) = parseFlags(f.toString)
        require(!global, "the g option applies to regexp_replace only")
        if (inline.isEmpty) pattern
        else org.apache.spark.sql.catalyst.expressions.Concat(
          Seq(Literal(s"(?$inline)"), pattern))
      case other => throw new IllegalArgumentException(
        s"regexp options must be a string literal, got $other")
    }
}
