package graft

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's path-parsing / regexp-escape / md5-number scalar
  * vocabulary as native expressions (delegated engine surface,
  * reference src/duckdb_pgwire_extension.cpp:52). Algorithm bodies are
  * static methods here so interpreted and codegen paths share one
  * body, like [[StringOps]].
  *
  * Semantics probed on DuckDB v1.0 and pinned in CompatSpec:
  *  - regexp_escape = RE2 QuoteMeta: ASCII outside [A-Za-z0-9_] gets a
  *    backslash ('a b' -> 'a\ b'); multibyte UTF-8 passes through
  *  - parse_path drops empty components but keeps a leading-separator
  *    root as its own element ('/a//b' -> ['/', 'a', 'b'])
  *  - parse_dirname is the FIRST component when the path contains a
  *    separator, else '' ('f.txt' -> '')
  *  - parse_dirpath is the prefix before the LAST separator
  *    ('/f.txt' -> '', 'a/b/' -> 'a/b')
  *  - parse_filename is the suffix after the last separator;
  *    trim_extension strips from the last '.' ('.hidden' -> '')
  *  - md5_number is the 16 MD5 bytes as a LITTLE-ENDIAN signed int128
  *    (can be negative); _lower/_upper are bytes 8..15 / 0..7 as
  *    little-endian UNSIGNED 64-bit — all rendered as decimal strings
  *    here (Spark has no int128; the reference wire drops HUGEINT
  *    columns anyway, cpp:80-83)
  */
object PathOps {

  /** Active separator characters for a DuckDB separator mode. */
  def sepChars(mode: UTF8String): String = mode.toString match {
    case "system" | "forward_slash" => "/"
    case "backslash" => "\\"
    case "both_slash" => "/\\"
    case other => throw new IllegalArgumentException(
      s"unsupported path separator specifier '$other'")
  }

  private def isSep(c: Char, seps: String): Boolean = seps.indexOf(c) >= 0

  def parsePath(path: UTF8String, mode: UTF8String): ArrayData = {
    val s = path.toString
    val seps = sepChars(mode)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    if (s.nonEmpty && isSep(s.charAt(0), seps))
      out += UTF8String.fromString(s.charAt(0).toString)
    var i = 0
    val cur = new java.lang.StringBuilder()
    while (i < s.length) {
      val c = s.charAt(i)
      if (isSep(c, seps)) {
        if (cur.length > 0) { out += UTF8String.fromString(cur.toString); cur.setLength(0) }
      } else cur.append(c)
      i += 1
    }
    if (cur.length > 0) out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray[Any])
  }

  def parseDirname(path: UTF8String, mode: UTF8String): UTF8String = {
    val s = path.toString
    val seps = sepChars(mode)
    if (!s.exists(isSep(_, seps))) return UTF8String.EMPTY_UTF8
    val arr = parsePath(path, mode)
    if (arr.numElements() == 0) UTF8String.EMPTY_UTF8
    else arr.getUTF8String(0)
  }

  def parseDirpath(path: UTF8String, mode: UTF8String): UTF8String = {
    val s = path.toString
    val seps = sepChars(mode)
    var last = -1
    var i = 0
    while (i < s.length) { if (isSep(s.charAt(i), seps)) last = i; i += 1 }
    if (last <= 0) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(s.substring(0, last))
  }

  def parseFilename(
      path: UTF8String, trimExt: Boolean, mode: UTF8String): UTF8String = {
    val s = path.toString
    val seps = sepChars(mode)
    var last = -1
    var i = 0
    while (i < s.length) { if (isSep(s.charAt(i), seps)) last = i; i += 1 }
    var name = s.substring(last + 1)
    if (trimExt) {
      val dot = name.lastIndexOf('.')
      if (dot >= 0) name = name.substring(0, dot)
    }
    UTF8String.fromString(name)
  }

  /** RE2 QuoteMeta: backslash-escape ASCII outside [A-Za-z0-9_];
    * multibyte codepoints pass through untouched. */
  def regexpEscape(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length * 2)
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      val word = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (!word && c < 128) sb.append('\\')
      sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def md5Bytes(s: UTF8String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)

  private def reverse(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new Array[Byte](until - from)
    var i = 0
    while (i < out.length) { out(i) = b(until - 1 - i); i += 1 }
    out
  }

  def md5Number(s: UTF8String): UTF8String = {
    val b = md5Bytes(s)
    // little-endian signed int128: reverse all 16 bytes, read signed
    UTF8String.fromString(new BigInteger(reverse(b, 0, 16)).toString)
  }

  def md5NumberLower(s: UTF8String): UTF8String = {
    val b = md5Bytes(s)
    UTF8String.fromString(new BigInteger(1, reverse(b, 8, 16)).toString)
  }

  def md5NumberUpper(s: UTF8String): UTF8String = {
    val b = md5Bytes(s)
    UTF8String.fromString(new BigInteger(1, reverse(b, 0, 8)).toString)
  }
}

abstract class PathBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringBinaryInput
  def method: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.PathOps.$method($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    withChildren(l, r)
  def withChildren(l: Expression, r: Expression): Expression
}

case class ParsePath(left: Expression, right: Expression) extends PathBinaryOp {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "parse_path"
  override def method: String = "parsePath"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PathOps.parsePath(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def withChildren(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ParseDirname(left: Expression, right: Expression) extends PathBinaryOp {
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_dirname"
  override def method: String = "parseDirname"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PathOps.parseDirname(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def withChildren(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ParseDirpath(left: Expression, right: Expression) extends PathBinaryOp {
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_dirpath"
  override def method: String = "parseDirpath"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PathOps.parseDirpath(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override def withChildren(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ParseFilename(
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, BooleanType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_filename"
  override protected def nullSafeEval(p: Any, t: Any, m: Any): Any =
    PathOps.parseFilename(p.asInstanceOf[UTF8String],
      t.asInstanceOf[Boolean], m.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, t, m) => s"graft.PathOps.parseFilename($p, $t, $m)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class RegexpEscape(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringUnaryInput
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_escape"
  override protected def nullSafeEval(a: Any): Any =
    PathOps.regexpEscape(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.PathOps.regexpEscape($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** md5_number family: `which` = 0 full int128, 1 lower, 2 upper. */
case class Md5NumberExpr(child: Expression, which: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringUnaryInput
  override def dataType: DataType = StringType
  override def prettyName: String = which match {
    case 0 => "md5_number"
    case 1 => "md5_number_lower"
    case _ => "md5_number_upper"
  }
  private def m: String = which match {
    case 0 => "md5Number"
    case 1 => "md5NumberLower"
    case _ => "md5NumberUpper"
  }
  override protected def nullSafeEval(a: Any): Any = which match {
    case 0 => PathOps.md5Number(a.asInstanceOf[UTF8String])
    case 1 => PathOps.md5NumberLower(a.asInstanceOf[UTF8String])
    case _ => PathOps.md5NumberUpper(a.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.PathOps.$m($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** DuckDB `make_time(h, m, s)` rendered as its TIME text form —
  * 'HH:MM:SS' with the fractional part trimmed of trailing zeros
  * (probed: 20.5 -> '10:30:20.5', 3.0 -> '01:02:03',
  * 59.999999 -> '23:59:59.999999'). Spark has no TIME type; the
  * reference wire would drop a TIME column anyway (cpp:80-83), so the
  * text render IS the interchange form. */
object TimeRender {
  def makeTime(h: Int, m: Int, s: Double): UTF8String = {
    val totalMicros = Math.round(s * 1e6)
    val sec = totalMicros / 1000000L
    val frac = totalMicros % 1000000L
    val base = f"$h%02d:$m%02d:$sec%02d"
    if (frac == 0L) UTF8String.fromString(base)
    else {
      var fs = f"$frac%06d"
      while (fs.endsWith("0")) fs = fs.substring(0, fs.length - 1)
      UTF8String.fromString(base + "." + fs)
    }
  }
}

case class MakeTimeStr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(org.apache.spark.sql.types.IntegerType,
    org.apache.spark.sql.types.IntegerType, DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "make_time"
  override protected def nullSafeEval(h: Any, m: Any, s: Any): Any =
    TimeRender.makeTime(h.asInstanceOf[Int], m.asInstanceOf[Int],
      s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, m, s) => s"graft.TimeRender.makeTime($h, $m, $s)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class NextAfter(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "nextafter"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** DuckDB GLOB (`a ~~~ p` / `GLOB` keyword) — a direct matcher, not a
  * regex translation, so the probed bracket arcana stay exact:
  *  - `*` any run (crosses `/`), `?` any one char, case-sensitive
  *  - `[set]` / `[!set]`; `]` literal when FIRST member (also right
  *    after the `!`); `^` is NOT a negation char ('[^a]' matches both
  *    '^' and 'a'); `-` literal when first or just after a range
  *    ('[a-c-e]' is a..c plus '-' plus 'e'); `x-y` with x>y is an
  *    empty range ('[b-a]' matches nothing but still closes)
  *  - `-` before ANY char forms a range INCLUDING `]` — so '[a-]'
  *    consumes the closer, leaving the bracket UNCLOSED
  *  - an unclosed bracket or dangling backslash makes the whole
  *    pattern match NOTHING ('[a' doesn't even match '[a')
  *  - `\x` escapes to literal x, inside and outside brackets
  * All pinned in CompatSpec from DuckDB v1.0 probes.
  */
object GlobOps {
  private sealed trait G
  private case object Star extends G
  private case object AnyOne extends G
  private final case class Lit(c: Char) extends G
  /** singles + inclusive ranges; `negate` flips membership */
  private final case class Cls(negate: Boolean, singles: String,
      ranges: Array[(Char, Char)]) extends G {
    def matches(c: Char): Boolean = {
      val in = singles.indexOf(c) >= 0 ||
        ranges.exists(r => c >= r._1 && c <= r._2)
      in != negate
    }
  }

  /** None = malformed pattern (matches nothing) */
  private def parse(p: String): Option[Array[G]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[G]
    var i = 0
    val n = p.length
    while (i < n) {
      p.charAt(i) match {
        case '*' => out += Star; i += 1
        case '?' => out += AnyOne; i += 1
        case '\\' =>
          if (i + 1 >= n) return None
          out += Lit(p.charAt(i + 1)); i += 2
        case '[' =>
          var j = i + 1
          val negate = j < n && p.charAt(j) == '!'
          if (negate) j += 1
          val singles = new java.lang.StringBuilder
          val ranges = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
          var first = true
          var closed = false
          var justRange = false
          while (!closed && j < n) {
            val c = p.charAt(j)
            if (c == ']' && !first) { closed = true; j += 1 }
            else if (c == '\\' && j + 1 < n) {
              singles.append(p.charAt(j + 1)); j += 2
              first = false; justRange = false
            } else if (c == '-' && !first && !justRange && j + 1 < n &&
                singles.length() > 0) {
              // range with the PREVIOUS single — the end char may even
              // be ']' (probed: '[a-]' consumes it and never closes)
              val lo = singles.charAt(singles.length() - 1)
              singles.setLength(singles.length() - 1)
              val hi = p.charAt(j + 1)
              if (lo <= hi) ranges += ((lo, hi))
              j += 2; justRange = true
            } else {
              singles.append(c); j += 1
              first = false; justRange = false
            }
          }
          if (!closed) return None
          out += Cls(negate, singles.toString, ranges.toArray)
          i = j
        case c => out += Lit(c); i += 1
      }
    }
    Some(out.toArray)
  }

  /** single-entry per-thread parse cache — patterns are almost always
    * constant per query, and this also covers the per-row case */
  private val lastParse =
    new ThreadLocal[(String, Option[Array[G]])] {
      override def initialValue(): (String, Option[Array[G]]) = (null, None)
    }

  def matches(s: UTF8String, p: UTF8String): Boolean = {
    val pat = p.toString
    val cached = lastParse.get()
    val parsed =
      if (cached._1 == pat) cached._2
      else { val r = parse(pat); lastParse.set((pat, r)); r }
    parsed match {
      case None => false
      case Some(gs) => run(s.toString, gs)
    }
  }

  /** classic star-backtracking glob walk */
  private def run(s: String, gs: Array[G]): Boolean = {
    var si = 0
    var gi = 0
    var starG = -1
    var starS = -1
    while (si < s.length) {
      if (gi < gs.length && (gs(gi) match {
        case Star => starG = gi; starS = si; gi += 1; true
        case AnyOne => si += 1; gi += 1; true
        case Lit(c) if c == s.charAt(si) => si += 1; gi += 1; true
        case cls: Cls if cls.matches(s.charAt(si)) => si += 1; gi += 1; true
        case _ => false
      })) ()
      else if (starG >= 0) { gi = starG + 1; starS += 1; si = starS }
      else return false
    }
    while (gi < gs.length && gs(gi) == Star) gi += 1
    gi == gs.length
  }

  /** DuckDB `n!` / factorial(n): HUGEINT result, modeled as
    * DECIMAL(38,0) — exact through 33! (DuckDB's own HUGEINT limit;
    * 34! is Out of Range in both engines). n <= 1 → 1, including
    * negatives (probed: (-5)! = 1).
    */
  def factorialBig(n: Int): org.apache.spark.sql.types.Decimal = {
    if (n > 33) throw new ArithmeticException(
      s"factorial($n): value out of range")
    var acc = java.math.BigInteger.ONE
    var i = 2
    while (i <= n) { acc = acc.multiply(java.math.BigInteger.valueOf(i)); i += 1 }
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(acc), 38, 0)
  }
}

case class GlobMatchExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringBinaryInput
  override def dataType: DataType = BooleanType
  override def prettyName: String = "duck_glob"
  override protected def nullSafeEval(s: Any, p: Any): Any =
    GlobOps.matches(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) => s"graft.GlobOps.matches($s, $p)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class FactorialBigExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType =
    org.apache.spark.sql.types.DecimalType(38, 0)
  override def prettyName: String = "duck_factorial"
  override protected def nullSafeEval(n: Any): Any =
    GlobOps.factorialBig(n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, n => s"graft.GlobOps.factorialBig($n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
