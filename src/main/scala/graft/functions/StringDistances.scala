package graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-distance / normalization vocabulary as native
  * expressions (reference delegates them to DuckDB's core: hamming,
  * jaccard, jaro_winkler_similarity, damerau_levenshtein,
  * strip_accents, nfc_normalize). Each expression is a single static
  * call inside whole-stage codegen — the algorithms live in
  * [[StringOps]] so interpreted and codegen paths share one body.
  *
  * Semantics probed on DuckDB 1.0 and pinned in CompatSpec:
  *  - hamming errors on unequal or empty inputs
  *  - jaccard is case-sensitive char-set Jaccard; errors on empty
  *  - damerau_levenshtein is the UNRESTRICTED variant (a transposed
  *    pair may be edited between: 'a cat' -> 'a abct' = 2, not OSA 3)
  *  - jaro_winkler applies the 0.1 prefix boost only above jaro 0.7
  *  - strip_accents = NFD + drop combining marks (ø and ß survive)
  */
object StringOps {

  def damerau(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.toCharArray
    val t = b.toString.toCharArray
    val m = s.length; val n = t.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    // full DL: da(char) = last row where char occurred in s
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val i1 = Option(da.get(t(j - 1))).map(_.intValue).getOrElse(0)
        val j1 = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1)
  }

  def hamming(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString; val t = b.toString
    if (s.isEmpty || t.isEmpty)
      throw new IllegalArgumentException(
        "hamming: strings must be of length > 0")
    if (s.length != t.length)
      throw new IllegalArgumentException(
        "hamming: strings must be of equal length")
    var c = 0; var i = 0
    while (i < s.length) { if (s.charAt(i) != t.charAt(i)) c += 1; i += 1 }
    c
  }

  def jaccardChars(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString; val t = b.toString
    if (s.isEmpty || t.isEmpty)
      throw new IllegalArgumentException("jaccard: an argument too short")
    val x = new java.util.HashSet[Character]()
    val y = new java.util.HashSet[Character]()
    s.foreach(x.add(_)); t.foreach(y.add(_))
    var inter = 0
    val it = x.iterator()
    while (it.hasNext) if (y.contains(it.next())) inter += 1
    inter.toDouble / (x.size + y.size - inter)
  }

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString.toCharArray
    val t = b.toString.toCharArray
    val m = s.length; val n = t.length
    if (m == 0 && n == 0) return 0.0 // DuckDB: ('','') -> 0
    if (m == 0 || n == 0) return 0.0
    val window = math.max(0, math.max(m, n) / 2 - 1)
    val sm = new Array[Boolean](m)
    val tm = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window)
      val hi = math.min(n - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s(i) == t(j)) {
          sm(i) = true; tm(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < m) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // transposition count is FLOORED half-mismatches (integer div) —
    // DuckDB/rapidfuzz semantics; the fractional form differs on odd
    // raw counts (probed: m=7, raw=5 → 0.549206, not 0.525397)
    (matches.toDouble / m + matches.toDouble / n +
      (matches - trans / 2).toDouble / matches) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j // standard boost threshold, matches DuckDB
    val s = a.toString; val t = b.toString
    var l = 0
    while (l < math.min(4, math.min(s.length, t.length)) &&
      s.charAt(l) == t.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def stripAccents(a: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(a.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def nfcNormalize(a: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(a.toString,
      java.text.Normalizer.Form.NFC))
}

abstract class StringBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringBinaryInput
  /** static call target, e.g. "damerau" */
  def method: String
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalPair(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  def evalPair(a: UTF8String, b: UTF8String): Any
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.StringOps.$method($a, $b)")
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringBinaryOp {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override def method: String = "damerau"
  override def evalPair(a: UTF8String, b: UTF8String): Any =
    StringOps.damerau(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class HammingDistance(left: Expression, right: Expression)
    extends StringBinaryOp {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming"
  override def method: String = "hamming"
  override def evalPair(a: UTF8String, b: UTF8String): Any =
    StringOps.hamming(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class JaccardChars(left: Expression, right: Expression)
    extends StringBinaryOp {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"
  override def method: String = "jaccardChars"
  override def evalPair(a: UTF8String, b: UTF8String): Any =
    StringOps.jaccardChars(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends StringBinaryOp {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override def method: String = "jaro"
  override def evalPair(a: UTF8String, b: UTF8String): Any =
    StringOps.jaro(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringBinaryOp {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override def method: String = "jaroWinkler"
  override def evalPair(a: UTF8String, b: UTF8String): Any =
    StringOps.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

abstract class StringUnaryOp extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.stringUnaryInput
  override def dataType: DataType = StringType
  def method: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.StringOps.$method($a)")
}

case class StripAccents(child: Expression) extends StringUnaryOp {
  override def prettyName: String = "strip_accents"
  override def method: String = "stripAccents"
  override protected def nullSafeEval(a: Any): Any =
    StringOps.stripAccents(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NfcNormalize(child: Expression) extends StringUnaryOp {
  override def prettyName: String = "nfc_normalize"
  override def method: String = "nfcNormalize"
  override protected def nullSafeEval(a: Any): Any =
    StringOps.nfcNormalize(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Integer/bar helpers for the numeric long-tail (same static-call
  * codegen shape as [[StringOps]]).
  */
object NumOps {
  // absExact/multiplyExact: Long.MinValue inputs and lcm overflow
  // ERROR loudly like DuckDB ('Overflow on abs' / 'lcm value is out
  // of range', probed) instead of silently wrapping
  def gcd(a: Long, b: Long): Long = {
    var x = Math.absExact(a); var y = Math.absExact(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L
    else Math.absExact(Math.multiplyExact(a / gcd(a, b), b))

  /** DuckDB `bar(x, min, max, width)`: a unicode bar of FLOORED
    * `width`·frac eighth-blocks (probed: bar(1,0,3,10) = '███▎' — 26
    * eighths, floored, not 27 rounded), and a zero bar renders as
    * `width` spaces (probed).
    */
  def bar(x: Double, min: Double, max: Double, width: Double): UTF8String = {
    val frac = math.max(0.0, math.min(1.0, (x - min) / (max - min)))
    val eighths = math.floor(frac * width * 8).toInt
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < eighths / 8) { sb.append('█'); i += 1 }
    val rem = eighths % 8
    if (rem > 0) sb.append((0x2590 - rem).toChar) // ▏..▉ are U+2589-258F
    // DuckDB pads with spaces to `width` BYTES, not characters — each
    // block char is 3 UTF-8 bytes (probed: bar(3,0,10,10) = '███ ',
    // bar(1,0,10,10) = '█' + 7 spaces, bar(3,0,10) = 80 bytes)
    val blockChars = eighths / 8 + (if (rem > 0) 1 else 0)
    var bytes = blockChars * 3
    val w = math.floor(width).toInt
    while (bytes < w) { sb.append(' '); bytes += 1 }
    UTF8String.fromString(sb.toString)
  }
}

case class GcdExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.longBinaryInput
  override def dataType: DataType = LongType
  override def prettyName: String = "greatest_common_divisor"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NumOps.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.NumOps.gcd($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class LcmExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = ColumnBridge.longBinaryInput
  override def dataType: DataType = LongType
  override def prettyName: String = "least_common_multiple"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NumOps.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.NumOps.lcm($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** DuckDB `bar` — a display helper, not a hot-path function, so
  * CodegenFallback keeps it one eval call.
  */
case class BarExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = ColumnBridge.doubleQuadInput
  override def dataType: DataType = StringType
  override def prettyName: String = "bar"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    NumOps.bar(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
