package graft

import org.apache.spark.unsafe.types.UTF8String

/** JVM-side string helpers invoked via StaticInvoke (codegen'd static
  * calls — these sit on hot paths where GraftCall's CodegenFallback
  * would cost). Semantics probed on DuckDB v1.0 (r10 batches).
  */
object DuckStrings {

  /** chr(n) = the full unicode CODEPOINT (Spark's builtin wraps at
    * 256). Invalid codepoints error like DuckDB's. */
  def codepointChr(cp: Int): UTF8String = {
    if (!Character.isValidCodePoint(cp))
      throw new IllegalArgumentException(s"chr: invalid code point $cp")
    UTF8String.fromString(new String(Character.toChars(cp)))
  }

  /** DECIMAL→DECIMAL scale reduction TRUNCATES toward zero in DuckDB
    * (probed grid: CAST(2.46 AS DECIMAL(3,1)) = 2.4, 2.5→(3,0) = 2,
    * -3.5→(3,0) = -3, 9.99→(2,1) = 9.9) — where Spark rounds HALF_UP.
    * Only the decimal→decimal path truncates: DOUBLE and VARCHAR
    * sources round half away from zero (2.5::DOUBLE→3), which Spark's
    * HALF_UP cast already matches. */
  def decTruncate(d: org.apache.spark.sql.types.Decimal, s: Int)
      : org.apache.spark.sql.types.Decimal =
    if (d == null) null
    else org.apache.spark.sql.types.Decimal(
      d.toJavaBigDecimal.setScale(s, java.math.RoundingMode.DOWN))

  /** DuckDB's DOUBLE/FLOAT→VARCHAR rendering (probed grid 2026-08-14):
    * shortest round-trip digits; positional for decimal exponents in
    * [-4, 15], scientific (`1.5e+20`, `9.99e-05` — no trailing `.0`
    * mantissa, signed ≥2-digit exponent) outside; integral positionals
    * get `.0`; `inf`/`-inf`/`nan` lowercase; `-0.0` keeps its sign.
    * Digits come from Java's shortest repr — identical to DuckDB's on
    * normal values (documented skew: Java 17 renders Double.MIN_VALUE
    * as 4.9e-324 where DuckDB prints 5e-324). */
  def renderDouble(d: Double): UTF8String =
    UTF8String.fromString(doubleString(d))
  def renderFloat(f: Float): UTF8String =
    UTF8String.fromString(floatString(f))
  def doubleString(d: Double): String =
    fmtFloating(d, java.lang.Double.toString(d))
  def floatString(f: Float): String =
    fmtFloating(f.toDouble, java.lang.Float.toString(f))

  /** DuckDB upper/lower use utf8proc's SIMPLE per-codepoint case
    * mapping (probed: upper('straße') = 'STRAẞE' — ß maps to U+1E9E,
    * where Java's full mapping expands to SS; lower('İ') = 'i' — the
    * dot is dropped; ligatures like ﬁ stay unchanged). Java's
    * per-codepoint Character.to*Case IS the simple mapping except ß,
    * which predates U+1E9E — special-cased. */
  def upperSimple(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val cp = in.codePointAt(i)
      val up = if (cp == 0xDF) 0x1E9E else Character.toUpperCase(cp)
      sb.appendCodePoint(up)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
  def lowerSimple(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val cp = in.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** VARCHAR→BLOB: DuckDB decodes `\xHH` escapes (invalid escapes
    * error, probed: '\q'::BLOB is a conversion error); all other
    * characters contribute their UTF-8 bytes. */
  def blobBytes(s: UTF8String): Array[Byte] = {
    val bytes = s.getBytes
    if (!bytes.contains('\\'.toByte)) return bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    def hex(b: Byte): Int = b match {
      case d if d >= '0' && d <= '9' => d - '0'
      case c if c >= 'a' && c <= 'f' => c - 'a' + 10
      case c if c >= 'A' && c <= 'F' => c - 'A' + 10
      case _ => -1
    }
    while (i < bytes.length) {
      if (bytes(i) == '\\' && i + 1 < bytes.length && bytes(i + 1) == 'x') {
        if (i + 3 >= bytes.length)
          throw new IllegalArgumentException(
            "invalid hex escape in string -> blob conversion: unterminated")
        val h = hex(bytes(i + 2)); val l = hex(bytes(i + 3))
        if (h < 0 || l < 0) throw new IllegalArgumentException(
          "invalid hex escape in string -> blob conversion")
        out.write(h * 16 + l)
        i += 4
      } else if (bytes(i) == '\\') {
        throw new IllegalArgumentException(
          "invalid escape in string -> blob conversion (only \\xHH)")
      } else { out.write(bytes(i)); i += 1 }
    }
    out.toByteArray
  }

  /** BLOB→VARCHAR: printable ASCII except backslash and single quote
    * render literally, everything else `\xHH` uppercase (probed). */
  def renderBlob(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      if (v >= 0x20 && v <= 0x7E && v != 0x5C && v != 0x27)
        sb.append(v.toChar)
      else sb.append(f"\\x$v%02X")
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** interval comparison key: DuckDB normalizes months to 30 days and
    * days to 24 h (probed: '1 month' = '30 days', '1 day' = '24
    * hours'). */
  def intervalMicros30(i: org.apache.spark.unsafe.types.CalendarInterval): Long =
    (i.months * 30L + i.days) * 86400000000L + i.microseconds

  /** the raw (months, days, micros) triple — DuckDB's own interval
    * model, which CalendarInterval carries 1:1 */
  def ivMonths(i: org.apache.spark.unsafe.types.CalendarInterval): Long =
    i.months.toLong
  def ivDays(i: org.apache.spark.unsafe.types.CalendarInterval): Long =
    i.days.toLong
  def ivMicros(i: org.apache.spark.unsafe.types.CalendarInterval): Long =
    i.microseconds

  private def fmtFloating(d: Double, shortest: String): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val neg = shortest.startsWith("-")
    val sign = if (neg) "-" else ""
    val abs = if (neg) shortest.substring(1) else shortest
    if (d == 0.0) return sign + "0.0"
    val bd = new java.math.BigDecimal(abs).stripTrailingZeros()
    val e = bd.precision - bd.scale - 1
    if (e >= 16 || e <= -5) {
      val digits = bd.unscaledValue.toString
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e < 0) "-" else "+"
      val ea = math.abs(e)
      sign + mant + "e" + es + (if (ea < 10) "0" + ea else ea.toString)
    } else {
      val plain = bd.toPlainString
      sign + (if (plain.indexOf('.') < 0) plain + ".0" else plain)
    }
  }
}
