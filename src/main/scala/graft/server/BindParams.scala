package graft.server

import java.nio.charset.StandardCharsets.UTF_8

import PgWire.Oid

/** Extended-protocol parameter binding: renders Bind values as SQL
  * literals and splices them into `$N` placeholders before planning.
  *
  * The reference drops bind parameters on the floor
  * (src/duckdb_pgwire_extension.cpp:91-92), which breaks every real
  * driver default — pgjdbc, psycopg and lib/pq all ship statements
  * parameterized. graft implements them: text format for all OIDs,
  * binary format for the fixed-width types drivers actually send
  * binary (int2/4/8, float4/8, bool, bytea).
  */
object BindParams {

  /** Bind/statement mismatch (08P01 protocol violation). */
  final class BindException(msg: String) extends RuntimeException(msg)

  /** Highest `$N` placeholder outside quoted strings/identifiers. */
  def paramCount(sql: String): Int = {
    var mx = 0; var i = 0; var inS = false; var inD = false
    while (i < sql.length) {
      val c = sql(i)
      if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else c match {
        case '\'' => inS = true
        case '"' => inD = true
        case '$' =>
          var j = i + 1; var n = 0
          while (j < sql.length && sql(j).isDigit) { n = n * 10 + (sql(j) - '0'); j += 1 }
          if (j > i + 1) mx = math.max(mx, n)
          i = j - 1
        case _ =>
      }
      i += 1
    }
    mx
  }

  /** Replace `$1..$n` (outside strings) with rendered literals. */
  def substitute(sql: String, lits: IndexedSeq[String]): String = {
    val out = new StringBuilder(sql.length + 32)
    var i = 0; var inS = false; var inD = false
    while (i < sql.length) {
      val c = sql(i)
      if (inS) { out += c; if (c == '\'') inS = false; i += 1 }
      else if (inD) { out += c; if (c == '"') inD = false; i += 1 }
      else c match {
        case '\'' => inS = true; out += c; i += 1
        case '"' => inD = true; out += c; i += 1
        case '$' if i + 1 < sql.length && sql(i + 1).isDigit =>
          var j = i + 1; var n = 0
          while (j < sql.length && sql(j).isDigit) { n = n * 10 + (sql(j) - '0'); j += 1 }
          if (n < 1 || n > lits.length)
            throw new BindException(
              s"bind message supplies ${lits.length} parameter(s), statement references $$$n")
          out ++= lits(n - 1)
          i = j
        case _ => out += c; i += 1
      }
    }
    out.toString
  }

  /** DuckDB also spells placeholders `?` (auto-numbered left to
    * right). Rewrite them to `$1..$n` outside strings / quoted
    * identifiers so the rest of the param machinery sees one syntax.
    */
  def questionToDollar(sql: String): String = {
    if (!sql.contains('?')) return sql
    val out = new StringBuilder(sql.length + 8)
    var i = 0; var inS = false; var inD = false; var n = 0
    while (i < sql.length) {
      val c = sql(i)
      if (inS) { out += c; if (c == '\'') inS = false; i += 1 }
      else if (inD) { out += c; if (c == '"') inD = false; i += 1 }
      else if (c == '-' && i + 1 < sql.length && sql(i + 1) == '-') {
        // line comment: a '?' in it is not a parameter
        while (i < sql.length && sql(i) != '\n') { out += sql(i); i += 1 }
      } else if (c == '/' && i + 1 < sql.length && sql(i + 1) == '*') {
        val close = sql.indexOf("*/", i + 2)
        val end = if (close < 0) sql.length else close + 2
        out ++= sql.substring(i, end); i = end
      } else {
        c match {
          case '\'' => inS = true; out += c
          case '"' => inD = true; out += c
          case '?' => n += 1; out ++= s"$$$n"
          case _ => out += c
        }
        i += 1
      }
    }
    out.toString
  }

  private val numRe = """[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r
  private val floatSpecials = Set("nan", "infinity", "-infinity", "+infinity", "inf", "-inf")

  /** Single-quoted literal, pg-style: quotes double, backslashes stay
    * literal (the session runs escapedStringLiterals=true, matching
    * DuckDB's standard-conforming strings). */
  def quote(v: String): String =
    "'" + v.replace("'", "''") + "'"

  /** One Bind parameter → SQL literal. `format`: 0 text, 1 binary;
    * `data` null ⇒ SQL NULL. */
  def literal(oid: Int, format: Int, data: Array[Byte]): String = {
    if (data == null) return "NULL"
    if (format == 1) return binaryLiteral(oid, data)
    val v = new String(data, UTF_8)
    oid match {
      case Oid.Bool =>
        if (v == "t" || v == "1" || v.equalsIgnoreCase("true")) "TRUE" else "FALSE"
      case Oid.Int2 | Oid.Int4 | Oid.Int8 | Oid.Float4 | Oid.Float8 | Oid.Numeric =>
        if (numRe.matches(v)) v
        else if (floatSpecials(v.toLowerCase) &&
            (oid == Oid.Float4 || oid == Oid.Float8))
          s"CAST(${quote(v)} AS DOUBLE)"
        else throw new NumberFormatException(s"invalid numeric parameter: $v")
      case Oid.Bytea if v.startsWith("\\x") => "X'" + v.drop(2) + "'"
      case Oid.Date => "DATE " + quote(v)
      case Oid.Timestamp | Oid.TimestampTz => "TIMESTAMP " + quote(v)
      case _ => quote(v)
    }
  }

  private def binaryLiteral(oid: Int, d: Array[Byte]): String = {
    def be(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (d(i) & 0xff); i += 1 }
      v
    }
    def fp(x: Double): String =
      if (x.isNaN || x.isInfinite) s"CAST('$x' AS DOUBLE)" else x.toString
    oid match {
      case Oid.Bool => if (d.nonEmpty && d(0) != 0) "TRUE" else "FALSE"
      case Oid.Int2 => be(2).toShort.toString
      case Oid.Int4 => be(4).toInt.toString
      case Oid.Int8 => be(8).toString
      case Oid.Float4 => fp(java.lang.Float.intBitsToFloat(be(4).toInt).toDouble)
      case Oid.Float8 => fp(java.lang.Double.longBitsToDouble(be(8)))
      case Oid.Bytea => "X'" + d.map(b => f"$b%02x").mkString + "'"
      case Oid.Date => // int4 days since 2000-01-01 (pg date_recv)
        val day = java.time.LocalDate.ofEpochDay(be(4).toInt.toLong + 10957L)
        s"DATE '$day'"
      case Oid.Timestamp | Oid.TimestampTz =>
        // int8 micros since 2000-01-01 (pg timestamp_recv)
        val micros = be(8) + 946684800000000L
        val i = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        val ldt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        val frac = if (ldt.getNano == 0) ""
          else "." + f"${ldt.getNano / 1000}%06d".reverse.dropWhile(_ == '0').reverse
        val hms = f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
        s"TIMESTAMP '${ldt.toLocalDate} $hms$frac'"
      case _ => throw new UnsupportedOperationException(
        s"binary-format parameter with type OID $oid is not supported")
    }
  }

  /** Typed NULL standing in for `$N` when Describe(statement) needs
    * the result row shape before any Bind. */
  def nullLiteral(oid: Int): String = oid match {
    case Oid.Bool => "CAST(NULL AS BOOLEAN)"
    case Oid.Int2 => "CAST(NULL AS SMALLINT)"
    case Oid.Int4 => "CAST(NULL AS INT)"
    case Oid.Int8 => "CAST(NULL AS BIGINT)"
    case Oid.Float4 => "CAST(NULL AS FLOAT)"
    case Oid.Float8 => "CAST(NULL AS DOUBLE)"
    case Oid.Numeric => "CAST(NULL AS DECIMAL(38,18))"
    case Oid.Date => "CAST(NULL AS DATE)"
    case Oid.Timestamp | Oid.TimestampTz => "CAST(NULL AS TIMESTAMP)"
    case Oid.Bytea => "CAST(NULL AS BINARY)"
    case _ => "CAST(NULL AS STRING)"
  }
}
