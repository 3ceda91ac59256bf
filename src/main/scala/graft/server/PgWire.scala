package graft.server

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** PostgreSQL wire-protocol framing + text-format serialization.
  *
  * Backend message layout: type byte, int32 length (self-inclusive,
  * type-exclusive), payload. Mirrors what the reference's pgwire
  * submodule does for it (bridge serialization switch at
  * src/duckdb_pgwire_extension.cpp:119-166), but covers ALL Spark
  * primitive types — the reference silently drops BOOLEAN /
  * TIMESTAMP_TZ / DECIMAL columns (cpp:80-83,125-128); we fix that
  * (SURVEY §1.3).
  */
object PgWire {

  // protocol magic numbers
  val ProtocolV3 = 196608
  val SslRequestCode = 80877103
  val CancelRequestCode = 80877102
  val GssRequestCode = 80877104

  /** Postgres type OIDs (public pg_type.h values). */
  object Oid {
    val Bool = 16
    val Bytea = 17
    val Int8 = 20
    val Int2 = 21
    val Int4 = 23
    val Text = 25
    val Float4 = 700
    val Float8 = 701
    val Varchar = 1043
    val Date = 1082
    val Time = 1083
    val Timestamp = 1114
    val Interval = 1186
    val TimestampTz = 1184
    val Numeric = 1700
    val TextArray = 1009
    val Json = 114
  }

  final class MessageWriter(out: DataOutputStream) {
    private val buf = new java.io.ByteArrayOutputStream()
    private val d = new DataOutputStream(buf)

    def int8(v: Int): MessageWriter = { d.writeByte(v); this }
    def int16(v: Int): MessageWriter = { d.writeShort(v); this }
    def int32(v: Int): MessageWriter = { d.writeInt(v); this }
    def bytes(v: Array[Byte]): MessageWriter = { d.write(v); this }
    def cstr(v: String): MessageWriter = {
      d.write(v.getBytes(UTF_8)); d.writeByte(0); this
    }
    /** length-prefixed field value (-1 for NULL). */
    def field(v: Option[String]): MessageWriter = v match {
      case None => int32(-1)
      case Some(s) =>
        val b = s.getBytes(UTF_8); int32(b.length); bytes(b)
    }
    /** length-prefixed binary (format-1) field value (-1 for NULL). */
    def fieldBytes(v: Option[Array[Byte]]): MessageWriter = v match {
      case None => int32(-1)
      case Some(b) => int32(b.length); bytes(b)
    }

    /** discard any partially-built payload (error recovery: an
      * exception mid-row must not corrupt the next message frame). */
    def resetPayload(): Unit = { d.flush(); buf.reset() }

    /** emit one framed message and reset. */
    def send(msgType: Char): Unit = {
      d.flush()
      val payload = buf.toByteArray
      out.writeByte(msgType)
      out.writeInt(payload.length + 4)
      out.write(payload)
      buf.reset()
    }
    def flushOut(): Unit = out.flush()
  }

  final case class FrontendMessage(msgType: Char, payload: Array[Byte]) {
    def reader = new PayloadReader(payload)
  }

  final class PayloadReader(payload: Array[Byte]) {
    private var pos = 0
    def int16(): Int = { val v = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff); pos += 2; v }
    def int32(): Int = {
      val v = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4; v
    }
    def cstr(): String = {
      val start = pos
      while (pos < payload.length && payload(pos) != 0) pos += 1
      val s = new String(payload, start, pos - start, UTF_8)
      pos += 1 // skip NUL
      s
    }
    def byte(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
    def remaining: Int = payload.length - pos
    def bytes(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b
    }
  }

  /** Read one frontend message (post-startup). Returns None on EOF. */
  def readMessage(in: DataInputStream): Option[FrontendMessage] = {
    val t = in.read()
    if (t < 0) return None
    val len = in.readInt()
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    Some(FrontendMessage(t.toChar, payload))
  }
}
