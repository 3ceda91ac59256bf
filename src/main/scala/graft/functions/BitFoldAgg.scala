package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** bit_and / bit_or / bit_xor with DuckDB's BIT-string polymorphism:
  * over the '0'/'1'-string BIT model the group folds CHAR-wise (probed
  * bit_xor('0101'::BIT) = '0101'); over integers it is the native
  * bitwise fold with the INPUT's type preserved (so the r8 oracle row
  * q_duckdb_bits keeps its integer schema). Runtime dispatch lives in
  * update() because an AggregateExpression cannot sit behind
  * RuntimeReplaceable (the planner extracts aggregates before
  * FinishAnalysis substitutes replacements). */
case class BitFoldAgg(
    child: Expression,
    op: String, // "and" | "or" | "xor"
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitFoldAgg.Buf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = s"bit_$op"

  override def createAggregationBuffer(): BitFoldAgg.Buf = BitFoldAgg.Buf()

  private def foldLong(a: Long, b: Long): Long = op match {
    case "and" => a & b
    case "or" => a | b
    case _ => a ^ b
  }
  private def foldStr(a: String, b: String): String = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"bit strings differ in length: ${a.length} vs ${b.length}")
    val sb = new StringBuilder(a.length)
    var i = 0
    while (i < a.length) {
      val x = a.charAt(i) == '1'; val y = b.charAt(i) == '1'
      val r = op match {
        case "and" => x && y
        case "or" => x || y
        case _ => x != y
      }
      sb += (if (r) '1' else '0'); i += 1
    }
    sb.toString
  }

  override def update(buf: BitFoldAgg.Buf, input: InternalRow): BitFoldAgg.Buf = {
    val v = child.eval(input)
    if (v != null) v match {
      case u: UTF8String =>
        buf.str = if (buf.str == null && !buf.set) u.toString
                  else foldStr(buf.str, u.toString)
        buf.set = true
      case n =>
        val l = n match {
          case i: java.lang.Integer => i.longValue()
          case l0: java.lang.Long => l0.longValue()
          case s: java.lang.Short => s.longValue()
          case b: java.lang.Byte => b.longValue()
          case other => throw new IllegalArgumentException(
            s"bit_$op: unsupported input $other")
        }
        buf.long = if (buf.set) foldLong(buf.long, l) else l
        buf.set = true
    }
    buf
  }

  override def merge(b1: BitFoldAgg.Buf, b2: BitFoldAgg.Buf): BitFoldAgg.Buf = {
    if (!b2.set) b1
    else if (!b1.set) b2
    else if (b1.str != null || b2.str != null) {
      b1.str = foldStr(b1.str, b2.str); b1
    } else { b1.long = foldLong(b1.long, b2.long); b1 }
  }

  override def eval(buf: BitFoldAgg.Buf): Any =
    if (!buf.set) null
    else if (buf.str != null) UTF8String.fromString(buf.str)
    else child.dataType match {
      case IntegerType => buf.long.toInt
      case ShortType => buf.long.toShort
      case ByteType => buf.long.toByte
      case _ => buf.long
    }

  override def serialize(buf: BitFoldAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    out.writeBoolean(buf.set)
    out.writeBoolean(buf.str != null)
    if (buf.str != null) out.writeUTF(buf.str) else out.writeLong(buf.long)
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BitFoldAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = BitFoldAgg.Buf()
    buf.set = in.readBoolean()
    if (in.readBoolean()) buf.str = in.readUTF() else buf.long = in.readLong()
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BitFoldAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitFoldAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BitFoldAgg = copy(child = cs(0))
}
object BitFoldAgg {
  case class Buf(var set: Boolean = false, var str: String = null,
      var long: Long = 0L)
}

/** mad with DuckDB's TIME polymorphism: TIME groups yield the median
  * absolute deviation as an INTERVAL (probed: mad of one TIME =
  * '00:00:00'); numeric groups keep the r8 MadAgg double semantics
  * (median(|x - median|), both interpolated). */
case class MadPolyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  private lazy val isTime = child.dataType.isInstanceOf[TimeType]
  override def dataType: DataType =
    if (isTime) CalendarIntervalType else DoubleType
  override def prettyName: String = "mad"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Double] =
    mutable.ArrayBuffer.empty[Double]

  override def update(
      buf: mutable.ArrayBuffer[Double], input: InternalRow): mutable.ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case l: java.lang.Long =>
          if (isTime) l.longValue() / 1000.0 // TimeType stores nanos → micros
          else l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case d0: java.lang.Double => d0.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case s: java.lang.Short => s.doubleValue()
        case b: java.lang.Byte => b.doubleValue()
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(
          s"mad: unsupported input $other")
      }
      buf += d
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[Double],
      b2: mutable.ArrayBuffer[Double]): mutable.ArrayBuffer[Double] = { b1 ++= b2; b1 }

  private def median(xs: Array[Double]): Double = {
    val n = xs.length
    if (n % 2 == 1) xs(n / 2)
    else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
  }

  override def eval(buf: mutable.ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val xs = buf.toArray.sorted
    val m = median(xs)
    val devs = xs.map(x => math.abs(x - m)).sorted
    val mad = median(devs)
    if (isTime) new CalendarInterval(0, 0, math.round(mad))
    else mad
  }

  override def serialize(buf: mutable.ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    out.writeInt(buf.length); buf.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt(); val buf = mutable.ArrayBuffer.empty[Double]
    var i = 0; while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MadPolyAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MadPolyAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MadPolyAgg = copy(child = cs(0))
}
