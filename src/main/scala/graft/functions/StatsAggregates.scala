package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's holistic statistical aggregates that don't decompose into
  * Spark's moment-based builtins (reference delegates them to DuckDB
  * core: `mad`, `entropy`, `bitstring_agg`;
  * src/duckdb_pgwire_extension.cpp:52).
  *
  * `mad`/`entropy` are exact-by-definition holistic aggregates: like
  * Spark's own `percentile` (and like DuckDB's implementation) they
  * buffer the group's values, so per-group memory is O(group) for mad
  * and O(distinct values) for entropy. At the 100 TB design point the
  * mergeable-sketch form (`approx_percentile` / a count-min sketch) is
  * the documented swap; the exact forms here ARE the reference
  * semantics and hash-match its oracle.
  *
  * Probed on DuckDB v1.0 and pinned in CompatSpec:
  *  - mad = median(|x - median(x)|), both medians interpolated
  *    (mad of [1,2,4,10] = 1.5)
  *  - entropy = Shannon entropy, log base 2, NULLs skipped, empty
  *    group (or all-NULL) = 0.0 — NOT NULL
  *  - bitstring_agg requires explicit bounds without table statistics
  *    (DuckDB: "Could not retrieve required statistics"); a value
  *    outside [lo, hi] errors
  */
object StatsAggregates

/** median(|x - median(x)|), both medians linearly interpolated —
  * DuckDB `mad(DOUBLE)` semantics. */
case class MadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mad"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Double] =
    mutable.ArrayBuffer.empty[Double]

  override def update(
      buf: mutable.ArrayBuffer[Double],
      input: InternalRow): mutable.ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Double],
      other: mutable.ArrayBuffer[Double]): mutable.ArrayBuffer[Double] =
    buf ++= other

  private def medianOfSorted(a: Array[Double]): Double = {
    val n = a.length
    if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
  }

  override def eval(buf: mutable.ArrayBuffer[Double]): Any =
    if (buf.isEmpty) null
    else {
      val xs = buf.toArray
      java.util.Arrays.sort(xs)
      val med = medianOfSorted(xs)
      val devs = xs.map(x => math.abs(x - med))
      java.util.Arrays.sort(devs)
      medianOfSorted(devs)
    }

  override def serialize(buf: mutable.ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** Shannon entropy (log base 2) over the group's value frequencies —
  * DuckDB `entropy(x)`. NULLs are skipped; an empty group yields 0.0
  * (probed, NOT NULL). Input is pre-cast to STRING at registration so
  * one buffer shape serves every input type. */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "entropy"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (buf.isEmpty) 0.0
    else {
      val n = buf.valuesIterator.sum.toDouble
      var h = 0.0
      buf.valuesIterator.foreach { c =>
        val p = c / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      h
    }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** Post-aggregation scalar for `bitstring_agg(x, lo, hi)`: renders the
  * group's collected distinct values as a '0'/'1' string of length
  * hi-lo+1, bit (v-lo) counted from the LEFT — DuckDB's BIT render
  * (probed: bitstring_agg(x, 0, 7) of {1,3,5} = '01010100'). Runs on
  * one row per group over collect_set's output, so CodegenFallback
  * costs nothing measurable. A value outside [lo, hi] errors like
  * DuckDB. An empty set (all-NULL group) renders all zeros. */
case class BitstringFromSet(
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bitstring_agg"

  override protected def nullSafeEval(set: Any, loA: Any, hiA: Any): Any = {
    val arr = set.asInstanceOf[ArrayData]
    val lo = loA.asInstanceOf[Long]
    val hi = hiA.asInstanceOf[Long]
    if (hi < lo) throw new IllegalArgumentException(
      s"bitstring_agg: max must be >= min ($hi < $lo)")
    val out = Array.fill[Char]((hi - lo + 1).toInt)('0')
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      if (v < lo || v > hi) throw new IllegalArgumentException(
        s"bitstring_agg: value $v is out of range [$lo, $hi]")
      out((v - lo).toInt) = '1'
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}
