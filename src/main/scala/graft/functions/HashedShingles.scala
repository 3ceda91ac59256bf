package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_shingles(text)` — native Catalyst expression producing the
  * distinct 64-bit word-`n`-gram hashes of a text column in ONE pass:
  * split on spaces, XXH64 each word's bytes, combine `n` consecutive
  * word hashes by seed-chaining, dedupe.
  *
  * This is the gram-construction map stage of
  * [[Dedup.minhashNearDups]] and [[Dedup.ngramJaccardPairs]] — the
  * dominant CPU term of near-dup dedup at 100 TB. The composable
  * formulation (`transform(split(...)) → array_distinct(transform(
  * sequence(...), element_at ...))`) walks interpreted HOF machinery
  * and allocates intermediate arrays; this walks the UTF-8 bytes once
  * and hashes in place. Word splitting matches Spark's
  * `split(text, " ")` with trailing empties kept (Pattern.split
  * limit -1), so the word count equals `size(split(text, ' '))` —
  * the pre-filter the callers use.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.HashedShingles.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {

  private final val Seed = 42L // Spark xxhash64 default seed

  /** Single-pass shingle hashing; public static for codegen. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // word hashes: split on ' ' keeping empty segments (Spark split)
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') words += 1; i += 1 }
    val wh = new Array[Long](words)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        wh(w) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val grams = words - n + 1
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](grams * 2)
    val out = new Array[Long](grams)
    var m = 0
    var g = 0
    while (g < grams) {
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(wh(g + k), h); k += 1 }
      if (seen.add(h)) { out(m) = h; m += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(c), n))
}

/** `span_hashes(text)` — positional sibling of [[HashedShingles]]:
  * element `g` is the hash of words `g..g+n-1`, duplicates KEPT, so
  * the array index IS the span's start position. The span-removal
  * family pairs it with `posexplode` to get (start, h) rows map-side
  * with no window and no token shuffle (r12); the composable
  * `transform(sequence, slice → hash)` formulation walks interpreted
  * HOF machinery per span, this walks the UTF-8 bytes once.
  */
case class SpanHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "span_hashes"

  override protected def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.SpanHashes.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {

  private final val Seed = 42L // Spark xxhash64 default seed

  /** Single-pass positional span hashing; public static for codegen. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') words += 1; i += 1 }
    val wh = new Array[Long](words)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        wh(w) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val grams = words - n + 1
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(wh(g + k), h); k += 1 }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(SpanHashes(ColumnBridge.expression(c), n))
}
