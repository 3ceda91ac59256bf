package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dsir_buckets(text)` — the DSIR featurizer as ONE fused native
  * expression: lowercase-alnum tokens, every unigram and adjacent
  * bigram polynomial-hashed (`h = fold(h*31 + codepoint) mod 2^31-1`,
  * the engine's cross-replayable rolling hash) and reduced mod
  * `buckets`. Emits the bucket ids with multiplicity (order:
  * unigrams in sequence, then bigrams) — callers only count.
  *
  * Semantics are EXACTLY the composable formulation the oracle
  * replays (`list_reduce` over `string_split(g, '')` with
  * `ascii`/codepoints, bigram = `w1 || ' ' || w2`), but computed in a
  * single pass over the text: the HOF composition re-evaluated the
  * full `split` inside the bigram lambda (O(words²) per doc) and
  * walked interpreted array machinery per character — measured 25×
  * wall at 10× rows before this expression; the fused pass restored
  * the linear band (see BENCH_NOTES r9).
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 2)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "dsir_buckets"

  override protected def nullSafeEval(input: Any): Any =
    DsirBuckets.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.DsirBuckets.compute($x, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

object DsirBuckets {

  private final val Mod = 2147483647L

  /** Single-pass unigram+bigram bucket hashing; public for codegen. */
  def compute(text: UTF8String, buckets: Int): ArrayData = {
    val s = text.toString
    // token boundaries over lowercased alnum runs. Per-codepoint
    // Character.toLowerCase is deliberate: DuckDB's lower() applies
    // the SIMPLE per-codepoint mapping (probed 2026-08: lower('İ') =
    // 'i', length 1), which Character.toLowerCase matches exactly —
    // String.toLowerCase applies Java's FULL mapping ('İ' → 'i' +
    // U+0307, a token-boundary change) and would diverge from the
    // oracle on special-cased codepoints. Do not "fix" this to the
    // string-level form.
    val tokHash = new java.util.ArrayList[java.lang.Long]()
    var h = 0L
    var inTok = false
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val lo = Character.toLowerCase(cp)
      val alnum = (lo >= 'a' && lo <= 'z') || (lo >= '0' && lo <= '9')
      if (alnum) {
        if (!inTok) { h = 0L; inTok = true }
        h = (h * 31 + lo) % Mod
      } else if (inTok) { tokHash.add(h); inTok = false }
      i += Character.charCount(cp)
    }
    if (inTok) tokHash.add(h)
    val t = tokHash.size
    val out = new Array[Long](if (t >= 2) 2 * t - 1 else t)
    var k = 0
    var j = 0
    while (j < t) { out(k) = tokHash.get(j) % buckets; k += 1; j += 1 }
    // bigram hash = fold(fold(h1 over w1, ' '), w2) — the sequential
    // poly fold over `w1 || ' ' || w2` — but the per-char fold of w2
    // must continue from (h1*31 + ' ') shifted through w2's chars;
    // recompute w2's contribution by re-walking its chars is avoided
    // with the identity h(prefix ++ w) = h(prefix)*31^|w| + h(w)
    // (mod p) — track 31^|w| per token.
    if (t >= 2) {
      // second pass for per-token lengths (chars) and hashes
      val tokPow = new Array[Long](t)
      locally {
        var idx = 0
        var pw = 1L
        var inT = false
        var ii = 0
        while (ii < n) {
          val cp = s.codePointAt(ii)
          val lo = Character.toLowerCase(cp)
          val alnum = (lo >= 'a' && lo <= 'z') || (lo >= '0' && lo <= '9')
          if (alnum) {
            if (!inT) { pw = 1L; inT = true }
            pw = (pw * 31) % Mod
          } else if (inT) { tokPow(idx) = pw; idx += 1; inT = false }
          ii += Character.charCount(cp)
        }
        if (inT) tokPow(idx) = pw
      }
      var b = 0
      while (b < t - 1) {
        val h1 = tokHash.get(b)
        val h2 = tokHash.get(b + 1)
        val withSpace = (h1 * 31 + ' ') % Mod
        val combined = (withSpace * tokPow(b + 1) + h2) % Mod
        out(k) = combined % buckets
        k += 1; b += 1
      }
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, buckets: Int): Column =
    ColumnBridge.column(DsirBuckets(ColumnBridge.expression(c), buckets))
}

/** `dsir_bucket_counts(text)` — [[DsirBuckets]] pre-reduced to the
  * per-document bucket HISTOGRAM, map-side (r12, guide §2.3 "aggregate
  * before you shuffle"): the same single text pass, but the bucket ids
  * fold into a counts array and only the ≤ `buckets` non-zero
  * (bucket, n) entries ship — so the downstream corpus-count aggregate
  * and the per-doc scoring join move histogram rows instead of one row
  * per gram INSTANCE. Multiset-identical to exploding [[DsirBuckets]]
  * (CorpusOpsSpec gates it); emission order is ascending bucket id.
  */
case class DsirBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 2)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "dsir_bucket_counts"

  override protected def nullSafeEval(input: Any): Any =
    DsirBucketCounts.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.DsirBucketCounts.compute($x, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): DsirBucketCounts =
    copy(child = newChild)
}

object DsirBucketCounts {

  /** Histogram of [[DsirBuckets.compute]]; public for codegen. */
  def compute(text: UTF8String, buckets: Int): ArrayData = {
    val ids = DsirBuckets.compute(text, buckets)
    val counts = new Array[Long](buckets)
    var i = 0
    val n = ids.numElements()
    var nonZero = 0
    while (i < n) {
      val b = ids.getLong(i).toInt
      if (counts(b) == 0L) nonZero += 1
      counts(b) += 1L
      i += 1
    }
    val out = new Array[Any](nonZero)
    var b = 0
    var k = 0
    while (b < buckets) {
      if (counts(b) > 0L) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(b.toLong, counts(b))
        k += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, buckets: Int): Column =
    ColumnBridge.column(DsirBucketCounts(ColumnBridge.expression(c), buckets))
}
