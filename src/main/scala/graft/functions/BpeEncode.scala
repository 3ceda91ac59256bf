package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(text)` — byte-pair-encoding tokenization (Sennrich et
  * al. 2016) with a FIXED learned merge table, as a native Catalyst
  * expression: lowercase-alnum words (the engine's `tokens` split),
  * each word decomposed to single-character symbols plus a `</w>`
  * end-of-word marker, then merges applied in rank order — for each
  * round, the lowest-rank pair present merges all its non-overlapping
  * occurrences left-to-right, exactly the subword-nmt encode loop.
  *
  * The merge table rides the expression (a few hundred pairs — it
  * ships in the serialized plan like a broadcast literal) and lookups
  * go through a transient hash map built once per executor. Codegen
  * calls the instance via `addReferenceObj`, so the expression stays
  * inside whole-stage codegen like [[HashedShingles]].
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, i)
    }
    m
  }

  /** Public for codegen. */
  def encode(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    Bpe.words(text.toString).foreach { w =>
      val toks = Bpe.encodeWord(w, ranks)
      var i = 0
      while (i < toks.length) {
        out.add(UTF8String.fromString(toks(i))); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encode($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** BPE primitives shared by training (driver-side, on the word-
  * frequency dictionary) and encoding (distributed expression).
  */
object Bpe {

  final val EndOfWord = "</w>"

  /** The engine's token split: lowercase (locale-independent), alnum
    * runs.
    */
  def words(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** Word → initial symbol sequence (chars + end-of-word marker). */
  def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Merge all non-overlapping (a,b) occurrences, left to right. */
  def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** subword-nmt encode loop: repeatedly merge the lowest-rank pair
    * present in the word until none of its adjacent pairs is a merge.
    */
  def encodeWord(word: String,
      ranks: java.util.HashMap[String, Integer]): Vector[String] = {
    var syms = symbols(word)
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else syms = mergePair(syms, bestA, bestB)
    }
    syms
  }

  /** BPE training on a word-frequency dictionary (the classic
    * subword-nmt formulation — training never touches the corpus
    * again once the dictionary is aggregated): `numMerges` rounds of
    * "count adjacent symbol pairs weighted by word frequency, merge
    * the most frequent". Determinism contract: ties break on the
    * lexicographically smallest (a, b) pair.
    */
  def train(wordFreq: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab = wordFreq.map { case (w, c) => (symbols(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.merge(k, c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val k = e.getKey
          val c = e.getValue
          if (c > bestC || (c == bestC &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = c
          }
        }
        merges += best
        vocab = vocab.map { case (syms, c) =>
          (mergePair(syms, best._1, best._2), c)
        }
        round += 1
      }
    }
    merges.result()
  }

  def encodeColumn(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))
}
