package graft

import org.apache.spark.sql.functions._

/** Real BPE (Sennrich et al. 2016): hand-verified training pins,
  * encode-loop semantics, the reconstruction invariant, and the
  * compression bound on the fixture corpus.
  */
class BpeSpec extends SparkSpecBase {

  test("training replays the hand-computed merge sequence") {
    // wordFreq {ab:10, abc:5}. Round 1: (a,b)=15 wins. Round 2:
    // (ab,</w>)=10. Round 3: (ab,c)=5 ties (c,</w>)=5 → lexicographic
    // 'ab' < 'c'. Round 4: (abc,</w>)=5. Round 5: nothing mergeable
    // (every word is one symbol) → training stops early.
    val merges = Bpe.train(Seq(("ab", 10L), ("abc", 5L)), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", Bpe.EndOfWord),
      ("ab", "c"), ("abc", Bpe.EndOfWord)), merges.toString)
  }

  test("encode merges in rank order, all occurrences, left to right") {
    val ranks = new java.util.HashMap[String, Integer]()
    Seq(("a", "b"), ("ab", Bpe.EndOfWord), ("ab", "c"),
      ("abc", Bpe.EndOfWord)).zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, i)
    }
    assert(Bpe.encodeWord("ab", ranks) == Vector("ab</w>"))
    assert(Bpe.encodeWord("abc", ranks) == Vector("abc</w>"))
    // unknown tail symbol stays unmerged
    assert(Bpe.encodeWord("abd", ranks) ==
      Vector("ab", "d", Bpe.EndOfWord))
    // repeated pair merges every occurrence in one round; then the
    // (ab,</w>) merge still applies to the word-final pair
    assert(Bpe.encodeWord("abab", ranks) == Vector("ab", "ab</w>"))
  }

  test("expression: reconstruction invariant + compression on fixture") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = TextAnalysis.learnBpeMerges(docs, "text",
      numMerges = 60, maxDictWords = 4096)
    assert(merges.size == 60)
    val got = TextAnalysis.withBpeTokens(docs, "text", merges)
      .select(col("doc_id"), col("text"), col("bpe"), col("bpe_count"))
      .collect()
    got.foreach { r =>
      val text = r.getString(1)
      val toks = r.getSeq[String](2)
      val words = Bpe.words(text)
      // tokens concatenate back to the tokenized words, exactly
      val rebuilt = toks.mkString("").split(java.util.regex.Pattern
        .quote(Bpe.EndOfWord)).toSeq.filter(_.nonEmpty)
      assert(rebuilt == words, s"doc ${r.getLong(0)} reconstruction")
      // one-to-? bounds: at least one token per word, at most
      // chars+1 per word, and merges must actually compress
      assert(toks.size >= words.size)
      assert(toks.size <= words.map(_.length + 1).sum)
    }
    val charTotal = got.map(_.getString(1).length.toLong).sum
    val tokTotal = got.map(_.getLong(3)).sum
    assert(tokTotal.toDouble / charTotal < 0.5,
      s"60 merges should at least halve char-level token count " +
        s"($tokTotal tokens / $charTotal chars)")
  }

  test("determinism: same corpus, same merges, codegen = interpreted") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val m1 = TextAnalysis.learnBpeMerges(docs, "text", 30, 1024)
    val m2 = TextAnalysis.learnBpeMerges(docs, "text", 30, 1024)
    assert(m1 == m2)
    val viaExpr = TextAnalysis.withBpeTokens(docs, "text", m1)
      .select(col("doc_id"), col("bpe")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // interpreted replay (driver-side Bpe.encodeWord) must agree
    val ranks = new java.util.HashMap[String, Integer]()
    m1.zipWithIndex.foreach { case ((a, b), i) => ranks.put(a + " " + b, i) }
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = Bpe.words(r.getString(1)).flatMap(Bpe.encodeWord(_, ranks))
      assert(viaExpr(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
    }
  }
}
