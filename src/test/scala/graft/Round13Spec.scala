package graft

import org.apache.spark.sql.functions._

/** Round-13 (optimization round 2) pins: the empty-term-list ranking
  * contract restored by the r13 ADVICE fix, and completeness of the
  * prefix-filtered Jaccard join at a ceil-hazard threshold (t·sz
  * landing on an integer in double arithmetic — 5·0.6 =
  * 3.0000000000000004 → an unguarded ceil shortens the prefix /
  * tightens the PPJoin bound by one and can drop boundary pairs).
  */
class Round13Spec extends SparkSpecBase {

  test("bm25/tfidf with an empty term list return empty frames, not an error") {
    val docs = Tables.load(spark, sfDir, "documents").limit(10)
    val bm = Ranking.bm25Scores(docs, "doc_id", "text", Seq.empty)
    assert(bm.columns.toSeq == Seq("doc_id", "score"))
    assert(bm.count() == 0L)
    val tf = Ranking.tfidfTopK(docs, "doc_id", "text", Seq.empty, k = 5)
    assert(tf.count() == 0L)
    // and the non-empty path is unchanged
    assert(Ranking.bm25Scores(docs, "doc_id", "text", Seq("the")).count() >= 0L)
  }

  test("prefix join stays complete at a ceil-hazard threshold (t=0.56)") {
    // t = 0.56 overshoots in double where the declared t = 0.6 happens
    // not to: 25·0.56 = 14.000000000000002 → unguarded ceil 15 shortens
    // A's prefix from 12 to 11; and alpha = (25+14)·(0.56/1.56) =
    // 14.000000000000002 → unguarded ceil 15 > the true bound 14, so
    // the exact-boundary pair fails the positional filter too. Both
    // 1e-9 guards must hold for the A–B pair below to survive.
    //
    // Shape: B ⊂ A, |B| = 14 shingles, |A| = 25 → J = 14/25 = 0.56
    // exactly. A's 11 unique shingles are corpus-rare (df 1) while the
    // 14 shared ones are pumped common by filler docs, so A's (df asc)
    // prefix starts with all 11 unique grams — an 11-long (unguarded)
    // prefix contains no shared gram and the pair is lost; the correct
    // 12-long prefix reaches the first shared gram. Ground truth is
    // the all-pairs exact Jaccard over the same hashed grams.
    val sp = spark
    import sp.implicits._
    val core = (1 to 16).map("w" + _).mkString(" ") // B: exactly 14 shingles
    val aText = (1 to 11).map("u" + _).mkString(" ") + " " + core // 25 shingles
    val texts = Seq((0L, core), (1L, aText)) ++ (2 to 4).map { i =>
      (i.toLong, s"f${i}a f${i}b " + core) // fillers pump shared df to 5
    }
    val docs = texts.toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(docs, shingleSize = 3, threshold = 0.56)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val g = Dedup.withHashedShingles(docs, "text", 3, "grams")
      .select(col("doc_id"), col("grams"))
    val a = g.select(col("doc_id").as("id1"), col("grams").as("ga"))
    val b = g.select(col("doc_id").as("id2"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val exact = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(inter.cast("double") /
          (size(col("ga")) + size(col("gb")) - inter), 6).as("j"))
      .filter(col("j") >= 0.56)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "fixture must produce boundary pairs")
    assert(got == exact,
      s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }
}
