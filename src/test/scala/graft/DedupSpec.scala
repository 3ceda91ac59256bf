package graft

import org.apache.spark.sql.functions._

/** Dedup family: exact semantics, MinHash recall against exact
  * Jaccard, SimHash behavior on identical/near-identical texts.
  */
class DedupSpec extends SparkSpecBase {

  test("exact dedup collapses duplicated rows to min id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", Seq("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 1L)))
  }

  test("minhash LSH finds high-jaccard pairs (recall on j>=0.5)") {
    val docs = Tables.load(spark, sfDir, "documents")
    // Ground truth: the oracle-backed exact operator (q_dedup_ngram
    // hash-matches DuckDB's all-pairs SQL every round), run at the
    // same threshold with the size prefilter disabled — cross-operator
    // truth instead of a second self-computed all-pairs join. The lang
    // column is neutralized because ngramJaccardPairs blocks on
    // language while minhash is lang-agnostic (this corpus repeats
    // identical texts across languages, so the universes differ).
    val exact = Dedup.ngramJaccardPairs(
        docs.withColumn("lang", lit("x")), shingleSize = 3,
        maxCharDiff = Int.MaxValue, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands × 2 rows: P(candidate | j=0.5) = 1-(1-0.25)^16 ≈ 0.99
    if (exact.nonEmpty)
      assert(lsh.intersect(exact).size.toDouble / exact.size >= 0.9,
        s"recall too low: ${lsh.intersect(exact).size}/${exact.size}")
    // precision: every reported pair really has j >= 0.5 (verified
    // exactly inside minhashNearDups) and appears in the exact set
    // (ngram truth is same-language only; a cross-language j>=0.5
    // trigram pair does not occur in this corpus)
    assert(lsh.subsetOf(exact))
  }

  test("simhash: identical text → hamming 0; near-identical → small") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, base), (2L, base), (3L, base + " extra"),
      (4L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val sims = df.select(col("doc_id"), Dedup.simhash32(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) <= 6)
    // the near-dup operator bands the 64-bit fingerprint — check its
    // pairs against the same-width hamming
    val sims64 = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims64(1L) == sims64(2L))
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)) || java.lang.Long.bitCount(sims64(1L) ^ sims64(4L)) <= 3)
  }

  test("simhash: exact duplicates are always found (recall 1.0 on copies)") {
    // quantified check for the no_oracle q_dedup_simhash row: byte-
    // identical texts share the full fingerprint, so every chunk
    // collides and the pair MUST surface with hamming 0 — pigeonhole
    // recall on exact copies is deterministic, not probabilistic.
    val docs = Tables.load(spark, sfDir, "documents")
    val copies = docs.limit(50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val corpus = docs.limit(50).unionByName(copies)
    val pairs = Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 0)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.limit(50).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missing exact-copy pairs: ${expected.diff(pairs).take(5)}")
  }

  test("prefix-filtered jaccard join equals all-pairs at the threshold") {
    val docs = Tables.load(spark, sfDir, "documents").limit(80)
      .localCheckpoint()
    val got = Dedup.prefixJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // ground truth: all-pairs jaccard over the same hashed grams
    val g = Dedup.withHashedShingles(
        docs.filter(size(split(col("text"), " ")) >= 3), "text", 3, "grams")
      .select(col("doc_id"), col("grams")).filter(size(col("grams")) > 0)
    val a = g.select(col("doc_id").as("id1"), col("grams").as("ga"))
    val b = g.select(col("doc_id").as("id2"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val exact = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(inter.cast("double") /
          (size(col("ga")) + size(col("gb")) - inter), 6).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == exact,
      s"prefix join must be exact: missing=${(exact.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- exact.keySet).take(3)}")
  }

  test("embedding near-dups agree with brute-force cosine at threshold") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val pairs = Dedup.embeddingNearDups(emb, 0.3)
    // spot-verify one pair's cosine against a driver-side computation
    val row = pairs.orderBy(col("id1"), col("id2")).limit(1).collect()
    if (row.nonEmpty) {
      val (id1, id2, cos) = (row(0).getLong(0), row(0).getLong(1), row(0).getDouble(2))
      val vecs = emb.filter(col("vec_id").isin(id1, id2))
        .orderBy("vec_id").collect()
        .map(_.getSeq[Float](1).toArray)
      val dot = vecs(0).zip(vecs(1)).map { case (a, b) => a.toDouble * b }.sum
      val n1 = math.sqrt(vecs(0).map(x => x.toDouble * x).sum)
      val n2 = math.sqrt(vecs(1).map(x => x.toDouble * x).sum)
      assert(math.abs(cos - dot / (n1 * n2)) < 1e-5)
    }
  }

  test("embeddingNearDups threshold-dispatch: banded at t>=0.8, grid when exact or loose") {
    // the checkpointed plans are opaque (LogicalRDD), so the routing
    // decision itself is the unit under test
    assert(Dedup.dispatchesToBanded(0.9, exact = false))
    assert(Dedup.dispatchesToBanded(0.8, exact = false))
    assert(!Dedup.dispatchesToBanded(0.9, exact = true),
      "exact=true must keep the complete grid")
    assert(!Dedup.dispatchesToBanded(0.4, exact = false),
      "loose thresholds keep the complete grid")
    // dispatched and exact agree on an engineered high-cosine pair
    val sp = spark
    import sp.implicits._
    val base = Array.tabulate(64)(i => (1.0f / 8.0f) * (if (i % 2 == 0) 1 else -1))
    val twin = base.clone(); twin(0) = twin(0) * 0.9f
    val tiny = Seq((1L, base.toSeq, 0), (2L, twin.toSeq, 0),
      (3L, base.map(-_).toSeq, 0)).toDF("vec_id", "embedding", "label")
    val dis = Dedup.embeddingNearDups(tiny, 0.9).collect()
    val exa = Dedup.embeddingNearDups(tiny, 0.9, exact = true).collect()
    assert(dis.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      exa.map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(exa.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("banded embedding near-dup recovers noised twins (recall >= 0.9), no false cosines") {
    // the 100 TB high-threshold path: probabilistic candidates, exact
    // verify. Engineered twins at cos ~0.93 (noise scale 0.05 on unit-norm vectors) must be
    // recovered; every reported pair's cosine is exact-verified so
    // precision is 1.0 by construction — assert the verify holds.
    val sp = spark
    import sp.implicits._
    val base = Tables.load(spark, sfDir, "embeddings").limit(200)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
    val rng = new scala.util.Random(11)
    val rows = base.flatMap { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1)
      val lab = r.getInt(2)
      val noised = v.map(x => x + 0.05f * rng.nextGaussian().toFloat)
      Seq((id, v, lab), (id + 1000000L, noised, lab))
    }.toSeq
    val twin = rows.toDF("vec_id", "embedding", "label")
    val got = Dedup.bandedEmbeddingNearDups(twin, threshold = 0.85).collect()
    assert(got.forall(_.getDouble(2) >= 0.85))
    val found = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = base.map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val recall = found.intersect(expected).size.toDouble / expected.size
    assert(recall >= 0.9, s"banded embedding recall = $recall")
  }

  test("incremental dedup: exact beats near, near needs the threshold") {
    val s = spark
    import s.implicits._
    def row(id: Long, text: String) =
      (id, text, "en", text.length.toLong)
    val corpus = Seq(
      row(10L, "alpha beta gamma delta epsilon zeta eta theta"),
      row(11L, "one two three four five six seven eight nine ten"),
      row(12L, "totally unrelated corpus content words here")).toDF(
      "doc_id", "text", "lang", "n_chars")
    val batch = Seq(
      // exact copy of corpus 10 (and trivially near it too — exact wins)
      row(0L, "alpha beta gamma delta epsilon zeta eta theta"),
      // near-dup of corpus 11: one word changed
      row(1L, "one two three four five six seven eight nine wolf"),
      // fresh content
      row(2L, "completely novel document with its own words entirely")).toDF(
      "doc_id", "text", "lang", "n_chars")
    val got = Dedup.incrementalDedup(batch, corpus, shingleSize = 3,
        maxCharDiff = 20, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.toString.toLong),
          Option(r.get(3)).map(_.toString.toDouble)))).toMap
    assert(got(0L)._1 == "exact_dup" && got(0L)._2 == Some(10L) &&
      got(0L)._3 == Some(1.0))
    assert(got(1L)._1 == "near_dup" && got(1L)._2 == Some(11L) &&
      got(1L)._3.get >= 0.5 && got(1L)._3.get < 1.0)
    assert(got(2L) == (("keep", None, None)))
    // one-directional: corpus docs are never screened or returned
    assert(got.keySet == Set(0L, 1L, 2L))
  }

  test("incremental embedding dedup: twins flagged, fresh kept") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    def unit(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n).toSeq
    }
    val corpus = (0 until 30).map(i => (i.toLong, unit(i), i % 3))
      .toDF("vec_id", "embedding", "label")
    // batch: 15 noised twins of corpus vectors + 15 fresh directions
    val batch = ((0 until 15).map { i =>
      val v = unit(i).map(x => x + 0.04f * rng.nextGaussian().toFloat)
      (1000L + i, v, i % 3)
    } ++ (0 until 15).map(i => (2000L + i, unit(10000 + i), i % 3)))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.incrementalEmbeddingDedup(batch, corpus,
        threshold = 0.85)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(got.size == 30, "one row per batch vector")
    val twinHits = (0 until 15).count(i => got(1000L + i) == ((true, i.toLong)))
    assert(twinHits >= 14, s"twin recall $twinHits/15")
    // fresh random 64-d directions are nowhere near cos 0.85
    (0 until 15).foreach(i =>
      assert(got(2000L + i) == ((false, -1L)), s"fresh ${2000 + i} flagged"))
  }
}
