package graft

import org.apache.spark.sql.functions._

/** Similarity search: LSH recall against the exact brute-force
  * baseline, determinism across runs (seeded hyperplanes).
  */
class AnnSpec extends SparkSpecBase {

  test("LSH ANN achieves reasonable recall@3 vs brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val approx = pairs(SimilaritySearch.lshTopK(queries, emb, 3, dims = 64,
      bands = 16, bitsPerBand = 4))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"recall@3 = $recall")
  }

  test("IVF ANN achieves recall@3 >= 0.9 on the isotropic test corpus") {
    // the synthetic embeddings carry NO cluster structure (pairwise
    // cos ~ 0, flat eigenspectrum), so a coarse quantizer needs a high
    // probe fraction here — 12/16 cells. The earlier 0.95-at-nprobe-6
    // figure was a seeding artifact: first-N-by-id seeds WERE the
    // query vectors. The clustered-corpus test below gates the real
    // ANN operating point (low probe fraction).
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val ivf = pairs(SimilaritySearch.ivfTopK(queries, emb, 3,
      numClusters = 16, nprobe = 12, kmeansIters = 2))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@3 = $recall")
    // every query returns exactly k candidates
    assert(ivf.groupBy(_._1).forall(_._2.size == 3))
  }

  test("IVF ANN: recall@3 >= 0.9 at nprobe=4/16 on a clustered corpus") {
    // deterministic clustered fixture: 16 seeded Gaussian centers,
    // 480 points = center(i % 16) + small noise — the structure real
    // embedding corpora have and the isotropic table lacks. Here the
    // coarse quantizer earns its keep: 4 of 16 cells probed (25% of
    // the corpus scanned) still clears 0.9 recall.
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val dims = 64
    val centers = Array.fill(16)(Array.fill(dims)(rng.nextGaussian()))
    val rows = (0 until 480).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(v => (v + 0.25 * rng.nextGaussian()).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val ivf = pairs(SimilaritySearch.ivfTopK(queries, emb, 3,
      numClusters = 16, nprobe = 4, kmeansIters = 2))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered IVF recall@3 = $recall")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("quantized search + exact rerank: recall@3 >= 0.95 vs float brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val quant = pairs(SimilaritySearch.bruteForceTopKQuantized(queries, emb, 3))
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"quantized recall@3 = $recall")
  }

  test("IVF-bucketed quantized search: recall@3 >= 0.95 vs float brute force") {
    // the 100 TB-shaped quantized path: cluster-probe candidates,
    // int8-code scoring, exact float rerank. The isotropic corpus
    // needs nprobe=14/16 to clear 0.95 (candidate-generation misses
    // dominate: plain IVF at nprobe=12 sits at ~0.92 here); the
    // clustered-corpus test below gates the real low-probe operating
    // point. The rerank recovers quantization-ranking noise, so recall
    // tracks the IVF candidate recall.
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val qivf = pairs(SimilaritySearch.quantizedIvfTopK(queries, emb, 3,
      numClusters = 16, nprobe = 14, kmeansIters = 2))
    val recall = qivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"quantized-IVF recall@3 = $recall")
    assert(qivf.groupBy(_._1).forall(_._2.size == 3))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("IVF-bucketed quantized search: recall@3 >= 0.9 at nprobe=4/16 on a clustered corpus") {
    // same clustered fixture as the IVF low-probe test — the operating
    // point real embeddings get: 25% of cells probed, int8 candidate
    // scoring, exact rerank.
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val dims = 64
    val centers = Array.fill(16)(Array.fill(dims)(rng.nextGaussian()))
    val rows = (0 until 480).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(v => (v + 0.25 * rng.nextGaussian()).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val qivf = pairs(SimilaritySearch.quantizedIvfTopK(queries, emb, 3,
      numClusters = 16, nprobe = 4, kmeansIters = 2))
    val recall = qivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered quantized-IVF recall@3 = $recall")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("LSH is deterministic across runs (seeded planes)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    def run() = SimilaritySearch.lshTopK(q, emb, 3, 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(run() == run())
  }

  test("brute force: self-similarity excluded, k respected, cos in [-1,1]") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val res = SimilaritySearch.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 5)
      .collect()
    assert(res.forall(r => r.getLong(0) != r.getLong(2)))
    assert(res.groupBy(_.getLong(0)).forall(_._2.length == 5))
    assert(res.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }
}
