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

  test("IVF ANN achieves reasonable recall@3 vs brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilaritySearch.bruteForceTopK(queries, emb, 3))
    val ivf = pairs(SimilaritySearch.ivfTopK(queries, emb, 3,
      numClusters = 16, nprobe = 6, kmeansIters = 2))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@3 = $recall")
    // every query returns exactly k candidates
    assert(ivf.groupBy(_._1).forall(_._2.size == 3))
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
