package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star M5): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane LSH variant as the scale path.
  */
object SimilaritySearch {

  /** Exact top-k by cosine: broadcast the (small) query set against
    * the corpus, score with the codegen'd cosine expression, keep k
    * per query via a ranking window partitioned by query id.
    *
    * Scale: corpus-side stays fully partitioned (no shuffle until the
    * per-query top-k, which is bounded at k×|queries| rows after the
    * partial TakeOrdered); queries must fit a broadcast.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(numPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dims)(rng.nextGaussian().toFloat))
  }

  private def dotSign(vec: Column, plane: Array[Float]): Column = {
    val p = typedlit(plane)
    when(aggregate(zip_with(vec, p, (a, b) => a * b), lit(0.0d),
      (acc, x) => acc + x) > 0, 1L).otherwise(0L)
  }

  /** Sign-LSH bucketed ANN: `bands` signatures of `bitsPerBand` random
    * hyperplane sign bits; candidates share any band bucket; exact
    * cosine rerank keeps top-k. Recall/latency trade via bands ×
    * bitsPerBand. The candidate join is keyed by (band, bucket) —
    * the only shuffle, no cross join anywhere.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dims: Int,
      bands: Int = 8,
      bitsPerBand: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bands * bitsPerBand, dims, seed)

    def signature(df: DataFrame, idAs: String, embAs: String,
        bbAs: String): DataFrame = {
      val bandCols = (0 until bands).map { b =>
        val bits = (0 until bitsPerBand).map { j =>
          dotSign(col("embedding"), planes(b * bitsPerBand + j)) * (1L << j)
        }
        struct(lit(b).as("band"), bits.reduce(_ + _).as("bucket")).as(s"b$b")
      }
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          explode(array(bandCols: _*)).as(bbAs))
    }

    val qs = signature(queries, "query_id", "qe", "qbb")
    val cs = signature(corpus, "cand_id", "ce", "cbb")
    val cand = qs.join(cs, col("qbb") === col("cbb") &&
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("qe"), col("cand_id"), col("ce"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cand
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
  }
}
