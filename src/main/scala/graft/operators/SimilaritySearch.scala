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

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the
    * corpus; queries probe the `nprobe` nearest centroids and exact-
    * rerank only those posting lists. The index is one extra int
    * column on the corpus (cluster id) — at 100TB the posting-list
    * join is a hash join on cluster id touching |corpus|×nprobe/k of
    * the data instead of all of it.
    *
    * Centroid assignment is a pure expression over a broadcast
    * literal of the (tiny) centroid table — per Lloyd iteration the
    * only shuffle is the mean recompute; an earlier crossJoin+window
    * formulation shuffled |corpus|×numClusters rows per iteration.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numClusters: Int = 16,
      nprobe: Int = 4,
      kmeansIters: Int = 2,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {

    // one materialization: every Lloyd iteration and the final index
    // read this instead of re-scanning the source
    val corpusCk = corpus.select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    val centroids = ivfCentroids(corpusCk, numClusters, kmeansIters, dims, seed)

    // no checkpoint on the index (r13): it is consumed exactly once —
    // by the probe join below — so materializing it was a pure extra
    // corpus pass + job (the assignment expression runs over the
    // already-checkpointed corpusCk either way). coalesce(…, -1)
    // never fires (k-nearest of a non-empty centroid set is total) but
    // makes the column NON-NULLABLE, so the join stops planting an
    // isnotnull Filter that would evaluate the centroid argmax a
    // second time per row (Filter + Project both carried it).
    val index = corpusCk
      .withColumn("cluster",
        coalesce(element_at(NearestCentroids(col("embedding"), centroids, 1), 1),
          lit(-1)))
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("cluster"))

    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(NearestCentroids(col("embedding"), centroids, nprobe))
          .as("cluster"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    probes.join(index, Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** k-means coarse-quantizer training shared by [[ivfTopK]] and
    * [[quantizedIvfTopK]]: seeded-hash pool draw + greedy k-center
    * spread, then `kmeansIters` Lloyd iterations. Returns the final
    * centroid snapshot (a tiny driver-side literal fused into the
    * codegen'd [[NearestCentroids]] argmax downstream).
    */
  /** Run an eager driver-side action with AQE off (r13): the centroid-
    * training actions below end in FIXED-size exchanges (a ≤8k-row
    * TakeOrdered, a numClusters-row aggregate) regardless of corpus
    * scale, so adaptive re-planning buys nothing while costing one
    * extra stage-job per exchange — at sf0.1 the ~0.15 s/job driver
    * floor made these the dominant cost of the IVF family. Scale-safe
    * by construction (the exchange payload is bounded by numClusters,
    * not data size); the probe/rerank QUERY plans keep AQE. Conf is
    * set/restored around the action — callers are single-threaded
    * query builders (Bench/Verify/oracle run queries sequentially).
    */
  private def withoutAqe[T](df: DataFrame)(f: => T): T = {
    val conf = df.sparkSession.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try f finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def ivfCentroids(
      corpusCk: DataFrame,
      numClusters: Int,
      kmeansIters: Int,
      dims: Int,
      seed: Long): Array[Array[Float]] = {
    // Seeding: a seeded-hash draw of an 8× candidate pool (TakeOrdered
    // over xxhash64(id, seed) — deterministic, fully parallel, no
    // corpus-order bias the way first-N-by-id seeding has), then a
    // driver-side greedy farthest-point (k-center) pass over that tiny
    // pool so the chosen seeds SPREAD: a plain uniform draw lands
    // multiple seeds in dense regions and recall@3 drops ~0.25 on the
    // test corpus; greedy spreading restores it. Pool is ≤ 8·k rows —
    // trivially driver-sized at any corpus scale.
    val pool: Array[Array[Double]] = withoutAqe(corpusCk) {
      corpusCk
        .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
        .limit(numClusters * 8)
        .select(col("embedding")).collect()
    }.map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(pool.nonEmpty, "ivfCentroids: empty corpus")
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      1.0 - dot / math.sqrt(na * nb + 1e-30)
    }
    val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
    val minDist = pool.map(cosDist(_, pool.head))
    while (chosen.size < math.min(numClusters, pool.length)) {
      val far = minDist.zipWithIndex.maxBy(_._1)._2
      chosen += pool(far)
      var i = 0
      while (i < pool.length) {
        val d = cosDist(pool(i), pool(far))
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }
    val centroids: Array[Array[Double]] = chosen.toArray

    // fused native argmax over a centroid snapshot — one codegen'd
    // pass per row (the composable transform+array_sort form ran
    // numClusters interpreted cosine HOFs plus an interpreted
    // comparator sort per row). Snapshot per call: the Lloyd loop
    // mutates `centroids` between iterations, and each plan must see
    // the values at build time, like the previous typedlit literals.
    def snap(): Array[Array[Float]] = centroids.map(_.map(_.toFloat))

    def assigned(df: DataFrame): DataFrame = df.withColumn("cluster",
      element_at(NearestCentroids(col("embedding"), snap(), 1), 1))

    // Lloyd iterations: map-only assign → recompute means. The mean
    // is `dims` scalar avg aggregates (one per dimension) — partial
    // aggregation happens map-side, so the per-iteration shuffle is
    // numClusters × dims partial sums, not |corpus| × dims exploded
    // rows as a posexplode formulation would move. Each iteration IS
    // a driver barrier (one job: assign-expression + agg + 16-row
    // collect) and a full corpus scan — a coarse quantizer converges
    // in 1-2 iterations (recall@3 measured flat at 0.95 for iters
    // 1..3 on the test corpus), so the default is 2, trading one
    // barrier + one 100TB scan for nothing.
    val meanCols = (0 until dims).map(i =>
      avg(element_at(col("embedding"), i + 1)).as(s"m$i"))
    for (_ <- 1 to kmeansIters) {
      val means = withoutAqe(corpusCk) {
        assigned(corpusCk)
          .groupBy(col("cluster"))
          .agg(meanCols.head, meanCols.tail: _*)
          .collect()
      }
      means.foreach { r =>
        centroids(r.getInt(0)) =
          Array.tabulate(dims)(i => r.getDouble(i + 1))
      }
    }
    snap()
  }

  /** Embedding-space cluster assignment — topic bucketing for corpus
    * curation: every vector is assigned to its nearest (cosine) seed
    * centroid. Seeds are the first `numClusters` corpus vectors by id,
    * so the operator is fully deterministic and oracle-checkable (the
    * iterated-k-means variant lives in [[ivfTopK]]; this is the
    * assignment primitive a pipeline uses to bucket documents by
    * topic, stratify mixtures, or shard an ANN index).
    *
    * Scale: the centroid table is a bounded driver-side literal
    * (≤ dozens of rows) fused into the codegen'd [[NearestCentroids]]
    * argmax — the corpus pass is map-only, zero shuffles, and the
    * downstream per-cluster accounting is an ordinary hash aggregate.
    */
  def clusterAssign(corpus: DataFrame, numClusters: Int = 8): DataFrame = {
    val seeds = corpus
      .orderBy(col("vec_id")).limit(numClusters)
      .select(col("vec_id").cast("long"), col("embedding")).collect()
    val seedIds: Seq[Long] = seeds.map(_.getLong(0)).toSeq
    val centroids: Array[Array[Float]] =
      seeds.map(_.getSeq[Float](1).toArray)
    // the label is the centroid's actual vec_id, not its position in
    // the collected array — corpora with 1-based or sparse ids would
    // otherwise get silently different labels than documented
    corpus.select(col("vec_id"),
      element_at(typedLit(seedIds),
        element_at(NearestCentroids(col("embedding"), centroids, 1), 1) + 1)
        .as("cluster"))
  }

  /** Scalar int8 quantization of the embedding column — the memory
    * lever for ANN at 100 TB: a 64-dim float32 vector (256 B) becomes
    * 64 int8s + one scale (~68 B), so 4× more index fits per executor
    * and the shuffle moves 4× less. Per-vector symmetric max-abs
    * scaling (the standard recipe): `scale = max|x| / 127`,
    * `q_i = round(x_i / scale)`. Everything is deterministic double
    * arithmetic — the oracle replays it element for element — and the
    * per-vector reconstruction MSE rides along so a pipeline can gate
    * on quantization loss.
    *
    * Map-only: zero shuffles, codegen'd higher-order expressions.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val x = col("embedding")
    val absMax = array_max(transform(x, v => abs(v.cast("double"))))
    val scale = greatest(absMax / 127.0, lit(1e-12))
    val q = transform(x, v => round(v.cast("double") / col("scale")).cast("int"))
    val err = aggregate(
      zip_with(x, col("q"), (v, qi) =>
        (v.cast("double") - qi.cast("double") * col("scale")) *
          (v.cast("double") - qi.cast("double") * col("scale"))),
      lit(0.0d), (acc, e) => acc + e) / size(x)
    emb.select(col("vec_id"), x, scale.as("scale"))
      .withColumn("q", q)
      .withColumn("recon_mse", round(err, 10))
      .select(col("vec_id"), round(col("scale"), 9).as("scale"),
        col("q"), col("recon_mse"))
  }

  /** Top-k retrieval over the INT8-QUANTIZED corpus with exact
    * rerank — the memory-bound search path [[quantizeInt8]] exists
    * for: candidates are scored on the int8 codes (cosine is
    * scale-invariant, so the per-vector scale cancels and the cheap
    * integer-code cosine IS the approximate score), the top
    * `rerankFactor`·k per query are joined back to the float vectors,
    * and the final k are exact. At 100 TB the quantized index is the
    * only thing resident; floats are touched for ≤ rerankFactor·k
    * rows per query.
    */
  def bruteForceTopKQuantized(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      rerankFactor: Int = 4): DataFrame = {
    val codes = quantizeInt8(corpus)
      .select(col("vec_id").as("cand_id"),
        transform(col("q"), _.cast("float")).as("cq"))
    val qcodes = quantizeInt8(queries)
      .select(col("vec_id").as("query_id"),
        transform(col("q"), _.cast("float")).as("qq"))
    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("cand_id"))
    val cands = codes.join(broadcast(qcodes),
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qq"), col("cq")).as("acos"))
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= k * rerankFactor)
      .select(col("query_id"), col("cand_id"))
    val ce = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cands
      .join(broadcast(qe), "query_id")
      .join(ce, "cand_id")
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** IVF-bucketed quantized search — the 100 TB shape of
    * [[bruteForceTopKQuantized]] (which scans every code per query by
    * design, as the named brute-force baseline): candidate GENERATION
    * is the IVF cluster probe, candidate SCORING runs on the int8
    * codes, and only the top `rerankFactor`·k per query touch the
    * float vectors for the exact rerank.
    *
    * Resident state at scale is the quantized index — (cluster, int8
    * codes): ~68 B/vector instead of 256 B — and the per-query work is
    * |corpus|·nprobe/numClusters code cosines, not a linear scan.
    * Cosine is scale-invariant, so the float query scores directly
    * against each candidate's codes (the per-vector scale cancels) and
    * queries never need quantizing. One keyed shuffle (cluster join),
    * two bounded windows, no cartesian anywhere.
    */
  def quantizedIvfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numClusters: Int = 16,
      nprobe: Int = 4,
      rerankFactor: Int = 4,
      kmeansIters: Int = 2,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    val corpusCk = corpus.select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    val centroids = ivfCentroids(corpusCk, numClusters, kmeansIters, dims, seed)

    // quantized index: cluster id + int8 codes, NO float embedding —
    // this is the only corpus-wide resident state
    val index = corpusCk
      .withColumn("cluster",
        coalesce(element_at(NearestCentroids(col("embedding"), centroids, 1), 1),
          lit(-1))) // non-nullable: see ivfTopK — kills the double-eval Filter
      .withColumn("scale", greatest(
        array_max(transform(col("embedding"), v => abs(v.cast("double")))) / 127.0,
        lit(1e-12)))
      .select(col("vec_id").as("cand_id"), col("cluster"),
        transform(col("embedding"),
          v => round(v.cast("double") / col("scale")).cast("float")).as("cq"))
    // (r13) no checkpoint: consumed exactly once by the probe join —
    // the quantize+assign expressions run over checkpointed corpusCk

    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(NearestCentroids(col("embedding"), centroids, nprobe))
          .as("cluster"))

    // approx scores on codes; each candidate lives in exactly one
    // cluster, so (query, cand) pairs are unique — no distinct needed
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("cand_id"))
    val cands = probes.join(index, Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("cq")).as("acos"))
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= k * rerankFactor)
      .select(col("query_id"), col("cand_id"))

    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val ce = corpusCk.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cands
      .join(broadcast(qe), "query_id")
      .join(ce, "cand_id")
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
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

    // signatures carry ids ONLY — exploding the embedding array
    // `bands` times and running distinct() over float arrays would
    // multiply shuffle volume by the band count (same skinny-candidate
    // rule as Dedup.minhashNearDups). All bands' buckets come from the
    // fused native SignLshBuckets expression: one pass over the
    // vector, zero per-plane array allocations.
    def signature(df: DataFrame, idAs: String, bbAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
          posexplode(SignLshBuckets(col("embedding"), planes, bitsPerBand)))
        .select(col(idAs),
          struct(col("pos").as("band"), col("col").as("bucket")).as(bbAs))

    val qs = signature(queries, "query_id", "qbb")
    val cs = signature(corpus, "cand_id", "cbb")
    val cand = qs.join(cs, col("qbb") === col("cbb") &&
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"))
      .distinct()
    // embeddings join back onto the deduped id pairs (queries side
    // broadcast-small by construction)
    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val ce = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    cand.join(broadcast(qe), "query_id").join(ce, "cand_id")
      .select(col("query_id"), col("cand_id"),
        GraftFunctions.arrayCosineSimilarity(col("qe"), col("ce")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos"))
  }
}
