package graft

import org.apache.spark.sql.functions._

/** Graph clustering (connected components) + BM25 ranking +
  * repetition filters: semantics on constructed inputs, where the
  * expected answer is known by hand, plus plan-shape checks for the
  * scale posture.
  */
class GraphRankingSpec extends SparkSpecBase {

  test("connected components: chains, cliques, and singleton-free output") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (a chain — worst case for propagation),
    // {10,11}, {20,21,22} (a triangle); node 99 appears in no edge
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: long path converges within the round budget") {
    val s = spark
    import s.implicits._
    // a 64-node path: diameter 63, but pointer jumping squares the
    // propagation distance per round, so ~log2(63) rounds suffice
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges, maxRounds = 10)
      .agg(count(lit(1)), countDistinct(col("component")),
        min(col("component")))
      .head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (64L, 1L, 0L))
  }

  test("connected components agree with union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 3).foreach { trial =>
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      // min-relabel: union-find roots are not necessarily the min id,
      // so normalize both sides by component member minimum
      val byRoot = truth.groupBy(_._2).map { case (_, m) =>
        val ids = m.keys.toSeq; val mn = ids.min; ids.map(_ -> mn)
      }.flatten.toMap
      val got = GraphOps.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == byRoot, s"trial $trial: $got vs $byRoot")
    }
  }

  test("dup clusters mark exactly one canonical per cluster") {
    val pairs = Dedup.ngramJaccardPairs(Tables.load(spark, sfDir, "documents"),
      shingleSize = 3, maxCharDiff = 20, threshold = 0.1)
    val clusters = GraphOps.dupClusters(pairs)
    val perCluster = clusters.groupBy(col("cluster_id"))
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"),
        count(lit(1)).as("sz"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getLong(1) == 1L, s"cluster ${r} canonical count")
      assert(r.getLong(2) >= 2L, "clusters come from pairs, so size >= 2")
    }
  }

  test("bm25: single-term corpus ranks by tf, respects k") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x x y y"), // tf(x)=3
      (2L, "x y y y y"), // tf(x)=1
      (3L, "x x y y y"), // tf(x)=2
      (4L, "y y y y y")  // no hit — must not appear
    ).toDF("doc_id", "text")
    val got = Ranking.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 10)
      .collect().map(r => r.getLong(0)).toSeq
    // equal doc lengths → score strictly increases with tf
    assert(got == Seq(1L, 3L, 2L))
  }

  test("bm25: rare term outranks common term at equal tf") {
    val s = spark
    import s.implicits._
    // 'rare' in 1 of 6 docs, 'common' in 5 of 6 — idf must dominate
    val docs = (1L to 4L).map(i => (i, "common filler filler")) ++
      Seq((5L, "rare filler filler"), (6L, "common filler filler"))
    val df = docs.toDF("doc_id", "text")
    val scores = Ranking.bm25TopK(df, "doc_id", "text",
        Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(5L) > scores(1L))
  }

  test("ANN-fed hybrid RRF overlaps the exact hybrid's top-k") {
    // the dense side comes from LSH candidates instead of the exact
    // cosine scan; fusion and the lexical side are identical, so the
    // top-k should largely agree (LSH recall bounds in AnnSpec) —
    // and the lexical-only hits agree exactly.
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val terms = Seq("vector", "spark", "merge")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Ranking.hybridRrfTopK(docs, emb, terms, 7L, k = 15))
    val ann = ids(Ranking.hybridRrfTopKAnn(docs, emb, terms, 7L, k = 15))
    val overlap = ann.intersect(exact).size.toDouble / exact.size
    assert(overlap >= 0.6, s"overlap@15 = $overlap ($ann vs $exact)")
    // the quantized-IVF dense side (the q_text_hybrid_ann default)
    val ivf = ids(Ranking.hybridRrfTopKIvf(docs, emb, terms, 7L, k = 15))
    val ivfOverlap = ivf.intersect(exact).size.toDouble / exact.size
    assert(ivfOverlap >= 0.6, s"ivf overlap@15 = $ivfOverlap ($ivf vs $exact)")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("repetition features: constructed repeats") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams: ab,ba,ab,ba,ab → top 3/5
      (2L, "q w e r t y"),   // all distinct
      (3L, "z z z z"),       // maximal repetition
      (4L, "only two")       // 1 bigram, 0 trigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got(0) == ((1L, 5L, 3L, 0.6, 0.5))) // trigrams: aba,bab,aba,bab → 2/4 dup
    assert(got(1) == ((2L, 5L, 1L, 0.2, 0.0)))
    assert(got(2) == ((3L, 3L, 3L, 1.0, 0.5))) // zzz,zzz → 1 distinct of 2
    assert(got(3) == ((4L, 1L, 1L, 1.0, 0.0))) // no trigrams → 0.0
  }

  test("plan shape: cc round and bm25 have no cartesian/BNLJ data joins") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cc = GraphOps.connectedComponents(edges, maxRounds = 2)
    val ccPlan = cc.queryExecution.executedPlan.toString
    assert(!ccPlan.contains("CartesianProduct"), ccPlan)

    val docs = Tables.load(spark, sfDir, "documents")
    val bm = Ranking.bm25TopK(docs, "doc_id", "text", Seq("vector"), k = 5)
    val bmPlan = bm.queryExecution.executedPlan.toString
    assert(!bmPlan.contains("CartesianProduct"), bmPlan)
    // the single-row stats frame rides a broadcast nested loop by
    // design; any OTHER nested loop would be a data-sized join bug
    assert(bmPlan.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, bmPlan)
  }
}
