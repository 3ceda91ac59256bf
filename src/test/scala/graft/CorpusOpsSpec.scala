package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.rawConcat

/** Corpus-management operators: reproducible sampling, splitting,
  * and token-budget packing.
  */
class CorpusOpsSpec extends SparkSpecBase {

  test("stratified sample is reproducible and near the target fraction") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s1 = CorpusOps.stratifiedSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = CorpusOps.stratifiedSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must be byte-identical across runs")
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction $frac far from 0.2")
    // growing the fraction keeps prior rows (nested samples)
    val s3 = CorpusOps.stratifiedSample(docs, "doc_id", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3), "samples must be nested as fraction grows")
  }

  test("hash split is disjoint, total, and near the target ratios") {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val counts = CorpusOps.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n, "split must be total")
    assert(counts("train").toDouble / n > 0.8, counts.toString)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("budget packing: every shard fits budget + one overflowing doc") {
    val docs = Tables.load(spark, sfDir, "documents")
    val budget = 10000L
    val shards = CorpusOps.packByBudget(docs, "lang", "doc_id",
        "n_chars", budget)
      .groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_chars")).as("total"), max(col("n_chars")).as("mx"))
      .collect()
    shards.foreach { r =>
      val total = r.getLong(2); val mx = r.getLong(3)
      assert(total <= budget + mx,
        s"shard ${r.get(0)}/${r.get(1)} holds $total > budget+$mx")
    }
    // shards are contiguous per group starting at 0
    val perLang = shards.groupBy(_.getString(0))
    perLang.foreach { case (lang, rs) =>
      val ids = rs.map(_.getLong(1)).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"$lang shards not contiguous: $ids")
    }
  }

  test("contamination report flags exactly the overlapping docs, broadcast-side eval") {
    val s = spark
    import s.implicits._
    val evalDocs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "xx alpha beta gamma delta epsilon yy"), // shares 1 5-gram
      (101L, "alpha beta gamma other words here"),    // shares none (4-gram max)
      (102L, "totally unrelated text about sparks and rows")
    ).toDF("doc_id", "text")
    val rep = CorpusOps.contaminationReport(corpus, evalDocs, n = 5)
    val got = rep.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(100L -> 1L))
    // scale shape: the eval gram set must ride a broadcast hash join
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("temperature mix flattens source shares toward uniform") {
    val docs = Tables.load(spark, sfDir, "documents")
    val natural = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = CorpusOps.temperatureMix(docs, "source", "doc_id",
        temperature = 2.0, fraction = 0.5)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source survives, and the kept SHARE of a small source
    // exceeds its natural share (T>1 upweights the tail)
    assert(mixed.keySet == natural.keySet)
    val nTot = natural.values.sum.toDouble
    val mTot = mixed.values.sum.toDouble
    val smallest = natural.minBy(_._2)._1
    val largest = natural.maxBy(_._2)._1
    if (smallest != largest && natural(smallest) < natural(largest)) {
      assert(mixed(smallest) / mTot >= natural(smallest) / nTot,
        s"small source share must not shrink: $natural -> $mixed")
    }
    // deterministic: same call, same rows
    val again = CorpusOps.temperatureMix(docs, "source", "doc_id", 2.0, 0.5)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == mixed)
  }

  test("oov report: known vocabulary and rates") {
    val s = spark
    import s.implicits._
    // 'common' appears 5x (>= minFreq), everything else is OOV
    val docs = Seq(
      (1L, "en", "common common common rare1"),
      (2L, "en", "common common rare2 rare3")
    ).toDF("doc_id", "lang", "text")
    val got = CorpusOps.oovReport(docs, minFreq = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // 8 tokens, 3 OOV (rare1, rare2, rare3) → 0.375
    assert(got == Seq(("en", 2L, 8L, 0.375)))
  }

  test("pii redaction replaces and counts every category, leaves clean text alone") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e.org call 555-123-4567 ip 10.0.0.1"),
      (2L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val got = CorpusOps.redactPii(docs).orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getString(1) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP>")
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4)) == ((2L, 1L, 1L)))
    val r2 = got(1)
    assert(r2.getString(1) == "nothing sensitive here at all")
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) == ((0L, 0L, 0L)))
  }

  test("token chunking: stride windows, short-doc single chunk, full coverage") {
    val s = spark
    import s.implicits._
    val words = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "a b c")).toDF("doc_id", "text")
    val got = CorpusOps.chunkByTokens(docs, chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: 50 tokens → chunks at 0 and 24 (stride 24): sizes 32, 26
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(d1.map(_.getLong(3)).toSeq == Seq(32L, 26L))
    assert(d1(0).getString(2).startsWith("w1 ") &&
      d1(1).getString(2).startsWith("w25 ") &&
      d1(1).getString(2).endsWith(" w50"))
    // short doc: exactly one chunk with every token
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(2) == "a b c" &&
      d2(0).getLong(3) == 3L)
  }

  test("duplicate spans: shared 5-gram found cross-doc, unique docs score zero") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared zeta eta"),
      (2L, s"prefix words here $shared"),
      (3L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, spanWords = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: 3 spans, 1 shared; doc2: 4 spans, 1 shared; doc3: 4 spans, 0
    assert(got == Seq((1L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 0L)))
  }

  test("duplicate-span removal cuts exactly the shared tokens, rebuilds order") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared zeta eta"),
      (2L, s"prefix words here $shared"),
      (3L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, spanWords = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, "zeta eta", 7L, 5L),           // shared prefix removed
      (2L, "prefix words here", 8L, 5L),  // shared suffix removed
      (3L, "totally different content with no overlap at all", 8L, 0L)))
  }

  test("source-quality gate: filtered corpus = docs of passing sources, broadcast semi-join") {
    val docs = Tables.load(spark, sfDir, "documents")
    val report = CorpusOps.sourceQualityReport(docs, minAvgQuality = 0.8)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    val kept = CorpusOps.filterBySourceQuality(docs, minAvgQuality = 0.8)
    val keptSources = kept.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(keptSources == report.filter(_._2).keySet)
    assert(kept.count() ==
      docs.filter(col("source").isin(keptSources.toSeq: _*)).count())
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan)
  }

  test("surgical decontamination cuts only eval-overlapping spans") {
    val s = spark
    import s.implicits._
    val leak = "alpha beta gamma delta epsilon"
    val evalDocs = Seq((1L, s"benchmark question $leak answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, s"intro $leak outro words"),
      (101L, "completely clean document with no leaked content here")
    ).toDF("doc_id", "text")
    val got = Dedup.removeContaminatedSpans(corpus, evalDocs, spanWords = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq(
      (100L, "intro outro words", 5L),
      (101L, "completely clean document with no leaked content here", 0L)))
  }

  test("per-source cap: bound respected, survivors deterministic and unbiased") {
    val docs = Tables.load(spark, sfDir, "documents")
    val capped = CorpusOps.capPerSource(docs, "doc_id", cap = 10)
    val bySource = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.values.forall(_ <= 10), bySource.toString)
    // sources under the cap keep everything
    val natural = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    natural.foreach { case (src, n) =>
      assert(bySource(src) == math.min(n, 10L), s"$src: $n -> ${bySource(src)}")
    }
    // deterministic across runs
    val ids1 = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusOps.capPerSource(docs, "doc_id", cap = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // hash order, not id order: survivors are not simply the lowest ids
    assert(ids1 != docs.select("doc_id").collect().map(_.getLong(0))
      .sorted.take(ids1.size).toSet)
  }

  test("bloom decontamination: no false negatives vs exact, bounded over-flag") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") >= 20)
    val evalSet = docs.filter(col("doc_id") < 20)
    val exact = CorpusOps.contaminationReport(corpus, evalSet, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = CorpusOps.bloomDecontaminate(corpus, evalSet, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided error: every exactly-contaminated doc must be flagged,
    // with a flagged-gram count >= the true shared-gram count
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"doc $id contaminated but not flagged")
      assert(bloom(id) >= nShared,
        s"doc $id flagged ${bloom(id)} < exact $nShared")
    }
    // false positives bounded: at fpp=0.01 the flagged population
    // shouldn't balloon (generous 2x + 10-doc slack vs exact)
    assert(bloom.size <= exact.size * 2 + 10,
      s"bloom flagged ${bloom.size} docs vs exact ${exact.size}")
  }

  test("deterministic shuffle: reproducible permutation, balanced shards") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = CorpusOps.deterministicShuffle(docs, "doc_id")
      .select("doc_id", "shard", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val b = CorpusOps.deterministicShuffle(docs, "doc_id")
      .select("doc_id", "shard", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b), "shuffle must be byte-identical across runs")
    assert(a.map(_._1).distinct.length == a.length, "must be a permutation")
    // hash order must differ from id order (it's a shuffle, not a sort)
    val keyOrderedIds = a.sortBy(_._3).map(_._1).toSeq
    assert(keyOrderedIds != keyOrderedIds.sorted, "order not shuffled")
    val shardCounts = a.groupBy(_._2).map(_._2.length)
    assert(shardCounts.size == 8 && shardCounts.min > a.length / 16,
      s"shards unbalanced: $shardCounts")
  }

  test("epoch materialization: copies realize the plan's token target") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = CorpusOps.epochPlan(docs, "source", "n_chars", 2.0, 1000000L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("toks"), r.getAs[Long]("target_toks"),
          r.getAs[Double]("epochs")))).toMap
    val mat = CorpusOps.materializeEpochs(docs, "source")
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("got_toks"),
        max(col("epoch_copy")).as("max_copy"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2)))).toMap
    assert(mat.keySet == plan.keySet.filter(s => plan(s)._3 >= 0.5),
      "sources with epochs < fractional floor may vanish only if ~0")
    mat.foreach { case (src, (gotToks, maxCopy)) =>
      val (_, target, epochs) = plan(src)
      // realized tokens within 15% of the plan target (the fractional
      // pick is per-doc, so realization error is doc-granular)
      assert(math.abs(gotToks - target).toDouble / target < 0.15,
        s"$src realized $gotToks vs target $target")
      assert(maxCopy == math.ceil(epochs).toInt ||
        maxCopy == math.floor(epochs).toInt, s"$src copies $maxCopy")
    }
  }

  test("span corruption: sentinel numbering and lossless round-trip") {
    val docs = Tables.load(spark, sfDir, "documents").limit(80)
    val got = CorpusOps.spanCorrupt(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .collect()
    assert(got.length == 80)
    got.foreach { r =>
      val (nMasked, input, target, text) = (r.getLong(1),
        Option(r.getString(2)).getOrElse(""),
        Option(r.getString(3)).getOrElse(""), r.getString(4))
      // reconstruct: substitute each <extra_id_k> in the input with
      // that sentinel's span from the target
      val spans = "<extra_id_(\\d+)> ((?:(?!<extra_id_)\\S+ ?)+)".r
        .findAllMatchIn(target)
        .map(m => m.group(1).toInt -> m.group(2).trim).toMap
      val rebuilt = "<extra_id_(\\d+)>".r.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      assert(rebuilt == text, s"doc ${r.getLong(0)} round-trip")
      // corruption rate: exactly the masked-class positions
      val n = text.split(" ").length
      val s = (r.getLong(0) % 7).toInt
      val expectMasked = (0 until n).count(i => ((i + s) % 7) == 3 ||
        (((i + s) % 7) == 4 && i >= 1))
      assert(nMasked == expectMasked, s"doc ${r.getLong(0)} rate")
    }
  }

  test("DSIR fused featurizer = composable HOF formulation, per doc") {
    // DsirBuckets must be multiset-identical to the oracle-replayable
    // composition (unigrams ++ bigrams, per-char poly fold) — the
    // fused expression replaced it for the measured O(words²) lambda
    // recompute; this pins hash identity including the 31^|w| bigram
    // continuation identity.
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    val words = filter(split(lower(col("text")), "[^a-z0-9]+"),
      t => t =!= "")
    val bigrams = when(size(words) >= 2,
        transform(sequence(lit(1), size(words) - 1),
          i => rawConcat(element_at(words, i), lit(" "),
            element_at(words, i + 1))))
      .otherwise(typedlit(Seq.empty[String]))
    val slow = docs
      .select(col("doc_id"), explode(rawConcat(words, bigrams)).as("gram"))
      .select(col("doc_id"),
        (aggregate(split(col("gram"), ""), lit(0L),
          (a, c) => (a * 31 + ascii(c)) % 2147483647L) % 256).as("b"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    val fast = docs
      .select(col("doc_id"), explode(DsirBuckets(col("text"), 256)).as("b"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(fast.keySet == slow.keySet)
    fast.keySet.foreach(id =>
      assert(fast(id) == slow(id), s"doc $id bucket multiset"))
  }

  test("DSIR: target-distribution docs outscore off-target docs") {
    val s = spark
    import s.implicits._
    // two disjoint vocabularies; the target corpus speaks vocabulary A.
    // Raw = 20 A-docs + 20 B-docs (ids interleaved so selection isn't
    // an id-order artifact). DSIR must rank every A-doc above every
    // B-doc and the top-k flag must pick exactly the A-docs.
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("zork", "quux", "fnord", "blorp", "wibble")
    def doc(v: Seq[String], salt: Int): String =
      (0 until 12).map(i => v((i + salt) % v.length)).mkString(" ")
    val raw = (0 until 40).map { i =>
      val a = i % 2 == 0
      (i.toLong, doc(if (a) vocabA else vocabB, i), a)
    }.toDF("doc_id", "text", "is_target_like")
    val target = (100 until 110).map(i =>
      (i.toLong, doc(vocabA, i))).toDF("doc_id", "text")
    val got = CorpusOps.dsirResample(raw, target, k = 20)
      .join(raw.select("doc_id", "is_target_like"), "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("logw"), r.getAs[Boolean]("selected"),
        r.getAs[Boolean]("is_target_like")))
    val (aDocs, bDocs) = got.partition(_._4)
    assert(aDocs.map(_._2).min > bDocs.map(_._2).max,
      "every target-vocabulary doc must outweigh every off-target doc")
    assert(got.forall(r => r._3 == r._4),
      "top-20 selection must be exactly the target-like docs")
    // determinism: a second run is value-identical
    val again = CorpusOps.dsirResample(raw, target, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(again.sameElements(
      got.map(r => (r._1, r._2)).sortBy(_._1)), "scores must be stable")
  }
}
