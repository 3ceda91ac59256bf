package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.rawConcat

/** Corpus-management operators for training-data pipelines:
  * reproducible sampling, train/val/test splitting, and token-budget
  * shard packing. All three are DETERMINISTIC (no engine RNG) so runs
  * are reproducible and every operator is oracle-checkable — the same
  * arithmetic runs identically in any SQL engine.
  *
  * The mixing hash is multiplicative over a pre-reduced id:
  * `pmod(pmod(id, 1000003) * 40503 + seed, modulus)`. Reducing by the
  * prime first keeps the product far from Long overflow (ANSI mode
  * would throw) for ids up to any realistic 100 TB key range, while
  * the multiplier de-correlates the bucket from id locality (plain
  * `id % 100` would put every 100th row in the sample — fine for
  * synthetic ids, catastrophic for block-allocated ones).
  */
object CorpusOps {

  /** bucket in [0, modulus) — deterministic, engine-portable. */
  def mixBucket(id: Column, seed: Int, modulus: Int): Column =
    pmod(pmod(id, lit(1000003L)) * 40503L + seed, lit(modulus.toLong))

  /** Reproducible stratified sample: keep ~`fraction` of each stratum.
    * Map-only (one filter expression), no shuffle, no RNG state — at
    * 100 TB this is a pushdown-friendly scan filter, and re-running
    * it yields byte-identical samples.
    */
  def stratifiedSample(df: DataFrame, idCol: String,
      fraction: Double, seed: Int = 17): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(mixBucket(col(idCol), seed, 10000) <
      lit((fraction * 10000).round))
  }

  /** Deterministic train/val/test split: one `split` label column,
    * assigned by the id's mix bucket. Map-only, reproducible, and
    * disjoint-and-total by construction (the three ranges partition
    * [0, 100)).
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
      valPct: Int = 5, seed: Int = 29): DataFrame = {
    require(trainPct + valPct <= 100 && trainPct >= 0 && valPct >= 0)
    val b = mixBucket(col(idCol), seed, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Temperature-based mixture resampling — the data-mixing step of a
    * pre-training pipeline (public recipe from the multilingual /
    * multi-source training literature: sampling weight ∝ share^(1/T),
    * T > 1 flattens toward uniform across sources, T = 1 keeps natural
    * proportions). Deterministic: the per-source keep rate is computed
    * from exact counts, and membership uses the same mix-hash as
    * [[stratifiedSample]], so the resample is reproducible and
    * oracle-checkable — no engine RNG.
    *
    * Per source s with count c_s: w_s = c_s^(1/T); keep rate
    * p_s = min(1, f·N·(w_s/Σw) / c_s), rounded to 6 decimals so both
    * engines derive an identical integer threshold. The rate table is
    * one row per source (broadcast); the corpus side is a map-only
    * filter — no shuffle of the data being sampled.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      temperature: Double, fraction: Double, seed: Int = 37): DataFrame = {
    require(temperature > 0 && fraction >= 0 && fraction <= 1)
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("cs"))
    val tot = counts.agg(sum(col("cs")).as("n"),
      sum(pow(col("cs"), lit(1.0 / temperature))).as("sw"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        round(least(lit(1.0),
          lit(fraction) * col("n") * (pow(col("cs"), lit(1.0 / temperature)) / col("sw")) / col("cs")),
          6).as("p"))
    df.join(broadcast(rates), sourceCol)
      .filter(mixBucket(col(idCol), seed, 1000000) <
        round(col("p") * 1000000).cast("long"))
      .drop("p")
  }

  /** Mixture epoch plan — the budgeting step of data mixing (public
    * recipe shape: temperature-derived source weights over a fixed
    * training-token budget, with the per-source repeat factor
    * "epochs" = target tokens / available tokens; >1 means the source
    * repeats, the regime the data-constrained scaling literature
    * reasons about). Pure planning arithmetic over per-source
    * aggregates: one source-keyed hash aggregate (tiny result) plus a
    * broadcast single-row total — deterministic via 6-dp rounding +
    * exact decimal weight normalization, so the plan table is
    * oracle-checkable and identical on any engine.
    *
    * @return (source, n_docs, toks, weight, target_toks, epochs)
    */
  def epochPlan(df: DataFrame, sourceCol: String, tokensCol: String,
      temperature: Double, budget: Long): DataFrame = {
    require(temperature > 0 && budget > 0)
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("toks"))
    val pw = round(pow(col("toks"), lit(1.0 / temperature)), 6)
      .cast("decimal(30,10)")
    val tot = counts.agg(sum(pw).as("sw"))
    counts.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("toks"),
        round((pw / col("sw")).cast("double"), 6).as("weight"))
      .withColumn("target_toks",
        round(col("weight") * budget).cast("bigint"))
      .withColumn("epochs",
        round(col("target_toks").cast("double") / col("toks"), 4))
  }

  /** Materialize the [[epochPlan]]: expand every document into its
    * actual training copies — `floor(epochs)` whole passes per source
    * plus one extra copy for a deterministic seeded-hash fraction of
    * its docs, so each source's expected token count hits the plan's
    * target. Zero RNG: the fractional pick is an integer LCG on
    * doc_id (`(doc_id·2654435761 + seed) mod 1000003 < frac·1000003`),
    * replayable in the SQL oracle.
    *
    * Output: (doc_id, source, epoch_copy) — one row per training
    * appearance, epoch_copy 1..copies.
    *
    * Scale: the plan is a per-source table (broadcast); expansion is
    * a map-only explode of a ≤⌈epochs⌉-element sequence per doc. The
    * output IS the training list — feed it to
    * [[deterministicShuffle]] + [[packByBudget]].
    */
  def materializeEpochs(df: DataFrame, sourceCol: String,
      idCol: String = "doc_id", tokensCol: String = "n_chars",
      temperature: Double = 2.0, budget: Long = 1000000L,
      seed: Int = 97): DataFrame = {
    val plan = epochPlan(df, sourceCol, tokensCol, temperature, budget)
      .select(col(sourceCol), col("epochs"))
    val full = floor(col("epochs")).cast("int")
    val frac = col("epochs") - floor(col("epochs"))
    val u = pmod(col(idCol).cast("long") * 2654435761L + seed, lit(1000003L))
    val copies = (full +
      when(u.cast("double") < frac * 1000003L, 1).otherwise(0)).as("copies")
    df.select(col(idCol), col(sourceCol))
      .join(broadcast(plan), sourceCol)
      .select(col(idCol), col(sourceCol), copies)
      .select(col(idCol), col(sourceCol),
        explode(when(col("copies") >= 1,
          sequence(lit(1), col("copies")))
          .otherwise(typedlit(Seq.empty[Int]))).as("epoch_copy"))
  }

  /** Benchmark decontamination: flag corpus documents that share at
    * least one word n-gram with an evaluation set (the standard
    * n-gram-overlap contamination check from the published LM
    * literature — GPT-3 appendix C / PaLM-style 8-gram matching,
    * shrunk to `n` for short documents).
    *
    * Shape at 100 TB: the eval side is a benchmark — thousands of
    * documents, millions of n-grams at most — so its distinct gram set
    * is BROADCAST and the corpus side never shuffles: one map-side
    * semi-join probe per corpus gram, then a doc-keyed count. Grams
    * ride as 64-bit combined word hashes ([[HashedShingles]]), never
    * materialized strings.
    *
    * @return (doc_id, n_shared) — contaminated corpus docs only.
    */
  def contaminationReport(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5): DataFrame = {
    def grams(df: DataFrame) = docGrams(df, idCol, textCol, n)
    val evalGrams = grams(evalDocs).select(col("gram")).distinct()
    grams(corpus)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      // grams are distinct within a doc (HashedShingles dedups), so a
      // plain count is the distinct shared-gram count
      .agg(count(lit(1)).as("n_shared"))
  }

  /** (doc_id, gram) pairs of 64-bit hashed word `n`-grams — shared by
    * the exact and Bloom decontamination paths. Grams are distinct
    * within a document ([[Dedup.withHashedShingles]] dedups).
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    Dedup.withHashedShingles(
        df.select(col(idCol).cast("long").as("doc_id"), col(textCol))
          .filter(size(split(col(textCol), " ")) >= n),
        textCol, n, "grams")
      .select(col("doc_id"), explode(col("grams")).as("gram"))

  /** Bloom-filter decontamination — the 100 TB scale path of
    * [[contaminationReport]]. The exact variant broadcasts the eval
    * set's DISTINCT gram set (8 bytes/gram: fine for thousands of eval
    * docs, 800 MB once the eval suite reaches 10^8 grams); this
    * variant aggregates those grams into a fixed-size Bloom filter
    * (built distributed via Spark's BloomFilter aggregate, ~240 MB at
    * 10^8 grams / fpp=1e-4), broadcasts the bitset once, and probes it
    * with a map-side predicate — the corpus still never shuffles.
    *
    * One-sided error, the safe direction for decontamination: a Bloom
    * filter has NO false negatives, so every exactly-contaminated
    * document is flagged (nothing contaminated slips through); false
    * positives over-flag clean DOCS at ~grams-per-doc × fpp (the
    * per-gram rate is amplified by every gram a document gets to
    * probe), which is why the default fpp is 1e-4, not the generic
    * 0.01: at ~10² grams/doc that holds the over-flag rate near 1%,
    * trading a sliver of clean data for the broadcast-size cap.
    * CorpusOpsSpec asserts the superset relation against
    * [[contaminationReport]] and bounds the over-flag rate.
    *
    * @return (doc_id, n_flagged) — corpus docs with ≥1 Bloom-positive
    *         gram and their flagged-gram count (an upper bound on the
    *         exact shared-gram count).
    */
  def bloomDecontaminate(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5, fpp: Double = 1e-4): DataFrame = {
    val evalGrams = docGrams(evalDocs, idCol, textCol, n)
      .select(col("gram")).distinct()
      .localCheckpoint(eager = false) // count() + bloom build share it
    // expectedNumItems needs a driver-side count of the (small) eval
    // side only; the corpus side stays lazy and distributed.
    val expected = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("gram", expected, fpp)
    // The probe is Spark's NATIVE BloomFilterMightContain (the same
    // expression its runtime row-level filtering injects), so the
    // corpus-wide pass stays inside whole-stage codegen — a ScalaUDF
    // here forced a codegen boundary on every probed row. The
    // serialized bitset rides the plan as a binary literal; Spark
    // broadcasts task binaries, so executors receive it once per
    // stage, like the explicit Broadcast it replaces.
    //
    // Driver-memory ceiling (advisor r6): a plan-resident Literal is
    // copied through plan transforms and pinned by the driver's plan
    // references for the query's lifetime — fine at the default sizes
    // (a 10^6-gram eval suite at fpp=1e-4 is ~2.4 MB) but not at the
    // documented 10^8-gram extreme (~240 MB). Above a 64 MB threshold
    // the probe falls back to an explicit releasable Broadcast + UDF:
    // one codegen boundary on the probe column, in exchange for not
    // holding a quarter-GB literal in every plan copy.
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val grams = docGrams(corpus, idCol, textCol, n)
    val probed =
      if (bytes.length <= (64 << 20)) {
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.graftbridge.ColumnBridge
        import org.apache.spark.sql.types.BinaryType
        grams.filter(ColumnBridge.column(BloomFilterMightContain(
          Literal(bytes, BinaryType), ColumnBridge.expression(col("gram")))))
      } else {
        val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
        val mightContain = udf((g: Long) => bc.value.mightContainLong(g))
        grams.filter(mightContain(col("gram")))
      }
    probed
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_flagged"))
  }

  /** Deterministic global training-order shuffle: every document gets
    * a cryptographic-hash sort key (seeded md5 over the id) and a
    * shard bucket, so the written training order is a reproducible
    * pseudo-random permutation — re-running the pipeline yields
    * byte-identical shard files, and no engine RNG state is involved.
    *
    * Scale shape: shard assignment is a map-only expression; the
    * within-shard order is a local sort after a repartition on
    * `shard` — at 100 TB this is one all-to-all scatter into nShards
    * writer groups, each sorting its own slice (no global sort, no
    * single-partition window).
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: Int = 41, nShards: Int = 8): DataFrame = {
    require(nShards > 0)
    df.withColumn("shard", mixBucket(col(idCol), seed, nShards))
      .withColumn("shuffle_key",
        md5(concat_ws(":", lit(seed), col(idCol)).cast("binary")))
  }

  /** Source-level quality filtering — the domain/provenance gate of
    * the public pipeline recipes (C4 / RefinedWeb filter whole domains
    * whose aggregate quality is poor, on the theory that provenance
    * predicts quality better than any per-document signal): aggregate
    * each source's mean quality score, then keep documents whose
    * SOURCE passes the bar.
    *
    * Scale shape: one source-keyed aggregate over the (tiny) per-source
    * stats — sources number in the thousands at 100 TB, so the verdict
    * table broadcasts — and the corpus-side filter is a broadcast
    * semi-join, no corpus shuffle. The mean is decimal-exact over the
    * 6-dp-rounded quality column, so the verdict is engine-portable.
    *
    * @return per-source report: (source, n_docs, avg_quality, kept).
    */
  def sourceQualityReport(docs: DataFrame, minAvgQuality: Double,
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    TextAnalysis.qualityFeatures(docs, textCol)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("quality").cast("decimal(20,10)")).cast("double") /
          count(lit(1)), 6).as("avg_quality"))
      .withColumn("kept", col("avg_quality") >= minAvgQuality)
  }

  /** The corpus filtered by [[sourceQualityReport]]'s verdict —
    * broadcast semi-join on the passing sources, map-side only.
    */
  def filterBySourceQuality(docs: DataFrame, minAvgQuality: Double,
      sourceCol: String = "source"): DataFrame = {
    val passing = sourceQualityReport(docs, minAvgQuality,
        sourceCol = sourceCol)
      .filter(col("kept")).select(col(sourceCol))
    docs.join(broadcast(passing), Seq(sourceCol), "left_semi")
  }

  /** Per-source document cap — RefinedWeb-style domain capping: no
    * source may contribute more than `cap` documents, and WHICH
    * documents survive is decided by a seeded hash order, not arrival
    * order, so the cap is an unbiased deterministic sample of the
    * source (arrival order correlates with crawl batches — exactly
    * the bias a cap must not inherit).
    *
    * Scale: one ranking window partitioned by source (partition =
    * source size, AQE-splittable via the same pre-split guidance as
    * [[packByBudget]]); the hash key is computed map-side.
    */
  def capPerSource(df: DataFrame, idCol: String, cap: Int,
      sourceCol: String = "source", seed: Int = 53): DataFrame = {
    require(cap > 0)
    df.withColumn("__capkey",
        md5(concat_ws(":", lit(seed), col(idCol)).cast("binary")))
      .withColumn("__caprank", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(col("__capkey"), col(idCol))))
      .filter(col("__caprank") <= cap)
      .drop("__capkey", "__caprank")
  }

  /** Vocabulary build + out-of-vocabulary rate — tokenizer-training
    * prep: the corpus vocabulary is every token with frequency ≥
    * `minFreq`; each document's OOV rate is the fraction of its tokens
    * outside that vocabulary; the report aggregates by language.
    *
    * Two token-keyed hash aggregates (vocab build, postings probe) and
    * one doc-keyed rollup — no broadcast of the vocab (a 100 TB corpus
    * vocabulary is itself huge, so the probe is a shuffle join on the
    * token, skew-handled by AQE; stopword-heavy tokens are exactly the
    * frequent ones, which the join's map-side combine pre-collapses).
    */
  def oovReport(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", groupCol: String = "lang",
      minFreq: Long = 5L): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        col(groupCol).as("grp"),
        explode(Ranking.tokens(col(textCol))).as("tok"))
      .localCheckpoint(eager = false) // vocab build + probe share it
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .select(col("tok"))
    val perDoc = toks.join(vocab.withColumn("in_v", lit(1)), Seq("tok"), "left")
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
    perDoc.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(sum(col("n_oov")).cast("double") / sum(col("n_toks")), 6)
          .as("oov_rate"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Pack documents into shards of at most `budget` tokens (plus one
    * overflowing document) per group: shard = floor(exclusive-prefix-
    * sum(tokens) / budget) over a deterministic order.
    *
    * Scale note: the prefix sum is a running window per `groupCol`
    * partition — the parallelism unit is the group (language, source,
    * …). That matches how corpora are packed in practice; a group too
    * large for one task gets pre-split by a coarser key first (e.g.
    * (lang, id range)). No shuffle beyond the window's partitioning.
    */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard",
      floor((sum(col(tokensCol)).over(w) - col(tokensCol)) / budget)
        .cast("bigint"))
  }

  /** Regexes shared by the Spark operator and the DuckDB oracle —
    * restricted to syntax RE2 and java.util.regex interpret
    * identically (no backrefs, no lookaround, no \\b differences in
    * char classes).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrub: replace emails / phone numbers / IPv4 literals with
    * typed placeholder tokens and report per-document match counts —
    * the standard pre-training redaction pass. Order matters: emails
    * go first (their domain part would otherwise feed the IP pattern a
    * dotted tail), phones before IPs (disjoint alphabets, but the
    * order is still fixed so results are deterministic).
    *
    * Scale: pure per-row map — three codegen'd regexp_replace + three
    * regexp_extract_all, zero shuffles, pushdown-transparent.
    */
  def redactPii(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val afterEmail = DuckRegexpReplace.sparkReplaceAll(t0, EmailRe, "<EMAIL>")
    val afterPhone = DuckRegexpReplace.sparkReplaceAll(afterEmail, PhoneRe, "<PHONE>")
    val clean = DuckRegexpReplace.sparkReplaceAll(afterPhone, Ipv4Re, "<IP>")
    df.select(col(idCol),
      clean.as("clean_text"),
      size(regexp_extract_all(t0, lit(EmailRe), lit(0)))
        .cast("bigint").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0)))
        .cast("bigint").as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(Ipv4Re), lit(0)))
        .cast("bigint").as("n_ips"))
  }

  /** Token-budget chunking with overlap: split each document's
    * whitespace tokens into windows of `chunkSize` tokens advancing by
    * `chunkSize - overlap` — the standard context-window packing step
    * before tokenization. A document shorter than one chunk yields
    * exactly one chunk.
    *
    * Scale: per-row explode of a computed index range — map-only, no
    * shuffle; chunk count is derived per row so no driver round trip.
    */
  def chunkByTokens(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkSize: Int = 32,
      overlap: Int = 8): DataFrame = {
    require(chunkSize > overlap && overlap >= 0)
    val stride = chunkSize - overlap
    // tokens is referenced by every chunk row: materialize it as its
    // own projection so the explode does not recompute the split per
    // output row (Catalyst composes, never shares, column trees)
    val toks = df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    val nChunks = when(col("n") <= chunkSize, lit(1L)).otherwise(
      ceil((col("n") - lit(chunkSize)).cast("double") / stride)
        .cast("bigint") + 1L)
    toks
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1L)))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("toks"),
          (col("chunk_id") * stride + 1L).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize),
          col("n") - col("chunk_id") * stride).cast("bigint").as("n_tok"))
  }

  /** Sharded training-data export: write the corpus as `nShards`
    * deterministic shard directories plus a manifest — the terminal
    * sink of a curation pipeline (trainers consume shard files in
    * manifest order).
    *
    * Shard assignment reuses [[deterministicShuffle]]'s seeded keys
    * (reproducible permutation, balanced shards, no RNG); the data
    * write is one distributed `partitionBy(shard)` with a
    * same-column repartition in front so each shard directory holds
    * one file per shuffle partition that owns it (typically one). The
    * manifest (shard → docs, tokens) is shard-cardinality rows —
    * a driver-side write of a tiny table, the IVF-seeding-class
    * sanctioned step.
    *
    * @return the manifest DataFrame (shard, n_docs, n_tokens).
    */
  def exportShards(df: DataFrame, outDir: String,
      idCol: String = "doc_id", tokensCol: String = "n_chars",
      nShards: Int = 8, seed: Int = 41,
      format: String = "parquet"): DataFrame = {
    // snapshot ONCE: the data write and the manifest aggregate share
    // this pass (without it the full corpus is read and shuffled twice)
    val sharded = deterministicShuffle(df, idCol, seed, nShards)
      .localCheckpoint(eager = false)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
      .write.format(format).partitionBy("shard")
      .mode("overwrite").save(s"$outDir/data")
    val manifest = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"))
      .orderBy(col("shard"))
    manifest.coalesce(1).write.format("json")
      .mode("overwrite").save(s"$outDir/manifest")
    manifest
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4, the masked
    * span-prediction objective): replace deterministic token spans
    * with ordered `<extra_id_k>` sentinels and emit the (input,
    * target) training pair per document. Spans are scheduled by a
    * doc-seeded modular pattern — positions where
    * `(pos + doc_id % period) % period ∈ [maskStart, maskStart+spanLen)`
    * mask, giving non-overlapping spans of exactly `spanLen` at a
    * `spanLen/period` corruption rate — so the construction replays
    * bit-identically in the SQL oracle (no RNG).
    *
    * Scale: posexplode to token rows, per-row classification, one
    * doc-keyed aggregate rebuilding input/target from sorted collected
    * pieces (collect_list skips the dropped-position NULLs; per-doc
    * arrays are document-sized, the same bound as the text itself).
    * Deliberately avoids transform+element_at lambdas over a derived
    * words array — the DSIR lesson: that shape re-evaluates the split
    * per element.
    */
  def spanCorrupt(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", period: Int = 7, maskStart: Int = 3,
      spanLen: Int = 2): DataFrame = {
    require(maskStart + spanLen <= period)
    val seed = pmod(col("doc_id"), lit(period))
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .withColumn("cls", pmod(col("pos") + seed, lit(period)))
      .withColumn("k",
        ((col("pos") + seed - maskStart) / period).cast("int"))
    val sentinel = rawConcat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    // a continuation position only masks when its span START is
    // inside the document — the head of a doc can land mid-pattern
    // (doc_id 4, s=4: pos 0 is a continuation with no start)
    val masked = col("cls") === maskStart ||
      (col("cls") > maskStart && col("cls") < maskStart + spanLen &&
        col("pos") >= col("cls") - maskStart)
    val agged = tok.groupBy(col("doc_id"))
      .agg(
        sum(when(masked, 1L).otherwise(0L)).as("n_masked"),
        collect_list(
          when(col("cls") === maskStart, struct(col("pos"), sentinel.as("p")))
            .when(!masked, struct(col("pos"), col("w").as("p"))))
          .as("in_pieces"),
        collect_list(
          when(col("cls") === maskStart,
            struct(col("pos"), rawConcat(sentinel, lit(" "), col("w")).as("p")))
            .when(masked, struct(col("pos"), col("w").as("p"))))
          .as("t_pieces"))
    def joined(c: String) = nullif(
      array_join(transform(array_sort(col(c)), x => x.getField("p")), " "),
      lit(""))
    agged.select(col("doc_id"), col("n_masked"),
      joined("in_pieces").as("input_text"),
      joined("t_pieces").as("target_text"))
  }

  /** DSIR importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): featurize every doc
    * as hashed n-gram (unigram + bigram) bucket counts, fit
    * add-1-smoothed bag-of-buckets models on the target and raw
    * corpora, and score each raw doc with
    * `log w = Σ_grams [ln p_target(bucket) − ln p_raw(bucket)]`.
    *
    * The bucket hash is the engine's cross-replayable polynomial
    * rolling hash (mod 2^31−1, then mod `buckets`) so the whole pass
    * is oracle-checkable; per-bucket log-ratios are rounded at 1e-8
    * (libm ulp guard) and accumulated exactly in decimal, the ppl-row
    * pattern.
    *
    * Scale: gram instances are token-shaped (two map-only explodes);
    * the per-bucket count tables are ≤ `buckets` rows — broadcast —
    * so scoring is one token-keyed hash aggregate per corpus plus one
    * broadcast join + doc-keyed aggregate. No global structure.
    */
  def dsirScores(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 256): DataFrame = {
    // fused single-pass featurizer — the HOF composition
    // (transform/element_at bigrams + per-char aggregate fold) was
    // measured 25× wall at 10× rows: the bigram lambda re-evaluated
    // the full split per element. DsirBuckets is hash-identical.
    // r12: the per-doc bucket HISTOGRAM is computed map-side inside
    // the same fused pass (DsirBucketCounts) — gram INSTANCES never
    // become rows, so the corpus-count aggregates and the scoring
    // join move ≤ `buckets` rows per doc instead of ~2 rows per
    // token, and the shared frame persists as a narrow numeric
    // columnar cache instead of a token-shaped localCheckpoint
    // (guide §2.3 "aggregate before you shuffle").
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("doc_id"),
          explode(DsirBucketCounts(col(textCol), buckets)).as("bc"))
        .select(col("doc_id"), col("bc.bucket").as("bucket"),
          col("bc.n").as("n"))
    val rawGrams = bucketed(raw)
      .localCheckpoint(eager = false) // corpus counts + scoring share it
    val rawCnt = rawGrams.groupBy(col("bucket"))
      .agg(sum(col("n")).as("cr"))
    val tgtCnt = bucketed(target).groupBy(col("bucket"))
      .agg(sum(col("n")).as("ct"))
    val totals = rawCnt.agg(sum(col("cr")).as("crt"))
      .crossJoin(tgtCnt.agg(sum(col("ct")).as("ctt")))
    // per-bucket smoothed log-ratio; ≤ `buckets` rows end to end
    val lr = rawCnt
      .join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(coalesce(col("ct"), lit(0L)) + 1) -
              log(col("ctt") + buckets) -
              log(col("cr") + 1) +
              log(col("crt") + buckets), 8)
          .cast("decimal(20,10)").as("lr"))
    // Σ n·lr ≡ the per-instance sum — but only if the decimal product
    // keeps full scale: decimal(20,10) × BIGINT(20,0) would need
    // precision 41 and Spark rounds at the 38 cap (ULP skew vs the
    // oracle, caught at sf0.01); ×decimal(10,0) needs 31 — exact.
    rawGrams.join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_grams"),
        round(sum(col("lr") * col("n").cast("decimal(10,0)"))
          .cast("double"), 6).as("logw"))
  }

  /** DSIR deterministic top-k resample: flags the `k` highest-weight
    * docs (ties broken by id). The threshold is found with an
    * orderBy+limit(k) over the doc-level score table (corpus-cardinality
    * rows, NOT token rows) — no single-partition window. The paper's
    * Gumbel-noise variant composes with [[deterministicShuffle]]'s
    * seeded keys when sampling diversity is wanted over exact top-k.
    */
  def dsirResample(raw: DataFrame, target: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 256): DataFrame = {
    val scored = dsirScores(raw, target, idCol, textCol, buckets)
      .localCheckpoint(eager = false) // threshold probe + flag share it
    val topk = scored.orderBy(col("logw").desc, col("doc_id")).limit(k)
      .localCheckpoint(eager = false)
    val thrW = topk.agg(min(col("logw")).as("tw"))
    val thr = topk.join(broadcast(thrW), col("logw") === col("tw"))
      .agg(min(col("tw")).as("tw"), max(col("doc_id")).as("ti"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_grams"), col("logw"),
        (col("logw") > col("tw") ||
          (col("logw") === col("tw") && col("doc_id") <= col("ti")))
          .as("selected"))
  }
}
