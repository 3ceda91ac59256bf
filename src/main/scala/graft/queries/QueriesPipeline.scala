package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import QueryDsl._

/** North-star M5 pipeline operators as driver-checkable queries:
  * dedup family, similarity search, text analysis, multimodal
  * features. SQL-expressible ones carry DuckDB oracles; the
  * LSH/sketch-based ones are rows-only here (their quality bounds —
  * recall vs. brute force, precision vs. exact pairs — are asserted
  * in the scalatest specs instead, since the oracle cannot replay
  * seeded xxhash banding).
  */
object QueriesPipeline {

  val defs: Map[String, Q] = Map(
    // Exact dedup: hash-groupBy on content, min-id representative.
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", Seq("text"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),
    // MinHash+LSH near-dups (rows-only: seeded banding).
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.2)
        .orderBy(col("id1"), col("id2"))
    }),
    // SimHash near-dups (rows-only: seeded fingerprint).
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
        .orderBy(col("id1"), col("id2"))
    }),
    // Cross-doc duplicate 5-word spans (Lee et al. exact-substring
    // dedup signal; oracle-checked).
    "q_dedup_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text",
          spanWords = 5)
        .orderBy(col("doc_id"))
    }),
    // PII scrub with per-doc match counts (oracle-checked). PII is
    // synthesized deterministically from doc_id so the pass has
    // real matches — the same concatenation runs in the oracle.
    "q_pii_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or 555-123-4567 at 10.0."),
          pmod(col("doc_id"), lit(256)), lit(".1")).as("text"))
      CorpusOps.redactPii(d, "doc_id", "text").orderBy(col("doc_id"))
    }),
    // Token-budget chunking with overlap (oracle-checked).
    "q_chunk_tokens" -> ((s, dir) => {
      CorpusOps.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),
    // Exact n-gram Jaccard pairs (oracle-checked).
    "q_dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          shingleSize = 3, maxCharDiff = 20, threshold = 0.1)
        .orderBy(col("id1"), col("id2"))
    }),
    // Embedding-cosine near-dups within label blocks (oracle-checked).
    // t=0.4 keeps the complete shifted grid: at loose thresholds the
    // OUTPUT is candidate-shaped anyway and completeness is the
    // contract — this row is the exactness oracle for the family.
    "q_dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), threshold = 0.4)
        .orderBy(col("id1"), col("id2"))
    }),
    // The DEFAULT high-threshold path (round 8): same public operator,
    // t=0.9 — threshold-dispatch routes it to the banded sign-LSH plan
    // (rows-only: probabilistic candidates; recall gated in SpecGates,
    // grid/banded agreement in DedupSpec). Exists so the scale curve
    // and the driver measure what a caller actually gets at scale.
    "q_dedup_embedding_hi" -> ((s, dir) => {
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), threshold = 0.9)
        .orderBy(col("id1"), col("id2"))
    }),
    // Sign-LSH banded embedding near-dup (round 7) — the 100 TB path
    // for high thresholds where the complete grid cannot prune in 64-d
    // (rows-only: seeded hyperplanes; recall gated in SpecGates).
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      Dedup.bandedEmbeddingNearDups(t(s, dir, "embeddings"), threshold = 0.9)
        .orderBy(col("id1"), col("id2"))
    }),
    // SemDeDup-style semantic dedup: cluster-scoped near-dup drop,
    // deterministic min-id survivor (oracle replays assignment +
    // within-cluster max-cosine + keep rule).
    "q_dedup_semantic" -> ((s, dir) => {
      Dedup.semanticDedup(t(s, dir, "embeddings"),
          numClusters = 8, threshold = 0.35)
        .orderBy(col("vec_id"))
    }),
    // Brute-force cosine top-k (oracle-checked).
    "q_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.bruteForceTopK(
          emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("query_id"), col("rk"))
    }),
    // LSH ANN (rows-only: seeded hyperplanes; recall asserted in spec).
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.lshTopK(
          emb.filter(col("vec_id") < 5), emb, k = 3, dims = 64,
          bands = 16, bitsPerBand = 4)
        .orderBy(col("query_id"), col("rk"))
    }),
    // IVF ANN (rows-only: k-means float averaging is engine-specific;
    // recall bound asserted in AnnSpec).
    "q_ann_ivf" -> ((s, dir) => {
      // nprobe 12/16: the synthetic embeddings are isotropic (no
      // cluster structure), so recall ≥ 0.9 honestly requires a high
      // probe fraction here; AnnSpec also gates nprobe=4 ≥ 0.9 on a
      // clustered corpus — the operating point real embeddings get.
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfTopK(
          emb.filter(col("vec_id") < 5), emb, k = 3,
          numClusters = 16, nprobe = 12, kmeansIters = 2)
        .orderBy(col("query_id"), col("rk"))
    }),
    // IVF-bucketed quantized search (round 7): int8 code scoring over
    // cluster-probed candidates + exact float rerank — the 100 TB
    // shape of the quantized path (rows-only: seeded k-means; recall
    // ≥ 0.95 vs float brute force gated in AnnSpec + SpecGates).
    "q_ann_ivf_quantized" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.quantizedIvfTopK(
          emb.filter(col("vec_id") < 5), emb, k = 3,
          numClusters = 16, nprobe = 14, rerankFactor = 4, kmeansIters = 2)
        .orderBy(col("query_id"), col("rk"))
    }),
    // Quality scoring (oracle-checked; formula mirrored in SQL).
    "q_text_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_words"), col("punct_ratio"),
          col("stopword_ratio"), col("avg_word_len"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    // Token counting (oracle-checked).
    "q_text_tokens" -> ((s, dir) => {
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"))
        .orderBy(col("doc_id"))
    }),
    // Language-ID heuristic (rows-only; behavior asserted in spec).
    "q_text_langid" -> ((s, dir) => {
      TextAnalysis.withLanguageId(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", "lang_guess")
        .groupBy(col("lang_guess")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_guess"))
    }),
    // Rolling-hash fingerprint (oracle-checked).
    "q_text_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    // End-to-end curation pipeline (oracle-checked): quality gate →
    // exact dedup (canonical = min doc_id) → per-language doc / dup /
    // token accounting. The composite the individual operators exist
    // for; two shuffles total (dedup groupBy, language rollup).
    "q_pipeline_curate" -> ((s, dir) => {
      val scored = TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .filter(col("quality") >= 0.7)
      val kept = scored.groupBy(col("lang"), col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      TextAnalysis.tokenCounts(kept, "text")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_copies")) - count(lit(1))).cast("bigint")
            .as("n_dups_removed"),
          sum(col("ws_tokens")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    // THE end-to-end curation pipeline — the composite every operator
    // above exists for, as one DAG: quality + repetition gate →
    // near-dup clustering (posting-list pairs → connected components,
    // keep cluster canonicals) → benchmark decontamination → hash
    // split → per-(split, lang) accounting. The oracle replays the
    // identical semantics with all-pairs joins and a recursive
    // closure — right answer at sf0.01, unviable at 100 TB, which is
    // the point of the Spark formulation.
    "q_pipeline_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") >= 20)
      val evalDocs = docs.filter(col("doc_id") < 20)
      // the repetition gate only needs the trigram fraction, which is
      // a pure expression — computing it inline instead of joining the
      // full repetitionFeatures saves the top-bigram shuffle pair and
      // the doc_id join (the oracle's rep CTE computes only dupf too)
      // checkpoint BEFORE the gate: a filter on derived columns gets
      // the full quality/trigram expression trees substituted into the
      // pushed-down predicate and recomputed per downstream reference
      // (round-1 lesson); filtering the materialized frame keeps the
      // gate a cheap column comparison
      val scored = TextAnalysis.withDupTrigramFrac(
          TextAnalysis.qualityFeatures(corpus, "text"), "text",
          "dup_trigram_frac")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
          col("quality"), col("dup_trigram_frac"))
        // Columnar MEMORY_AND_DISK, not localCheckpoint: this frame
        // carries the full text column, and a heap-resident
        // DESERIALIZED copy is what walled q_pipeline_full at sf100
        // (27×/decade on a 64 GB heap, SCALE_CURVE_r11). The SQL cache
        // stores compressed columnar batches bounded by the storage
        // pool and spills the rest to disk, keeping the
        // materialize-once property (derived quality/trigram columns
        // are NOT re-substituted into pushed-down predicates) with a
        // working set that degrades gracefully instead of GC-thrashing.
        .persist(StorageLevel.MEMORY_AND_DISK)
      val kept = scored
        .filter(col("quality") >= 0.84 && col("dup_trigram_frac") <= 0.1)
      val pairs = Dedup.ngramJaccardPairs(
        kept.select(col("doc_id"), col("lang"), col("n_chars"), col("text")),
        shingleSize = 3, maxCharDiff = 20, threshold = 0.1)
      val comp = GraphOps.connectedComponents(pairs, "id1", "id2")
      val canon = kept.join(comp, kept("doc_id") === comp("id"), "left")
        .filter(col("component").isNull || col("component") === col("doc_id"))
        .select(kept("doc_id"), col("lang"), col("text"))
      val contaminated = CorpusOps.contaminationReport(canon, evalDocs, n = 5)
        .select(col("doc_id"), lit(1).as("bad"))
      val clean = canon.join(contaminated, Seq("doc_id"), "left")
        .filter(col("bad").isNull)
      TextAnalysis.tokenCounts(CorpusOps.hashSplit(clean, "doc_id"), "text")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_tokens"))
        .orderBy(col("split"), col("lang"))
    }),
    // Exact prefix-filtered similarity join (high-threshold Jaccard;
    // oracle = all-pairs, plan = rare-prefix posting join).
    "q_dedup_prefix" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(t(s, dir, "documents"),
          shingleSize = 3, threshold = 0.6)
        .orderBy(col("id1"), col("id2"))
    }),
    // Reproducible stratified sample (deterministic mix-hash — no
    // engine RNG, so fully oracle-checkable, unlike TABLESAMPLE).
    "q_corpus_sample" -> ((s, dir) => {
      CorpusOps.stratifiedSample(t(s, dir, "documents"), "doc_id", 0.1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"))
    }),
    // Deterministic train/val/test split by id mix-bucket.
    "q_corpus_split" -> ((s, dir) => {
      CorpusOps.hashSplit(t(s, dir, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("split"))
    }),
    // Token-budget shard packing (what corpus sharding for training
    // actually does): per-language prefix sum over a deterministic
    // order, shard = floor(exclusive_cumsum / budget).
    "q_corpus_pack" -> ((s, dir) => {
      CorpusOps.packByBudget(t(s, dir, "documents"),
          "lang", "doc_id", "n_chars", budget = 10000L)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"), col("shard"))
    }),
    // Near-dup pairs → duplicate clusters: iterative min-label
    // connected components with pointer jumping (oracle replays the
    // closure via WITH RECURSIVE — right at sf0.01, wrong at 100 TB,
    // which is exactly why the Spark side is the iterative operator).
    "q_dedup_cluster" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        shingleSize = 3, maxCharDiff = 20, threshold = 0.1)
      GraphOps.dupClusters(pairs).orderBy(col("doc_id"))
    }),
    // BM25 keyword retrieval over the corpus (oracle-checked; decimal
    // accumulator keeps the score sum order-exact).
    "q_text_bm25" -> ((s, dir) => {
      Ranking.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("vector", "spark", "merge"), k = 15)
    }),
    // Hybrid retrieval: BM25 + cosine ranks fused by RRF (oracle
    // replays both rankings and the fusion arithmetic).
    "q_text_hybrid" -> ((s, dir) => {
      Ranking.hybridRrfTopK(t(s, dir, "documents"), t(s, dir, "embeddings"),
          terms = Seq("vector", "spark", "merge"), queryVecId = 7L, k = 15)
        .select(col("doc_id"), col("rrf"),
          col("lex_rank").cast("bigint").as("lex_rank"),
          col("vec_rank").cast("bigint").as("vec_rank"))
    }),
    // ANN-fed hybrid over the quantized-IVF index (round 8) — the
    // 100 TB retrieval default: dense candidates from int8 code
    // scoring + bounded rerank, fused with BM25 by RRF. Approximate
    // by construction → rows-only here; SpecGates bounds its top-15
    // overlap vs the exact hybrid (≥ 0.6), AnnSpec/SpecGates bound
    // the candidate stage's recall.
    "q_text_hybrid_ann" -> ((s, dir) => {
      Ranking.hybridRrfTopKIvf(t(s, dir, "documents"), t(s, dir, "embeddings"),
          terms = Seq("vector", "spark", "merge"), queryVecId = 7L, k = 15)
        .select(col("doc_id"), col("rrf"),
          col("lex_rank").cast("bigint").as("lex_rank"),
          col("vec_rank").cast("bigint").as("vec_rank"))
    }),
    // TF-IDF retrieval (oracle-checked; same posting-list skeleton).
    "q_text_tfidf" -> ((s, dir) => {
      Ranking.tfidfTopK(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("vector", "spark", "merge"), k = 15)
    }),
    // Gopher-style repetition filters (oracle-checked).
    "q_text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),
    // Benchmark decontamination: corpus docs sharing any 5-gram with
    // the "benchmark" slice (doc_id < 20); eval gram set broadcast.
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusOps.contaminationReport(
          docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
          n = 5)
        .orderBy(col("doc_id"))
    }),
    // Vocabulary build + per-language OOV rate (tokenizer prep).
    "q_corpus_vocab" -> ((s, dir) => {
      CorpusOps.oovReport(t(s, dir, "documents"), minFreq = 5L)
        .orderBy(col("lang"))
    }),
    // Temperature mixture resampling across sources (T=2 flattens,
    // f=0.5 target fraction) — deterministic, per-source accounting.
    "q_corpus_mix" -> ((s, dir) => {
      CorpusOps.temperatureMix(t(s, dir, "documents"), "source", "doc_id",
          temperature = 2.0, fraction = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars"))
        .orderBy(col("source"))
    }),
    // Duplicate-span REMOVAL: rebuild every doc without cross-doc
    // 5-gram spans (Lee et al. transform; oracle replays span strings).
    "q_dedup_despan" -> ((s, dir) => {
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), spanWords = 5)
        .orderBy(col("doc_id"))
    }),
    // Round-4 refinement composite: the NEW operators composed into
    // one DAG — provenance gate -> duplicate-span removal -> logistic
    // quality filter on the CLEANED text -> hash split -> accounting.
    // The oracle replays every stage in SQL.
    "q_pipeline_refine" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gated = CorpusOps.filterBySourceQuality(docs, minAvgQuality = 0.8)
      val despanned = Dedup.removeDuplicateSpans(gated)
        // scored join + accounting share it; columnar MEMORY_AND_DISK
        // (full-text frame) — heap-bounded, spills columnar
        .persist(StorageLevel.MEMORY_AND_DISK)
      val scored = TextAnalysis.qualityModel(despanned, "doc_id", "clean_text")
        .filter(col("keep"))
        .select(col("doc_id"), col("model_score"))
      val kept = despanned.join(scored, "doc_id")
      CorpusOps.hashSplit(kept, "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens") - col("n_removed")).as("kept_tokens"),
          sum(col("n_removed")).as("removed_tokens"),
          round(sum(col("model_score").cast("decimal(20,10)")).cast("double") /
            count(lit(1)), 6).as("avg_score"))
        .orderBy(col("split"))
    }),
    // Surgical decontamination: cut eval-overlapping 5-gram spans,
    // keep the repaired documents (vs q_decontaminate's doc flags).
    "q_decontaminate_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.removeContaminatedSpans(
          docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
          spanWords = 5)
        .filter(col("n_removed") > 0) // repaired docs only
        .orderBy(col("doc_id"))
    }),
    // Mixture epoch plan: temperature weights over a token budget,
    // per-source repeat factors (data-constrained mixing arithmetic).
    "q_corpus_epochs" -> ((s, dir) => {
      CorpusOps.epochPlan(t(s, dir, "documents"), "source", "n_chars",
          temperature = 2.0, budget = 1000000L)
        .orderBy(col("source"))
    }),
    // Per-source document cap (RefinedWeb-style domain capping) —
    // seeded-hash survivor choice; accounting per source.
    "q_corpus_cap" -> ((s, dir) => {
      CorpusOps.capPerSource(t(s, dir, "documents"), "doc_id", cap = 15)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("source"))
    }),
    // Canonical doc per near-dup cluster: keep the best-quality
    // member, not the arbitrary first (oracle replays the recursive
    // closure + the quality formula + the ranking).
    "q_dedup_canonical" -> ((s, dir) => {
      Dedup.canonicalDocs(t(s, dir, "documents"),
          shingleSize = 3, maxCharDiff = 20, threshold = 0.1)
        .orderBy(col("cluster_id"))
    }),
    // Bloom-filter decontamination (rows-only: the Bloom bitset uses
    // engine-specific hashing; the no-false-negative superset relation
    // vs q_decontaminate is asserted in CorpusOpsSpec).
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusOps.bloomDecontaminate(
          docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
          n = 5)
        .orderBy(col("doc_id"))
    }),
    // Deterministic seeded training-order shuffle (oracle-checked:
    // md5 + mix-hash arithmetic replay identically in any engine).
    "q_corpus_shuffle" -> ((s, dir) => {
      CorpusOps.deterministicShuffle(t(s, dir, "documents"), "doc_id",
          seed = 41, nShards = 8)
        .select(col("doc_id"), col("shard"), col("shuffle_key"))
        .orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
    }),
    // Source-level quality gate (C4/RefinedWeb domain-filter shape).
    "q_corpus_sourcequality" -> ((s, dir) => {
      CorpusOps.sourceQualityReport(t(s, dir, "documents"),
          minAvgQuality = 0.8)
        .orderBy(col("source"))
    }),
    // Per-language top terms (corpus statistics report).
    "q_text_topterms" -> ((s, dir) => {
      TextAnalysis.topTerms(t(s, dir, "documents"), "lang", "text", k = 5)
        .orderBy(col("lang"), col("rk"))
    }),
    // CCNet-style unigram log-prob (perplexity-proxy) scoring.
    "q_text_ppl" -> ((s, dir) => {
      TextAnalysis.unigramLogProb(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    // Fixed-weight logistic quality model over the feature columns.
    "q_quality_model" -> ((s, dir) => {
      TextAnalysis.qualityModel(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),
    // Embedding cluster assignment to deterministic seed centroids
    // (the oracle replays the argmax with list_cosine_similarity).
    "q_cluster_assign" -> ((s, dir) => {
      SimilaritySearch.clusterAssign(t(s, dir, "embeddings"), numClusters = 8)
        .select(col("vec_id"), col("cluster").cast("bigint").as("cluster"))
        .orderBy(col("vec_id"))
    }),
    // Multimodal: binary column + mapPartitions batch decode (stub).
    // REAL image decode (round 5): synthesized deterministic PNGs →
    // javax.imageio decode (partition-reused reader) → dimensions +
    // integer-Rec.601 mean luma; the oracle replays the pixel
    // formulas on the stored columns, closing the encode→decode loop.
    "q_multimodal_features" -> ((s, dir) => {
      Multimodal.extractImageFeatures(
          s, Multimodal.attachImages(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }),
    // Mixed-container decode (round 7): doc_id % 3 picks PNG / JPEG /
    // GIF; the magic-byte sniff dispatches per-(partition, format)
    // readers. JPEG rows are uniform gray at quality 1.0 (raster-exact
    // — see Multimodal.encodeJpegGray), so all three containers decode
    // to formula-replayable pixels and the oracle hash-checks the
    // whole sniff→decode→measure loop.
    "q_multimodal_mixed" -> ((s, dir) => {
      Multimodal.extractImageFeaturesWithFormat(
          s, Multimodal.attachImagesMixed(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }),
    // Multi-frame container decode + keyframe sampling (round 7):
    // animated GIFs with 1 + doc_id % 5 frames, frame f uniform gray
    // (doc_id%256 + 17f) % 256; the decoder counts frames and reads
    // only every 2nd one — the video-pipeline shape, oracle-replayed
    // from the stored columns (frame count AND sampled-mean luma).
    "q_multimodal_video" -> ((s, dir) => {
      Multimodal.extractVideoFeatures(
          s, Multimodal.attachAnimatedGifs(t(s, dir, "documents")), stride = 2)
        .orderBy(col("doc_id"))
    }),
    // REAL audio decode (round 7): deterministic PCM16 WAVs →
    // javax.sound.sampled parse → amplitude features; the oracle
    // replays the sample formula over generate_series.
    "q_multimodal_audio" -> ((s, dir) => {
      Multimodal.extractAudioFeatures(
          s, Multimodal.attachAudio(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }),
    // Audio beyond mono PCM16 (round 8): even docs stereo PCM16, odd
    // docs 8-bit G.711 μ-law mono — container parse, transcode to
    // linear PCM16, per-channel amplitude features; the oracle replays
    // the sample formulas, expanding μ-law by its closed form.
    "q_multimodal_audio2" -> ((s, dir) => {
      Multimodal.extractAudioChannelFeatures(
          s, Multimodal.attachAudio2(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }),
    // Generic opaque-byte stats path (the non-image media shape).
    "q_multimodal_bytes" -> ((s, dir) => {
      Multimodal.extractFeatures(s, Multimodal.attachMedia(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }),
    // Multimodal frame sampling. DuckDB 1.0 lacks blob substring, but
    // the AGGREGATED outputs (frames sampled, bytes covered) are pure
    // integer arithmetic on the byte length, so the oracle replays
    // them arithmetically; per-frame byte-exactness is asserted in
    // TextMultimodalSpec.
    "q_multimodal_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.attachMedia(t(s, dir, "documents")),
          frameBytes = 32, stride = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("frame_len")).as("sampled_bytes"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q_pipeline_refine" ->
      """WITH srcq AS (
        |  SELECT source,
        |    round(CAST(sum(CAST(q AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS aq
        |  FROM (
        |    SELECT source,
        |      round(
        |        least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |        (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |        least((CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |          / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |        (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |          / greatest(length(text), 1)) * 0.1, 6) AS q
        |    FROM (SELECT source, text, string_split(text, ' ') AS words FROM documents))
        |  GROUP BY source),
        |gated AS (
        |  SELECT d.* FROM documents d JOIN srcq ON d.source = srcq.source
        |  WHERE srcq.aq >= 0.8),
        |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM gated),
        |tok AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
        |      i -> struct_pack(pos := i - 1, w := words[i]))) AS u
        |    FROM w)),
        |spans AS (
        |  SELECT doc_id, u.start AS start, u.span AS span FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |      i -> struct_pack(start := i - 1,
        |        span := words[i]||' '||words[i+1]||' '||words[i+2]||' '||
        |                words[i+3]||' '||words[i+4]))) AS u
        |    FROM w WHERE len(words) >= 5)),
        |dup AS (
        |  SELECT span FROM (
        |    SELECT span, count(DISTINCT doc_id) AS dw FROM spans GROUP BY span)
        |  WHERE dw >= 2),
        |covered AS (
        |  SELECT DISTINCT doc_id, u AS pos FROM (
        |    SELECT s.doc_id, unnest(range(s.start, s.start + 5)) AS u
        |    FROM spans s JOIN dup USING (span))),
        |kept_tok AS (
        |  SELECT t.doc_id, t.pos, t.w FROM tok t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept_tok GROUP BY doc_id),
        |despanned AS (
        |  SELECT g.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |    CAST(len(string_split(g.text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(string_split(g.text, ' ')) - coalesce(r.n_kept, 0) AS BIGINT)
        |      AS n_removed
        |  FROM gated g LEFT JOIN rebuilt r USING (doc_id)),
        |feat AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    round(CAST(length(clean_text) - length(regexp_replace(clean_text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |      / greatest(length(clean_text), 1), 6) AS punct_ratio,
        |    round(CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |      / greatest(len(words), 1), 6) AS stopword_ratio,
        |    round(CAST(length(clean_text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1), 6) AS avg_word_len
        |  FROM (SELECT doc_id, clean_text, string_split(clean_text, ' ') AS words
        |        FROM despanned)),
        |scored AS (
        |  SELECT doc_id,
        |    round(1.0 / (1.0 + exp(-(
        |      -2.0 + least(CAST(n_words AS DOUBLE), 60.0) * 0.05 +
        |      stopword_ratio * 5.0 - punct_ratio * 8.0 +
        |      CASE WHEN avg_word_len BETWEEN 3.0 AND 10.0 THEN 0.5 ELSE -0.5 END))), 6)
        |      AS model_score
        |  FROM feat),
        |final AS (
        |  SELECT d.doc_id, d.n_tokens, d.n_removed, s.model_score,
        |    CASE WHEN ((d.doc_id % 1000003) * 40503 + 29) % 100 < 90 THEN 'train'
        |         WHEN ((d.doc_id % 1000003) * 40503 + 29) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM despanned d JOIN scored s USING (doc_id)
        |  WHERE s.model_score >= 0.5)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_tokens - n_removed) AS BIGINT) AS kept_tokens,
        |  CAST(sum(n_removed) AS BIGINT) AS removed_tokens,
        |  round(CAST(sum(CAST(model_score AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6)
        |    AS avg_score
        |FROM final GROUP BY split ORDER BY split""".stripMargin,
    "q_decontaminate_spans" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 20),
        |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
        |tok AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
        |      i -> struct_pack(pos := i - 1, w := words[i]))) AS u
        |    FROM w)),
        |spans AS (
        |  SELECT doc_id, u.start AS start, u.span AS span FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |      i -> struct_pack(start := i - 1,
        |        span := words[i]||' '||words[i+1]||' '||words[i+2]||' '||
        |                words[i+3]||' '||words[i+4]))) AS u
        |    FROM w WHERE len(words) >= 5)),
        |evspans AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(words) - 3),
        |    i -> words[i]||' '||words[i+1]||' '||words[i+2]||' '||
        |         words[i+3]||' '||words[i+4])) AS span
        |  FROM (SELECT string_split(text, ' ') AS words FROM documents
        |        WHERE doc_id < 20)
        |  WHERE len(words) >= 5),
        |covered AS (
        |  SELECT DISTINCT doc_id, u AS pos FROM (
        |    SELECT s.doc_id, unnest(range(s.start, s.start + 5)) AS u
        |    FROM spans s JOIN evspans USING (span))),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.w FROM tok t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT * FROM (
        |  SELECT c.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(string_split(c.text, ' ')) - coalesce(r.n_kept, 0) AS BIGINT)
        |      AS n_removed
        |  FROM corpus c LEFT JOIN rebuilt r USING (doc_id))
        |WHERE n_removed > 0 ORDER BY doc_id""".stripMargin,
    "q_corpus_epochs" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT sum(CAST(round(pow(toks, 0.5), 6) AS DECIMAL(30,10))) AS sw
        |  FROM c),
        |w AS (
        |  SELECT source, n_docs, toks,
        |    round(CAST(CAST(round(pow(toks, 0.5), 6) AS DECIMAL(30,10)) / sw
        |      AS DOUBLE), 6) AS weight
        |  FROM c, t)
        |SELECT source, n_docs, toks, weight,
        |  CAST(round(weight * 1000000) AS BIGINT) AS target_toks,
        |  round(CAST(CAST(round(weight * 1000000) AS BIGINT) AS DOUBLE) / toks, 4)
        |    AS epochs
        |FROM w ORDER BY source""".stripMargin,
    "q_corpus_cap" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('53:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 15 GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_despan" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |tok AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
        |      i -> struct_pack(pos := i - 1, w := words[i]))) AS u
        |    FROM w)),
        |spans AS (
        |  SELECT doc_id, u.start AS start, u.span AS span FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
        |      i -> struct_pack(start := i - 1,
        |        span := words[i]||' '||words[i+1]||' '||words[i+2]||' '||
        |                words[i+3]||' '||words[i+4]))) AS u
        |    FROM w WHERE len(words) >= 5)),
        |dup AS (
        |  SELECT span FROM (
        |    SELECT span, count(DISTINCT doc_id) AS dw FROM spans GROUP BY span)
        |  WHERE dw >= 2),
        |covered AS (
        |  SELECT DISTINCT doc_id, u AS pos FROM (
        |    SELECT s.doc_id, unnest(range(s.start, s.start + 5)) AS u
        |    FROM spans s JOIN dup USING (span))),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.w FROM tok t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split(d.text, ' ')) - coalesce(r.n_kept, 0) AS BIGINT)
        |    AS n_removed
        |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_canonical" ->
      """WITH RECURSIVE g AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text,' ') AS words
        |        FROM documents)
        |  WHERE len(words) >= 3),
        |pairs AS (
        |  SELECT id1, id2 FROM (
        |    SELECT a.doc_id AS id1, b.doc_id AS id2,
        |      round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS j
        |    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |      AND abs(a.n_chars - b.n_chars) <= 20)
        |  WHERE j >= 0.1),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |clusters AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |q AS (
        |  SELECT doc_id,
        |    round(
        |      least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |      (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |      least((CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |      (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1)) * 0.1, 6) AS quality
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)),
        |ranked AS (
        |  SELECT c.cluster_id, c.doc_id, q.quality,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |      ORDER BY q.quality DESC, c.doc_id) AS rk
        |  FROM clusters c JOIN q USING (doc_id))
        |SELECT cluster_id,
        |  max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
        |  max(CASE WHEN rk = 1 THEN quality END) AS quality,
        |  count(*) AS n_members
        |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT doc_id,
        |  ((doc_id % 1000003) * 40503 + 41) % 8 AS shard,
        |  md5('41:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents
        |ORDER BY shard, shuffle_key, doc_id""".stripMargin,
    "q_corpus_sourcequality" ->
      """WITH q AS (
        |  SELECT source,
        |    round(
        |      least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |      (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |      least((CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |      (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1)) * 0.1, 6) AS quality
        |  FROM (SELECT source, text, string_split(text, ' ') AS words FROM documents))
        |SELECT source, count(*) AS n_docs,
        |  round(CAST(sum(CAST(quality AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6)
        |    AS avg_quality,
        |  round(CAST(sum(CAST(quality AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6)
        |    >= 0.8 AS kept
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_text_topterms" ->
      """SELECT lang, rk, tok, n FROM (
        |  SELECT lang, tok, count(*) AS n,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, tok) AS rk
        |  FROM (
        |    SELECT lang, unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
        |    FROM documents)
        |  GROUP BY lang, tok)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "q_text_ppl" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS cf FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS ct FROM freq)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(CAST(sum(CAST(round(-ln(CAST(cf AS DOUBLE) / ct), 8)
        |      AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS avg_nll
        |FROM toks JOIN freq USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_quality_model" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1), 6) AS punct_ratio,
        |    round(CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |      / greatest(len(words), 1), 6) AS stopword_ratio,
        |    round(CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1), 6) AS avg_word_len
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents))
        |SELECT doc_id, n_words, punct_ratio, stopword_ratio, avg_word_len,
        |  round(1.0 / (1.0 + exp(-(
        |    -2.0 + least(CAST(n_words AS DOUBLE), 60.0) * 0.05 +
        |    stopword_ratio * 5.0 - punct_ratio * 8.0 +
        |    CASE WHEN avg_word_len BETWEEN 3.0 AND 10.0 THEN 0.5 ELSE -0.5 END))), 6)
        |    AS model_score,
        |  round(1.0 / (1.0 + exp(-(
        |    -2.0 + least(CAST(n_words AS DOUBLE), 60.0) * 0.05 +
        |    stopword_ratio * 5.0 - punct_ratio * 8.0 +
        |    CASE WHEN avg_word_len BETWEEN 3.0 AND 10.0 THEN 0.5 ELSE -0.5 END))), 6)
        |    >= 0.5 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_cluster_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS ce
        |           FROM embeddings WHERE vec_id < 8)
        |SELECT vec_id, cid AS cluster FROM (
        |  SELECT v.vec_id, c.cid,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |        CAST(c.ce AS DOUBLE[])) DESC, c.cid) AS rk
        |  FROM embeddings v CROSS JOIN c)
        |WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    "q_dedup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS words FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        range(1, len(words)-3),
        |        i -> words[i]||' '||words[i+1]||' '||words[i+2]||' '||
        |             words[i+3]||' '||words[i+4]))) AS span
        |      FROM w WHERE len(words) >= 5),
        |cnt AS (SELECT span, count(*) AS dw FROM g GROUP BY span)
        |SELECT g.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN dw >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(CAST(sum(CASE WHEN dw >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_frac
        |FROM g JOIN cnt USING(span)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q_pii_redact" ->
      ("""WITH d AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail.example.com or """ +
        """555-123-4567 at 10.0.' || doc_id % 256 || '.1' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '__EMRE__', '<EMAIL>', 'g'), '__PHRE__', '<PHONE>', 'g'),
        |    '__IPRE__', '<IP>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text, '__EMRE__')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(text, '__EMRE__',
        |    '<EMAIL>', 'g'), '__PHRE__')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |    '__EMRE__', '<EMAIL>', 'g'), '__PHRE__', '<PHONE>', 'g'),
        |    '__IPRE__')) AS BIGINT) AS n_ips
        |FROM d ORDER BY doc_id""").stripMargin
        .replace("__EMRE__", CorpusOps.EmailRe)
        .replace("__PHRE__", CorpusOps.PhoneRe)
        .replace("__IPRE__", CorpusOps.Ipv4Re),
    "q_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
        |            len(string_split(text,' ')) AS n FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |  CASE WHEN n <= 32 THEN 1
        |       ELSE CAST(ceil((n-32)/24.0) AS BIGINT)+1 END AS nch FROM t),
        |e AS (SELECT doc_id, toks, n, unnest(range(0, nch)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id,
        |  array_to_string(list_slice(toks, chunk_id*24+1, chunk_id*24+32),
        |    ' ') AS chunk_text,
        |  CAST(least(32, n - chunk_id*24) AS BIGINT) AS n_tok
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH g AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text,' ') AS words
        |        FROM documents)
        |  WHERE len(words) >= 3)
        |SELECT id1, id2, j AS jaccard FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS j
        |  FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |    AND abs(a.n_chars - b.n_chars) <= 20)
        |WHERE j >= 0.1 ORDER BY id1, id2""".stripMargin,
    "q_dedup_prefix" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS words
        |        FROM documents)
        |  WHERE len(words) >= 3 AND len(list_distinct(list_transform(
        |    range(1, len(words)-1),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) > 0)
        |SELECT id1, id2, j AS jaccard FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS j
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.6 ORDER BY id1, id2""".stripMargin,
    "q_dedup_embedding" ->
      """SELECT id1, id2, c AS cos FROM (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 6) AS c
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE c >= 0.4 ORDER BY id1, id2""".stripMargin,
    "q_dedup_semantic" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS ce
        |           FROM embeddings WHERE vec_id < 8),
        |asg AS (
        |  SELECT vec_id, cluster, embedding FROM (
        |    SELECT v.vec_id, c.cid AS cluster, v.embedding,
        |      row_number() OVER (PARTITION BY v.vec_id
        |        ORDER BY list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |          CAST(c.ce AS DOUBLE[])) DESC, c.cid) AS rk
        |    FROM embeddings v CROSS JOIN c)
        |  WHERE rk = 1),
        |pm AS (
        |  SELECT a.vec_id,
        |    max(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 6)) AS max_cos_lower
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster
        |    AND b.vec_id < a.vec_id
        |  GROUP BY a.vec_id)
        |SELECT asg.vec_id, CAST(asg.cluster AS BIGINT) AS cluster,
        |  pm.max_cos_lower,
        |  coalesce(pm.max_cos_lower, -2.0) < 0.35 AS is_kept
        |FROM asg LEFT JOIN pm ON asg.vec_id = pm.vec_id
        |ORDER BY asg.vec_id""".stripMargin,
    "q_ann_bruteforce" ->
      """SELECT query_id, rk, cand_id, round(sim, 6) AS cos FROM (
        |  SELECT q.vec_id AS query_id, cand.vec_id AS cand_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(cand.embedding AS DOUBLE[])) AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |        CAST(cand.embedding AS DOUBLE[])) DESC, cand.vec_id) AS rk
        |  FROM embeddings q JOIN embeddings cand ON q.vec_id <> cand.vec_id
        |  WHERE q.vec_id < 5)
        |WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |    / greatest(len(words), 1), 6) AS stopword_ratio,
        |  round(CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1), 6) AS avg_word_len,
        |  round(
        |    least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |    (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |          BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |    least((CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |      / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |    (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1)) * 0.1, 6) AS quality
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    round(
        |      least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |      (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |      least((CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |      (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1)) * 0.1, 6) AS quality
        |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS words FROM documents)
        |), kept AS (
        |  SELECT lang, text, min(doc_id) AS doc_id, count(*) AS n_copies
        |  FROM scored WHERE quality >= 0.7 GROUP BY lang, text
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dups_removed,
        |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_corpus_sample" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE ((doc_id % 1000003) * 40503 + 17) % 10000 < 1000
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_corpus_split" ->
      """SELECT CASE
        |    WHEN b < 90 THEN 'train'
        |    WHEN b < 95 THEN 'val'
        |    ELSE 'test' END AS split,
        |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (SELECT n_chars,
        |        ((doc_id % 1000003) * 40503 + 29) % 100 AS b
        |      FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin,
    "q_corpus_pack" ->
      """SELECT lang, shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (
        |  SELECT lang, n_chars,
        |    CAST(floor((sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars)
        |      / 10000.0) AS BIGINT) AS shard
        |  FROM documents)
        |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
    // Same stopword-argmax semantics as LangIdArgmax: hit counts per
    // profile over lowercased alnum tokens, ties to the
    // lexicographically greatest code, 'und' when nothing hits.
    "q_text_langid" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS tk
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id,
        |    len(list_filter(tk, t -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], t))) AS en,
        |    len(list_filter(tk, t -> list_contains(
        |      ['der','die','das','und','ist','von','mit','den','im','ein'], t))) AS de,
        |    len(list_filter(tk, t -> list_contains(
        |      ['le','la','les','de','et','un','une','est','dans','que'], t))) AS fr,
        |    len(list_filter(tk, t -> list_contains(
        |      ['el','la','los','de','y','un','una','es','en','que'], t))) AS es,
        |    len(list_filter(tk, t -> list_contains(
        |      ['il','la','di','e','un','una','che','per','con','del'], t))) AS it
        |  FROM toks
        |), best AS (
        |  SELECT doc_id, CASE
        |    WHEN greatest(en, de, fr, es, it) = 0 THEN 'und'
        |    WHEN it = greatest(en, de, fr, es, it) THEN 'it'
        |    WHEN fr = greatest(en, de, fr, es, it) THEN 'fr'
        |    WHEN es = greatest(en, de, fr, es, it) THEN 'es'
        |    WHEN en = greatest(en, de, fr, es, it) THEN 'en'
        |    ELSE 'de' END AS lang_guess
        |  FROM scored
        |)
        |SELECT lang_guess, count(*) AS n FROM best
        |GROUP BY lang_guess ORDER BY lang_guess""".stripMargin,
    "q_pipeline_full" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS words
        |  FROM documents WHERE doc_id >= 20),
        |scored AS (
        |  SELECT doc_id, lang, n_chars, text, words,
        |    round(
        |      least(CAST(len(words) AS DOUBLE) / 20.0, 1.0) * 0.4 +
        |      (CASE WHEN CAST(length(text) - len(words) + 1 AS DOUBLE) / greatest(len(words), 1)
        |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
        |      least((CAST(len(list_filter(words, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / greatest(len(words), 1)) * 4, 1.0) * 0.2 +
        |      (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1)) * 0.1, 6) AS quality
        |  FROM w),
        |rep AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tri) = 0 THEN 0.0 ELSE
        |      round(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri), 6)
        |    END AS dupf
        |  FROM (SELECT doc_id, list_transform(range(1, len(words)-1),
        |          i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS tri
        |        FROM w)),
        |kept AS (
        |  SELECT s.doc_id AS doc_id, s.lang AS lang, s.n_chars AS n_chars,
        |         s.text AS text, s.words AS words
        |  FROM scored s JOIN rep r ON s.doc_id = r.doc_id
        |  WHERE s.quality >= 0.84 AND r.dupf <= 0.1),
        |g AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS grams
        |  FROM kept WHERE len(words) >= 3),
        |pairs AS (
        |  SELECT id1, id2 FROM (
        |    SELECT a.doc_id AS id1, b.doc_id AS id2,
        |      round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS j
        |    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |      AND abs(a.n_chars - b.n_chars) <= 20)
        |  WHERE j >= 0.1),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cid
        |         FROM reach GROUP BY a),
        |canon AS (
        |  SELECT k.doc_id AS doc_id, k.lang AS lang, k.text AS text,
        |         k.words AS words
        |  FROM kept k LEFT JOIN comp c ON k.doc_id = c.doc_id
        |  WHERE c.cid IS NULL OR c.cid = k.doc_id),
        |eg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(words)-3),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
        |         || ' ' || words[i+3] || ' ' || words[i+4]))) AS gram
        |  FROM (SELECT string_split(text, ' ') AS words FROM documents
        |        WHERE doc_id < 20)
        |  WHERE len(words) >= 5),
        |cont AS (
        |  SELECT DISTINCT cg.doc_id AS doc_id FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(words)-3),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
        |           || ' ' || words[i+3] || ' ' || words[i+4]))) AS gram
        |    FROM canon WHERE len(words) >= 5) cg
        |  JOIN eg ON cg.gram = eg.gram),
        |clean AS (
        |  SELECT * FROM canon
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |            ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(words, t -> t <> ''))) AS BIGINT) AS total_tokens
        |FROM (SELECT lang, words,
        |        ((doc_id % 1000003) * 40503 + 29) % 100 AS b
        |      FROM clean)
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_corpus_mix" ->
      """WITH c AS (SELECT source, count(*) AS cs FROM documents GROUP BY source),
        |tot AS (SELECT sum(cs) AS n, sum(pow(cs, 0.5)) AS sw FROM c),
        |rates AS (
        |  SELECT source,
        |    round(least(1.0, 0.5 * n * (pow(cs, 0.5) / sw) / cs), 6) AS p
        |  FROM c CROSS JOIN tot)
        |SELECT d.source AS source, count(*) AS n_kept,
        |  CAST(sum(d.n_chars) AS BIGINT) AS chars
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE ((d.doc_id % 1000003) * 40503 + 37) % 1000000 <
        |  CAST(round(r.p * 1000000) AS BIGINT)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(words)-3),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
        |           || ' ' || words[i+3] || ' ' || words[i+4])) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS words FROM documents)
        |  WHERE len(words) >= 5),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20)
        |SELECT c.doc_id AS doc_id, count(*) AS n_shared
        |FROM c JOIN e ON c.gram = e.gram
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q_corpus_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) >= 5),
        |per_doc AS (
        |  SELECT doc_id, lang, count(*) AS n_toks,
        |    sum(CASE WHEN v.one IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM toks LEFT JOIN (SELECT tok, 1 AS one FROM vocab) v
        |    ON toks.tok = v.tok
        |  GROUP BY doc_id, lang)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(n_oov) AS DOUBLE) / sum(n_toks), 6) AS oov_rate
        |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE g AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text,' ') AS words
        |        FROM documents)
        |  WHERE len(words) >= 3),
        |pairs AS (
        |  SELECT id1, id2 FROM (
        |    SELECT a.doc_id AS id1, b.doc_id AS id2,
        |      round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS j
        |    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |      AND abs(a.n_chars - b.n_chars) <= 20)
        |  WHERE j >= 0.1),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION SELECT id2, id1 FROM pairs),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical FROM (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a)
        |ORDER BY doc_id""".stripMargin,
    "q_text_hybrid" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')) AS DOUBLE) AS dl,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |posts AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        |  WHERE term IN ('vector', 'spark', 'merge')
        |  GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM posts GROUP BY term),
        |bm AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(
        |      ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * p.tf * (1.2 + 1) /
        |        (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl))
        |      AS DECIMAL(30,15))) AS DOUBLE), 6) AS score
        |  FROM posts p JOIN dfreq f ON p.term = f.term CROSS JOIN stats s
        |  GROUP BY doc_id),
        |lex AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
        |        FROM bm QUALIFY lex_rank <= 1000),
        |vec AS (SELECT v.vec_id AS doc_id,
        |          row_number() OVER (ORDER BY
        |            list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |              CAST(q.qe AS DOUBLE[])) DESC, v.vec_id) AS vec_rank
        |        FROM embeddings v,
        |          (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7) q
        |        WHERE v.vec_id <> 7 QUALIFY vec_rank <= 1000)
        |SELECT doc_id,
        |  round(coalesce(1.0 / (lex_rank + 60), 0.0) +
        |        coalesce(1.0 / (vec_rank + 60), 0.0), 6) AS rrf,
        |  lex_rank, vec_rank
        |FROM lex FULL OUTER JOIN vec USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin,
    "q_text_tfidf" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')) AS DOUBLE) AS dl
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
        |posts AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        |  WHERE term IN ('vector', 'spark', 'merge')
        |  GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM posts GROUP BY term)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(round(ln(1.0 + tf) * ln(n / df) / dl, 8)
        |    AS DECIMAL(20,10))) AS DOUBLE), 6) AS score
        |FROM posts JOIN dfreq USING (term), stats
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    "q_text_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')) AS DOUBLE) AS dl,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |posts AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        |  WHERE term IN ('vector', 'spark', 'merge')
        |  GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM posts GROUP BY term)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(
        |    ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * p.tf * (1.2 + 1) /
        |      (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl))
        |    AS DECIMAL(30,15))) AS DOUBLE), 6) AS score
        |FROM posts p JOIN dfreq f ON p.term = f.term CROSS JOIN stats s
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    "q_text_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS words
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(words)),
        |      i -> words[i] || ' ' || words[i+1]) AS bigrams,
        |    list_transform(range(1, len(words)-1),
        |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS trigrams
        |  FROM w),
        |tops AS (
        |  SELECT doc_id, max(n) AS top_bigram_n FROM (
        |    SELECT doc_id, gram, count(*) AS n
        |    FROM (SELECT doc_id, unnest(bigrams) AS gram FROM b)
        |    GROUP BY doc_id, gram)
        |  GROUP BY doc_id)
        |SELECT b.doc_id AS doc_id,
        |  CAST(len(bigrams) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
        |  round(CAST(coalesce(top_bigram_n, 0) AS DOUBLE)
        |    / greatest(len(bigrams), 1), 6) AS top_bigram_frac,
        |  CASE WHEN len(trigrams) = 0 THEN 0.0 ELSE
        |    round(1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
        |      / len(trigrams), 6) END AS dup_trigram_frac
        |FROM b LEFT JOIN tops ON b.doc_id = tops.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')), ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(greatest(octet_length(CAST(text AS BLOB)) // 32 - 1, 0) // 4 + 1
        |    AS BIGINT) AS n_sampled,
        |  CAST(CASE WHEN octet_length(CAST(text AS BLOB)) >= 32
        |    THEN 32 * (greatest(octet_length(CAST(text AS BLOB)) // 32 - 1, 0) // 4 + 1)
        |    ELSE octet_length(CAST(text AS BLOB)) END AS BIGINT) AS sampled_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_features" ->
      // replays attachImages' pixel formulas on the stored columns:
      // the Spark side must get the SAME numbers back out of the
      // actual PNG bytes via javax.imageio
      """SELECT doc_id,
        |  CAST(1 + n_chars % 16 AS INT) AS width,
        |  CAST(1 + doc_id % 12 AS INT) AS height,
        |  CAST((1 + n_chars % 16) * (1 + doc_id % 12) AS BIGINT) AS n_pixels,
        |  round((
        |    floor((1 + doc_id % 12 + 1) / 2.0) * (doc_id % 256) +
        |    ((1 + doc_id % 12) - floor((1 + doc_id % 12 + 1) / 2.0)) *
        |      ((doc_id % 256 + 64) % 256)
        |  ) / (1 + doc_id % 12), 6) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_mixed" ->
      // per-container pixel-formula replay: two-band mean for the
      // lossless PNG/GIF rows, the uniform gray level for the
      // quality-1.0 JPEG rows
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |    WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
        |  CAST(1 + n_chars % 16 AS INT) AS width,
        |  CAST(1 + doc_id % 12 AS INT) AS height,
        |  CAST((1 + n_chars % 16) * (1 + doc_id % 12) AS BIGINT) AS n_pixels,
        |  CASE WHEN doc_id % 3 = 1 THEN round(CAST(doc_id % 256 AS DOUBLE), 6)
        |    ELSE round((
        |      floor((1 + doc_id % 12 + 1) / 2.0) * (doc_id % 256) +
        |      ((1 + doc_id % 12) - floor((1 + doc_id % 12 + 1) / 2.0)) *
        |        ((doc_id % 256 + 64) % 256)
        |    ) / (1 + doc_id % 12), 6) END AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_video" ->
      // frames sampled at stride 2 over 1 + doc_id%5 frames:
      // {0} / {0} / {0,2} / {0,2} / {0,2,4}; frame f's uniform gray is
      // (doc_id%256 + 17f) % 256
      """SELECT doc_id,
        |  CAST(1 + doc_id % 5 AS INT) AS n_frames,
        |  CAST((doc_id % 5 + 2) // 2 AS INT) AS n_sampled,
        |  CASE WHEN doc_id % 5 IN (0, 1)
        |      THEN round(CAST(doc_id % 256 AS DOUBLE), 6)
        |    WHEN doc_id % 5 IN (2, 3)
        |      THEN round((doc_id % 256 + (doc_id % 256 + 34) % 256) / 2.0, 6)
        |    ELSE round((doc_id % 256 + (doc_id % 256 + 34) % 256 +
        |      (doc_id % 256 + 68) % 256) / 3.0, 6)
        |  END AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_audio" ->
      // sample i of doc d is (d*31 + i*17) % 2001 - 1000 over
      // n = 100 + d%50 samples; series is uncorrelated (DuckDB 1.0
      // lacks lateral generate_series params) and bounded by the
      // theta join
      """SELECT d.doc_id,
        |  8000 AS sample_rate,
        |  CAST(100 + d.doc_id % 50 AS INT) AS n_samples,
        |  round(avg(abs((d.doc_id*31 + s.i*17) % 2001 - 1000)), 6) AS mean_abs,
        |  CAST(max(abs((d.doc_id*31 + s.i*17) % 2001 - 1000)) AS INT) AS peak
        |FROM documents d
        |JOIN generate_series(0, 148) s(i) ON s.i < 100 + d.doc_id % 50
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_multimodal_audio2" ->
      // even docs: stereo PCM16, L_i = (d·31+i·17)%2001−1000, R_i =
      // (d·13+i·29)%1601−800 over 100+d%50 frames; odd docs: μ-law
      // byte u_i = (d·7+i·11)%256 over 80+d%40 frames, expanded by
      // G.711: c = 255−u, |linear16| = ((2·(c%16)+33)·2^((c//16)%8)
      // − 33)·4 (probed identical to the JDK codec for all 256 codes)
      """SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 2 = 0 THEN 'pcm16' ELSE 'ulaw' END AS encoding,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT)
        |    AS n_channels,
        |  8000 AS sample_rate,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 100 + d.doc_id % 50
        |    ELSE 80 + d.doc_id % 40 END AS INT) AS n_frames,
        |  round(avg(CASE WHEN d.doc_id % 2 = 0
        |      THEN abs((d.doc_id*31 + s.i*17) % 2001 - 1000)
        |      ELSE ((2 * ((255 - (d.doc_id*7 + s.i*11) % 256) % 16) + 33)
        |        * CAST(power(2, ((255 - (d.doc_id*7 + s.i*11) % 256) // 16) % 8)
        |          AS BIGINT) - 33) * 4
        |    END), 6) AS mean_abs_l,
        |  CAST(max(CASE WHEN d.doc_id % 2 = 0
        |      THEN abs((d.doc_id*31 + s.i*17) % 2001 - 1000)
        |      ELSE ((2 * ((255 - (d.doc_id*7 + s.i*11) % 256) % 16) + 33)
        |        * CAST(power(2, ((255 - (d.doc_id*7 + s.i*11) % 256) // 16) % 8)
        |          AS BIGINT) - 33) * 4
        |    END) AS INT) AS peak_l,
        |  round(avg(CASE WHEN d.doc_id % 2 = 0
        |    THEN abs((d.doc_id*13 + s.i*29) % 1601 - 800) END), 6) AS mean_abs_r,
        |  CAST(max(CASE WHEN d.doc_id % 2 = 0
        |    THEN abs((d.doc_id*13 + s.i*29) % 1601 - 800) END) AS INT) AS peak_r
        |FROM documents d
        |JOIN generate_series(0, 149) s(i)
        |  ON s.i < CASE WHEN d.doc_id % 2 = 0 THEN 100 + d.doc_id % 50
        |    ELSE 80 + d.doc_id % 40 END
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_multimodal_bytes" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(octet_length(CAST(text AS BLOB)) // 32 AS BIGINT) AS n_frames,
        |  round(CAST(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'sum') AS DOUBLE)
        |    / octet_length(CAST(text AS BLOB)), 6) AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
