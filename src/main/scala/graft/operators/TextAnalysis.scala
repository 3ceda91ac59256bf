package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star M5):
  * language-ID, quality scoring, token counting, fingerprinting.
  * Everything is a native expression tree — codegen'd, shuffle-free,
  * embarrassingly parallel over document partitions at 100TB.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * heuristic language classifier.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "en", "que"),
    "it" -> Seq("il", "la", "di", "e", "un", "una", "che", "per", "con", "del"))

  private def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-zA-Z0-9]+"), t => t =!= "")

  /** Stopword-hit score for one language profile. */
  def langScore(text: Column, lang: String): Column = {
    val toks = tokens(text)
    val sw = typedlit(stopwords(lang))
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic language-ID: argmax of the per-language stopword hit
    * counts ('und' when nothing matches), via the fused native
    * [[LangIdArgmax]] expression — one pass over the tokens against
    * hash-set profiles, inside whole-stage codegen (the composable
    * per-profile `filter(toks, array_contains(...))` form walked the
    * array once per language through interpreted HOF machinery).
    */
  def languageId(text: Column): Column =
    LangIdArgmax(tokens(text), stopwords)

  /** [[languageId]] DataFrame form (kept for API symmetry with the
    * other with* helpers — the fused expression already reads the
    * token array exactly once).
    */
  def withLanguageId(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn(out, languageId(col(textCol)))

  /** Quality features + a composite score in [0,1]:
    * length band, punctuation ratio, stopword ratio, word-length
    * sanity — the usual pre-training corpus filters.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val words = split(text, " ")
    val nWords = size(words)
    val nChars = length(text)
    val punct = nChars - length(DuckRegexpReplace.sparkReplaceAll(text, "[.,;:!?]", ""))
    val sw = typedlit(stopwords("en"))
    val stopRatio = size(filter(words, w => array_contains(sw, w)))
      .cast("double") / greatest(nWords, lit(1))
    val punctRatio = punct.cast("double") / greatest(nChars, lit(1))
    val avgWordLen = (nChars - nWords + 1).cast("double") / greatest(nWords, lit(1))
    val lenScore = least(nWords.cast("double") / 20.0, lit(1.0))
    val wordLenScore = when(avgWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val score = round(
      lenScore * 0.4 + wordLenScore * 0.3 +
        least(stopRatio * 4, lit(1.0)) * 0.2 + (lit(1.0) - punctRatio) * 0.1, 6)
    df.withColumn("n_words", nWords.cast("bigint"))
      .withColumn("punct_ratio", round(punctRatio, 6))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("avg_word_len", round(avgWordLen, 6))
      .withColumn("quality", score)
  }

  /** Logistic quality model: a fixed-weight linear classifier over the
    * [[qualityFeatures]] signals, squashed to a keep-probability — the
    * shape of the model-based quality filters in the public pipeline
    * literature (CCNet / Gopher / C4 use trained fasttext or logistic
    * models; the weights here are fixed constants so the operator is
    * deterministic and oracle-checkable, and a trained coefficient
    * vector drops in without changing the plan).
    *
    * The score is computed from the ROUNDED feature columns (6 dp),
    * so any engine replaying the published formula reproduces it
    * bit-for-bit; the final sigmoid is rounded to 6 dp to absorb
    * last-ulp exp() differences across math libraries.
    *
    * Scale: map-only — one codegen'd expression per row on top of the
    * feature projection, no shuffle.
    */
  def qualityModel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = qualityFeatures(df, textCol)
    val z = lit(-2.0) +
      least(col("n_words").cast("double"), lit(60.0)) * 0.05 +
      col("stopword_ratio") * 5.0 -
      col("punct_ratio") * 8.0 +
      when(col("avg_word_len").between(3.0, 10.0), 0.5).otherwise(-0.5)
    val score = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    f.select(col(idCol), col("n_words"), col("punct_ratio"),
        col("stopword_ratio"), col("avg_word_len"),
        score.as("model_score"),
        (score >= 0.5).as("keep"))
  }

  /** Unigram log-probability scoring — the perplexity-proxy filter of
    * CCNet (Wenzek et al. 2020, public): score each document by the
    * mean negative log-probability of its tokens under the corpus's
    * own unigram distribution. High avg_nll = rare-token soup (OCR
    * noise, gibberish); low = stopword-heavy boilerplate. A real
    * pipeline thresholds both tails.
    *
    * Determinism: each token's -ln p is rounded to 8 dp (absorbing
    * last-ulp ln() differences) then accumulated as an exact DECIMAL,
    * so the per-doc mean is independent of partitioning and addition
    * order — fully oracle-checkable.
    *
    * Scale shape (same as [[CorpusOps.oovReport]]): one token-keyed
    * hash aggregate to build the frequency table, one token-keyed
    * shuffle join to probe it (the unigram table of a 100 TB corpus is
    * itself large, so no broadcast — AQE handles stopword skew, and
    * map-side combine collapses the frequent tokens), one doc-keyed
    * rollup.
    */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(Ranking.tokens(col(textCol))).as("tok"))
      .localCheckpoint(eager = false) // freq build + probe share it
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
    val total = freq.agg(sum(col("cf")).as("ct"))
    val nll = round(-log(col("cf").cast("double") / col("ct")), 8)
      .cast("decimal(20,10)")
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        // exact decimal sum → one well-defined double conversion →
        // correctly-rounded double division: identical in any engine
        round(sum(nll).cast("double") / count(lit(1)), 6).as("avg_nll"))
  }

  /** Interpolated bigram negative log-likelihood — the CCNet-style
    * language-model quality proxy one order up from
    * [[unigramLogProb]]: per bigram position,
    * `p = λ·p(w2|w1) + (1−λ)·p(w2)` with conditional probabilities
    * from corpus bigram counts over context counts (positions where
    * w1 has a successor) and the unigram backoff from corpus token
    * frequencies. Per-doc average NLL accumulates exactly in decimal
    * after a 1e-8 round of each position's −ln p (the libm-ulp guard
    * shared with the unigram row); docs with fewer than two tokens
    * report n_bigrams = 0 and NULL avg.
    *
    * Scale: bigram instances come from a `lead` window whose
    * partitions are single documents (bounded); the three count
    * tables are token-keyed hash aggregates with map-side combine;
    * the probability join is token-keyed. Nothing pairwise, no
    * global structure — CCNet runs this shape at web scale.
    */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", lambda: Double = 0.7): DataFrame = {
    // r12 restructure: adjacent pairs come MAP-SIDE from the token
    // array (transform(sequence(1, n-1)) + element_at — a zip_with
    // over two slices was measured worse, two array copies per row)
    // instead of a lead() window —
    // the doc-keyed window SHUFFLED the entire token table just to
    // pair neighbors that already sit adjacent in the array; now the
    // token table never shuffles at all (guide §2.4 "remove shuffles
    // outright"). The shared base is the per-doc ARRAY frame (one row
    // per doc — far smaller than the exploded token table the old
    // shape checkpointed); bigram instances and all counts are
    // unchanged row for row.
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        Ranking.tokens(col(textCol)).as("toks"))
      .localCheckpoint(eager = false) // unigram counts + bigram build
    val t = col("toks")
    val pairsArr = when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1), i =>
          struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bi = base.select(col("doc_id"), explode(pairsArr).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint(eager = false) // counts + probe share it
    val uni = base.select(explode(t).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val uniTot = uni.agg(sum(col("cu")).as("ct"))
    val ctx = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val pair = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val p = col("cb").cast("double") / col("c1") * lambda +
      col("cu").cast("double") / col("ct") * (1 - lambda)
    val nll = round(-log(p), 8).cast("decimal(20,10)")
    bi.join(pair, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2"), Seq("w2"))
      .crossJoin(broadcast(uniTot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(nll).cast("double") / count(lit(1)), 6).as("avg_nll"))
      .join(docs.select(col(idCol).cast("long").as("doc_id")),
        Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens",
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("bigint"))
      .withColumn("bpe_tokens",
        size(expr(s"regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("bigint"))

  /** Duplicate-trigram fraction as a pure expression column — the
    * shuffle-free member of the repetition family, for pipelines that
    * gate on it without needing the per-doc top-bigram mode. The
    * trigram array is materialized through its own projection so the
    * three references (two sizes + distinct) don't recompute it.
    */
  def withDupTrigramFrac(df: DataFrame, textCol: String,
      out: String): DataFrame = {
    val w = col("__dtf_w")
    val tri = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    // words and trigrams each materialize through their own projection:
    // both are multi-referenced non-cheap arrays, and inlining them
    // re-splits the text once per reference
    df.withColumn("__dtf_w", filter(split(col(textCol), " "), x => x =!= ""))
      .withColumn("__tri", tri)
      .drop("__dtf_w")
      .withColumn(out,
        when(size(col("__tri")) === 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(col("__tri"))).cast("double") /
            size(col("__tri")), 6)))
      .drop("__tri")
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    * how much of a document is the same phrase repeated. Emitted per
    * doc: bigram count, the most frequent bigram's occurrence count
    * and fraction, and the fraction of trigrams that are duplicates.
    *
    * Unlike the rest of this file, the top-bigram signal is not
    * shuffle-free — the per-doc mode needs a (doc, gram) hash
    * aggregate — but both shuffles are keyed by doc_id, so the
    * operator stays embarrassingly parallel across documents at
    * 100 TB (no cross-document joins).
    */
  def repetitionFeatures(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = filter(split(col(textCol), " "), w => w =!= "")
    def grams(wc: Column, n: Int): Column =
      // sequence(1, hi) DESCENDS when hi < 1 (Spark semantics) — the
      // short-doc guard must short-circuit before sequence() is built
      when(size(wc) >= n,
        transform(sequence(lit(1), size(wc) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(wc, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    val base = df
      .select(col(idCol).cast("long").as("doc_id"), words.as("words"))
      .select(col("doc_id"), grams(col("words"), 2).as("bigrams"),
        grams(col("words"), 3).as("trigrams"))
      .localCheckpoint(eager = false) // per-doc frame + exploded counts share it

    val top = base
      .select(col("doc_id"), explode(col("bigrams")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_bigram_n"))

    val nTri = size(col("trigrams"))
    base.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("bigrams")).cast("bigint").as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).cast("bigint").as("top_bigram_n"),
        round(coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
          greatest(size(col("bigrams")), lit(1)), 6).as("top_bigram_frac"),
        when(nTri === 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(col("trigrams"))).cast("double") /
            nTri, 6)).as("dup_trigram_frac"))
  }

  /** Per-group top terms — the corpus-statistics report every
    * pipeline writes (vocabulary drift, language sanity checks,
    * stopword balance): the `k` most frequent tokens within each
    * group (language, source, …), rank ties broken lexically so the
    * report is deterministic and oracle-checkable.
    *
    * Scale: one (group, token)-keyed hash aggregate with map-side
    * combine (exactly the frequent tokens collapse hardest), then a
    * rank window whose partitions are groups — the aggregate output,
    * not the corpus.
    */
  def topTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(Ranking.tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("n").desc, col("tok"))))
      .filter(col("rk") <= k)
      .withColumnRenamed("grp", groupCol)
      .select(col(groupCol), col("rk"), col("tok"), col("n"))
  }

  /** Polynomial rolling-hash fingerprint of the normalized text,
    * mod 2^31-1 (keeps the ANSI-mode fold inside long range).
    */
  def fingerprint(text: Column): Column = {
    val normalized = lower(DuckRegexpReplace.sparkReplaceAll(text, "[^a-zA-Z0-9 ]", ""))
    aggregate(split(normalized, ""), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 2147483647L)
  }

  /** URL regex shared with the oracle replay (Java and RE2 agree on
    * this subset: literal alternation, char classes, no lookaround).
    */
  val UrlRe = "https?://[a-zA-Z0-9.-]+(/[a-zA-Z0-9/._-]*)?"
  val DomainRe = "https?://([a-zA-Z0-9.-]+)"

  /** Per-domain URL statistics over a corpus — the domain-level view
    * C4/RefinedWeb curation filters on (domain allow/deny lists,
    * per-domain caps): extract URLs from the text, reduce to
    * registrable domain strings, and aggregate.
    *
    * Output: (domain, n_urls, n_docs) — one row per domain.
    *
    * Scale: a map-only regex extract + explode (token-shaped), then
    * ONE domain-keyed hash aggregate with map-side combine (domains
    * are Zipf-heavy, partial aggregation collapses the head). The
    * per-doc distinct is carried as a (domain, doc) pre-aggregate —
    * two shuffles total, both on the domain key.
    */
  def urlDomainStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val urls = docs.select(col(idCol).as("id"),
        explode(expr(s"regexp_extract_all($textCol, '$UrlRe', 0)"))
          .as("url"))
      .select(col("id"),
        regexp_extract(col("url"), DomainRe, 1).as("domain"))
    urls.groupBy(col("domain"), col("id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("domain"))
      .agg(sum(col("n")).as("n_urls"), count(lit(1)).as("n_docs"))
  }

  /** Learn a BPE merge table from the corpus (Sennrich et al. 2016).
    *
    * The corpus pass is ONE distributed (token → count) hash
    * aggregate; training then runs driver-side on the top
    * `maxDictWords` rows of the frequency dictionary — the classic
    * subword-nmt formulation trains on the word-frequency dict, never
    * the raw corpus, and the dict is Zipf-bounded (top-8k words cover
    * the overwhelming mass at any corpus size), so the collect is a
    * fixed-size sanctioned driver step like the IVF seeding pool.
    * Deterministic: dictionary truncation orders (count desc, word),
    * merge ties break lexicographically.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 200, maxDictWords: Int = 8192): Seq[(String, String)] = {
    val wf = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxDictWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.train(wf, numMerges)
  }

  /** Real BPE token array + count columns from a learned merge table
    * (map-only; the [[BpeEncode]] native expression stays inside
    * whole-stage codegen, merges ship in the serialized plan).
    */
  def withBpeTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], out: String = "bpe"): DataFrame =
    df.withColumn(out, Bpe.encodeColumn(col(textCol), merges))
      .withColumn(s"${out}_count", size(col(out)).cast("long"))

  /** C4-style line-level page cleaning (Raffel et al. 2020, §2.2 of
    * the T5 paper — the rules behind the C4 corpus):
    *
    *  - keep only lines that end in a terminal punctuation mark
    *    (`.` `!` `?` `"`);
    *  - drop lines with fewer than `minWordsPerLine` words;
    *  - drop any line containing the word "javascript" (case-folded);
    *  - drop the whole page if it contains "lorem ipsum" (case-folded)
    *    or a curly brace;
    *  - drop the page if fewer than `minKeptLines` lines survive.
    *
    * Output: input id column + `kept` (page verdict), `n_lines`,
    * `n_kept`, and `clean_text` (surviving lines re-joined with \n;
    * empty string for dropped pages so downstream schemas stay stable).
    *
    * Scale: pure expression tree over one text column — map-only,
    * codegen'd array HOFs, no shuffle; embarrassingly parallel at
    * 100 TB. Page filtering composes with the quality/dedup gates.
    */
  def c4LineClean(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWordsPerLine: Int = 3,
      minKeptLines: Int = 3): DataFrame = {
    val text = col(textCol)
    val lines = split(text, "\n")
    def lineOk(l: Column): Column = {
      val t = trim(l)
      (t.rlike("[.!?\"]$")) &&
        (size(filter(split(t, " +"), w => w =!= "")) >= minWordsPerLine) &&
        !lower(t).contains("javascript")
    }
    val junkPage = lower(text).contains("lorem ipsum") || text.contains("{")
    df.withColumn("__kept_lines", filter(lines, lineOk _))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(col("__kept_lines")).cast("long"))
      .withColumn("kept", !junkPage && col("n_kept") >= minKeptLines)
      .withColumn("clean_text",
        when(col("kept"), array_join(col("__kept_lines"), "\n"))
          .otherwise(lit("")))
      .drop("__kept_lines")
  }
}
