package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.rawConcat

import QueryDsl._

/** Round-9 curation wave: corpus-cleaning operators from the published
  * LLM-data-pipeline literature, each Spark-first with a DuckDB oracle
  * replay under the driver's hard gate.
  *
  * The `documents` fixture is single-line word soup, so page-shaped
  * inputs (lines, punctuation, boilerplate markers) are synthesized
  * deterministically from doc_id + the word list — the SAME
  * construction in both engines, the multimodal-fixture pattern.
  */
object QueriesCuration {

  lazy val defs: Map[String, Q] = Map(
    // C4 line-level page cleaning (Raffel et al. 2020): synthesize a
    // multi-line page per doc (6-word lines, hash-scheduled terminal
    // punctuation, javascript-line + lorem-ipsum/brace injections),
    // then apply the line and page rules. Map-only codegen'd HOFs.
    "q_text_c4lines" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val nl = ceil(size(words) / lit(6.0)).cast("int")
      val line = (i: org.apache.spark.sql.Column) =>
        rawConcat(
          when(pmod(col("doc_id") * 3 + i, lit(7)) === 0, lit("javascript "))
            .otherwise(lit("")),
          array_join(slice(words, i * 6 + 1, lit(6)), " "),
          element_at(typedlit(Seq(".", "!", "", "?")),
            (pmod(col("doc_id") + i, lit(4)) + 1).cast("int")))
      val page = array_join(transform(sequence(lit(0), nl - 1), line), "\n")
      val withJunk =
        when(col("doc_id") % 17 === 0,
          rawConcat(page, lit("\nlorem ipsum dolor sit amet.")))
        .when(col("doc_id") % 23 === 0,
          rawConcat(page, lit("\nif (x) { return 1; } done.")))
        .otherwise(page)
      val pages = t(s, dir, "documents")
        .select(col("doc_id"), withJunk.as("text"))
      TextAnalysis.c4LineClean(pages, "doc_id", "text",
          minWordsPerLine = 3, minKeptLines = 3)
        .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept"),
          col("clean_text"))
        .orderBy(col("doc_id"))
    }),
    // DSIR importance resampling (Xie et al. 2023): target = the
    // English slice, raw = the whole corpus; hashed unigram+bigram
    // bucket models, add-1 smoothing, deterministic top-200 selection.
    "q_corpus_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusOps.dsirResample(docs, docs.filter(col("lang") === "en"),
          k = 200, buckets = 256)
        .orderBy(col("doc_id"))
    }),
    // Incremental cross-corpus dedup: screen a new batch (every 4th
    // doc) against the existing corpus (the rest) — exact md5 stage +
    // asymmetric n-gram Jaccard stage, deterministic best-match. The
    // fixture has no full-text duplicates, so every 20th batch doc
    // takes its neighbor's text (a corpus doc — same construction in
    // the oracle) to exercise the exact stage under the hard gate.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val donor = docs.select(col("doc_id").as("did"),
        col("text").as("dtext"))
      val batch = docs.filter(col("doc_id") % 4 === 0)
        .join(donor, col("did") === col("doc_id") + 1, "left")
        .select(col("doc_id"),
          when(col("doc_id") % 20 === 0 && col("dtext").isNotNull,
            col("dtext")).otherwise(col("text")).as("text"),
          col("lang"), col("n_chars"))
      Dedup.incrementalDedup(batch, docs.filter(col("doc_id") % 4 =!= 0),
          shingleSize = 3, maxCharDiff = 20, threshold = 0.5)
        .orderBy(col("doc_id"))
    }),
    // Epoch materialization: the epochPlan expanded into the actual
    // per-copy training list (floor passes + seeded fractional pick).
    "q_corpus_epochs2" -> ((s, dir) => {
      CorpusOps.materializeEpochs(t(s, dir, "documents"), "source",
          temperature = 2.0, budget = 1000000L, seed = 97)
        .orderBy(col("doc_id"), col("epoch_copy"))
    }),
    // T5 span corruption: deterministic sentinel masking (2-token
    // spans on a doc-seeded 7-periodic schedule → 2/7 corruption).
    "q_corpus_spanmask" -> ((s, dir) => {
      CorpusOps.spanCorrupt(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    // CCNet-style interpolated bigram NLL (one LM order above
    // q_text_ppl; λ=0.7 conditional + 0.3 unigram backoff).
    "q_text_ppl2" -> ((s, dir) => {
      TextAnalysis.bigramLogProb(t(s, dir, "documents"), lambda = 0.7)
        .orderBy(col("doc_id"))
    }),
    // Per-domain URL statistics (C4/RefinedWeb domain-filter view).
    // URLs are synthesized deterministically from doc_id (the PII-row
    // pattern) so extraction has real matches in both engines.
    "q_text_urls" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        rawConcat(col("text"),
          lit(" see https://www.site"), pmod(col("doc_id"), lit(7)),
          lit(".example.com/page/"), col("doc_id"),
          lit(" and http://cdn"), pmod(col("doc_id"), lit(3)),
          lit(".assets.net/x_"), col("doc_id")).as("text"))
      TextAnalysis.urlDomainStats(d, "doc_id", "text")
        .orderBy(col("domain"))
    }),
    // Incremental SEMANTIC dedup (rows-only: probabilistic banded
    // candidates; recall gated in SpecGates, precedence in DedupSpec):
    // new embeddings screened against the existing corpus index. The
    // fixture has no cross-split high-cos pairs, so every 5th batch
    // vector takes its neighbor's embedding (a corpus vector — the
    // donor trick from q_dedup_incremental) so the dup path runs.
    "q_dedup_embedding_inc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val donor = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("demb"), col("label").as("dlab"))
      val batch = emb.filter(col("vec_id") % 4 === 0)
        .join(donor, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("vec_id") % 20 === 0 && col("demb").isNotNull,
            col("demb")).otherwise(col("embedding")).as("embedding"),
          when(col("vec_id") % 20 === 0 && col("demb").isNotNull,
            col("dlab")).otherwise(col("label")).as("label"))
      Dedup.incrementalEmbeddingDedup(batch,
          emb.filter(col("vec_id") % 4 =!= 0), threshold = 0.85)
        .orderBy(col("vec_id"))
    }),
    // Real BPE tokenization (rows-only: the learned merge table is an
    // engine artifact — reconstruction + compression bounded in
    // BpeSpec/SpecGates). One dict aggregate, driver-side training on
    // the Zipf-bounded dictionary, then a map-only codegen'd encode.
    "q_text_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = TextAnalysis.learnBpeMerges(docs, "text",
        numMerges = 60, maxDictWords = 4096)
      TextAnalysis.withBpeTokens(docs, "text", merges)
        .select(col("doc_id"), col("bpe_count").as("n_bpe"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          round(length(col("text")).cast("double") / col("bpe_count"), 6)
            .as("chars_per_token"))
        .orderBy(col("doc_id"))
    }))

  lazy val oracles: Map[String, String] = Map(
    "q_text_c4lines" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |l AS (SELECT doc_id, words,
        |        CAST(ceil(len(words) / 6.0) AS BIGINT) AS nl FROM w),
        |pages AS (SELECT doc_id,
        |  array_to_string(list_transform(range(0, nl), i ->
        |    (CASE WHEN (doc_id*3 + i) % 7 = 0 THEN 'javascript '
        |          ELSE '' END) ||
        |    array_to_string(list_slice(words, i*6+1, i*6+6), ' ') ||
        |    (['.','!','','?'])[CAST((doc_id + i) % 4 AS INT) + 1]),
        |    chr(10)) AS page FROM l),
        |p2 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 17 = 0
        |         THEN page || chr(10) || 'lorem ipsum dolor sit amet.'
        |       WHEN doc_id % 23 = 0
        |         THEN page || chr(10) || 'if (x) { return 1; } done.'
        |       ELSE page END AS text FROM pages),
        |k AS (SELECT doc_id, text,
        |  string_split(text, chr(10)) AS lines,
        |  list_filter(string_split(text, chr(10)), s ->
        |    regexp_matches(trim(s), '[.!?"]$')
        |    AND len(list_filter(regexp_split_to_array(trim(s), ' +'),
        |          x -> x <> '')) >= 3
        |    AND NOT contains(lower(trim(s)), 'javascript')) AS keptl
        |  FROM p2)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(keptl) AS BIGINT) AS n_kept,
        |  (NOT (contains(lower(text), 'lorem ipsum') OR contains(text, '{')))
        |    AND len(keptl) >= 3 AS kept,
        |  CASE WHEN (NOT (contains(lower(text), 'lorem ipsum')
        |               OR contains(text, '{'))) AND len(keptl) >= 3
        |       THEN array_to_string(keptl, chr(10)) ELSE '' END AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_corpus_dsir" ->
      """WITH rawg AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(g, ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 2147483647) % 256 AS bucket
        |  FROM (
        |    SELECT doc_id, unnest(list_concat(words,
        |      CASE WHEN len(words) >= 2 THEN
        |        list_transform(range(1, len(words)),
        |          i -> words[i] || ' ' || words[i+1])
        |      ELSE [] END)) AS g
        |    FROM (SELECT doc_id,
        |            list_filter(string_split_regex(lower(text),
        |              '[^a-z0-9]+'), t -> t <> '') AS words
        |          FROM documents))),
        |tgtg AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(g, ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 2147483647) % 256 AS bucket
        |  FROM (
        |    SELECT doc_id, unnest(list_concat(words,
        |      CASE WHEN len(words) >= 2 THEN
        |        list_transform(range(1, len(words)),
        |          i -> words[i] || ' ' || words[i+1])
        |      ELSE [] END)) AS g
        |    FROM (SELECT doc_id,
        |            list_filter(string_split_regex(lower(text),
        |              '[^a-z0-9]+'), t -> t <> '') AS words
        |          FROM documents WHERE lang = 'en'))),
        |rc AS (SELECT bucket, count(*) AS cr FROM rawg GROUP BY bucket),
        |tc AS (SELECT bucket, count(*) AS ct FROM tgtg GROUP BY bucket),
        |tot AS (SELECT (SELECT sum(cr) FROM rc) AS crt,
        |               (SELECT sum(ct) FROM tc) AS ctt),
        |lr AS (SELECT rc.bucket,
        |    CAST(round(ln(coalesce(ct, 0) + 1) - ln(ctt + 256)
        |             - ln(cr + 1) + ln(crt + 256), 8)
        |      AS DECIMAL(20,10)) AS lr
        |  FROM rc LEFT JOIN tc USING (bucket), tot),
        |scored AS (SELECT doc_id, count(*) AS n_grams,
        |    round(CAST(sum(lr) AS DOUBLE), 6) AS logw
        |  FROM rawg JOIN lr USING (bucket) GROUP BY doc_id),
        |topk AS (SELECT * FROM scored ORDER BY logw DESC, doc_id LIMIT 200),
        |thrw AS (SELECT min(logw) AS tw FROM topk),
        |thr AS (SELECT tw, max(doc_id) AS ti
        |        FROM topk, thrw WHERE logw = tw GROUP BY tw)
        |SELECT s.doc_id, n_grams, logw,
        |  (logw > tw OR (logw = tw AND s.doc_id <= ti)) AS selected
        |FROM scored s, thr ORDER BY s.doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH b AS (SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 20 = 0 AND d2.text IS NOT NULL
        |         THEN d2.text ELSE d.text END AS text,
        |    d.lang, d.n_chars
        |  FROM documents d
        |  LEFT JOIN documents d2 ON d2.doc_id = d.doc_id + 1
        |  WHERE d.doc_id % 4 = 0),
        |c AS (SELECT doc_id, text, lang, n_chars FROM documents
        |      WHERE doc_id % 4 <> 0),
        |ex AS (SELECT b.doc_id, min(c.doc_id) AS em
        |       FROM b JOIN c ON md5(b.text) = md5(c.text)
        |       GROUP BY b.doc_id),
        |bg AS (SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i]||' '||words[i+1]||' '||words[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text,' ') AS words
        |        FROM b) WHERE len(words) >= 3),
        |cg AS (SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(range(1, len(words)-1),
        |      i -> words[i]||' '||words[i+1]||' '||words[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text,' ') AS words
        |        FROM c) WHERE len(words) >= 3),
        |cand AS (SELECT bg.doc_id AS bid, cg.doc_id AS cid,
        |    round(CAST(len(list_intersect(bg.grams, cg.grams)) AS DOUBLE) /
        |      (len(bg.grams) + len(cg.grams)
        |       - len(list_intersect(bg.grams, cg.grams))), 6) AS j
        |  FROM bg JOIN cg ON bg.lang = cg.lang
        |    AND abs(bg.n_chars - cg.n_chars) <= 20),
        |nr AS (SELECT bid AS doc_id,
        |    arg_max(cid, printf('%012.9f-%019d', j, 999999999999999999 - cid)) AS nm,
        |    max(j) AS nj
        |  FROM cand WHERE j >= 0.5 GROUP BY bid)
        |SELECT b.doc_id,
        |  CASE WHEN em IS NOT NULL THEN 'exact_dup'
        |       WHEN nm IS NOT NULL THEN 'near_dup'
        |       ELSE 'keep' END AS verdict,
        |  coalesce(em, nm) AS match_id,
        |  CASE WHEN em IS NOT NULL THEN CAST(1.0 AS DOUBLE)
        |       ELSE nj END AS jaccard
        |FROM b LEFT JOIN ex ON b.doc_id = ex.doc_id
        |       LEFT JOIN nr ON b.doc_id = nr.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q_corpus_epochs2" ->
      """WITH c AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT sum(CAST(round(pow(toks, 0.5), 6) AS DECIMAL(30,10))) AS sw
        |  FROM c),
        |w AS (
        |  SELECT source,
        |    round(CAST(CAST(round(weight * 1000000) AS BIGINT) AS DOUBLE)
        |      / toks, 4) AS epochs
        |  FROM (SELECT source, toks,
        |          round(CAST(CAST(round(pow(toks, 0.5), 6)
        |            AS DECIMAL(30,10)) / sw AS DOUBLE), 6) AS weight
        |        FROM c, t)),
        |x AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(floor(epochs) AS INT) +
        |    (CASE WHEN CAST((d.doc_id * 2654435761 + 97) % 1000003
        |               AS DOUBLE) < (epochs - floor(epochs)) * 1000003
        |          THEN 1 ELSE 0 END) AS copies
        |  FROM documents d JOIN w USING (source))
        |SELECT doc_id, source,
        |  CAST(unnest(range(1, copies + 1)) AS INT) AS epoch_copy
        |FROM x ORDER BY doc_id, epoch_copy""".stripMargin,
    "q_corpus_spanmask" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 7 AS INT) AS s,
        |             string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(range(0, len(ws)),
        |    i -> (i + s) % 7 = 3 OR ((i + s) % 7 = 4 AND i >= 1)))
        |    AS BIGINT) AS n_masked,
        |  nullif(array_to_string(list_filter(
        |    list_transform(range(0, len(ws)), i ->
        |      CASE WHEN (i + s) % 7 = 3
        |             THEN '<extra_id_' || ((i + s - 3) // 7) || '>'
        |           WHEN (i + s) % 7 = 4 AND i >= 1 THEN NULL
        |           ELSE ws[i + 1] END),
        |    x -> x IS NOT NULL), ' '), '') AS input_text,
        |  nullif(array_to_string(list_transform(
        |    list_filter(range(0, len(ws)),
        |      i -> (i + s) % 7 = 3 OR ((i + s) % 7 = 4 AND i >= 1)),
        |    i -> CASE WHEN (i + s) % 7 = 3
        |              THEN '<extra_id_' || ((i + s - 3) // 7) || '> '
        |                || ws[i + 1]
        |              ELSE ws[i + 1] END), ' '), '') AS target_text
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_text_ppl2" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '[^a-z0-9]+'), t -> t <> '') AS ws
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |uni AS (SELECT w, count(*) AS cu
        |        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
        |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS ct FROM uni),
        |ctx AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
        |pair AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    round(CAST(sum(CAST(round(-ln(
        |        CAST(cb AS DOUBLE) / c1 * 0.7e0 +
        |        CAST(cu AS DOUBLE) / ct * (1 - 0.7e0)), 8)
        |      AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS avg_nll
        |  FROM bi JOIN pair USING (w1, w2) JOIN ctx USING (w1)
        |    JOIN uni ON uni.w = bi.w2, tot
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.avg_nll
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_text_urls" ->
      ("""WITH d AS (SELECT doc_id,
        |    text || ' see https://www.site' || (doc_id % 7)
        |      || '.example.com/page/' || doc_id
        |      || ' and http://cdn' || (doc_id % 3)
        |      || '.assets.net/x_' || doc_id AS text
        |  FROM documents),
        |u AS (SELECT doc_id,
        |    regexp_extract(unnest(regexp_extract_all(text,
        |      '__URLRE__')), '__DOMRE__', 1) AS domain
        |  FROM d),
        |dd AS (SELECT domain, doc_id, count(*) AS n
        |       FROM u GROUP BY domain, doc_id)
        |SELECT domain, CAST(sum(n) AS BIGINT) AS n_urls, count(*) AS n_docs
        |FROM dd GROUP BY domain ORDER BY domain""").stripMargin
        .replace("__URLRE__", TextAnalysis.UrlRe)
        .replace("__DOMRE__", TextAnalysis.DomainRe))
}
