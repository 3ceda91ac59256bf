package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Dialect sugar + streaming-shaped batch queries (SURVEY §7 M4/M6):
  * QUALIFY, JSON arrows, tumbling time windows.
  */
object QueriesSugar {

  /** shared by the query twin and the oracle row — one source of
    * truth keeps the identical-statement contract from drifting */
  private val structCastStmt: String =
    """SELECT doc_id,
      |  CAST(sv.k AS BIGINT) AS k_round,
      |  sv.t AS t_txt,
      |  CAST(sv.d AS VARCHAR) AS d_txt,
      |  CAST(list_extract(lv, 3) AS BIGINT) AS l3,
      |  CAST(list_extract(lv, 2) AS BIGINT) AS l_null,
      |  CAST(tv.a AS BIGINT) AS try_a
      |FROM (
      |  SELECT doc_id,
      |    ('{''k'': ' || doc_id || '.5, ''t'': doc ' || lang
      |      || ', ''d'': 2024-01-0' || (doc_id % 9 + 1) || '}')
      |      ::STRUCT(k INT, t VARCHAR, d DATE) AS sv,
      |    ('[' || doc_id || ', NULL, ' || n_chars || ']')::BIGINT[] AS lv,
      |    TRY_CAST('{''a'': ' || CASE WHEN doc_id % 2 = 0 THEN 'zz'
      |      ELSE CAST(doc_id AS VARCHAR) END || '}' AS STRUCT(a INT)) AS tv
      |  FROM documents) q
      |ORDER BY doc_id""".stripMargin

  /** implicit-lateral comma-unnest (round 11): `FROM d, unnest(col)
    * a(x)` — the no-LATERAL spelling DuckDB accepts; lowered by
    * SqlRewrites.rewriteCommaUnnest to LATERAL VIEW over DuckUnnest.
    * Chained comma-unnests are a cartesian product (probed). */
  private val commaUnnestStmt: String =
    """SELECT doc_id, part, n
      |FROM (SELECT doc_id, string_split(lang, '-') AS parts
      |      FROM documents WHERE doc_id % 5 = 0) d,
      |  unnest(parts) AS p(part),
      |  unnest([1, 2]) AS q(n)
      |WHERE length(part) > 1
      |ORDER BY doc_id, part, n""".stripMargin

  val defs: Map[String, Q] = Map(
    "q_duckdb_commaunnest" -> ((s, dir) => sql(s, dir, commaUnnestStmt)),
    // QUALIFY clause (DuckDB sugar) through the rewrite pre-pass.
    "q_qualify" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin)),
    // QUALIFY whose window expr references columns NOT in the
    // projection (o_custkey) — the rewrite injects the predicate into
    // the select's own scope, like DuckDB evaluates it.
    "q_qualify_unprojected" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_orderkey""".stripMargin)),
    // QUALIFY over GROUP BY: the window evaluates on the aggregated
    // rows, referencing the aggregate itself.
    "q_qualify_groupby" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, count(*) AS n
        |FROM orders GROUP BY o_custkey
        |QUALIFY rank() OVER (ORDER BY count(*) DESC, o_custkey) <= 5
        |ORDER BY o_custkey""".stripMargin)),
    // DISTINCT + QUALIFY: windows evaluate over pre-distinct rows,
    // DISTINCT applies to the filtered result (DuckDB clause order).
    "q_qualify_distinct" -> ((s, dir) => sql(s, dir,
      """SELECT DISTINCT o_orderpriority
        |FROM orders
        |QUALIFY count(*) OVER (PARTITION BY o_orderpriority, o_custkey) >= 2
        |ORDER BY o_orderpriority""".stripMargin)),
    // pg/DuckDB JSON arrow operators through the rewrite pre-pass.
    "q_json_arrows" -> ((s, dir) => sql(s, dir,
      """SELECT event_id, props ->> 'k' AS k_str,
        |  CAST(props ->> 'k' AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin)),
    // Tumbling time window (batch form of the streaming aggregation).
    "q_window_tumbling" -> ((s, dir) => {
      EventsStreaming.tumblingCounts(t(s, dir, "events"))
        .orderBy(col("bucket_start"), col("event_type"))
    }),
    // Hopping windows (size 10 min, slide 5 min): every event in two
    // overlapping buckets; oracle replays the overlap via unnest of
    // the two candidate bucket starts.
    "q_window_hopping" -> ((s, dir) => {
      EventsStreaming.hoppingCounts(t(s, dir, "events"))
        .orderBy(col("bucket_start"), col("event_type"))
    }),
    // Stream-stream attribution join, batch form (same declaration
    // runs as a watermarked streaming join; StreamingSpec checks the
    // stream/batch agreement).
    "q_stream_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EventsStreaming.attributeJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), windowMinutes = 60)
        .orderBy(col("click_id"), col("purchase_id"))
    }),
    // DuckDB `* REPLACE` star modifier through the rewrite pre-pass
    // (the paired `* EXCLUDE` is q_star_exclude).
    "q_star_replace" -> ((s, dir) => sql(s, dir,
      """SELECT * REPLACE (upper(r_name) AS r_name) FROM region
        |ORDER BY r_regionkey""".stripMargin)),
    // DuckDB v1.1 `ASOF JOIN` SQL syntax through the rewrite pre-pass
    // — same semantics as the DataFrame-level q_asof_join, exercised
    // from raw SQL text as a wire client would send it.
    "q_asof_sql" -> ((s, dir) => sql(s, dir,
      """SELECT e.event_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin)),
    // SQL-level file reader TVF (read_parquet) — the delegated-engine
    // surface a wire client can call on loose files (cpp:52).
    "q_read_tvf" -> ((s, dir) => sql(s, dir,
      s"""SELECT lang, count(*) AS n, sum(n_chars) AS chars
         |FROM read_parquet('$dir/documents.parquet')
         |GROUP BY lang ORDER BY lang""".stripMargin)),
    // DuckDB function vocabulary through the engine: polymorphic len,
    // string_split (literal separator), list_* family, lambdas,
    // array_to_string, regexp_matches — the oracle runs the IDENTICAL
    // statement in DuckDB, so the alias pack is hash-checked 1:1.
    "q_duckdb_funcs" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  CAST(len(text) AS BIGINT) AS n_ch,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    w -> len(w) > 4)) AS BIGINT) AS n_long,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 3), '_')
        |    AS first3,
        |  regexp_matches(text, 'query') AS has_q
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Long-tail DuckDB list/string vocabulary (round-5 sweep): the
    // fold family (list_sum/avg/count), append/prepend/extract/
    // position, inclusive negative-index slicing, regexp_split_to_
    // array, strpos, starts/ends_with — identical statement in both
    // engines, hash-checked 1:1 like q_duckdb_funcs.
    "q_duckdb_funcs2" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS sum_len,
        |  round(list_avg(list_transform(string_split(text, ' '),
        |    w -> len(w))), 6) AS avg_len,
        |  CAST(list_min(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS min_len,
        |  CAST(list_max(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS max_len,
        |  CAST(list_count(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(list_position(string_split(text, ' '), 'the') AS BIGINT)
        |    AS pos_the,
        |  list_extract(string_split(text, ' '), 2) AS tok2,
        |  list_extract(string_split(text, ' '), -1) AS tok_last,
        |  array_to_string(array_slice(string_split(text, ' '), -2, -1), '_')
        |    AS last2,
        |  array_to_string(list_append(list_prepend('<',
        |    list_value(lower(left(text, 1)))), '>'), '') AS wrapped,
        |  CAST(len(regexp_split_to_array(text, '[aeiou]+')) AS BIGINT)
        |    AS n_vruns,
        |  CAST(strpos(text, 'data') AS BIGINT) AS p_data,
        |  starts_with(text, 'The') AS st,
        |  ends_with(text, '.') AS en
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // String-distance / normalization vocabulary (round-7 sweep):
    // levenshtein, damerau_levenshtein, hamming, char-set jaccard,
    // jaro(_winkler)_similarity, strip_accents, nfc_normalize,
    // unicode, to_hex/to_base, fmt-style format + printf — identical
    // statement in both engines, hash-checked 1:1.
    "q_duckdb_funcs3" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  CAST(levenshtein(left(text, 20), 'the quick brown fox') AS BIGINT)
        |    AS lev,
        |  CAST(damerau_levenshtein(left(text, 12), lower(left(text, 12)))
        |    AS BIGINT) AS dl,
        |  CAST(hamming(left(text, 8), upper(left(text, 8))) AS BIGINT) AS ham,
        |  round(jaccard(left(text, 30), 'etaoin shrdlu'), 6) AS jac,
        |  round(jaro_similarity(left(text, 15), 'the quick brown'), 6) AS js,
        |  round(jaro_winkler_similarity(left(text, 15), left(text, 10)), 6)
        |    AS jw,
        |  strip_accents(left(text, 10)) AS sa,
        |  nfc_normalize(left(text, 6)) AS nfc,
        |  CAST(unicode(text) AS INT) AS uc,
        |  to_hex(doc_id) AS hx,
        |  to_base(doc_id + 1, 2) AS b2,
        |  format('{}:{}', doc_id, lang) AS fmt,
        |  printf('%d/%s', doc_id, source) AS pf
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Vector/list math, numeric and date-name long tail (round 7):
    // list_dot_product / list_cosine_similarity / list_distance /
    // list_select, gcd/lcm, cot, isfinite/isinf, signbit, even,
    // monthname/dayname, week/yearweek — identical statement in both
    // engines, hash-checked 1:1.
    "q_duckdb_funcs4" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  round(list_dot_product(
        |    list_value(CAST(doc_id % 7 AS DOUBLE), 2.0, CAST(n_chars % 5 AS DOUBLE)),
        |    list_value(1.5, CAST(doc_id % 3 AS DOUBLE), 2.0)), 6) AS dot,
        |  round(list_cosine_similarity(
        |    list_value(1.0 + doc_id % 7, 2.0, 3.0 + n_chars % 5),
        |    list_value(1.5, 1.0 + doc_id % 3, 2.0)), 6) AS lcos,
        |  round(list_distance(
        |    list_value(CAST(doc_id % 7 AS DOUBLE), 2.0),
        |    list_value(1.0, CAST(n_chars % 5 AS DOUBLE))), 6) AS ldist,
        |  array_to_string(
        |    list_select(string_split(text, ' '), list_value(3, 1, 1)), '|')
        |    AS sel,
        |  greatest_common_divisor(doc_id + 12, 18) AS g,
        |  least_common_multiple(1 + doc_id % 6, 4) AS l,
        |  round(cot(1.0 + doc_id % 3), 6) AS ct,
        |  isfinite(CAST(doc_id AS DOUBLE)) AS fin,
        |  isinf(1e308 * (1 + doc_id % 2) * 10) AS inf,
        |  signbit(2.5 - doc_id % 4) AS sb,
        |  even(CAST(doc_id % 9 AS DOUBLE) / 2) AS ev,
        |  monthname(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS mn,
        |  dayname(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS dn,
        |  CAST(week(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS INT) AS wk,
        |  CAST(yearweek(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS INT) AS yw
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // BIT-string vocabulary (round 8): bitstring/get_bit/set_bit/
    // bit_count/bit_position/xor — DuckDB's BIT type modeled as
    // '0'/'1' strings, statements shared by feeding every function a
    // bitstring() result (which DuckDB types as BIT) and casting BIT
    // outputs to VARCHAR on both sides.
    "q_duckdb_bits" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  CAST(bitstring(CASE WHEN doc_id % 2 = 0 THEN '0101' ELSE '111' END,
        |    8) AS VARCHAR) AS bs,
        |  CAST(get_bit(bitstring('0110', 8), CAST(doc_id % 8 AS INT)) AS INT)
        |    AS gb,
        |  CAST(set_bit(bitstring('0110', 8), CAST(doc_id % 8 AS INT), 1)
        |    AS VARCHAR) AS sb,
        |  CAST(bit_count(bitstring(CASE WHEN doc_id % 3 = 0 THEN '01011'
        |    ELSE '1001' END, 12)) AS BIGINT) AS bc,
        |  CAST(bit_position(bitstring('01', 2),
        |    bitstring(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '110101'
        |      WHEN 1 THEN '000000' WHEN 2 THEN '010101'
        |      ELSE '111111' END, 6)) AS BIGINT) AS bp,
        |  CAST(xor(bitstring('0110', 8),
        |    bitstring(CASE WHEN doc_id % 2 = 0 THEN '0011' ELSE '1111' END,
        |      8)) AS VARCHAR) AS bx
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Regexp / path / md5-number scalar wave (round 8):
    // regexp_extract_all (group-0 default), regexp_full_match,
    // regexp_escape, the parse_path family, md5_number(+lower/upper,
    // HUGEINT rendered via ::VARCHAR on both sides), like_escape
    // variants, sign-aware left/right, translate/chr/ascii,
    // bit_length, nextafter, factorial, cbrt/log2/degrees/radians/
    // atan2 — identical statement in both engines, hash-checked 1:1.
    "q_duckdb_funcs5" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  array_to_string(regexp_extract_all(text, '[A-Z][a-z]+'), '|')
        |    AS caps,
        |  array_to_string(regexp_extract_all(left(text, 40),
        |    '([a-z])([aeiou])', 2), '') AS vgrp,
        |  regexp_full_match(lang, '[a-z]{2}') AS lang2,
        |  regexp_escape(left(text, 12)) AS resc,
        |  array_to_string(parse_path('/data/' || source || '/' ||
        |    CAST(doc_id AS VARCHAR) || '.txt'), '>') AS pparts,
        |  parse_dirname('corpus/' || source || '/f.txt') AS pdir,
        |  parse_dirpath('/data/' || source || '/f.txt') AS pdirp,
        |  parse_filename('/data/' || source || '/doc.' ||
        |    CAST(doc_id AS VARCHAR) || '.gz', true) AS pfile,
        |  CAST(md5_number(left(text, 16)) AS VARCHAR) AS m128,
        |  CAST(md5_number_lower(lang) AS VARCHAR) AS mlo,
        |  CAST(md5_number_upper(source) AS VARCHAR) AS mhi,
        |  like_escape(text, '%50$%%', '$') AS lesc,
        |  ilike_escape(left(text, 3), 'TH%', '$') AS ilesc,
        |  not_like_escape(source, 'c$%%', '$') AS nlesc,
        |  left(text, -5) AS l_neg,
        |  right(text, -5) AS r_neg,
        |  right(left(text, 9), 4) AS midcut,
        |  translate(left(text, 15), 'aeiou', '_____') AS tr,
        |  chr(CAST(65 + doc_id % 26 AS INT)) AS ch,
        |  ascii(source) AS asc,
        |  CAST(bit_length(left(text, 7)) AS BIGINT) AS blen,
        |  nextafter(CAST(doc_id AS DOUBLE), 1e9) AS nxt,
        |  CAST(factorial(CAST(doc_id % 15 AS INT)) AS BIGINT) AS fact,
        |  round(cbrt(CAST(n_chars AS DOUBLE)), 6) AS cb,
        |  round(log2(CAST(1 + n_chars AS DOUBLE)), 6) AS lg2,
        |  round(degrees(CAST(doc_id % 10 AS DOUBLE)), 6) AS dg,
        |  round(radians(CAST(doc_id % 360 AS DOUBLE)), 6) AS rd,
        |  round(atan2(1.0 + doc_id % 5, 2.0), 6) AS at2
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Statistical-aggregate long tail (round 8): the nine-function
    // regr_* family, sample-corrected skewness/kurtosis, mad, Shannon
    // entropy, quantile_cont/disc, count_if, bitstring_agg — identical
    // statement in both engines, hash-checked 1:1. The huge-magnitude
    // sums-of-squares (sxx/syy/sxy) are ln-compressed before rounding
    // so 1e-12 relative engine noise can't flip a 6-decimal digit.
    "q_duckdb_stats" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS r_slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS r_icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r_r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS r_avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS r_avgy,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS r_n,
        |  round(ln(1 + abs(regr_sxx(l_extendedprice, l_quantity)))
        |    * sign(regr_sxx(l_extendedprice, l_quantity)), 6) AS r_lnsxx,
        |  round(ln(1 + abs(regr_syy(l_extendedprice, l_quantity)))
        |    * sign(regr_syy(l_extendedprice, l_quantity)), 6) AS r_lnsyy,
        |  round(ln(1 + abs(regr_sxy(l_extendedprice, l_quantity)))
        |    * sign(regr_sxy(l_extendedprice, l_quantity)), 6) AS r_lnsxy,
        |  round(skewness(CAST(l_quantity AS DOUBLE)), 6) AS skew,
        |  round(kurtosis(CAST(l_quantity AS DOUBLE)), 6) AS kurt,
        |  round(CAST(mad(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) AS madq,
        |  round(entropy(l_linenumber), 6) AS ent,
        |  round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25)
        |    AS DOUBLE), 6) AS q25,
        |  round(CAST(quantile_disc(CAST(l_quantity AS DOUBLE), 0.6)
        |    AS DOUBLE), 6) AS q60d,
        |  CAST(count_if(l_discount > 0.04) AS BIGINT) AS n_disc,
        |  CAST(bitstring_agg(l_linenumber, 1, 7) AS VARCHAR) AS lines_bits
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    // Long-tail DuckDB date vocabulary: 3-arg date_diff (boundary
    // crossings) vs 3-arg date_sub (complete intervals), epoch/
    // epoch_ms — identical statement in both engines.
    "q_duckdb_dates" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey,
        |  CAST(date_diff('day', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_day,
        |  CAST(date_diff('month', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_month,
        |  CAST(date_diff('year', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_year,
        |  CAST(date_sub('month', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS ds_month,
        |  CAST(date_sub('day', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS ds_day,
        |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep,
        |  CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep_ms,
        |  time_bucket(INTERVAL '3 days', CAST(o_orderdate AS TIMESTAMP)) AS tb,
        |  time_bucket(INTERVAL '1 week', CAST(o_orderdate AS TIMESTAMP)) AS tw,
        |  CAST(time_bucket(INTERVAL '1 month', o_orderdate) AS DATE)
        |    AS tb_mon,
        |  CAST(time_bucket(INTERVAL '3 month', o_orderdate) AS DATE)
        |    AS tb_qtr,
        |  CAST(time_bucket(INTERVAL '2 month', o_orderdate,
        |    DATE '1995-02-10') AS DATE) AS tb_morig,
        |  CAST(time_bucket(INTERVAL '1 week', CAST(o_orderdate AS TIMESTAMP),
        |    INTERVAL '2 day') AS DATE) AS tb_woff
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),
    // Misc engine vocabulary (round 8): typeof's name grid and
    // constant_or_null — identical statement in both engines.
    "q_duckdb_misc" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  typeof(doc_id) AS ty_id,
        |  typeof(lang) AS ty_s,
        |  typeof(1) AS ty_i,
        |  typeof(1.5) AS ty_dec,
        |  typeof(CAST(1.5 AS DOUBLE)) AS ty_dbl,
        |  typeof(CAST(doc_id AS FLOAT)) AS ty_f,
        |  typeof(doc_id % 2 = 0) AS ty_b,
        |  typeof(DATE '2020-01-01') AS ty_date,
        |  typeof(CAST(NULL AS SMALLINT)) AS ty_si,
        |  typeof(list_value(1, 2)) AS ty_l,
        |  typeof(list_value(lang)) AS ty_ls,
        |  typeof(NULL) AS ty_null,
        |  CAST(constant_or_null(42, CASE WHEN doc_id % 3 = 0 THEN 1 END)
        |    AS INT) AS cn,
        |  constant_or_null('x', 1, CASE WHEN doc_id % 2 = 0 THEN 1 END)
        |    AS cn2
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // UNION-type value functions (round 8): union_value's := sugar,
    // union_tag, union_extract — identical statement in both engines
    // (anonymous unions only: the oracle runner executes one SELECT,
    // no DDL; typed CREATE TYPE ... AS UNION is CompatSpec-pinned).
    "q_duckdb_union" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  union_tag(union_value(num := doc_id)) AS t_num,
        |  CAST(union_extract(union_value(num := doc_id * 3), 'num')
        |    AS BIGINT) AS v_num,
        |  union_tag(union_value(txt := lang)) AS t_txt,
        |  union_extract(union_value(txt := upper(lang)), 'txt') AS v_txt,
        |  union_extract(union_value(w := CASE WHEN doc_id % 3 = 0
        |    THEN source END), 'w') AS v_null
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // String→container TEXT casts (round 11): '{..}'::STRUCT(..) and
    // '[..]'::T[] over computed (non-literal) text — bare/quoted
    // values, DATE leaves, half-away-from-zero integral rounding,
    // NULL elements, TRY leaf-null granularity. Identical statement
    // in both engines (functions/DuckTextCast.scala).
    "q_duckdb_structcast" -> ((s, dir) => sql(s, dir, structCastStmt)),
    // Map-function family (round 8): map(keys,vals) constructor,
    // element_at/map_extract list-wrapped access (missing key -> []),
    // map_keys/map_values order preservation, map_concat last-wins on
    // duplicate keys, cardinality — identical statement in both
    // engines except map_from_entries (struct-literal syntax differs;
    // the oracle uses DuckDB's {'k': v} form).
    "q_duckdb_maps" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  CAST(cardinality(map(list_value('a', 'b', 'c'),
        |    list_value(doc_id, n_chars, doc_id + 1))) AS BIGINT) AS card,
        |  list_extract(element_at(map(list_value(0, 1, 2),
        |    list_value(doc_id * 2, doc_id * 3, doc_id * 5)),
        |    CAST(doc_id % 4 AS INT)), 1) AS elem,
        |  list_extract(map_extract(map(list_value('en', 'de'),
        |    list_value(10, 20)), lang), 1) AS mex,
        |  CAST(len(map_extract(map(list_value(0, 1),
        |    list_value('x', 'y')), CAST(doc_id % 3 AS INT))) AS BIGINT)
        |    AS mex_n,
        |  array_to_string(map_keys(map(list_value('k1', 'k2'),
        |    list_value(doc_id, n_chars))), ',') AS mk,
        |  array_to_string(map_values(map(list_value('k1', 'k2'),
        |    list_value(CAST(doc_id AS VARCHAR), lang))), '|') AS mv,
        |  list_extract(element_at(map_concat(
        |    map(list_value('x', 'y'), list_value(1, 2)),
        |    map(list_value('x'), list_value(CAST(doc_id AS INT)))), 'x'), 1)
        |    AS mcx,
        |  CAST(cardinality(map_concat(
        |    map(list_value('x', 'y'), list_value(1, 2)),
        |    map(list_value('x', 'z'), list_value(3, 4)))) AS BIGINT)
        |    AS mcn
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Date long tail (round 8): make_date/make_timestamp (6-arg and
    // micros forms)/make_time (TIME text render), last_day, julian,
    // the day-number convention grid (dayofweek/weekday Sunday=0,
    // isodow Monday=1), isoyear, ordinal century/decade/era/millennium
    // and the to_* interval-constructor family applied to dates —
    // identical statement in both engines, hash-checked 1:1.
    "q_duckdb_dates2" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey,
        |  make_date(1995, CAST(1 + o_orderkey % 12 AS INT),
        |    CAST(1 + o_orderkey % 28 AS INT)) AS md,
        |  make_timestamp(2020, CAST(1 + o_orderkey % 12 AS INT),
        |    CAST(1 + o_orderkey % 28 AS INT), CAST(o_orderkey % 24 AS INT),
        |    CAST(o_orderkey % 60 AS INT), o_orderkey % 60 + 0.25) AS mts,
        |  make_timestamp(o_orderkey * 86400000000 + 123456) AS mtu,
        |  CAST(make_time(CAST(o_orderkey % 24 AS INT),
        |    CAST(o_orderkey % 60 AS INT), o_orderkey % 60 + 0.5) AS VARCHAR)
        |    AS mt,
        |  last_day(o_orderdate) AS ld,
        |  round(julian(o_orderdate), 6) AS jl,
        |  round(julian(CAST(o_orderdate AS TIMESTAMP) + to_hours(6)), 6)
        |    AS jlt,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(weekday(o_orderdate) AS INT) AS wd,
        |  CAST(isodow(o_orderdate) AS INT) AS idw,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(isoyear(o_orderdate) AS INT) AS iy,
        |  CAST(century(o_orderdate) AS BIGINT) AS cen,
        |  CAST(decade(o_orderdate) AS BIGINT) AS dec,
        |  CAST(era(o_orderdate) AS INT) AS er,
        |  CAST(millennium(o_orderdate) AS BIGINT) AS mil,
        |  CAST(o_orderdate + to_years(1) AS TIMESTAMP) AS t_yr,
        |  CAST(o_orderdate + to_months(CAST(1 + o_orderkey % 5 AS INT))
        |    AS TIMESTAMP) AS t_mo,
        |  CAST(o_orderdate + to_weeks(2) AS TIMESTAMP) AS t_wk,
        |  CAST(o_orderdate + to_days(CAST(o_orderkey % 45 AS INT))
        |    AS TIMESTAMP) AS t_dy,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_hours(30) AS TIMESTAMP)
        |    AS t_hr,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_minutes(90) AS TIMESTAMP)
        |    AS t_mi,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_seconds(90.5)
        |    AS TIMESTAMP) AS t_se,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_milliseconds(1500)
        |    AS TIMESTAMP) AS t_ms,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_microseconds(2500000)
        |    AS TIMESTAMP) AS t_us,
        |  CAST(o_orderdate + to_centuries(1) AS TIMESTAMP) AS t_ce,
        |  CAST(o_orderdate + to_decades(2) AS TIMESTAMP) AS t_de
        |FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin)),
    // DuckDB bare file-path tables (`FROM 'f.parquet'`) — rewritten to
    // the reader TVFs; exercises both FROM and JOIN positions.
    "q_read_barepath" -> ((s, dir) => sql(s, dir,
      s"""SELECT d.lang, count(*) AS n, sum(e.label) AS label_sum
         |FROM '$dir/documents.parquet' d
         |JOIN '$dir/embeddings.parquet' e ON d.doc_id = e.vec_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),
    // Gap-based sessionization (batch form; streaming variant is
    // spec-checked against it).
    "q_sessionize" -> ((s, dir) => {
      EventsStreaming.sessionizeBatch(t(s, dir, "events"), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_start"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_qualify" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_qualify_unprojected" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_orderkey""".stripMargin,
    "q_qualify_groupby" ->
      """SELECT o_custkey, count(*) AS n
        |FROM orders GROUP BY o_custkey
        |QUALIFY rank() OVER (ORDER BY count(*) DESC, o_custkey) <= 5
        |ORDER BY o_custkey""".stripMargin,
    "q_qualify_distinct" ->
      """SELECT DISTINCT o_orderpriority
        |FROM orders
        |QUALIFY count(*) OVER (PARTITION BY o_orderpriority, o_custkey) >= 2
        |ORDER BY o_orderpriority""".stripMargin,
    "q_star_replace" ->
      """SELECT * REPLACE (upper(r_name) AS r_name) FROM region
        |ORDER BY r_regionkey""".stripMargin,
    "q_asof_sql" ->
      """SELECT e.event_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q_read_tvf" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_read_barepath" ->
      """SELECT d.lang, count(*) AS n, CAST(sum(e.label) AS BIGINT) AS label_sum
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q_duckdb_funcs" ->
      """SELECT doc_id,
        |  CAST(len(text) AS BIGINT) AS n_ch,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    w -> len(w) > 4)) AS BIGINT) AS n_long,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 3), '_')
        |    AS first3,
        |  regexp_matches(text, 'query') AS has_q
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_funcs2" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS sum_len,
        |  round(list_avg(list_transform(string_split(text, ' '),
        |    w -> len(w))), 6) AS avg_len,
        |  CAST(list_min(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS min_len,
        |  CAST(list_max(list_transform(string_split(text, ' '),
        |    w -> len(w))) AS BIGINT) AS max_len,
        |  CAST(list_count(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(list_position(string_split(text, ' '), 'the') AS BIGINT)
        |    AS pos_the,
        |  list_extract(string_split(text, ' '), 2) AS tok2,
        |  list_extract(string_split(text, ' '), -1) AS tok_last,
        |  array_to_string(array_slice(string_split(text, ' '), -2, -1), '_')
        |    AS last2,
        |  array_to_string(list_append(list_prepend('<',
        |    list_value(lower(left(text, 1)))), '>'), '') AS wrapped,
        |  CAST(len(regexp_split_to_array(text, '[aeiou]+')) AS BIGINT)
        |    AS n_vruns,
        |  CAST(strpos(text, 'data') AS BIGINT) AS p_data,
        |  starts_with(text, 'The') AS st,
        |  ends_with(text, '.') AS en
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_funcs3" ->
      """SELECT doc_id,
        |  CAST(levenshtein(left(text, 20), 'the quick brown fox') AS BIGINT)
        |    AS lev,
        |  CAST(damerau_levenshtein(left(text, 12), lower(left(text, 12)))
        |    AS BIGINT) AS dl,
        |  CAST(hamming(left(text, 8), upper(left(text, 8))) AS BIGINT) AS ham,
        |  round(jaccard(left(text, 30), 'etaoin shrdlu'), 6) AS jac,
        |  round(jaro_similarity(left(text, 15), 'the quick brown'), 6) AS js,
        |  round(jaro_winkler_similarity(left(text, 15), left(text, 10)), 6)
        |    AS jw,
        |  strip_accents(left(text, 10)) AS sa,
        |  nfc_normalize(left(text, 6)) AS nfc,
        |  CAST(unicode(text) AS INT) AS uc,
        |  to_hex(doc_id) AS hx,
        |  to_base(doc_id + 1, 2) AS b2,
        |  format('{}:{}', doc_id, lang) AS fmt,
        |  printf('%d/%s', doc_id, source) AS pf
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_funcs4" ->
      """SELECT doc_id,
        |  round(list_dot_product(
        |    list_value(CAST(doc_id % 7 AS DOUBLE), 2.0, CAST(n_chars % 5 AS DOUBLE)),
        |    list_value(1.5, CAST(doc_id % 3 AS DOUBLE), 2.0)), 6) AS dot,
        |  round(list_cosine_similarity(
        |    list_value(1.0 + doc_id % 7, 2.0, 3.0 + n_chars % 5),
        |    list_value(1.5, 1.0 + doc_id % 3, 2.0)), 6) AS lcos,
        |  round(list_distance(
        |    list_value(CAST(doc_id % 7 AS DOUBLE), 2.0),
        |    list_value(1.0, CAST(n_chars % 5 AS DOUBLE))), 6) AS ldist,
        |  array_to_string(
        |    list_select(string_split(text, ' '), list_value(3, 1, 1)), '|')
        |    AS sel,
        |  greatest_common_divisor(doc_id + 12, 18) AS g,
        |  least_common_multiple(1 + doc_id % 6, 4) AS l,
        |  round(cot(1.0 + doc_id % 3), 6) AS ct,
        |  isfinite(CAST(doc_id AS DOUBLE)) AS fin,
        |  isinf(1e308 * (1 + doc_id % 2) * 10) AS inf,
        |  signbit(2.5 - doc_id % 4) AS sb,
        |  even(CAST(doc_id % 9 AS DOUBLE) / 2) AS ev,
        |  monthname(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS mn,
        |  dayname(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS dn,
        |  CAST(week(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS INT) AS wk,
        |  CAST(yearweek(make_date(2024, CAST(1 + doc_id % 12 AS INT),
        |    CAST(1 + doc_id % 28 AS INT))) AS INT) AS yw
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_bits" ->
      """SELECT doc_id,
        |  CAST(bitstring(CASE WHEN doc_id % 2 = 0 THEN '0101' ELSE '111' END,
        |    8) AS VARCHAR) AS bs,
        |  CAST(get_bit(bitstring('0110', 8), CAST(doc_id % 8 AS INT)) AS INT)
        |    AS gb,
        |  CAST(set_bit(bitstring('0110', 8), CAST(doc_id % 8 AS INT), 1)
        |    AS VARCHAR) AS sb,
        |  CAST(bit_count(bitstring(CASE WHEN doc_id % 3 = 0 THEN '01011'
        |    ELSE '1001' END, 12)) AS BIGINT) AS bc,
        |  CAST(bit_position(bitstring('01', 2),
        |    bitstring(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '110101'
        |      WHEN 1 THEN '000000' WHEN 2 THEN '010101'
        |      ELSE '111111' END, 6)) AS BIGINT) AS bp,
        |  CAST(xor(bitstring('0110', 8),
        |    bitstring(CASE WHEN doc_id % 2 = 0 THEN '0011' ELSE '1111' END,
        |      8)) AS VARCHAR) AS bx
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_funcs5" ->
      """SELECT doc_id,
        |  array_to_string(regexp_extract_all(text, '[A-Z][a-z]+'), '|')
        |    AS caps,
        |  array_to_string(regexp_extract_all(left(text, 40),
        |    '([a-z])([aeiou])', 2), '') AS vgrp,
        |  regexp_full_match(lang, '[a-z]{2}') AS lang2,
        |  regexp_escape(left(text, 12)) AS resc,
        |  array_to_string(parse_path('/data/' || source || '/' ||
        |    CAST(doc_id AS VARCHAR) || '.txt'), '>') AS pparts,
        |  parse_dirname('corpus/' || source || '/f.txt') AS pdir,
        |  parse_dirpath('/data/' || source || '/f.txt') AS pdirp,
        |  parse_filename('/data/' || source || '/doc.' ||
        |    CAST(doc_id AS VARCHAR) || '.gz', true) AS pfile,
        |  CAST(md5_number(left(text, 16)) AS VARCHAR) AS m128,
        |  CAST(md5_number_lower(lang) AS VARCHAR) AS mlo,
        |  CAST(md5_number_upper(source) AS VARCHAR) AS mhi,
        |  like_escape(text, '%50$%%', '$') AS lesc,
        |  ilike_escape(left(text, 3), 'TH%', '$') AS ilesc,
        |  not_like_escape(source, 'c$%%', '$') AS nlesc,
        |  left(text, -5) AS l_neg,
        |  right(text, -5) AS r_neg,
        |  right(left(text, 9), 4) AS midcut,
        |  translate(left(text, 15), 'aeiou', '_____') AS tr,
        |  chr(CAST(65 + doc_id % 26 AS INT)) AS ch,
        |  ascii(source) AS asc,
        |  CAST(bit_length(left(text, 7)) AS BIGINT) AS blen,
        |  nextafter(CAST(doc_id AS DOUBLE), 1e9) AS nxt,
        |  CAST(factorial(CAST(doc_id % 15 AS INT)) AS BIGINT) AS fact,
        |  round(cbrt(CAST(n_chars AS DOUBLE)), 6) AS cb,
        |  round(log2(CAST(1 + n_chars AS DOUBLE)), 6) AS lg2,
        |  round(degrees(CAST(doc_id % 10 AS DOUBLE)), 6) AS dg,
        |  round(radians(CAST(doc_id % 360 AS DOUBLE)), 6) AS rd,
        |  round(atan2(1.0 + doc_id % 5, 2.0), 6) AS at2
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_stats" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS r_slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS r_icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r_r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS r_avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS r_avgy,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS r_n,
        |  round(ln(1 + abs(regr_sxx(l_extendedprice, l_quantity)))
        |    * sign(regr_sxx(l_extendedprice, l_quantity)), 6) AS r_lnsxx,
        |  round(ln(1 + abs(regr_syy(l_extendedprice, l_quantity)))
        |    * sign(regr_syy(l_extendedprice, l_quantity)), 6) AS r_lnsyy,
        |  round(ln(1 + abs(regr_sxy(l_extendedprice, l_quantity)))
        |    * sign(regr_sxy(l_extendedprice, l_quantity)), 6) AS r_lnsxy,
        |  round(skewness(CAST(l_quantity AS DOUBLE)), 6) AS skew,
        |  round(kurtosis(CAST(l_quantity AS DOUBLE)), 6) AS kurt,
        |  round(CAST(mad(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) AS madq,
        |  round(entropy(l_linenumber), 6) AS ent,
        |  round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25)
        |    AS DOUBLE), 6) AS q25,
        |  round(CAST(quantile_disc(CAST(l_quantity AS DOUBLE), 0.6)
        |    AS DOUBLE), 6) AS q60d,
        |  CAST(count_if(l_discount > 0.04) AS BIGINT) AS n_disc,
        |  CAST(bitstring_agg(l_linenumber, 1, 7) AS VARCHAR) AS lines_bits
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_duckdb_misc" ->
      """SELECT doc_id,
        |  typeof(doc_id) AS ty_id,
        |  typeof(lang) AS ty_s,
        |  typeof(1) AS ty_i,
        |  typeof(1.5) AS ty_dec,
        |  typeof(CAST(1.5 AS DOUBLE)) AS ty_dbl,
        |  typeof(CAST(doc_id AS FLOAT)) AS ty_f,
        |  typeof(doc_id % 2 = 0) AS ty_b,
        |  typeof(DATE '2020-01-01') AS ty_date,
        |  typeof(CAST(NULL AS SMALLINT)) AS ty_si,
        |  typeof(list_value(1, 2)) AS ty_l,
        |  typeof(list_value(lang)) AS ty_ls,
        |  typeof(NULL) AS ty_null,
        |  CAST(constant_or_null(42, CASE WHEN doc_id % 3 = 0 THEN 1 END)
        |    AS INT) AS cn,
        |  constant_or_null('x', 1, CASE WHEN doc_id % 2 = 0 THEN 1 END)
        |    AS cn2
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_union" ->
      """SELECT doc_id,
        |  union_tag(union_value(num := doc_id)) AS t_num,
        |  CAST(union_extract(union_value(num := doc_id * 3), 'num')
        |    AS BIGINT) AS v_num,
        |  union_tag(union_value(txt := lang)) AS t_txt,
        |  union_extract(union_value(txt := upper(lang)), 'txt') AS v_txt,
        |  union_extract(union_value(w := CASE WHEN doc_id % 3 = 0
        |    THEN source END), 'w') AS v_null
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_structcast" -> structCastStmt,
    "q_duckdb_commaunnest" -> commaUnnestStmt,
    "q_duckdb_maps" ->
      """SELECT doc_id,
        |  CAST(cardinality(map(list_value('a', 'b', 'c'),
        |    list_value(doc_id, n_chars, doc_id + 1))) AS BIGINT) AS card,
        |  list_extract(element_at(map(list_value(0, 1, 2),
        |    list_value(doc_id * 2, doc_id * 3, doc_id * 5)),
        |    CAST(doc_id % 4 AS INT)), 1) AS elem,
        |  list_extract(map_extract(map(list_value('en', 'de'),
        |    list_value(10, 20)), lang), 1) AS mex,
        |  CAST(len(map_extract(map(list_value(0, 1),
        |    list_value('x', 'y')), CAST(doc_id % 3 AS INT))) AS BIGINT)
        |    AS mex_n,
        |  array_to_string(map_keys(map(list_value('k1', 'k2'),
        |    list_value(doc_id, n_chars))), ',') AS mk,
        |  array_to_string(map_values(map(list_value('k1', 'k2'),
        |    list_value(CAST(doc_id AS VARCHAR), lang))), '|') AS mv,
        |  list_extract(element_at(map_concat(
        |    map(list_value('x', 'y'), list_value(1, 2)),
        |    map(list_value('x'), list_value(CAST(doc_id AS INT)))), 'x'), 1)
        |    AS mcx,
        |  CAST(cardinality(map_concat(
        |    map(list_value('x', 'y'), list_value(1, 2)),
        |    map(list_value('x', 'z'), list_value(3, 4)))) AS BIGINT)
        |    AS mcn
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_duckdb_dates2" ->
      """SELECT o_orderkey,
        |  make_date(1995, CAST(1 + o_orderkey % 12 AS INT),
        |    CAST(1 + o_orderkey % 28 AS INT)) AS md,
        |  make_timestamp(2020, CAST(1 + o_orderkey % 12 AS INT),
        |    CAST(1 + o_orderkey % 28 AS INT), CAST(o_orderkey % 24 AS INT),
        |    CAST(o_orderkey % 60 AS INT), o_orderkey % 60 + 0.25) AS mts,
        |  make_timestamp(o_orderkey * 86400000000 + 123456) AS mtu,
        |  CAST(make_time(CAST(o_orderkey % 24 AS INT),
        |    CAST(o_orderkey % 60 AS INT), o_orderkey % 60 + 0.5) AS VARCHAR)
        |    AS mt,
        |  last_day(o_orderdate) AS ld,
        |  round(julian(o_orderdate), 6) AS jl,
        |  round(julian(CAST(o_orderdate AS TIMESTAMP) + to_hours(6)), 6)
        |    AS jlt,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(weekday(o_orderdate) AS INT) AS wd,
        |  CAST(isodow(o_orderdate) AS INT) AS idw,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(isoyear(o_orderdate) AS INT) AS iy,
        |  CAST(century(o_orderdate) AS BIGINT) AS cen,
        |  CAST(decade(o_orderdate) AS BIGINT) AS dec,
        |  CAST(era(o_orderdate) AS INT) AS er,
        |  CAST(millennium(o_orderdate) AS BIGINT) AS mil,
        |  CAST(o_orderdate + to_years(1) AS TIMESTAMP) AS t_yr,
        |  CAST(o_orderdate + to_months(CAST(1 + o_orderkey % 5 AS INT))
        |    AS TIMESTAMP) AS t_mo,
        |  CAST(o_orderdate + to_weeks(2) AS TIMESTAMP) AS t_wk,
        |  CAST(o_orderdate + to_days(CAST(o_orderkey % 45 AS INT))
        |    AS TIMESTAMP) AS t_dy,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_hours(30) AS TIMESTAMP)
        |    AS t_hr,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_minutes(90) AS TIMESTAMP)
        |    AS t_mi,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_seconds(90.5)
        |    AS TIMESTAMP) AS t_se,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_milliseconds(1500)
        |    AS TIMESTAMP) AS t_ms,
        |  CAST(CAST(o_orderdate AS TIMESTAMP) + to_microseconds(2500000)
        |    AS TIMESTAMP) AS t_us,
        |  CAST(o_orderdate + to_centuries(1) AS TIMESTAMP) AS t_ce,
        |  CAST(o_orderdate + to_decades(2) AS TIMESTAMP) AS t_de
        |FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin,
    "q_duckdb_dates" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_day,
        |  CAST(date_diff('month', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_month,
        |  CAST(date_diff('year', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS dd_year,
        |  CAST(date_sub('month', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS ds_month,
        |  CAST(date_sub('day', DATE '1995-06-15', o_orderdate) AS BIGINT)
        |    AS ds_day,
        |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep,
        |  CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep_ms,
        |  time_bucket(INTERVAL '3 days', CAST(o_orderdate AS TIMESTAMP)) AS tb,
        |  time_bucket(INTERVAL '1 week', CAST(o_orderdate AS TIMESTAMP)) AS tw,
        |  CAST(time_bucket(INTERVAL '1 month', o_orderdate) AS DATE)
        |    AS tb_mon,
        |  CAST(time_bucket(INTERVAL '3 month', o_orderdate) AS DATE)
        |    AS tb_qtr,
        |  CAST(time_bucket(INTERVAL '2 month', o_orderdate,
        |    DATE '1995-02-10') AS DATE) AS tb_morig,
        |  CAST(time_bucket(INTERVAL '1 week', CAST(o_orderdate AS TIMESTAMP),
        |    INTERVAL '2 day') AS DATE) AS tb_woff
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q_json_arrows" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS v_sum
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,
    "q_window_hopping" ->
      """SELECT bucket_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS v_sum
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
        |                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
        |    AS bucket_start, event_type, value
        |  FROM events)
        |GROUP BY bucket_start, event_type
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.user_id, a.ts AS click_ts, b.ts AS purchase_ts
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id, ts,
        |    sum(flag) OVER (PARTITION BY user_id ORDER BY ts
        |                    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT user_id, ts,
        |      CASE WHEN prev IS NULL
        |             OR date_diff('second', prev, ts) > 1800 THEN 1
        |           ELSE 0 END AS flag
        |    FROM (SELECT user_id, ts,
        |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |          FROM events)))
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
  )
}
