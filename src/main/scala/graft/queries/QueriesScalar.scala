package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.rawConcat
import QueryDsl._

/** Scalar function families (SURVEY §2.2 "Scalar function families"):
  * string, regex, date/time, math, conditional, cast, array/lambda,
  * struct/map, JSON. Each family is one query projecting several
  * members so coverage stays line-auditable.
  */
object QueriesScalar {

  val defs: Map[String, Q] = Map(
    "q_str_funcs" -> ((s, dir) => {
      t(s, dir, "nation").select(
          col("n_nationkey"),
          length(col("n_name")).as("len"),
          lower(col("n_name")).as("lo"),
          upper(lower(col("n_name"))).as("up"),
          substring(col("n_name"), 1, 6).as("sub"),
          DuckRegexpReplace.sparkReplaceAll(col("n_name"), "_", "-").as("repl"),
          rawConcat(col("n_name"), lit("|"), col("n_nationkey").cast("string"))
            .as("cat"),
          trim(lit("  x  ")).as("trimmed"),
          levenshtein(col("n_name"), lit("NATION_1")).as("lev"),
          md5(col("n_name")).as("m"),
          reverse(col("n_name")).as("rev"),
          lpad(col("n_nationkey").cast("string"), 4, "0").as("pad"))
        .orderBy(col("n_nationkey"))
    }),
    "q_regex_funcs" -> ((s, dir) => {
      t(s, dir, "customer").select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          DuckRegexpReplace.sparkReplaceAll(col("c_name"), "[0-9]+", "#").as("masked"),
          col("c_name").rlike("[02468]$").as("even_name"),
          col("c_name").like("%1%").as("has_one"),
          split(col("c_name"), "_").getItem(0).as("prefix"))
        .orderBy(col("c_custkey"))
    }),
    "q_datetime_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("mo"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("d"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          datediff(lit("1998-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("bigint").as("days_to_98"))
        .orderBy(col("o_orderkey")).limit(2000)
    }),
    "q_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("ad"),
          ceil(col("l_extendedprice")).cast("bigint").as("ce"),
          floor(col("l_extendedprice")).cast("bigint").as("fl"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(ln(col("l_extendedprice")), 6).as("lg"),
          round(pow(col("l_quantity"), lit(2)), 6).as("p2"),
          (col("l_partkey") % 7).as("m7"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(5000)
    }),
    "q_case_cond" -> ((s, dir) => {
      t(s, dir, "customer").select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("(none)")).as("seg"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
          least(col("c_nationkey"), lit(10)).as("nk_cap"),
          (!(col("c_mktsegment") <=> lit("AUTOMOBILE"))).as("not_auto"))
        .orderBy(col("c_custkey"))
    }),
    "q_cast_funcs" -> ((s, dir) => {
      t(s, dir, "customer").select(
          col("c_custkey"),
          col("c_acctbal").cast("int").as("bal_int"),
          col("c_custkey").cast("string").as("key_str"),
          col("c_custkey").cast("double").as("key_dbl"),
          col("c_mktsegment").try_cast("int").as("seg_int"),
          substring(col("c_name"), 10, 10).try_cast("bigint").as("name_num"))
        .orderBy(col("c_custkey"))
    }),
    // Array/lambda family over the embeddings fixture: 1-based
    // element_at matches DuckDB indexing; lambda fold with explicit
    // double accumulator keeps per-row float math identical.
    "q_array_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).as("dims"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(element_at(col("embedding"), 64).cast("double"), 6).as("e64"),
          round(aggregate(transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("vsum"),
          round(array_max(transform(col("embedding"), x => x.cast("double"))), 6)
            .as("vmax"),
          array_contains(transform(col("embedding"), x => x.cast("double") > 0),
            true).as("has_pos"),
          size(filter(col("embedding"), x => x.cast("double") > 0)).as("n_pos"))
        .orderBy(col("vec_id"))
    }),
    "q_struct_map" -> ((s, dir) => {
      val withS = t(s, dir, "nation").select(
        col("n_nationkey"),
        struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("st"),
        map(lit("rk"), col("n_regionkey")).as("mp"))
      withS.select(
          col("n_nationkey"),
          col("st").getField("name").as("s_name"),
          col("st").getField("rk").as("s_rk"),
          // .getItem, not element_at: since r8 the registry's
          // element_at carries DuckDB's list-wrapped MAP shape (and
          // Spark 4's functions.element_at resolves by NAME through
          // that registry); getItem is the direct scalar accessor
          col("mp").getItem("rk").as("m_rk"))
        .orderBy(col("n_nationkey"))
    }),
    "q_json_funcs" -> ((s, dir) => {
      t(s, dir, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_num"),
          get_json_object(col("props"), "$.missing").as("nothing"))
        .orderBy(col("event_id"))
    }),
    // explode/unnest + word count over documents.
    "q_explode_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(20)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT n_nationkey, length(n_name) AS len, lower(n_name) AS lo,
        |  upper(lower(n_name)) AS up, substr(n_name, 1, 6) AS sub,
        |  regexp_replace(n_name, '_', '-', 'g') AS repl,
        |  n_name || '|' || CAST(n_nationkey AS VARCHAR) AS cat,
        |  trim('  x  ') AS trimmed,
        |  levenshtein(n_name, 'NATION_1') AS lev,
        |  md5(n_name) AS m, reverse(n_name) AS rev,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS pad
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_regex_funcs" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
        |  regexp_matches(c_name, '[02468]$') AS even_name,
        |  c_name LIKE '%1%' AS has_one,
        |  string_split(c_name, '_')[1] AS prefix
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
        |  CAST(extract(day FROM o_orderdate) AS BIGINT) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS ad,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  round(pow(l_quantity, 2), 6) AS p2,
        |  l_partkey % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 5000""".stripMargin,
    "q_case_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_nationkey, 10) AS nk_cap,
        |  c_mktsegment IS DISTINCT FROM 'AUTOMOBILE' AS not_auto
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_cast_funcs" ->
      """SELECT c_custkey,
        |  CAST(c_acctbal AS INT) AS bal_int,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(c_custkey AS DOUBLE) AS key_dbl,
        |  TRY_CAST(c_mktsegment AS INT) AS seg_int,
        |  TRY_CAST(substr(c_name, 10, 10) AS BIGINT) AS name_num
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS dims,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(CAST(embedding[64] AS DOUBLE), 6) AS e64,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vsum,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6) AS vmax,
        |  list_contains(list_transform(embedding, x -> CAST(x AS DOUBLE) > 0), true) AS has_pos,
        |  len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_struct_map" ->
      """SELECT n_nationkey,
        |  st.name AS s_name, st.rk AS s_rk,
        |  mp['rk'][1] AS m_rk
        |FROM (SELECT n_nationkey,
        |        {'name': n_name, 'rk': n_regionkey} AS st,
        |        MAP(['rk'], [n_regionkey]) AS mp
        |      FROM nation)
        |ORDER BY n_nationkey""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract_string(props, '$.missing') AS nothing
        |FROM events ORDER BY event_id""".stripMargin,
    "q_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin
  )
}
