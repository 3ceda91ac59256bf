package graft

import org.apache.spark.sql.functions._
import QueryDsl._

/** Coverage expansion over SURVEY §2.2 long-tail: PIVOT, GROUP BY ALL,
  * ILIKE, DISTINCT ON, forward as-of, VALUES, second waves of
  * string/date/array/bit/hash function families.
  */
object QueriesExtra {

  val defs: Map[String, Q] = Map(
    // Skew-safe aggregation through the gate: salted two-phase sum
    // must equal the plain group-by (ScaleOps.saltedSum).
    "q_salted_agg" -> ((s, dir) => {
      ScaleOps.saltedSum(t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
        .orderBy(col("l_returnflag"))
    }),
    // Embedding vector math as sequential folds — identical
    // left-to-right accumulation order in both engines, so the
    // doubles are bit-equal and hash-match.
    "q_embed_norms" -> ((s, dir) => {
      t(s, dir, "embeddings").select(col("vec_id"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 6).as("comp_sum"),
          size(col("embedding")).as("dims"))
        .orderBy(col("vec_id"))
    }),
    // Int8 scalar quantization of the embedding column (4× ANN index
    // memory lever) — deterministic double arithmetic, element-for-
    // element oracle replay incl. per-vector reconstruction MSE. The
    // q INT[] cell is serialized via to_json on BOTH engines (the
    // round-1 array-cell convention) so the driver harness can sort it.
    "q_embed_quantize" -> ((s, dir) => {
      SimilaritySearch.quantizeInt8(t(s, dir, "embeddings"))
        .withColumn("q", to_json(col("q")))
        .orderBy(col("vec_id"))
    }),
    // PIVOT — DataFrame-API relational pivot with pinned value set
    // (no second pass to discover values: scale posture).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("st"))
        .groupBy(col("priority")).pivot("st", Seq("F", "O", "P")).count()
        .orderBy(col("priority"))
    }),
    // UNPIVOT (wide metrics → long), the inverse of q_pivot: Spark's
    // native unpivot/melt against DuckDB's UNPIVOT clause. Values
    // share one type (double) via the exact-decimal sum.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .unpivot(Array(col("priority")),
          Array(col("n_orders"), col("total_price")), "metric", "value")
        .orderBy(col("priority"), col("metric"))
    }),
    // GROUP BY ALL sugar (both engines).
    "q_groupby_all" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),
    // ILIKE (case-insensitive LIKE).
    "q_ilike" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_mktsegment").ilike("%build%"))
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),
    // DISTINCT ON via ranking-window operator.
    "q_distinct_on" -> ((s, dir) => {
      RelationalOps.distinctOn(
          t(s, dir, "orders"), Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy(col("o_custkey"))
    }),
    // Forward ASOF: earliest event at/after each order date.
    "q_asof_forward" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val e = t(s, dir, "events").select(col("user_id"), col("ts"))
      AsOfJoin.forward(o, e, "o_custkey", "user_id", "o_orderdate", "ts",
          Seq("ts"))
        .select(col("o_orderkey"), col("ts").as("next_event_ts"))
        .orderBy(col("o_orderkey"))
    }),
    // inline VALUES relation.
    "q_values" -> ((s, dir) => sql(s, dir,
      "SELECT a, b FROM (VALUES (1, 'x'), (2, 'y'), (3, NULL)) AS t(a, b) ORDER BY a")),
    "q_str_funcs2" -> ((s, dir) => {
      t(s, dir, "nation").select(
          col("n_nationkey"),
          col("n_name").startsWith("NATION_1").as("sw"),
          col("n_name").endsWith("5").as("ew"),
          col("n_name").contains("ION").as("ct"),
          instr(col("n_name"), "_").as("pos"),
          expr("repeat(n_name, 2)").as("rep"),
          expr("left(n_name, 3)").as("l3"),
          expr("right(n_name, 2)").as("r2"),
          ascii(col("n_name")).as("asc_first"),
          expr("chr(65 + n_nationkey % 26)").as("ch"),
          translate(col("n_name"), "NAT", "nat").as("tr"))
        .orderBy(col("n_nationkey"))
    }),
    "q_date_funcs2" -> ((s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          quarter(col("o_orderdate")).cast("bigint").as("q"),
          dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
          weekofyear(col("o_orderdate")).cast("bigint").as("woy"),
          make_date(lit(2024), lit(2), lit(29)).as("leap"))
        .orderBy(col("o_orderkey")).limit(2000)
    }),
    // DuckDB strftime/strptime (C-style % formats) via registered
    // compat functions — Functions.registerAll + StrfTime translation.
    "q_strftime" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS d,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%y %H:%M:%S') AS dmy,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), 'day %j of %Y') AS doy,
        |  CAST(strptime('2024-03-05 10:30:45', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS back
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin)),
    "q_hash_funcs" -> ((s, dir) => {
      t(s, dir, "nation").select(
          col("n_nationkey"),
          sha2(col("n_name"), 256).as("h256"),
          md5(col("n_name")).as("hmd5"),
          length(sha2(col("n_name"), 512)).as("len512"))
        .orderBy(col("n_nationkey"))
    }),
    "q_bitops" -> ((s, dir) => {
      t(s, dir, "nation").select(
          col("n_nationkey"),
          col("n_nationkey").bitwiseAND(lit(12)).as("band"),
          col("n_nationkey").bitwiseOR(lit(3)).as("bor"),
          col("n_nationkey").bitwiseXOR(lit(21)).as("bxor"),
          shiftleft(col("n_nationkey"), 2).as("shl"),
          shiftright(col("n_nationkey"), 1).as("shr"))
        .orderBy(col("n_nationkey"))
    }),
    "q_array_funcs2" -> ((s, dir) => {
      val arr = expr("sequence(1, 1 + cast(n_nationkey % 5 as int))")
      t(s, dir, "nation").select(
          col("n_nationkey"),
          array_position(arr, 3).as("pos3"),
          to_json(flatten(array(arr, arr))).as("flat"),
          to_json(slice(arr, 1, 2)).as("first2"),
          to_json(reverse(sort_array(arr))).as("desc_sorted"),
          to_json(array_union(arr, typedlit(Seq(9L, 10L)))).as("uni"),
          to_json(array_except(arr, typedlit(Seq(1L, 2L)))).as("exc"))
        .orderBy(col("n_nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_l_quantity,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_embed_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), (a, b) -> a + b)), 6) AS l2,
        |  round(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b), 6) AS comp_sum,
        |  len(embedding) AS dims
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> abs(v))) / 127.0, 1e-12) AS sc
        |  FROM embeddings)
        |SELECT vec_id, round(sc, 9) AS scale,
        |  to_json(list_transform(e, v -> CAST(round(v / sc) AS INT))) AS q,
        |  round(list_reduce(list_transform(e,
        |    v -> (v - CAST(round(v / sc) AS INT) * sc) *
        |         (v - CAST(round(v / sc) AS INT) * sc)),
        |    (a, b) -> a + b) / len(e), 10) AS recon_mse
        |FROM s ORDER BY vec_id""".stripMargin,
    "q_pivot" ->
      """SELECT * FROM (SELECT o_orderpriority AS priority, o_orderstatus AS st
        |               FROM orders)
        |PIVOT (count(*) FOR st IN ('F', 'O', 'P'))
        |ORDER BY priority""".stripMargin,
    "q_unpivot" ->
      """SELECT priority, metric, value FROM (
        |  SELECT o_orderpriority AS priority,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_orderpriority)
        |UNPIVOT (value FOR metric IN (n_orders, total_price))
        |ORDER BY priority, metric""".stripMargin,
    "q_groupby_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_ilike" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment ILIKE '%build%' ORDER BY c_custkey""".stripMargin,
    "q_distinct_on" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
        |  FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey""".stripMargin,
    "q_asof_forward" ->
      """SELECT o.o_orderkey, e.ts AS next_event_ts
        |FROM orders o ASOF LEFT JOIN events e
        |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_values" ->
      "SELECT a, b FROM (VALUES (1, 'x'), (2, 'y'), (3, NULL)) t(a, b) ORDER BY a",
    "q_str_funcs2" ->
      """SELECT n_nationkey,
        |  starts_with(n_name, 'NATION_1') AS sw,
        |  suffix(n_name, '5') AS ew,
        |  contains(n_name, 'ION') AS ct,
        |  instr(n_name, '_') AS pos,
        |  repeat(n_name, 2) AS rep,
        |  left(n_name, 3) AS l3,
        |  right(n_name, 2) AS r2,
        |  ascii(n_name) AS asc_first,
        |  chr(CAST(65 + n_nationkey % 26 AS INT)) AS ch,
        |  translate(n_name, 'NAT', 'nat') AS tr
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_strftime" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS d,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%y %H:%M:%S') AS dmy,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), 'day %j of %Y') AS doy,
        |  CAST(strptime('2024-03-05 10:30:45', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS back
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |  make_date(2024, 2, 29) AS leap
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_hash_funcs" ->
      """SELECT n_nationkey,
        |  sha256(n_name) AS h256,
        |  md5(n_name) AS hmd5,
        |  128 AS len512
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_bitops" ->
      """SELECT n_nationkey,
        |  n_nationkey & 12 AS band,
        |  n_nationkey | 3 AS bor,
        |  xor(n_nationkey, 21) AS bxor,
        |  n_nationkey << 2 AS shl,
        |  n_nationkey >> 1 AS shr
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_array_funcs2" ->
      """SELECT n_nationkey,
        |  CAST(coalesce(list_position(arr, 3), 0) AS BIGINT) AS pos3,
        |  to_json(flatten([arr, arr])) AS flat,
        |  to_json(list_slice(arr, 1, 2)) AS first2,
        |  to_json(list_reverse_sort(arr)) AS desc_sorted,
        |  to_json(list_concat(arr, [9, 10])) AS uni,
        |  to_json(list_filter(arr, x -> x NOT IN (1, 2))) AS exc
        |FROM (SELECT n_nationkey,
        |        range(1, 2 + n_nationkey % 5) AS arr FROM nation)
        |ORDER BY n_nationkey""".stripMargin
  )
}
