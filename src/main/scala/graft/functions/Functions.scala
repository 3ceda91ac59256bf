package graft

import org.apache.spark.sql.SparkSession

/** Session-level function registration — the Spark analogue of the
  * reference's `ExtensionUtil::RegisterFunction` calls
  * (src/duckdb_pgwire_extension.cpp:204-212). Idempotent per session.
  */
object Functions {
  private val marker = "graft.functions.registered"

  def registerAll(spark: SparkSession): Unit = synchronized {
    if (spark.conf.getOption(marker).isEmpty) {
      // Postgres-compat shim: always false (reference
      // src/duckdb_pgwire_extension.cpp:190-193).
      spark.udf.register("pg_is_in_recovery", () => false)
      // Demo greeting function (reference
      // src/duckdb_pgwire_extension.cpp:195-202).
      spark.udf.register("duckdb_pgwire", (s: String) => s"DuckdbPgwire $s 🐥")
      // Native Catalyst expression (codegen'd): SQL-surface parity with
      // DuckDB v1.1's array_cosine_similarity.
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "array_cosine_similarity",
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ArrayCosineSimilarity(exprs(0), exprs(1)),
        "built-in")
      // typed Aggregator registered as a SQL UDAF
      spark.udf.register("geomean",
        org.apache.spark.sql.functions.udaf(GeometricMean))
      // DuckDB/pg strftime/strptime with C-style % formats (Spark's
      // date_format speaks Java patterns — translate).
      spark.udf.register("strftime",
        (ts: java.sql.Timestamp, fmt: String) =>
          if (ts == null || fmt == null) null
          else ts.toLocalDateTime.format(
            java.time.format.DateTimeFormatter.ofPattern(StrfTime.toJava(fmt))))
      spark.udf.register("strptime",
        (s: String, fmt: String) =>
          if (s == null || fmt == null) null
          else StrfTime.parse(s, fmt))
      // DuckDB sequence functions over the engine-global registry
      // (Sequences.scala documents the serial-oracle scale posture).
      // Nondeterministic: each evaluation advances/reads live state, so
      // Catalyst must not fold, dedup, or reorder calls.
      spark.udf.register("nextval",
        org.apache.spark.sql.functions.udf((name: String) => Sequences.next(name))
          .asNondeterministic())
      spark.udf.register("currval",
        org.apache.spark.sql.functions.udf((name: String) => Sequences.curr(name))
          .asNondeterministic())
      // DuckDB-named aliases over Spark builtins (len, list_*, ...)
      DuckAliases.registerAll(spark)
      spark.conf.set(marker, "true")
    }
  }
}
