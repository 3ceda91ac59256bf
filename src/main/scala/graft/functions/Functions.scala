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
      spark.conf.set(marker, "true")
    }
  }
}
