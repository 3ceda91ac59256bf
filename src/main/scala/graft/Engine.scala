package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine core — the "library" entry point (SURVEY §3 entry point 2).
  *
  * The reference (euiko/duckdb-pgwire, src/duckdb_pgwire_extension.cpp:40)
  * holds one process-wide engine instance shared by every connection; the
  * Spark-native equivalent is one [[SparkSession]] whose catalog (temp
  * views + registered functions) is shared, with `newSession()` clones
  * for per-connection state.
  *
  * Config posture (SURVEY §4): AQE on, UTC session timezone, ANSI on
  * (Spark 4.x default — matches DuckDB's strict-cast semantics),
  * shuffle partitions sized for local[32] rather than the 200 default.
  */
object Engine {

  /** Build (or reuse) the shared session. Idempotent. */
  def session(master: String = "local[32]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft-engine")
      .withExtensions(new GraftExtensions) // TVFs + parser + functions
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // managed-table location for the in-memory catalog: keep it out
      // of the repo and unique per JVM (a stale spark-warehouse dir
      // otherwise breaks CREATE TABLE across restarts)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.registerAll(spark)
    spark
  }

  /** Run one SQL statement through the compat layer (pg-dialect sugar
    * rewrites: QUALIFY, generate_series, json arrows) then Catalyst.
    * Mirrors the reference's single delegation point
    * (src/duckdb_pgwire_extension.cpp:52 `conn.Prepare(query)`).
    */
  def query(spark: SparkSession, sql: String): DataFrame = {
    Functions.registerAll(spark)
    val r = SqlRewrites.rewriteFull(sql)
    r.dropCols.foldLeft(spark.sql(r.sql))((df, c) => df.drop(c))
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** per-(session, dir, table) DataFrame cache: every corpus query
    * calls load(), and an uncached load costs a file listing + parquet
    * footer schema read — ~50-100 ms of pure driver latency that
    * dominated the per-query floor at small SF. The cached object is
    * just the analyzed read plan; execution still streams from disk.
    */
  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loadCache.computeIfAbsent((spark, dir, name), _ => {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long, then convert
      // to a microsecond timestamp with integer arithmetic (a double
      // division would lose precision above 2^53 ns).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events")
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      else df
    })

  /** Register every table as a temp view in the session catalog —
    * the Spark analogue of the reference's shared catalog
    * (src/duckdb_pgwire_extension.cpp:40). Idempotent AND cached per
    * (session, dir): re-registration costs 10 parquet footer reads,
    * which dominated the SQL-path queries' latency.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val marker = "graft.tables.dir"
    if (!spark.conf.getOption(marker).contains(dir)) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(marker, dir)
    }
  }
}
