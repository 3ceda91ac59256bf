package graft

import java.nio.file.{Files, Paths}

/** ATTACH / DETACH — DuckDB's persistent-database surface
  * (reference README.md:8 "start persisting data") re-expressed as a
  * directory warehouse of parquet tables. The contract under test:
  * data written through an attached database survives DETACH and is
  * visible again after a re-ATTACH — i.e. attach persists, detach
  * never deletes.
  */
class AttachSpec extends SparkSpecBase {

  test("ATTACH dir / CTAS / DETACH keeps data / re-ATTACH sees it") {
    val dir = Files.createTempDirectory("graft-attach").toString
    Engine.query(spark, s"ATTACH '$dir' AS att1")
    Engine.query(spark,
      "CREATE TABLE att1.people AS SELECT 1 AS id, 'ada' AS name " +
        "UNION ALL SELECT 2, 'grace'")
    assert(Engine.query(spark,
      "SELECT count(*) AS n FROM att1.people").collect().head.getLong(0) == 2)

    Engine.query(spark, "DETACH att1")
    assert(!spark.catalog.databaseExists("att1"))
    // detach closes, never deletes: the table directory must survive
    val tableDir = Paths.get(dir, "people")
    assert(Files.isDirectory(tableDir),
      s"DETACH must not delete table data under $dir")
    assert(Files.list(tableDir).iterator().hasNext, "parquet files survive")

    // a fresh attach under a different alias re-registers the table
    Engine.query(spark, s"ATTACH '$dir' AS att2")
    val rows = Engine.query(spark,
      "SELECT id, name FROM att2.people ORDER BY id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "ada"), (2, "grace")))
    Engine.query(spark, "DETACH DATABASE att2")
  }

  test("EXPORT DATABASE round-trips through IMPORT (parquet + csv)") {
    Engine.query(spark,
      "CREATE OR REPLACE TABLE exp_kv AS SELECT 1 AS k, 'a' AS v " +
        "UNION ALL SELECT 2, 'b'")
    for (fmt <- Seq("PARQUET", "CSV")) {
      val dir = Files.createTempDirectory(s"graft-export-$fmt").toString
      Engine.query(spark, s"EXPORT DATABASE '$dir' (FORMAT $fmt)")
      // DuckDB-compatible companion files
      assert(Files.readString(Paths.get(dir, "schema.sql"))
        .contains("CREATE TABLE exp_kv"), fmt)
      // the COPY source must be a *.ext glob over the writer directory
      // (part-* files + _SUCCESS markers) — a bare directory path is
      // not loadable by DuckDB's COPY FROM
      val load = Files.readString(Paths.get(dir, "load.sql"))
      assert(load.contains("COPY exp_kv FROM") &&
        load.contains(s"/*.${fmt.toLowerCase}' (FORMAT $fmt"), s"$fmt: $load")
      assert(Files.isDirectory(Paths.get(dir, "exp_kv")), fmt)
      // drop, then import back into the current database
      Engine.query(spark, "DROP TABLE exp_kv")
      Engine.query(spark, s"IMPORT DATABASE '$dir'")
      val rows = Engine.query(spark,
        "SELECT k, v FROM exp_kv ORDER BY k").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(rows == Seq((1, "a"), (2, "b")), s"$fmt: $rows")
    }
    Engine.query(spark, "DROP TABLE exp_kv")
    // maintenance statements are accepted no-ops
    Engine.query(spark, "CHECKPOINT")
    Engine.query(spark, "VACUUM")
    Engine.query(spark, "ANALYZE")
    // the reference's own documented startup (README.md:48) succeeds
    Engine.query(spark, "INSTALL duckdb_pgwire")
    Engine.query(spark, "load duckdb_pgwire")
    // CREATE INDEX is a hint (no-op); UNIQUE is a constraint (loud)
    Engine.query(spark, "CREATE INDEX idx_k ON exp_tbl (k)")
    Engine.query(spark, "DROP INDEX idx_k")
    intercept[IllegalArgumentException] {
      Engine.query(spark, "CREATE UNIQUE INDEX u_idx ON exp_tbl (k)")
    }
  }

  test("IMPORT DATABASE reads DuckDB's flat-file export layout") {
    // DuckDB's EXPORT DATABASE writes flat <table>.parquet files next
    // to schema.sql — not per-table directories
    val dir = Files.createTempDirectory("graft-flat-import")
    // staging dir OUTSIDE the import dir: IMPORT scans everything under
    // its path, and a leftover staging subdir would register as a table
    val stage = Files.createTempDirectory("graft-flat-stage")
    val s = spark
    import s.implicits._
    Seq((1, "x"), (2, "y")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val listing = Files.list(stage)
    val part =
      try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      finally listing.close()
    Files.copy(part, dir.resolve("flat_kv.parquet"))
    Files.writeString(dir.resolve("schema.sql"),
      "CREATE TABLE flat_kv (k INTEGER, v VARCHAR);\n")
    Engine.query(spark, s"IMPORT DATABASE '$dir'")
    val rows = Engine.query(spark,
      "SELECT k, v FROM flat_kv ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "x"), (2, "y")))
    Engine.query(spark, "DROP TABLE flat_kv")
  }

  test("ATTACH ':memory:' and alias defaulting from the path stem") {
    Engine.query(spark, "ATTACH ':memory:' AS scratch")
    Engine.query(spark,
      "CREATE TABLE scratch.t AS SELECT 42 AS x")
    assert(Engine.query(spark, "SELECT x FROM scratch.t")
      .collect().head.getInt(0) == 42)
    Engine.query(spark, "DETACH scratch")

    // ATTACH 'dir/mydb.db' with no AS: alias = stem ("mydb")
    val dir = Files.createTempDirectory("graft-attach2")
    Engine.query(spark, s"ATTACH '${dir.resolve("mydb.db")}'")
    assert(spark.catalog.databaseExists("mydb"))
    Engine.query(spark, "DETACH mydb")
  }
}
