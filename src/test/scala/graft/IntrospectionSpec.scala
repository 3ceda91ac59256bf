package graft

import java.nio.file.{Files, Paths}

/** DuckDB file-introspection + catalog-listing TVFs
  * (sources/Introspection.scala). Shapes and values pinned from v1.0
  * probes: glob's `file` column, read_text/read_blob's
  * (filename, content, size, last_modified), parquet_* footer
  * listings, sniff_csv dialect row.
  */
class IntrospectionSpec extends SparkSpecBase {

  private val dir = Files.createTempDirectory("graft-intro").toString
  Files.write(Paths.get(dir, "a.txt"), "hello\nworld".getBytes("UTF-8"))
  Files.write(Paths.get(dir, "b.txt"), "bye".getBytes("UTF-8"))
  Files.createDirectory(Paths.get(dir, "sub"))
  Files.write(Paths.get(dir, "sub", "c.txt"), "deep".getBytes("UTF-8"))
  Files.write(Paths.get(dir, "d.csv"),
    "a,b,c\n1,2.5,x\n2,3.5,y\n".getBytes("UTF-8"))

  private def q(sql: String) = Engine.query(spark, sql)

  test("glob lists matches; ** recurses across directories") {
    assert(q(s"SELECT * FROM glob('$dir/*.txt')").collect()
      .map(_.getString(0)).toSeq == Seq(s"$dir/a.txt", s"$dir/b.txt"))
    assert(q(s"SELECT * FROM glob('$dir/**/*.txt')").collect()
      .map(_.getString(0)).toSeq.contains(s"$dir/sub/c.txt"))
  }

  test("read_text: filename/content/size/last_modified") {
    val r = q(s"SELECT * FROM read_text('$dir/a.txt')").collect().head
    assert(r.getString(0) == s"$dir/a.txt")
    assert(r.getString(1) == "hello\nworld")
    assert(r.getLong(2) == 11L)
    assert(r.getTimestamp(3) != null)
    assert(q(s"SELECT * FROM read_text('$dir/*.txt') ORDER BY filename")
      .count() == 2)
  }

  test("read_blob: binary content") {
    val r = q(s"SELECT * FROM read_blob('$dir/b.txt')").collect().head
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == "bye")
    assert(r.getLong(2) == 3L)
  }

  test("parquet_schema walks the footer schema") {
    val rows = q("SELECT name, type, repetition_type, num_children FROM " +
      "parquet_schema('/root/testdata/sf0.001/region.parquet')").collect()
    assert(rows.head.getString(0) == "schema" && rows.head.getLong(3) >= 2)
    val byName = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("r_regionkey") == "INT32")
    assert(byName("r_name") == "BYTE_ARRAY") // the thrift/DuckDB spelling
  }

  test("parquet_metadata: row-group/column stats") {
    val r = q("SELECT row_group_num_rows, path_in_schema, stats_min_value, " +
      "stats_max_value, compression FROM " +
      "parquet_metadata('/root/testdata/sf0.001/region.parquet') " +
      "WHERE path_in_schema = 'r_regionkey'").collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getString(2) == "0" && r.getString(3) == "4")
    assert(r.getString(4) == "SNAPPY")
  }

  test("parquet_file_metadata + kv_metadata") {
    val fm = q("SELECT * FROM parquet_file_metadata(" +
      "'/root/testdata/sf0.001/region.parquet')").collect().head
    assert(fm.getLong(2) == 5L && fm.getLong(3) == 1L)
    val kv = q("SELECT CAST(key AS STRING) k FROM parquet_kv_metadata(" +
      "'/root/testdata/sf0.001/region.parquet')").collect()
      .map(_.getString(0))
    assert(kv.contains("pandas") || kv.contains("ARROW:schema"))
  }

  test("sniff_csv detects dialect, header and column types") {
    val r = q(s"SELECT * FROM sniff_csv('$dir/d.csv')").collect().head
    assert(r.getString(0) == ",")
    assert(r.getBoolean(5)) // HasHeader
    val cols = r.getSeq[org.apache.spark.sql.Row](6)
      .map(c => (c.getString(0), c.getString(1)))
    assert(cols == Seq(("a", "BIGINT"), ("b", "DOUBLE"), ("c", "VARCHAR")))
    assert(r.getString(10).startsWith("FROM read_csv("))
  }

  test("catalog listings: views/types/keywords/sequences/memory") {
    q("CREATE OR REPLACE TEMP VIEW intro_v AS SELECT 1 AS x")
    val v = q("SELECT view_name, temporary FROM duckdb_views() " +
      "WHERE view_name = 'intro_v'").collect()
    assert(v.length == 1 && v.head.getBoolean(1))
    val t = q("SELECT logical_type, type_category FROM duckdb_types() " +
      "WHERE type_name = 'bigint'").collect().head
    assert(t.getString(0) == "BIGINT" && t.getString(1) == "NUMERIC")
    val kw = q("SELECT keyword_category FROM duckdb_keywords() " +
      "WHERE keyword_name = 'select'").collect()
    assert(kw.nonEmpty)
    q("CREATE SEQUENCE intro_seq")
    assert(q("SELECT sequence_name FROM duckdb_sequences()").collect()
      .map(_.getString(0)).contains("intro_seq"))
    q("DROP SEQUENCE intro_seq")
    assert(q("SELECT * FROM duckdb_memory()").count() >= 10)
    assert(q("SELECT * FROM duckdb_indexes()").count() == 0)
    assert(q("SELECT * FROM checkpoint()").count() == 0)
    assert(q("SELECT * FROM duckdb_optimizers()").count() > 10)
  }

  test("PRAGMA database_size / show_databases") {
    val r = Engine.query(spark, "PRAGMA database_size").collect().head
    assert(r.getString(0) == "memory" && r.getString(8).nonEmpty)
    assert(Engine.query(spark, "PRAGMA show_databases").collect().nonEmpty)
  }
}
