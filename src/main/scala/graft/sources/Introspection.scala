package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB's file-introspection and catalog-metadata table functions
  * (delegated engine surface, reference forwards statements verbatim
  * at src/duckdb_pgwire_extension.cpp:52). Column names/order pinned
  * from DuckDB v1.0 probes; listings are metadata-sized by
  * construction (file footers, catalog snapshots), while the CONTENT
  * readers (read_text/read_blob) go through Spark's distributed
  * binaryFile source — a million matched files scan in parallel.
  *
  * Documented divergences: filenames render as absolute local paths
  * (DuckDB echoes the matched path verbatim); engine-specific listings
  * (duckdb_optimizers, duckdb_extensions, duckdb_keywords,
  * duckdb_memory) describe THIS engine, as DuckDB's describe its own.
  */
object Introspection {

  private def hadoopFs(sp: SparkSession, p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(sp.sessionState.newHadoopConf()), path)
  }

  /** expand one DuckDB file-glob: hadoop handles the non-recursive
    * forms natively; `**` (recursive, crosses separators) walks from
    * the longest glob-free prefix and filters with a translated regex
    * (`*`/`?` stay within a path segment, `**` crosses).
    */
  def expandGlob(sp: SparkSession, pattern: String): Seq[String] = {
    if (!pattern.contains("**")) {
      val (fs, p) = hadoopFs(sp, pattern)
      Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.isFile).map(_.getPath.toUri.getPath).sorted
    } else {
      val sepIdx = {
        val g = pattern.indexWhere(c => c == '*' || c == '?' || c == '[')
        pattern.lastIndexOf('/', math.max(g, 0))
      }
      val root = if (sepIdx <= 0) "." else pattern.substring(0, sepIdx)
      val re = {
        val sb = new StringBuilder("^")
        var i = 0
        while (i < pattern.length) {
          pattern.charAt(i) match {
            case '*' if i + 1 < pattern.length && pattern.charAt(i + 1) == '*' =>
              sb.append(".*"); i += 2
            case '*' => sb.append("[^/]*"); i += 1
            case '?' => sb.append("[^/]"); i += 1
            case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 =>
              sb.append('\\').append(c); i += 1
            case c => sb.append(c); i += 1
          }
        }
        sb.append("$").toString.r
      }
      val (fs, rp) = hadoopFs(sp, root)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(rp, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile) {
          val p = f.getPath.toUri.getPath
          if (re.findFirstIn(p).isDefined) out += p
        }
      }
      out.sorted.toSeq
    }
  }

  /** `glob('pat')` → one `file` row per match */
  def globDf(sp: SparkSession, pattern: String): DataFrame = {
    import sp.implicits._
    expandGlob(sp, pattern).toDF("file")
  }

  /** `read_text` / `read_blob`: (filename, content, size,
    * last_modified) over Spark's distributed binaryFile source.
    */
  def readFilesDf(sp: SparkSession, patterns: Seq[String],
      asText: Boolean): DataFrame = {
    val paths = patterns.flatMap(expandGlob(sp, _))
    require(paths.nonEmpty,
      s"read_${if (asText) "text" else "blob"}: no files match " +
        patterns.mkString(", "))
    val raw = sp.read.format("binaryFile").load(paths: _*)
    // decode(), not a cast: read_text is a raw UTF-8 byte decode,
    // while CAST(blob AS VARCHAR) renders DuckDB's \xHH escape form
    // (DuckBlobCastRule)
    val contentCol =
      if (asText) decode(col("content"), "UTF-8") else col("content")
    raw.select(
      regexp_replace(col("path"), "^file:(//)?", "").as("filename"),
      contentCol.as("content"),
      col("length").as("size"),
      col("modificationTime").as("last_modified"))
  }

  // ---- parquet footer introspection (driver-side: footers are KB) --

  private def withFooter[A](sp: SparkSession, path: String)(
      f: (String, org.apache.parquet.hadoop.metadata.ParquetMetadata) => Seq[A])
      : Seq[A] =
    expandGlob(sp, path).flatMap { p =>
      val in = HadoopInputFile.fromPath(new Path(p),
        sp.sessionState.newHadoopConf())
      val r = ParquetFileReader.open(in)
      try f(p, r.getFooter) finally r.close()
    }

  /** parquet-java's enum says BINARY; the thrift (and DuckDB) spelling
    * is BYTE_ARRAY */
  private def thriftTypeName(
      t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName): String =
    t.name match {
      case "BINARY" => "BYTE_ARRAY"
      case other => other
    }

  def parquetSchemaDf(sp: SparkSession, path: String): DataFrame = {
    import sp.implicits._
    import org.apache.parquet.schema.{GroupType, PrimitiveType, Type}
    def rows(file: String, t: Type, name: String)
        : Seq[(String, String, String, String, String, Option[Long],
            String, Option[Long], Option[Long], Option[Long], String)] =
      t match {
        case g: GroupType =>
          (file, name, null, null, t.getRepetition.name,
            Some(g.getFieldCount.toLong), null, None, None,
            Option(t.getId).map(_.intValue.toLong), null) +:
            g.getFields.asScala.toSeq.flatMap(f => rows(file, f, f.getName))
        case p: PrimitiveType =>
          val dec = Option(p.getLogicalTypeAnnotation).collect {
            case d: org.apache.parquet.schema.LogicalTypeAnnotation
                .DecimalLogicalTypeAnnotation => (d.getScale, d.getPrecision)
          }
          Seq((file, name, thriftTypeName(p.getPrimitiveTypeName),
            if (p.getTypeLength > 0) p.getTypeLength.toString else null,
            p.getRepetition.name, None,
            Option(p.getOriginalType).map(_.name).orNull,
            dec.map(_._1.toLong), dec.map(_._2.toLong),
            Option(p.getId).map(_.intValue.toLong),
            Option(p.getLogicalTypeAnnotation).map(_.toString).orNull))
      }
    withFooter(sp, path) { (p, footer) =>
      val root = footer.getFileMetaData.getSchema
      rows(p, root, "schema")
    }.toDF("file_name", "name", "type", "type_length", "repetition_type",
      "num_children", "converted_type", "scale", "precision", "field_id",
      "logical_type")
  }

  def parquetMetadataDf(sp: SparkSession, path: String): DataFrame = {
    import sp.implicits._
    def statStr(s: org.apache.parquet.column.statistics.Statistics[_],
        min: Boolean): String =
      if (s == null || s.isEmpty) null
      else scala.util.Try {
        (if (min) s.genericGetMin else s.genericGetMax) match {
          case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
          case v => String.valueOf(v)
        }
      }.getOrElse(null)
    withFooter(sp, path) { (p, footer) =>
      footer.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (rg, rgi) =>
        rg.getColumns.asScala.toSeq.zipWithIndex.map { case (cc, ci) =>
          val st = cc.getStatistics
          (p, rgi.toLong, rg.getRowCount, rg.getColumns.size.toLong,
            rg.getTotalByteSize, ci.toLong, cc.getStartingPos,
            cc.getValueCount, cc.getPath.toDotString,
            thriftTypeName(cc.getPrimitiveType.getPrimitiveTypeName),
            statStr(st, min = true), statStr(st, min = false),
            if (st != null && !st.isEmpty && st.isNumNullsSet)
              Some(st.getNumNulls) else None,
            statStr(st, min = true), statStr(st, min = false),
            cc.getCodec.name,
            cc.getEncodings.asScala.map(_.name).toSeq.sorted.mkString(", "),
            if (cc.getDictionaryPageOffset > 0)
              Some(cc.getDictionaryPageOffset) else None,
            cc.getFirstDataPageOffset, cc.getTotalSize,
            cc.getTotalUncompressedSize)
        }
      }
    }.toDF("file_name", "row_group_id", "row_group_num_rows",
      "row_group_num_columns", "row_group_bytes", "column_id",
      "file_offset", "num_values", "path_in_schema", "type",
      "stats_min", "stats_max", "stats_null_count",
      "stats_min_value", "stats_max_value", "compression", "encodings",
      "dictionary_page_offset", "data_page_offset",
      "total_compressed_size", "total_uncompressed_size")
  }

  def parquetFileMetadataDf(sp: SparkSession, path: String): DataFrame = {
    import sp.implicits._
    withFooter(sp, path) { (p, footer) =>
      val fm = footer.getFileMetaData
      Seq((p, fm.getCreatedBy,
        footer.getBlocks.asScala.map(_.getRowCount).sum,
        footer.getBlocks.size.toLong))
    }.toDF("file_name", "created_by", "num_rows", "num_row_groups")
  }

  def parquetKvMetadataDf(sp: SparkSession, path: String): DataFrame = {
    import sp.implicits._
    withFooter(sp, path) { (p, footer) =>
      footer.getFileMetaData.getKeyValueMetaData.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) =>
          (p, k.getBytes("UTF-8"),
            Option(v).map(_.getBytes("UTF-8")).orNull)
        }
    }.toDF("file_name", "key", "value")
  }

  // ---- catalog metadata listings (duckdb_* shapes) -----------------

  private def safeFields(sp: SparkSession, name: String) =
    scala.util.Try(sp.table(name).schema.fields).getOrElse(Array.empty)

  def viewsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    sp.catalog.listTables().collect().toSeq
      .filter(t => t.tableType == "VIEW" || t.tableType == "TEMPORARY")
      .sortBy(_.name)
      .map(t => (Option(t.database).getOrElse("memory"), "main", t.name,
        graft.Comments.get("view", t.name).orNull,
        t.isTemporary, safeFields(sp, t.name).length, null: String))
      .toDF("database_name", "schema_name", "view_name", "comment",
        "temporary", "column_count", "sql")
  }

  def schemasDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    sp.catalog.listDatabases().collect().toSeq.sortBy(_.name)
      .map(d => ("memory", d.name, d.name == "default"))
      .toDF("database_name", "schema_name", "internal")
  }

  /** DuckDB's internal type grid (name → size/logical/category),
    * distinct rows from the v1.0 catalog probe. */
  def typesDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    val g = Seq(
      ("bigint", Some(8L), "BIGINT", "NUMERIC"),
      ("binary", Some(16L), "BLOB", null), ("bit", Some(16L), "BIT", null),
      ("bitstring", Some(16L), "BIT", null),
      ("blob", Some(16L), "BLOB", null), ("bool", Some(1L), "BOOLEAN", "BOOLEAN"),
      ("boolean", Some(1L), "BOOLEAN", "BOOLEAN"),
      ("bpchar", Some(16L), "VARCHAR", "STRING"),
      ("bytea", Some(16L), "BLOB", null),
      ("char", Some(16L), "VARCHAR", "STRING"),
      ("date", Some(4L), "DATE", "DATETIME"),
      ("datetime", Some(8L), "TIMESTAMP", "DATETIME"),
      ("dec", None: Option[Long], "DECIMAL", "NUMERIC"),
      ("decimal", None: Option[Long], "DECIMAL", "NUMERIC"),
      ("double", Some(8L), "DOUBLE", "NUMERIC"),
      ("enum", None: Option[Long], "ENUM", null),
      ("float", Some(4L), "FLOAT", "NUMERIC"),
      ("float4", Some(4L), "FLOAT", "NUMERIC"),
      ("float8", Some(8L), "DOUBLE", "NUMERIC"),
      ("guid", Some(16L), "UUID", null),
      ("hugeint", Some(16L), "HUGEINT", "NUMERIC"),
      ("int", Some(4L), "INTEGER", "NUMERIC"),
      ("int1", Some(1L), "TINYINT", "NUMERIC"),
      ("int128", Some(16L), "HUGEINT", "NUMERIC"),
      ("int16", Some(2L), "SMALLINT", "NUMERIC"),
      ("int2", Some(2L), "SMALLINT", "NUMERIC"),
      ("int32", Some(4L), "INTEGER", "NUMERIC"),
      ("int4", Some(4L), "INTEGER", "NUMERIC"),
      ("int64", Some(8L), "BIGINT", "NUMERIC"),
      ("int8", Some(8L), "BIGINT", "NUMERIC"),
      ("integer", Some(4L), "INTEGER", "NUMERIC"),
      ("integral", Some(4L), "INTEGER", "NUMERIC"),
      ("interval", Some(16L), "INTERVAL", "DATETIME"),
      ("JSON", Some(16L), "VARCHAR", "STRING"),
      ("list", None: Option[Long], "LIST", "COMPOSITE"),
      ("logical", Some(1L), "BOOLEAN", "BOOLEAN"),
      ("long", Some(8L), "BIGINT", "NUMERIC"),
      ("map", None: Option[Long], "MAP", "COMPOSITE"),
      ("null", Some(1L), "\"NULL\"", null),
      ("numeric", None: Option[Long], "DECIMAL", "NUMERIC"),
      ("nvarchar", Some(16L), "VARCHAR", "STRING"),
      ("oid", Some(8L), "BIGINT", "NUMERIC"),
      ("real", Some(4L), "FLOAT", "NUMERIC"),
      ("row", None: Option[Long], "STRUCT", "COMPOSITE"),
      ("short", Some(2L), "SMALLINT", "NUMERIC"),
      ("signed", Some(4L), "INTEGER", "NUMERIC"),
      ("smallint", Some(2L), "SMALLINT", "NUMERIC"),
      ("string", Some(16L), "VARCHAR", "STRING"),
      ("struct", None: Option[Long], "STRUCT", "COMPOSITE"),
      ("text", Some(16L), "VARCHAR", "STRING"),
      ("time", Some(8L), "TIME", "DATETIME"),
      ("timestamp", Some(8L), "TIMESTAMP", "DATETIME"),
      ("timestamp_ms", Some(8L), "TIMESTAMP_MS", "DATETIME"),
      ("timestamp_ns", Some(8L), "TIMESTAMP_NS", "DATETIME"),
      ("timestamp_s", Some(8L), "TIMESTAMP_S", "DATETIME"),
      ("timestamp_us", Some(8L), "TIMESTAMP", "DATETIME"),
      ("timestamptz", Some(8L), "TIMESTAMP WITH TIME ZONE", "DATETIME"),
      ("timetz", Some(8L), "TIME WITH TIME ZONE", "DATETIME"),
      ("tinyint", Some(1L), "TINYINT", "NUMERIC"),
      ("ubigint", Some(8L), "UBIGINT", "NUMERIC"),
      ("uhugeint", Some(16L), "UHUGEINT", "NUMERIC"),
      ("uint128", Some(16L), "UHUGEINT", "NUMERIC"),
      ("uint16", Some(2L), "USMALLINT", "NUMERIC"),
      ("uint32", Some(4L), "UINTEGER", "NUMERIC"),
      ("uint64", Some(8L), "UBIGINT", "NUMERIC"),
      ("uint8", Some(1L), "UTINYINT", "NUMERIC"),
      ("uinteger", Some(4L), "UINTEGER", "NUMERIC"),
      ("union", None: Option[Long], "UNION", "COMPOSITE"),
      ("usmallint", Some(2L), "USMALLINT", "NUMERIC"),
      ("utinyint", Some(1L), "UTINYINT", "NUMERIC"),
      ("uuid", Some(16L), "UUID", null),
      ("varbinary", Some(16L), "BLOB", null),
      ("varchar", Some(16L), "VARCHAR", "STRING"))
    g.map { case (n, sz, lt, cat) => ("memory", "main", n, sz, lt, cat) }
      .toDF("database_name", "schema_name", "type_name", "type_size",
        "logical_type", "type_category")
  }

  /** THIS engine's keyword list (Spark's sql_keywords TVF) in DuckDB's
    * column shape — engine-specific by nature, like duckdb_settings. */
  def keywordsDf(sp: SparkSession): DataFrame =
    sp.sql("SELECT lower(keyword) AS keyword_name, " +
      "CASE WHEN reserved THEN 'reserved' ELSE 'unreserved' END " +
      "AS keyword_category FROM sql_keywords() ORDER BY keyword_name")

  def sequencesDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Sequences.list()
      .map { case (name, next, inc) =>
        ("memory", "main", name,
          graft.Comments.get("sequence", name).orNull, 1L, inc, next)
      }
      .toDF("database_name", "schema_name", "sequence_name", "comment",
        "start_value", "increment_by", "last_value")
  }

  def indexesDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Seq.empty[(String, String, String, String, Boolean, Boolean, String)]
      .toDF("database_name", "schema_name", "index_name", "table_name",
        "is_unique", "is_primary", "sql")
  }

  /** duckdb_constraints() over the recorded registry — DuckDB 1.0's
    * 12-column shape (probed). constraint_index is declaration-order
    * approximate (the registry groups by kind); oids are stable
    * hashes, engine-specific like DuckDB's own. */
  def constraintsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    import graft.TableConstraints
    val rows = Seq.newBuilder[(String, Long, String, Long, String, Long,
      Long, String, String, String, Seq[Long], Seq[String])]
    TableConstraints.allTables.foreach { t =>
      val parts = t.split('.')
      val (schemaName, tableName) =
        if (parts.length > 1) (parts(0), parts.last) else ("main", t)
      val colIdx: Map[String, Long] =
        scala.util.Try(sp.table(t).schema.fieldNames.zipWithIndex
          .map { case (c, i) => c.toLowerCase -> i.toLong }.toMap)
          .getOrElse(Map.empty)
      val tOid = (t.hashCode.toLong & 0x7fffffff)
      var idx = -1L
      def add(tpe: String, text: String, expr: String,
          cols: Seq[String]): Unit = {
        idx += 1
        rows += (("memory", 0L, schemaName, 0L, tableName, tOid, idx,
          tpe, text, expr, cols.flatMap(c => colIdx.get(c.toLowerCase)),
          cols))
      }
      val pk = TableConstraints.pkOf(t).getOrElse(Nil)
      if (pk.nonEmpty)
        add("PRIMARY KEY", s"PRIMARY KEY(${pk.mkString(", ")})", null, pk)
      TableConstraints.fksOf(t).foreach { fk =>
        add("FOREIGN KEY",
          s"FOREIGN KEY (${fk.cols.mkString(", ")}) REFERENCES " +
            s"${fk.parentTable}(${fk.parentCols.mkString(", ")})",
          null, fk.cols)
      }
      TableConstraints.uniquesOf(t).foreach(u =>
        add("UNIQUE", s"UNIQUE(${u.mkString(", ")})", null, u))
      // explicit NOT NULLs first, PK-implied last (DuckDB lists the
      // implied ones after the declared constraints)
      val nn = TableConstraints.notNullOf(t)
      (nn.filterNot(pk.contains) ++ nn.filter(pk.contains)).foreach(c =>
        add("NOT NULL", "NOT NULL", null, Seq(c)))
      TableConstraints.checksRawOf(t).foreach { e =>
        // referenced columns: schema names appearing as words
        val refd = colIdx.toSeq.sortBy(_._2).map(_._1).filter(c =>
          ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
            .findFirstIn(e).isDefined)
        add("CHECK", s"CHECK(($e))", s"($e)", refd)
      }
    }
    rows.result().toDF("database_name", "database_oid", "schema_name",
      "schema_oid", "table_name", "table_oid", "constraint_index",
      "constraint_type", "constraint_text", "expression",
      "constraint_column_indexes", "constraint_column_names")
  }

  // ---- information_schema constraint views (standard SQL; ORMs and
  // migration tools probe them). Naming matches DuckDB 1.0 (probed):
  // single-column constraints carry the column ({t}_{c}_pkey), multi-
  // column ones drop it ({t}_pkey); NOT NULL surfaces as CHECK type
  // with the _not_null suffix.

  private def cName(table: String, cols: Seq[String],
      suffix: String): String = {
    val bare = table.split('.').last
    if (cols.length == 1) s"${bare}_${cols.head}_$suffix"
    else s"${bare}_$suffix"
  }

  private def schemaOf(t: String): String = {
    val parts = t.split('.')
    if (parts.length > 1) parts(0) else "main"
  }

  private def checkCols(sp: SparkSession, t: String,
      expr: String): Seq[String] =
    scala.util.Try(sp.table(t).schema.fieldNames.toSeq).getOrElse(Nil)
      .filter(c => ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
        .findFirstIn(expr).isDefined).map(_.toLowerCase)

  def isTableConstraintsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    import graft.TableConstraints
    val rows = Seq.newBuilder[(String, String, String, String, String,
      String, String, String, String, String, String)]
    TableConstraints.allTables.foreach { t =>
      val (sch, bare) = (schemaOf(t), t.split('.').last)
      def add(name: String, tpe: String): Unit =
        rows += (("memory", sch, name, "memory", sch, bare, tpe,
          "NO", "NO", "YES", "YES"))
      TableConstraints.fksOf(t).foreach(fk =>
        add(cName(t, fk.cols, "fkey"), "FOREIGN KEY"))
      TableConstraints.pkOf(t).foreach(pk =>
        add(cName(t, pk, "pkey"), "PRIMARY KEY"))
      TableConstraints.notNullOf(t).foreach(c =>
        add(cName(t, Seq(c), "not_null"), "CHECK"))
      TableConstraints.uniquesOf(t).foreach(u =>
        add(cName(t, u, "key"), "UNIQUE"))
      TableConstraints.checksRawOf(t).foreach(e =>
        add(cName(t, checkCols(sp, t, e), "check"), "CHECK"))
    }
    rows.result().toDF("constraint_catalog", "constraint_schema",
      "constraint_name", "table_catalog", "table_schema", "table_name",
      "constraint_type", "is_deferrable", "initially_deferred",
      "enforced", "nulls_distinct")
  }

  def isKeyColumnUsageDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    import graft.TableConstraints
    val rows = Seq.newBuilder[(String, String, String, String, String,
      String, String, Int, Option[Int])]
    TableConstraints.allTables.foreach { t =>
      val (sch, bare) = (schemaOf(t), t.split('.').last)
      def add(name: String, col: String, pos: Int,
          inUnique: Option[Int]): Unit =
        rows += (("memory", sch, name, "memory", sch, bare, col, pos,
          inUnique))
      TableConstraints.pkOf(t).foreach(pk => pk.zipWithIndex.foreach {
        case (c, i) => add(cName(t, pk, "pkey"), c, i + 1, None) })
      TableConstraints.uniquesOf(t).foreach(u => u.zipWithIndex.foreach {
        case (c, i) => add(cName(t, u, "key"), c, i + 1, None) })
      TableConstraints.fksOf(t).foreach(fk => fk.cols.zipWithIndex
        .foreach { case (c, i) =>
          add(cName(t, fk.cols, "fkey"), c, i + 1, Some(i + 1)) })
    }
    rows.result().toDF("constraint_catalog", "constraint_schema",
      "constraint_name", "table_catalog", "table_schema", "table_name",
      "column_name", "ordinal_position", "position_in_unique_constraint")
  }

  def isReferentialConstraintsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    import graft.TableConstraints
    val rows = Seq.newBuilder[(String, String, String, String, String,
      String, String, String, String)]
    TableConstraints.allTables.foreach { t =>
      val sch = schemaOf(t)
      TableConstraints.fksOf(t).foreach { fk =>
        // DuckDB lists EVERY candidate unique-constraint name for the
        // edge (probed: a PK-referencing FK shows both the _pkey and
        // the _key spelling)
        val pPk = TableConstraints.pkOf(fk.parentTable).getOrElse(Nil)
        val uNames =
          (if (pPk == fk.parentCols)
            Seq(cName(fk.parentTable, pPk, "pkey")) else Nil) :+
            cName(fk.parentTable, fk.parentCols, "key")
        uNames.foreach { uName =>
          rows += (("memory", sch, cName(t, fk.cols, "fkey"), "memory",
            schemaOf(fk.parentTable), uName, "NONE", "NO ACTION",
            "NO ACTION"))
        }
      }
    }
    rows.result().toDF("constraint_catalog", "constraint_schema",
      "constraint_name", "unique_constraint_catalog",
      "unique_constraint_schema", "unique_constraint_name",
      "match_option", "update_rule", "delete_rule")
  }

  def temporaryFilesDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Seq.empty[(String, Long)].toDF("path", "size")
  }

  def secretsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Seq.empty[(String, String, String, Boolean, String)]
      .toDF("name", "type", "provider", "persistent", "storage")
  }

  /** JVM/executor memory in DuckDB's tag shape */
  def memoryDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    val rt = Runtime.getRuntime
    val used = rt.totalMemory - rt.freeMemory
    (("BASE_TABLE", used, 0L) +:
      Seq("HASH_TABLE", "PARQUET_READER", "CSV_READER", "ORDER_BY",
        "ART_INDEX", "COLUMN_DATA", "METADATA", "OVERFLOW_STRINGS",
        "IN_MEMORY_TABLE", "ALLOCATOR", "EXTENSION").map((_, 0L, 0L)))
      .toDF("tag", "memory_usage_bytes", "temporary_storage_bytes")
  }

  /** THIS engine's optimizer rule names (engine-specific listing) */
  def optimizersDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    sp.sessionState.optimizer.batches
      .flatMap(_.rules.map(_.ruleName.split("\\.").last)).distinct.sorted
      .toSeq.toDF("name")
  }

  /** the capabilities this engine ships compiled-in, in extension shape */
  def extensionsDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Seq(("parquet", true, true, "", "Parquet reader/writer (Spark native)"),
      ("json", true, true, "", "JSON reader/writer (Spark native)"),
      ("icu", true, true, "", "Collations/timezones (JVM ICU)"),
      ("httpfs", false, false, "", "Remote filesystems via Hadoop FS"),
      ("graft", true, true, "", "DuckDB-dialect engine on Spark"))
      .toDF("extension_name", "loaded", "installed", "install_path",
        "description")
  }

  /** `sniff_csv('f.csv')` — dialect detection over the file head
    * (driver-side, bounded read), DuckDB's column shape. */
  def sniffCsvDf(sp: SparkSession, path: String): DataFrame = {
    val p = expandGlob(sp, path).headOption.getOrElse(
      throw new IllegalArgumentException(s"sniff_csv: no file matches $path"))
    val (fs, hp) = hadoopFs(sp, p)
    val in = fs.open(hp)
    val head = try {
      val buf = new Array[Byte](1 << 20)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), "UTF-8")
    } finally in.close()
    val newline = if (head.contains("\r\n")) "\\r\\n" else "\\n"
    val lines = head.split("\r?\n").filter(_.nonEmpty).take(100)
    require(lines.nonEmpty, s"sniff_csv: $p is empty")
    def split(line: String, d: Char): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (inQ) {
          if (c == '"') {
            if (i + 1 < line.length && line.charAt(i + 1) == '"') {
              cur.append('"'); i += 1
            } else inQ = false
          } else cur.append(c)
        } else if (c == '"') inQ = true
        else if (c == d) { out += cur.toString; cur.clear() }
        else cur.append(c)
        i += 1
      }
      out += cur.toString
      out.toSeq
    }
    val delim = Seq(',', ';', '\t', '|').maxBy { d =>
      val counts = lines.map(split(_, d).length)
      if (counts.distinct.length == 1 && counts.head > 1) counts.head else 0
    }
    val rows = lines.map(split(_, delim))
    val width = rows.map(_.length).max
    def cellType(s: String): String = {
      val t = s.trim
      if (t.isEmpty) "VARCHAR"
      else if (scala.util.Try(t.toLong).isSuccess) "BIGINT"
      else if (scala.util.Try(t.toDouble).isSuccess) "DOUBLE"
      else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false"))
        "BOOLEAN"
      else "VARCHAR"
    }
    def merge(a: String, b: String): String =
      if (a == b) a
      else if (Set(a, b) == Set("BIGINT", "DOUBLE")) "DOUBLE"
      else "VARCHAR"
    def colTypes(data: Seq[Seq[String]]): Seq[String] =
      (0 until width).map { i =>
        data.flatMap(_.lift(i)).map(cellType)
          .reduceOption(merge).getOrElse("VARCHAR")
      }
    val headerTypes = rows.head.map(cellType)
    val dataTypes = colTypes(rows.drop(1))
    val hasHeader = rows.length > 1 &&
      headerTypes.forall(_ == "VARCHAR") &&
      dataTypes.exists(_ != "VARCHAR")
    val names =
      if (hasHeader) rows.head.padTo(width, "")
      else (0 until width).map("column" + _)
    val types = if (hasHeader) dataTypes else colTypes(rows)
    val columns = names.zip(types)
    val prompt = s"FROM read_csv('$p', auto_detect=false, delim='" +
      (if (delim == '\t') "\\t" else delim.toString) +
      s"', quote='\"', escape='\"', new_line='$newline', skip=0, " +
      s"header=$hasHeader, columns={" +
      columns.map { case (n, t) => s"'$n': '$t'" }.mkString(", ") + "});"
    import sp.implicits._
    Seq((if (delim == '\t') "\\t" else delim.toString, "\"", "\"", newline,
      0L, hasHeader,
      columns.map { case (n, t) => (n, t) },
      null: String, null: String, null: String, prompt))
      .toDF("Delimiter", "Quote", "Escape", "NewLineDelimiter", "SkipRows",
        "HasHeader", "Columns", "DateFormat", "TimestampFormat",
        "UserArguments", "Prompt")
      .withColumn("Columns", col("Columns").cast(
        "array<struct<name:string,type:string>>"))
  }

  private def fmtBytes(b: Long): String = {
    if (b < 1024) s"$b bytes"
    else {
      val units = Seq("KiB", "MiB", "GiB", "TiB")
      var v = b.toDouble / 1024
      var u = 0
      while (v >= 1024 && u < units.length - 1) { v /= 1024; u += 1 }
      f"$v%.1f ${units(u)}"
    }
  }

  /** PRAGMA database_size — in-memory engine: blocks are zero, the
    * JVM heap numbers are real. */
  def databaseSizeDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    val rt = Runtime.getRuntime
    Seq(("memory", "0 bytes", 0L, 0L, 0L, 0L, "0 bytes",
      fmtBytes(rt.totalMemory - rt.freeMemory), fmtBytes(rt.maxMemory)))
      .toDF("database_name", "database_size", "block_size", "total_blocks",
        "used_blocks", "free_blocks", "wal_size", "memory_usage",
        "memory_limit")
  }

  /** checkpoint()/force_checkpoint(): nothing to flush — an empty
    * Success-shaped result, like DuckDB's */
  def checkpointDf(sp: SparkSession): DataFrame = {
    import sp.implicits._
    Seq.empty[Boolean].toDF("Success")
  }
}
