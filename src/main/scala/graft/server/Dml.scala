package graft.server

import org.apache.spark.sql.SparkSession

/** UPDATE / DELETE over catalog parquet tables as copy-on-write
  * rewrites — the surface the reference serves through DuckDB
  * (README.md:54 flow allows any DuckDB SQL) but Spark's v1 sources
  * reject natively. Semantics: matched rows (predicate strictly TRUE,
  * null ≠ match, like SQL DELETE) are rewritten/removed, and the full
  * table is overwritten from a materialized snapshot.
  *
  * Scale note: whole-table copy-on-write is exactly what Delta/
  * Iceberg formalize per-file; this is the v1-source equivalent, and
  * the snapshot (localCheckpoint) is what breaks the read-overwrite
  * cycle Spark otherwise refuses.
  */
object Dml {

  /** Per-table write lock: the snapshot-then-overwrite cycle is not
    * atomic, so two concurrent writers on one table would both
    * snapshot the original and the last overwrite would silently drop
    * the first writer's rows. The delegated engine serializes writers
    * (DuckDB admits one write transaction at a time), so a per-table
    * monitor reproduces the observable semantics. Keyed by lowercased
    * table name, process-wide (the catalog is process-wide too).
    */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def lockFor(table: String): Object =
    tableLocks.computeIfAbsent(table.toLowerCase, _ => new Object)

  private val deleteRe =
    """(?is)^DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val updateRe =
    """(?is)^UPDATE\s+([\w.]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r

  private def matchPred(p: Option[String]): String =
    p.map(x => s"coalesce(CAST(($x) AS BOOLEAN), false)").getOrElse("true")

  /** top-level comma split (respects quotes and parens). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var inS = false
    s.foreach { c =>
      if (inS) { cur += c; if (c == '\'') inS = false }
      else c match {
        case '\'' => inS = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def delete(session: SparkSession, sql: String): Long = sql.trim match {
    case deleteRe(table, whereOrNull) => lockFor(table).synchronized {
      val pred = matchPred(Option(whereOrNull))
      val n = session.sql(s"SELECT count(*) FROM $table WHERE $pred")
        .collect()(0).getLong(0)
      if (n > 0) {
        val keep = session.sql(s"SELECT * FROM $table WHERE NOT $pred")
          .localCheckpoint() // snapshot BEFORE overwriting the source
        keep.write.mode("overwrite").insertInto(table)
      }
      n
    }
    case _ => throw new IllegalArgumentException(
      "DELETE syntax: DELETE FROM table [WHERE predicate]")
  }

  def update(session: SparkSession, sql: String): Long = sql.trim match {
    case updateRe(table, setList, whereOrNull) => lockFor(table).synchronized {
      val pred = matchPred(Option(whereOrNull))
      val schema = session.table(table).schema
      val sets: Map[String, String] = splitTopLevel(setList).map { a =>
        val idx = a.indexOf('=')
        require(idx > 0, s"bad SET assignment: $a")
        (a.substring(0, idx).trim.toLowerCase, a.substring(idx + 1).trim)
      }.toMap
      val unknown = sets.keySet.diff(schema.fieldNames.map(_.toLowerCase).toSet)
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"UPDATE references unknown column(s): ${unknown.mkString(", ")}")
      val proj = schema.fields.map { f =>
        sets.get(f.name.toLowerCase) match {
          case Some(e) =>
            // cast to the column type (DuckDB-style assignment cast)
            s"CASE WHEN $pred THEN CAST(($e) AS ${f.dataType.sql}) " +
              s"ELSE ${f.name} END AS ${f.name}"
          case None => f.name
        }
      }.mkString(", ")
      val n = session.sql(s"SELECT count(*) FROM $table WHERE $pred")
        .collect()(0).getLong(0)
      if (n > 0) {
        val updated = session.sql(s"SELECT $proj FROM $table")
          .localCheckpoint()
        updated.write.mode("overwrite").insertInto(table)
      }
      n
    }
    case _ => throw new IllegalArgumentException(
      "UPDATE syntax: UPDATE table SET col = expr[, ...] [WHERE predicate]")
  }
}
