package graft.server

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal pg_catalog interception so psql's introspection
  * meta-commands work (SURVEY §7 known-hard #1: "psql's catalog
  * probes … mitigate with a tiny pg_catalog view shim").
  *
  * psql renders whatever result table the backend returns for its
  * catalog queries, so serving the column shapes psql reads
  * positionally is enough — relation listings come from the live
  * Spark catalog. Recognized flows (psql 15): `\dt`/`\d` listing,
  * `\d <table>` (oid probe → relchecks probe → pg_attribute columns),
  * `\l`, `\dn`, `\df`.
  */
object PgCatalogShim {

  /** synthetic stable oids for \d's multi-query flow. */
  private val oidToTable = TrieMap.empty[Int, String]
  private def oidOf(name: String): Int = {
    val oid = (name.hashCode & 0x7fffffff) | 1
    oidToTable.put(oid, name)
    oid
  }

  private val relnamePattern = """\^\(([^)]*)\)\$""".r
  private val oidEquals = """c\.oid = '(\d+)'""".r
  private val attrelid = """attrelid = '(\d+)'""".r

  def intercept(session: SparkSession, sql: String): Option[DataFrame] = {
    val s = sql.toLowerCase
    if (!s.contains("pg_catalog.") && !s.contains("from pg_")) return None
    import session.implicits._

    // \d <name> step 1: resolve relname pattern to oid
    if (s.contains("pg_class") && s.contains("c.oid") &&
        relnamePattern.findFirstMatchIn(sql).isDefined) {
      val name = relnamePattern.findFirstMatchIn(sql).get.group(1)
      val exists = session.catalog.tableExists(name)
      val rows = if (exists) Seq((oidOf(name), "session", name)) else Seq()
      return Some(rows.toDF("oid", "nspname", "relname"))
    }
    // \d <name> step 2: relation properties probe
    if (s.contains("relchecks")) {
      return Some(Seq((0, "v", false, false, false, false, false, false,
        false, "", 0, "", "p", "d", ""))
        .toDF("relchecks", "relkind", "relhasindex", "relhasrules",
          "relhastriggers", "relrowsecurity", "relforcerowsecurity",
          "relhasoids", "relispartition", "x", "reltablespace", "reloftype",
          "relpersistence", "relreplident", "amname"))
    }
    // \d <name> step 3: column listing from the Spark schema
    if (s.contains("pg_attribute")) {
      val table = oidEquals.findFirstMatchIn(sql)
        .orElse(attrelid.findFirstMatchIn(sql))
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      // psql 15 reads positionally: (attname, format_type, default,
      // attnotnull, attcollation, attidentity, attgenerated)
      val cols = table.toSeq.flatMap { t =>
        session.table(t).schema.fields.map { f =>
          (f.name, f.dataType.simpleString, Option.empty[String],
            !f.nullable, Option.empty[String], "", "")
        }
      }
      return Some(cols.toDF("attname", "format_type", "adef",
        "attnotnull", "attcollation", "attidentity", "attgenerated"))
    }
    if (s.contains("pg_class")) {
      val db = session.catalog.currentDatabase
      val tables = session.catalog.listTables(db).collect().toSeq
      Some(tables.map { t =>
        (Option(t.database).getOrElse("session"), t.name,
          if (t.tableType == "VIEW" || t.isTemporary) "view" else "table",
          "graft")
      }.toDF("Schema", "Name", "Type", "Owner")
        .orderBy($"Schema", $"Name"))
    } else if (s.contains("pg_proc")) {
      // psql embeds the \df pattern as proname ~ '^(regex)$'
      val pattern = relnamePattern.findFirstMatchIn(sql)
        .map(m => ("^" + m.group(1) + "$").r)
      Some(session.catalog.listFunctions().collect().toSeq
        .filter(f => !f.name.contains("$") &&
          pattern.forall(_.findFirstIn(f.name).isDefined))
        .take(500)
        .map(f => ("session", f.name, "", "", "func"))
        .toDF("Schema", "Name", "Result data type", "Argument data types", "Type")
        .orderBy($"Name"))
    } else if (s.contains("pg_database")) {
      Some(Seq(("main", "graft", "UTF8")).toDF("Name", "Owner", "Encoding"))
    } else if (s.contains("pg_namespace")) {
      Some(session.catalog.listDatabases().collect().toSeq
        .map(d => (d.name, "graft")).toDF("Name", "Owner").orderBy($"Name"))
    } else None
  }
}
