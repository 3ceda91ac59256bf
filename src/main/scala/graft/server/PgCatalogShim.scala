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
    // \d <name> step 2: relation properties probe. relchecks > 0 and
    // relhasindex = true steer psql into its constraint/index
    // follow-up queries, served below from the constraint registry.
    if (s.contains("relchecks")) {
      val table = oidEquals.findFirstMatchIn(sql)
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      val checks = table.map(t =>
        graft.TableConstraints.checksRawOf(t).size).getOrElse(0)
      val hasIdx = table.exists(t =>
        graft.TableConstraints.pkOf(t).nonEmpty ||
          graft.TableConstraints.uniquesOf(t).nonEmpty)
      // pg implements FKs as RI triggers, and psql gates both the
      // "Foreign-key constraints" and "Referenced by" sections on
      // relhastriggers — flag it when the table touches any FK edge
      val hasTrig = table.exists(t =>
        graft.TableConstraints.fksOf(t).nonEmpty ||
          graft.TableConstraints.referencingFks(t).nonEmpty)
      val kind = table.map { t =>
        scala.util.Try(session.catalog.getTable(t)).toOption
          .map(ti =>
            if (ti.tableType == "VIEW" || ti.tableType == "TEMPORARY") "v"
            else "r")
          .getOrElse("r")
      }.getOrElse("r")
      return Some(Seq((checks, kind, hasIdx, false, hasTrig, false, false,
        false, false, "", 0, "", "p", "d", ""))
        .toDF("relchecks", "relkind", "relhasindex", "relhasrules",
          "relhastriggers", "relrowsecurity", "relforcerowsecurity",
          "relhasoids", "relispartition", "x", "reltablespace", "reloftype",
          "relpersistence", "relreplident", "amname"))
    }
    // \d <name> step 3: column listing from the Spark schema +
    // constraint registry (NOT NULL marks, declared defaults,
    // generated columns render as pg's "generated always as (...)")
    if (s.contains("pg_attribute")) {
      val table = oidEquals.findFirstMatchIn(sql)
        .orElse(attrelid.findFirstMatchIn(sql))
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      val cols = table.toSeq.flatMap { t =>
        val nn = graft.TableConstraints.notNullOf(t).toSet
        val gens = graft.TableConstraints.generatedOf(t)
          .map(g => g.name.toLowerCase -> g.expr).toMap
        session.table(t).schema.fields.map { f =>
          val gen = gens.get(f.name.toLowerCase)
          val dflt =
            if (gen.isDefined) gen
            else if (f.metadata.contains("CURRENT_DEFAULT"))
              Some(f.metadata.getString("CURRENT_DEFAULT"))
            else None
          (f.name, f.dataType.simpleString, dflt,
            nn(f.name.toLowerCase) || !f.nullable,
            Option.empty[String], "", if (gen.isDefined) "s" else "")
        }
      }
      return Some(cols.toDF("attname", "format_type", "adef",
        "attnotnull", "attcollation", "attidentity", "attgenerated"))
    }
    // \d <name> index section: psql's 12-column pg_index probe —
    // PRIMARY KEY / UNIQUE keysets render as their implicit indexes
    if (s.contains("pg_index") && s.contains("indisprimary")) {
      val table = oidEquals.findFirstMatchIn(sql)
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      val rows = table.toSeq.flatMap { t =>
        val bare = t.split('.').last
        def name(cols: Seq[String], sfx: String) =
          if (cols.length == 1) s"${bare}_${cols.head}_$sfx"
          else s"${bare}_$sfx"
        val pk = graft.TableConstraints.pkOf(t).toSeq.map { cols =>
          (s"${bare}_pkey", true, true, false, true,
            s"CREATE UNIQUE INDEX ${bare}_pkey ON $bare " +
              s"USING btree (${cols.mkString(", ")})",
            s"PRIMARY KEY (${cols.mkString(", ")})", "p", false, false,
            false, 0)
        }
        val uq = graft.TableConstraints.uniquesOf(t).map { cols =>
          (name(cols, "key"), false, true, false, true,
            s"CREATE UNIQUE INDEX ${name(cols, "key")} ON $bare " +
              s"USING btree (${cols.mkString(", ")})",
            s"UNIQUE (${cols.mkString(", ")})", "u", false, false,
            false, 0)
        }
        pk ++ uq
      }
      return Some(rows.toDF("relname", "indisprimary", "indisunique",
        "indisclustered", "indisvalid", "indexdef", "constraintdef",
        "contype", "condeferrable", "condeferred", "indisreplident",
        "reltablespace"))
    }
    // \d <name> CHECK constraints (relchecks > 0 steered psql here)
    if (s.contains("pg_constraint") && s.contains("contype = 'c'")) {
      val table = oidEquals.findFirstMatchIn(sql)
        .orElse("""conrelid = '(\d+)'""".r.findFirstMatchIn(sql))
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      val rows = table.toSeq.flatMap { t =>
        val bare = t.split('.').last
        graft.TableConstraints.checksRawOf(t).zipWithIndex.map {
          case (e, i) =>
            val cols = scala.util.Try(session.table(t).schema.fieldNames
              .filter(c => ("(?i)\\b" +
                java.util.regex.Pattern.quote(c) + "\\b").r
                .findFirstIn(e).isDefined).toSeq).getOrElse(Nil)
            val nm = if (cols.length == 1) s"${bare}_${cols.head}_check"
              else if (i == 0) s"${bare}_check" else s"${bare}_check$i"
            (nm, s"CHECK (($e))")
        }
      }
      return Some(rows.toDF("conname", "condef"))
    }
    // \d <name> FOREIGN KEY sections: outgoing (conrelid) and
    // incoming "Referenced by" (confrelid)
    if (s.contains("pg_constraint") && s.contains("contype = 'f'")) {
      // psql 15: outgoing keys probe conrelid and read (sametable,
      // conname, condef, ontable); "Referenced by" probes confrelid
      // (IN a partition-ancestors set) and reads (conname, ontable,
      // condef)
      val incoming = s.contains("confrelid")
      val table = """'(\d+)'""".r.findFirstMatchIn(sql)
        .flatMap(m => oidToTable.get(m.group(1).toInt))
      def fkName(child: String, cols: Seq[String]) = {
        val cb = child.split('.').last
        if (cols.length == 1) s"${cb}_${cols.head}_fkey"
        else s"${cb}_fkey"
      }
      if (incoming) {
        val rows = table.toSeq.flatMap { t =>
          val bare = t.split('.').last
          graft.TableConstraints.referencingFks(t).map { case (child, fk) =>
            (fkName(child, fk.cols), child.split('.').last,
              s"FOREIGN KEY (${fk.cols.mkString(", ")}) REFERENCES " +
                s"$bare(${fk.parentCols.mkString(", ")})")
          }
        }
        return Some(rows.toDF("conname", "ontable", "condef"))
      } else {
        val rows = table.toSeq.flatMap { t =>
          val bare = t.split('.').last
          graft.TableConstraints.fksOf(t).map { fk =>
            val pb = fk.parentTable.split('.').last
            (true, fkName(t, fk.cols),
              s"FOREIGN KEY (${fk.cols.mkString(", ")}) REFERENCES " +
                s"$pb(${fk.parentCols.mkString(", ")})", bare)
          }
        }
        return Some(rows.toDF("sametable", "conname", "condef", "ontable"))
      }
    }
    // \d <name> follow-ups this engine has nothing for — answer the
    // empty set in a harmless 2-col shape instead of falling through
    // to the pg_class listing (whose 4 columns break psql's reader)
    if (s.contains("pg_statistic_ext") || s.contains("pg_publication") ||
        s.contains("pg_rules") || s.contains("pg_trigger") ||
        s.contains("pg_inherits") || s.contains("pg_policy")) {
      return Some(Seq.empty[(String, String)].toDF("a", "b"))
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
