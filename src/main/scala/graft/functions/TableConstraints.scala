package graft

/** PRIMARY KEY records for engine tables. The DDL pass ACCEPTS and
  * strips constraint syntax (no enforcement — documented divergence);
  * the key columns are recorded here so DuckDB's PK-dependent upsert
  * forms resolve: `ON CONFLICT` without an explicit target and
  * `INSERT OR REPLACE/IGNORE`. Shared-registry pattern of
  * [[Sequences]]/[[Macros]]/[[EnumTypes]]: process-wide, like the
  * catalog itself.
  */
object TableConstraints {

  private val pks =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  // records key on the FULL (possibly schema-qualified) name so
  // same-named tables in different schemas never share a record;
  // lookups fall back to an UNAMBIGUOUS last-segment match so
  // `CREATE TABLE s.t … INSERT INTO t` still resolves
  private def key(table: String): String =
    table.toLowerCase.replace("\"", "")

  private def suffix(table: String): String = key(table).split('.').last

  def recordPk(table: String, cols: Seq[String]): Unit =
    pks.put(key(table), cols.map(_.toLowerCase.replace("\"", "")))

  def clear(table: String): Unit = {
    pks.remove(key(table))
    // an unqualified DROP also clears a uniquely-matching qualified
    // record (the catalog resolves the name the same way)
    if (!key(table).contains('.')) {
      val matches = pks.keySet.toArray(Array.empty[String])
        .filter(k => k.split('.').last == suffix(table))
      if (matches.length == 1) pks.remove(matches.head)
    }
  }

  def pkOf(table: String): Option[Seq[String]] =
    Option(pks.get(key(table))).orElse {
      // the suffix fallback is only for UNQUALIFIED lookups (mirrors
      // clear()): a qualified name like `r.t` must match exactly, else
      // it would borrow a same-named table's PK from another schema
      if (key(table).contains('.')) None
      else {
        val matches = pks.keySet.toArray(Array.empty[String])
          .filter(k => k.split('.').last == suffix(table))
        if (matches.length == 1) Option(pks.get(matches.head)) else None
      }
    }
}
