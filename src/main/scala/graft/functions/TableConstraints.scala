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

  private def key(table: String): String =
    table.toLowerCase.replace("\"", "").split('.').last

  def recordPk(table: String, cols: Seq[String]): Unit =
    pks.put(key(table), cols.map(_.toLowerCase.replace("\"", "")))

  def clear(table: String): Unit = pks.remove(key(table))

  def pkOf(table: String): Option[Seq[String]] =
    Option(pks.get(key(table)))
}
