package graft

/** COMMENT ON records (DuckDB v1.0+ statement surface, delegated via
  * src/duckdb_pgwire_extension.cpp:52). Probed grid 2026-08-15:
  * TABLE/VIEW/COLUMN/SEQUENCE/INDEX/MACRO/TYPE all accept a comment,
  * `IS NULL` clears it, DATABASE is "not implemented" in DuckDB
  * itself (reproduced loudly). Comments surface through the catalog
  * TVFs — duckdb_tables()/duckdb_columns()/duckdb_views()/
  * duckdb_sequences() each carry a `comment` column.
  *
  * Shared-registry pattern of [[Sequences]]/[[Macros]]/
  * [[TableConstraints]]: process-wide, like the catalog itself.
  * Keyed by (kind, lowercased name); column comments key as
  * ("column", "table.column").
  */
object Comments {

  private val store =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def key(kind: String, name: String): (String, String) =
    (kind.toLowerCase, name.toLowerCase.replace("\"", ""))

  def set(kind: String, name: String, comment: Option[String]): Unit =
    comment match {
      case Some(c) => store.put(key(kind, name), c)
      case None => store.remove(key(kind, name))
    }

  def get(kind: String, name: String): Option[String] =
    Option(store.get(key(kind, name))).orElse {
      // unqualified lookups also match a uniquely-suffixed qualified
      // record and vice versa (the catalog resolves names either way)
      val (k, n) = key(kind, name)
      val last = n.split('.').last
      val matches = store.keySet.toArray(Array.empty[(String, String)])
        .filter { case (kk, nn) => kk == k && nn != n &&
          (nn.split('.').last == n || (!n.contains('.') &&
            nn.split('.').last == last)) }
      if (matches.length == 1) Option(store.get(matches.head)) else None
    }

  /** DROP TABLE/VIEW must not leave a stale comment behind. */
  def clear(name: String): Unit = {
    val n = name.toLowerCase.replace("\"", "")
    store.keySet.toArray(Array.empty[(String, String)]).foreach {
      case k @ (_, nn)
          if nn == n || nn.startsWith(n + ".") ||
            nn.split('.').last == n =>
        store.remove(k)
      case _ =>
    }
  }
}
