package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** DuckDB `CREATE SEQUENCE` / `nextval` / `currval` (delegated surface —
  * README's persistence walkthrough uses sequences for id columns; the
  * bridge forwards the statements verbatim at
  * src/duckdb_pgwire_extension.cpp:52).
  *
  * Engine-global registry, like DuckDB's: a sequence is a catalog
  * object shared by every connection, and `nextval` on any connection
  * advances the same counter. `currval` returns the last value THIS
  * JVM handed out for the sequence (DuckDB scopes currval per
  * connection; the single-engine shape matches our shared-session
  * model the same way the shared temp-view catalog does).
  *
  * Scale honesty: `nextval` is an inherently serial oracle — one
  * atomic per sequence. That is exactly DuckDB's semantic (single
  * node, serialized), and it is fine for the wire-server use case
  * (DDL ids, small inserts). It is NOT the way to number 100 TB of
  * rows: a distributed pipeline should take one `nextval` per
  * PARTITION as a block base (fetch-and-add of `rows-per-partition`)
  * and add a local offset — the standard block-allocation recipe —
  * or use `zipWithIndex`/`row_number`. The UDF evaluates on the
  * driver-side executor threads of local mode; on a multi-JVM
  * cluster each executor would hold its own copy, so the UDF form is
  * deliberately not the distributed path.
  */
object Sequences {

  private final case class SeqDef(counter: AtomicLong, increment: Long)

  private val seqs = new ConcurrentHashMap[String, SeqDef]()
  private val lastVal = new ConcurrentHashMap[String, java.lang.Long]()

  private def norm(name: String): String =
    name.toLowerCase.stripPrefix("\"").stripSuffix("\"")

  def create(name: String, start: Long, increment: Long,
      orReplace: Boolean, ifNotExists: Boolean): Unit = {
    require(increment != 0, "INCREMENT BY must be non-zero")
    val k = norm(name)
    if (seqs.containsKey(k) && !orReplace && !ifNotExists)
      throw new IllegalArgumentException(s"sequence $name already exists")
    if (!seqs.containsKey(k) || orReplace) {
      seqs.put(k, SeqDef(new AtomicLong(start), increment))
      lastVal.remove(k)
    }
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val k = norm(name)
    if (seqs.remove(k) == null && !ifExists)
      throw new IllegalArgumentException(s"sequence $name does not exist")
    lastVal.remove(k)
  }

  def next(name: String): Long = {
    val s = seqs.get(norm(name))
    if (s == null)
      throw new IllegalArgumentException(s"sequence $name does not exist")
    val v = s.counter.getAndAdd(s.increment)
    lastVal.put(norm(name), v)
    v
  }

  def curr(name: String): Long = {
    val k = norm(name)
    if (!seqs.containsKey(k))
      throw new IllegalArgumentException(s"sequence $name does not exist")
    val v = lastVal.get(k)
    if (v == null) throw new IllegalStateException(
      s"currval of $name before nextval in this engine")
    v
  }

  /** (name, start-at-next, increment) rows for PRAGMA-style listings. */
  def list(): Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    seqs.asScala.toSeq.sortBy(_._1).map { case (n, d) =>
      (n, d.counter.get(), d.increment)
    }
  }
}
