package graft

/** ENUM types at the ENGINE level (DuckDB `CREATE TYPE x AS ENUM`,
  * delegated surface — the reference's wire silently drops ENUM
  * columns, cpp:80-83, so any engine-level support is strictly
  * better). Spark has no enum type, so graft models an enum COLUMN as
  * its member string and keeps the type itself in this shared
  * registry, exactly like [[Sequences]]/`Macros` keep theirs:
  *
  *  - `CREATE TYPE m AS ENUM ('a','b')` / `DROP TYPE m` — Engine DDL.
  *  - `'a'::m` / `CAST(x AS m)` — rewritten (SqlRewrites) to a
  *    validating cast: member strings pass through, NULL propagates,
  *    non-members raise like DuckDB's conversion error.
  *  - `enum_range(NULL::m)`, `enum_first/enum_last(NULL::m)`,
  *    `enum_code('a'::m)`, `enum_range_boundary('a'::m, 'b'::m)` —
  *    rewritten to name-carrying registry functions (probed: code is
  *    0-based; range_boundary is inclusive of both ends).
  *
  * Documented divergence: DuckDB orders enum VALUES by definition
  * position (`'sad'::mood < 'happy'::mood` is true); graft's string
  * model compares lexicographically. Callers needing definition order
  * compare `enum_code(...)` instead — which is also the plan-friendly
  * form (an integer comparison instead of a dictionary one).
  */
object EnumTypes {
  private val types =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

  private def key(name: String): String =
    name.stripPrefix("\"").stripSuffix("\"").toLowerCase

  def define(name: String, values: Seq[String], orReplace: Boolean,
      ifNotExists: Boolean): Unit = {
    val k = key(name)
    if (types.containsKey(k) && !orReplace && !ifNotExists)
      throw new IllegalArgumentException(s"type $name already exists")
    if (types.containsKey(k) && ifNotExists && !orReplace) return
    require(values.nonEmpty, s"enum $name must have at least one value")
    require(values.distinct.size == values.size,
      s"enum $name has duplicate values")
    types.put(k, values.toVector)
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val removed = types.remove(key(name)) != null
    if (!removed && !ifExists)
      throw new IllegalArgumentException(s"type $name does not exist")
  }

  def isDefined(name: String): Boolean = types.containsKey(key(name))

  /** Registered enum names, for the rewrite pass's trigger check. */
  def names(): Set[String] = {
    val it = types.keys()
    val b = Set.newBuilder[String]
    while (it.hasMoreElements) b += it.nextElement()
    b.result()
  }

  def values(name: String): Vector[String] = {
    val v = types.get(key(name))
    if (v == null)
      throw new IllegalArgumentException(s"type $name does not exist")
    v
  }

  /** Validating cast — the engine's `'x'::m`. NULL propagates. */
  def cast(name: String, v: String): String = {
    if (v == null) return null
    if (!values(name).contains(v))
      throw new IllegalArgumentException(
        s"could not convert string '$v' to ENUM type $name")
    v
  }

  /** 0-based definition index (probed: enum_code('happy'::mood)=2). */
  def code(name: String, v: String): java.lang.Integer =
    if (v == null) null else Integer.valueOf(values(name).indexOf(cast(name, v)))

  def first(name: String): String = values(name).head
  def last(name: String): String = values(name).last

  /** Inclusive definition-order slice (probed on 1.0). */
  def rangeBoundary(name: String, a: String, b: String): Seq[String] = {
    val vs = values(name)
    val i = vs.indexOf(cast(name, a)); val j = vs.indexOf(cast(name, b))
    require(i <= j, s"enum_range_boundary: '$a' after '$b' in $name")
    vs.slice(i, j + 1)
  }

  /** Test hygiene: drop everything (shared JVM-wide registry). */
  def reset(): Unit = types.clear()
}
