package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{DataType, StringType}

/** UNION types at the ENGINE level (DuckDB `CREATE TYPE u AS
  * UNION(num INTEGER, str VARCHAR)`, delegated surface — the
  * reference's wire silently drops UNION columns, cpp:80-83, so any
  * engine-level support is strictly better). Spark has no tagged-union
  * type; graft models a union VALUE as a struct carrying the active
  * tag plus every member (inactive members NULL) — which reproduces
  * the probed DuckDB observable surface exactly:
  *
  *  - `union_value(num := 5)` — anonymous single-member union; the
  *    `:=` named-argument sugar is rewritten (SqlRewrites) to the
  *    registry function `graft_union_value('num', 5)`.
  *  - `union_tag(u)` reads the active tag; NULL union → NULL.
  *  - `union_extract(u, 'k')` / member access `(u).k` read a member:
  *    the inactive member is NULL (probed), an unknown key is a bind
  *    error ("Could not find key ... in union").
  *  - `CAST(x AS u)` picks the first member whose type matches x
  *    exactly, else the first member x can cast to (probed: 5 → num,
  *    'hi' → str), and builds the full struct.
  *
  * Documented divergence: `CAST(u AS VARCHAR)` renders the struct,
  * not the bare member value (Spark cast semantics); read
  * `union_extract(u, union_tag(u))`-style columns instead.
  */
object UnionTypes {
  /** tag field name inside the struct model */
  val TagField = "utag"

  private val types = new java.util.concurrent.ConcurrentHashMap[
    String, Vector[(String, String)]]()

  private def key(name: String): String =
    name.stripPrefix("\"").stripSuffix("\"").toLowerCase

  /** DuckDB's bare VARCHAR/TEXT are unbounded; Spark's parser demands
    * a length — normalize to STRING before parseDataType (the same
    * bridge the engine's bare-VARCHAR cast rewrite applies). */
  def normalizeType(t: String): String =
    t.replaceAll("(?i)\\bvarchar\\b(?!\\s*\\()", "STRING")
      .replaceAll("(?i)\\btext\\b", "STRING")

  def define(name: String, members: Seq[(String, String)], orReplace: Boolean,
      ifNotExists: Boolean): Unit = {
    val k = key(name)
    if (types.containsKey(k) && !orReplace && !ifNotExists)
      throw new IllegalArgumentException(s"type $name already exists")
    if (types.containsKey(k) && ifNotExists && !orReplace) return
    require(members.nonEmpty, s"union $name must have at least one member")
    require(members.map(_._1).distinct.size == members.size,
      s"union $name has duplicate member names")
    // validate the member types parse NOW, not at first cast
    members.foreach { case (m, t) =>
      try CatalystSqlParser.parseDataType(normalizeType(t))
      catch { case e: Exception => throw new IllegalArgumentException(
        s"union $name member $m has unsupported type '$t'", e) }
    }
    types.put(k, members.toVector)
  }

  def drop(name: String, ifExists: Boolean): Boolean = {
    val removed = types.remove(key(name)) != null
    if (!removed && !ifExists)
      throw new IllegalArgumentException(s"type $name does not exist")
    removed
  }

  def isDefined(name: String): Boolean = types.containsKey(key(name))

  def names(): Set[String] = {
    val it = types.keys()
    val b = Set.newBuilder[String]
    while (it.hasMoreElements) b += it.nextElement()
    b.result()
  }

  def members(name: String): Vector[(String, String)] = {
    val v = types.get(key(name))
    if (v == null)
      throw new IllegalArgumentException(s"type $name does not exist")
    v
  }

  /** Anonymous single-member union: struct(utag, tag -> value). */
  def valueExpr(tag: String, v: Expression): Expression =
    CreateNamedStruct(Seq(
      Literal(TagField), Literal(tag),
      Literal(tag), v))
}

/** `CAST(x AS u)` for a registered union type: resolved after analysis
  * (needs x's type) into the full-member struct with the matching
  * member active. Member choice is exact-type first, then the first
  * member the input casts to — DuckDB's implicit-cast pick (probed:
  * 5 → num over str; 'hi' → str).
  */
case class UnionCastExpr(typeName: String, child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = {
    val members = UnionTypes.members(typeName)
    val parsed: Vector[(String, DataType)] = members.map { case (m, t) =>
      (m, CatalystSqlParser.parseDataType(UnionTypes.normalizeType(t)))
    }
    val from = child.dataType
    val active = parsed.find(_._2 == from)
      .orElse(parsed.find(p => Cast.canCast(from, p._2)))
      .getOrElse(throw new IllegalArgumentException(
        s"no member of union type $typeName accepts ${from.simpleString}"))
    val fields = Seq(Literal(UnionTypes.TagField): Expression,
      Literal(active._1): Expression) ++
      parsed.flatMap { case (m, dt) =>
        Seq(Literal(m): Expression,
          (if (m == active._1) Cast(child, dt)
           else Literal(null, dt)): Expression)
      }
    val struct = CreateNamedStruct(fields)
    // a NULL input is a NULL UNION (probed: union_tag(NULL::u) is
    // NULL), not a struct of NULLs
    org.apache.spark.sql.catalyst.expressions.If(
      org.apache.spark.sql.catalyst.expressions.IsNull(child),
      Literal(null, struct.dataType), struct)
  }
  override protected def withNewChildInternal(c: Expression): UnionCastExpr =
    copy(child = c)
}
