package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, MapType}

/** DuckDB-named function aliases over Spark's own expressions — the
  * delegated-surface names a wire client actually types (reference
  * forwards statements verbatim at src/duckdb_pgwire_extension.cpp:52,
  * so DuckDB's function vocabulary IS the API). Every alias builds the
  * native Spark expression directly (registry-level, NOT a UDF), so
  * whole-stage codegen, constant folding and pushdown see the builtin.
  *
  * Notable semantic bridges:
  *  - `len` is polymorphic in DuckDB (strings AND lists) → resolved
  *    after analysis by [[LenPoly]].
  *  - `string_split` splits on a LITERAL separator; Spark's `split`
  *    takes a regex → literal separators are regex-quoted at build.
  *  - `list_slice(l, a, b)` is inclusive-bounds → Spark `slice` with
  *    length b-a+1.
  *  - `range(a, b)` is upper-EXCLUSIVE → `sequence(a, b-1)`.
  */
object DuckAliases {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def alias(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")

    alias("len")(e => LenPoly(e.head))
    alias("list_distinct")(e => ArrayDistinct(e.head))
    alias("list_transform")(e => ArrayTransform(e(0), e(1)))
    alias("list_filter")(e => ArrayFilter(e(0), e(1)))
    alias("list_contains")(e => ArrayContains(e(0), e(1)))
    alias("list_has")(e => ArrayContains(e(0), e(1)))
    alias("list_intersect")(e => ArrayIntersect(e(0), e(1)))
    alias("list_sort")(e => new SortArray(e.head))
    alias("list_reverse_sort")(e => SortArray(e.head, Literal(false)))
    alias("list_unique")(e => Size(ArrayDistinct(e.head), false))
    alias("array_to_string")(e => ArrayJoin(e(0), e(1), None))
    alias("list_slice")(e =>
      Slice(e(0), e(1), Add(Subtract(e(2), e(1)), Literal(1))))
    alias("regexp_matches")(e => RLike(e(0), e(1)))
    alias("range") {
      case Seq(stop) =>
        new Sequence(Literal(0L), Subtract(stop, Literal(1L)), None, Some("UTC"))
      case Seq(start, stop) =>
        new Sequence(start, Subtract(stop, Literal(1L)), None, Some("UTC"))
      case Seq(start, stop, step) =>
        new Sequence(start, Subtract(stop, Literal(1L)), Some(step), Some("UTC"))
    }
    // literal separators regex-quoted; non-literal falls through as
    // regex (DuckDB's string_split_regex is also mapped directly)
    alias("string_split")(e => StringSplit(e(0), quoteIfLiteral(e(1)), Literal(-1)))
    alias("str_split")(e => StringSplit(e(0), quoteIfLiteral(e(1)), Literal(-1)))
    alias("string_split_regex")(e => StringSplit(e(0), e(1), Literal(-1)))
  }

  private def quoteIfLiteral(sep: Expression): Expression = sep match {
    case Literal(v, _) if v != null =>
      Literal(java.util.regex.Pattern.quote(v.toString))
    case other => other
  }
}

/** DuckDB's polymorphic `len`: element count for arrays/maps,
  * character count for strings — dispatch needs the child's resolved
  * type, so this is a RuntimeReplaceable the analyzer swaps for the
  * concrete builtin after resolution.
  */
case class LenPoly(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }
  override protected def withNewChildInternal(newChild: Expression): LenPoly =
    copy(child = newChild)
}
