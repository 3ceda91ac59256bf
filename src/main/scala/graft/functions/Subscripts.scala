package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** DuckDB bracket-subscript semantics, resolved post-analysis (the
  * dispatch needs the operand's type, like [[LenPoly]]). DuckDB's
  * `x[i]` is 1-based and polymorphic (reference forwards statements
  * verbatim at src/duckdb_pgwire_extension.cpp:52, so this syntax IS
  * the wire surface); Spark's own bracket operator is 0-based on
  * arrays, so [[BracketRewrite]] lowers `x[i]` onto this expression
  * instead. All cases probed on DuckDB 1.0:
  *  - list[i]:   1-based, negative counts from the end, 0 and
  *               out-of-range yield NULL
  *  - string[i]: 1-based char, negative from the end, 0 and
  *               out-of-range yield '' (empty, NOT null)
  *  - map[k]:    LIST-wrapped value, [] when the key is absent
  *               (same shape as map_extract / element_at)
  *  - struct[k]: field by (literal) name
  */
case class SubscriptPoly(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override lazy val replacement: Expression = left.dataType match {
    case ArrayType(et, _) =>
      val idx = Cast(right, IntegerType)
      If(Or(IsNull(idx), EqualTo(idx, Literal(0))),
        Literal(null, et),
        ElementAt(left, idx, None, failOnError = false))
    case _: MapType => MapExtractAsList(left, right)
    case st: StructType =>
      right match {
        case Literal(s, StringType) if s != null =>
          val name = s.toString
          val i = st.indexWhere(_.name.equalsIgnoreCase(name))
          if (i < 0) throw new IllegalArgumentException(
            s"subscript: struct has no field '$name'")
          GetStructField(left, i, Some(st.fields(i).name))
        case other => throw new IllegalArgumentException(
          "subscript: struct keys must be literal strings, got " +
            other.simpleString(10))
      }
    case _ =>
      val s = Cast(left, StringType)
      val idx = Cast(right, IntegerType)
      If(IsNull(idx), Literal(null, StringType),
        If(EqualTo(idx, Literal(0)), Literal(""),
          Substring(s, idx, Literal(1))))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SubscriptPoly = copy(left = l, right = r)
}

/** DuckDB slice semantics — `x[a:b]` / list_slice — polymorphic over
  * lists and strings. Probed on DuckDB 1.0: bounds are 1-based and
  * INCLUSIVE; negative counts from the end (-1 = last); out-of-range
  * bounds clamp; start past stop yields an empty list/string; a NULL
  * bound nulls the whole slice; open bounds ([a:], [:b], [:]) are
  * filled by [[BracketRewrite]] with 1 / -1.
  */
case class SlicePoly(child: Expression, lo: Expression, hi: Expression)
    extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child, lo, hi)
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType => SlicePoly.inclusiveSlice(child, lo, hi)
    case _ =>
      val s = Cast(child, StringType)
      val n = Length(s)
      def norm(i: Expression) = {
        val ii = Cast(i, IntegerType)
        If(GreaterThanOrEqual(ii, Literal(0)), ii,
          Add(Add(n, ii), Literal(1)))
      }
      val start = Greatest(Seq(Literal(1), norm(lo)))
      val end = Least(Seq(n, norm(hi)))
      val len = Greatest(Seq(Literal(0), Add(Subtract(end, start), Literal(1))))
      val anyNull = Or(IsNull(Cast(lo, IntegerType)), IsNull(Cast(hi, IntegerType)))
      If(anyNull, Literal(null, StringType), Substring(s, start, len))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SlicePoly =
    copy(child = cs(0), lo = cs(1), hi = cs(2))
}

object SlicePoly {
  /** Inclusive 1-based list slice (shared with the list_slice alias). */
  def inclusiveSlice(l: Expression, a: Expression, b: Expression): Expression = {
    val sz = Size(l, legacySizeOfNull = false)
    def norm(i: Expression) = {
      val ii = Cast(i, IntegerType)
      If(GreaterThanOrEqual(ii, Literal(0)), ii,
        Add(Add(sz, ii), Literal(1)))
    }
    val start = Greatest(Seq(Literal(1), norm(a)))
    val end = Least(Seq(sz, norm(b)))
    val len = Greatest(Seq(Literal(0), Add(Subtract(end, start), Literal(1))))
    val anyNullBound = Or(IsNull(Cast(a, IntegerType)), IsNull(Cast(b, IntegerType)))
    Slice(l, If(anyNullBound, Literal(null, IntegerType), start), len)
  }

  /** 4-arg stepped slice — `list_slice(l, a, b, step)` / `l[a:b:s]`.
    * Probed DuckDB 1.0: bounds 1-based inclusive and clamped; a
    * NEGATIVE step walks down from `a` to `b` (list_slice(l, 5, 1,
    * -2) = elements 5,3,1); wrong-direction bounds → []; step 0 is a
    * loud error ("Slice step cannot be zero"). Lowered to
    * element_at over an index sequence — codegen'd HOFs throughout.
    */
  def steppedSlice(l: Expression, a: Expression, b: Expression,
      st: Expression): Expression = {
    val sz = Size(l, legacySizeOfNull = false)
    def norm(i: Expression) = {
      val ii = Cast(i, IntegerType)
      If(GreaterThanOrEqual(ii, Literal(0)), ii,
        Add(Add(sz, ii), Literal(1)))
    }
    val stI = Cast(st, IntegerType)
    val pos = GreaterThan(stI, Literal(0))
    // the step-0 raise rides inside `start` (an integer-typed seam, so
    // the If branches type-agree) and start is evaluated on every
    // non-NULL path — DuckDB's "Slice step cannot be zero"
    val start = If(EqualTo(stI, Literal(0)),
      Cast(RaiseError(Literal(
        "Invalid Input Error: Slice step cannot be zero")), IntegerType),
      If(pos, Greatest(Seq(Literal(1), norm(a))),
        Least(Seq(sz, norm(a)))))
    val end = If(pos, Least(Seq(sz, norm(b))),
      Greatest(Seq(Literal(1), norm(b))))
    val empty = If(pos, GreaterThan(start, end), LessThan(start, end))
    val i = UnresolvedNamedLambdaVariable(Seq("__sli"))
    val vals = ArrayTransform(
      new Sequence(start, end, Some(stI), Some("UTC")),
      LambdaFunction(ElementAt(l, i), Seq(i)))
    val anyNull = Or(Or(IsNull(Cast(a, IntegerType)),
      IsNull(Cast(b, IntegerType))), IsNull(stI))
    // NULL / empty results come from Slice itself so the element type
    // is always right (l may still be unresolved here)
    If(anyNull, Slice(l, Literal(null, IntegerType), Literal(1)),
      If(empty, Slice(l, Literal(1), Literal(0)), vals))
  }
}
