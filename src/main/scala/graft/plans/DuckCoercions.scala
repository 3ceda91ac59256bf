package graft

import org.apache.spark.sql.catalyst.analysis.{AnsiTypeCoercion, TypeCoercion}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** DuckDB's greatest/least resolve through typed OVERLOADS, not a
  * widest-common-type walk (probed grid 2026-08-14; delegated surface
  * via src/duckdb_pgwire_extension.cpp:52): every integral mix lands
  * on the BIGINT overload (even greatest(1, 2)), any
  * fractional/decimal presence lands on DOUBLE (even pure decimals:
  * greatest(2.5, 1.5) is DOUBLE), and VARCHAR arguments cast to the
  * non-string side — least('5', 10) is BIGINT 5,
  * greatest(DATE '…', '2024-06-01') is the DATE — erroring loudly on
  * unconvertible text exactly like DuckDB's ConversionError (the
  * session runs ANSI casts). Spark instead keeps the widest input
  * type and refuses string/number mixes outright (DATATYPE_MISMATCH),
  * so this fires before CheckAnalysis. BOOLEAN stays un-coerced:
  * DuckDB's binder rejects least('true', TRUE).
  *
  * A self-resolving RuntimeReplaceable (like TypeofExpr): the lazy
  * replacement means enclosing calls — typeof(least('5', 10)) —
  * resolve inside the normal fixpoint with NO extra analyzer rule.
  * Emitted only by the registry aliases for `greatest`/`least`: the
  * repo's OWN lowerings build catalyst `Greatest` directly as an
  * index/size clamp feeding INT-typed consumers (array_repeat,
  * element_at) — promoting those to BIGINT would break them, and
  * DuckDB semantics only attach to the user-spelled call anyway.
  */
case class VarargCoerceMarker(children: Seq[Expression], greatest: Boolean)
    extends Expression with RuntimeReplaceable {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def temporal(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** the DuckDB overload the argument types land on — None leaves
    * Spark's own behavior/error in place */
  private def target(ts: Seq[DataType]): Option[DataType] = {
    val nonStr = ts.filterNot(_ == StringType).distinct
    if (nonStr.isEmpty) None
    else if (nonStr.forall(integral)) Some(LongType)
    else if (nonStr.forall(_.isInstanceOf[NumericType])) Some(DoubleType)
    else if (ts.contains(StringType) && nonStr.forall(temporal))
      Some(nonStr.find(_ != DateType).getOrElse(DateType))
    else None
  }

  override lazy val replacement: Expression = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    val ts = children.map(_.dataType)
    val cs = target(ts) match {
      case Some(t) =>
        children.map(c => if (c.dataType == t) c else Cast(c, t, tz))
      case None if ts.distinct.length <= 1 => children
      case None =>
        // a replacement must resolve AS BUILT: widen mixed non-overload
        // types ourselves (no analyzer coercion runs inside), loud on
        // genuinely incompatible arguments like DuckDB's binder
        val wider =
          (if (SQLConf.get.ansiEnabled) AnsiTypeCoercion
           else TypeCoercion).findWiderCommonType(ts).getOrElse(
            throw new IllegalArgumentException(
              s"${if (greatest) "greatest" else "least"}: arguments have " +
                s"incompatible types ${ts.map(_.sql).mkString(", ")}"))
        children.map(c => if (c.dataType == wider) c else Cast(c, wider, tz))
    }
    if (greatest) Greatest(cs) else Least(cs)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VarargCoerceMarker = copy(children = cs)
}

/** DuckDB resolves a set-operation column that mixes VARCHAR with a
  * scalar type to VARCHAR (probed: 1 UNION ALL 'x' is VARCHAR rows
  * '1','x'; DATE UNION VARCHAR is VARCHAR; DECIMAL(4,2) renders
  * '2.50'; LIST UNION VARCHAR errors — left loud here too). Spark's
  * analyzer instead widens toward the non-string side
  * (INT+STRING→DECIMAL(38,10), DATE+STRING→DATE), which either dies
  * at runtime on non-numeric text or silently keeps the wrong type.
  *
  * This repairs the plan AFTER Spark's WidenSetOperationTypes ran
  * (post-hoc): it strips the widen-inserted casts whose operand is a
  * STRING attribute, re-casts every sibling position to VARCHAR
  * (DuckDB renderings come from the cast-render rules that run later
  * in this batch), and re-types the operation's output attribute
  * upstream. The strip only fires when Spark's own widening of the
  * stripped types reproduces the observed common type — so a
  * user-written `CAST(s AS INT) AS s` directly under a union is never
  * mistaken for an analyzer cast.
  */
object DuckSetOpVarcharRule extends Rule[LogicalPlan] {

  private def renderable(dt: DataType): Boolean = dt match {
    case _: NumericType | BooleanType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  /** per output position: the pre-widen expression (the cast operand
    * when the top project item is the analyzer's Alias(Cast(attr))
    * shape, the item itself otherwise) */
  private def preWiden(child: LogicalPlan): Seq[(NamedExpression, Expression)] =
    child match {
      case Project(items, _) => items.map {
        case a @ Alias(Cast(ar: AttributeReference, _, _, _), name)
            if name == ar.name => (a, ar)
        case other => (other, other)
      }
      case other => other.output.map(a => (a, a))
    }

  private def widerOf(ts: Seq[DataType]): Option[DataType] =
    if (SQLConf.get.ansiEnabled) AnsiTypeCoercion.findWiderCommonType(ts)
    else TypeCoercion.findWiderCommonType(ts)

  /** rebuild one child so the columns at `fix` positions are VARCHAR,
    * keeping each position's output exprId (upstream references are
    * re-typed by the caller) */
  private def rebuild(child: LogicalPlan, fix: Set[Int]): LogicalPlan = {
    val pre = preWiden(child)
    val items = pre.zipWithIndex.map { case ((item, preE), i) =>
      if (!fix(i)) item
      else if (preE.dataType == StringType)
        // already a string: drop the widen cast if one was there
        Alias(preE, item.name)(exprId = item.exprId)
      else
        Alias(Cast(preE, StringType,
          Some(SQLConf.get.sessionLocalTimeZone)), item.name)(
          exprId = item.exprId)
    }
    child match {
      case Project(_, grand) => Project(items, grand)
      case other => Project(items, other)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val retyped = scala.collection.mutable.HashSet.empty[ExprId]

    def fixChildren(children: Seq[LogicalPlan]): Option[Seq[LogicalPlan]] = {
      if (children.exists(!_.resolved)) return None
      val width = children.head.output.length
      if (children.exists(_.output.length != width)) return None
      val pres = children.map(preWiden)
      val fix = (0 until width).filter { i =>
        val preTs = pres.map(_(i)._2.dataType)
        val curTs = children.map(_.output(i).dataType).distinct
        val widened = curTs.length == 1 && curTs.head != StringType &&
          preTs.contains(StringType) &&
          preTs.exists(t => t != StringType && renderable(t)) &&
          preTs.forall(t => t == StringType || renderable(t)) &&
          // the analyzer-cast hypothesis must reproduce what we see
          widerOf(preTs).contains(curTs.head)
        // a nested set-op this rule already retyped (transformUp:
        // children first) leaves the ENCLOSING op with a string
        // column vs the siblings' stale widen-casts — same repair,
        // minus the reproduction check (the plan is past saving for
        // Spark anyway; DuckDB's answer for the mix is VARCHAR)
        val innerRetyped = curTs.length > 1 && curTs.contains(StringType) &&
          preTs.contains(StringType) &&
          preTs.forall(t => t == StringType || renderable(t))
        widened || innerRetyped
      }.toSet
      if (fix.isEmpty) None
      else {
        children.foreach(c => fix.foreach(i => retyped += c.output(i).exprId))
        Some(children.map(rebuild(_, fix)))
      }
    }

    val fixed = plan.transformUpWithSubqueries {
      case u: Union =>
        fixChildren(u.children).map(cs => u.withNewChildren(cs)).getOrElse(u)
      case s: Intersect =>
        fixChildren(s.children).map(cs => s.withNewChildren(cs)).getOrElse(s)
      case s: Except =>
        fixChildren(s.children).map(cs => s.withNewChildren(cs)).getOrElse(s)
    }
    if (retyped.isEmpty) fixed
    else fixed.transformAllExpressionsWithSubqueries {
      case a: AttributeReference
          if retyped.contains(a.exprId) && a.dataType != StringType =>
        a.copy(dataType = StringType)(a.exprId, a.qualifier)
    }
  }
}

/** ceil/floor/trunc keep a FLOAT/DOUBLE input's own type in DuckDB
  * (probed: typeof(ceil(2.5::FLOAT)) is FLOAT, floor(2.5::DOUBLE) is
  * DOUBLE) where Spark's ceil/floor return BIGINT. Self-resolving
  * RuntimeReplaceable emitted only by the registry aliases — the
  * repo's internal Ceil/Floor uses feed INT-typed consumers and must
  * keep Spark's types.
  */
case class FloatingRoundMarker(children: Seq[Expression], op: String)
    extends Expression with RuntimeReplaceable {
  override lazy val replacement: Expression = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    val x0 = children.head
    def integral = x0.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // an integral trunc is the identity AT ITS OWN TYPE; integral
    // ceil/floor are DOUBLE (probed: typeof(ceil(3)) is DOUBLE,
    // trunc(3::SMALLINT) is SMALLINT)
    if (op == "trunc" && integral) x0
    else {
      val floating = x0.dataType == FloatType || x0.dataType == DoubleType
      // a replacement must resolve AS BUILT — no analyzer coercion
      // runs inside it, so every widen cast is spelled out here
      val x = x0.dataType match {
        case FloatType | StringType => Cast(x0, DoubleType, tz)
        case _ if integral => Cast(x0, DoubleType, tz)
        case _ => x0
      }
      val base: Expression = op match {
        case "ceil" => Ceil(x)
        case "floor" => Floor(x)
        case _ => // trunc: toward zero; bare fractional->long cast
          // would round under DuckNumericCastRule, so Floor/Ceil split
          Cast(If(GreaterThanOrEqual(x, Cast(Literal(0), x.dataType, tz)),
            Floor(x), Ceil(x)), LongType, tz)
      }
      if (floating) Cast(base, x0.dataType, tz)
      else if (integral) Cast(base, DoubleType, tz) // ceil/floor only
      else base
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): FloatingRoundMarker = copy(children = cs)
}

/** The fused expression-tail pass — ONE bottom-up traversal for the
  * round-10 coercion semantics that previously each cost their own
  * full-tree walk per analysis (pipeline operators analyze hundreds
  * of growing plans, so per-analysis traversals are the hot path):
  *
  *  - CASE/COALESCE bind a string branch to the NON-STRING side's own
  *    common type (probed: CASE 1 ELSE 'x' is INTEGER, 1::SMALLINT
  *    ELSE '9' is SMALLINT, 1.5::FLOAT ELSE '9' is FLOAT, 1 WHEN 2.5
  *    ELSE 'x' is DECIMAL(11,1); bad text raises a ConversionError).
  *    Strips only analyzer casts (Cast.USER_SPECIFIED_CAST respected)
  *    and only when Spark's own widening reproduces the observed
  *    type.
  *  - BOOLEAN vs integer comparisons cast the bool (2 = true is
  *    FALSE); string vs BOOLEAN casts the string (true > '0'). Fires
  *    only on comparisons Spark left unresolved.
  *  - FLOAT-mixing arithmetic computes in FLOAT, not DOUBLE (probed:
  *    typeof(1 + 1.5::FLOAT) is FLOAT); Divide narrows its RESULT
  *    (Spark's Divide is double/decimal-only); user ::DOUBLE casts
  *    and lambda-body operands are left alone.
  *  - width-checked << / >> (DuckShift): DuckDB raises Out of Range
  *    where Spark masks the shift mod the width.
  *  - uncorrelated multi-row scalar subqueries pick one row via an
  *    injected LIMIT 1 (DuckDB's non-error semantics, cheaper at any
  *    scale).
  */
object DuckExprTailRule extends Rule[LogicalPlan] {

  private def tz = Some(SQLConf.get.sessionLocalTimeZone)

  private def widerOf(ts: Seq[DataType]): Option[DataType] =
    if (SQLConf.get.ansiEnabled) AnsiTypeCoercion.findWiderCommonType(ts)
    else TypeCoercion.findWiderCommonType(ts)

  // ---- CASE/COALESCE string binding
  private def rebind(vals: Seq[Expression]): Option[Seq[Expression]] = {
    if (vals.isEmpty || !vals.forall(_.resolved)) return None
    val wide = vals.head.dataType
    if (!vals.forall(_.dataType == wide)) return None
    // BIGINT/DOUBLE are ANSI Spark's two string-mix widen targets
    if (wide != LongType && wide != DoubleType) return None
    val pres = vals.map {
      case c @ Cast(ch, dt, _, _)
          if dt == wide &&
            c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => ch
      case other => other
    }
    // an untyped NULL branch is a wildcard in both engines
    val preTs = pres.map(_.dataType).distinct.filterNot(_ == NullType)
    val nonStr = preTs.filterNot(_ == StringType)
    if (!preTs.contains(StringType) || nonStr.isEmpty ||
        !nonStr.forall(_.isInstanceOf[NumericType])) return None
    val t = widerOf(nonStr).getOrElse(return None)
    if (t == wide) return None // already DuckDB's binding
    if (!widerOf(preTs).contains(wide)) return None // not the analyzer's cast
    Some(pres.map(p =>
      if (p.dataType == t) p else Cast(p, t, tz)))
  }

  // ---- bool/string comparison coercion
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // ---- FLOAT-mixing arithmetic
  private val narrowed =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit](
      "graft.floatArithNarrowed")
  private def floatEligible(dt: DataType): Boolean = dt match {
    case FloatType | ByteType | ShortType | IntegerType | LongType |
        _: DecimalType => true
    case _ => false
  }
  private def stripDbl(e: Expression): Expression = e match {
    case c @ Cast(ch, DoubleType, _, _)
        if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => ch
    case other => other
  }

  /** unwraps ONE analyzer-inserted (non-user) cast, else identity */
  private object StripImplicitCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(ch, _, _, _)
          if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => Some(ch)
      case other => Some(other)
    }
  }

  // ---- BIT-string operations over the '0'/'1'-string model
  private def bitStrShift(l: Expression, r: Expression,
      leftShift: Boolean): Expression = {
    val n = Cast(r, IntegerType)
    val len = Length(l)
    val zeros = StringRepeat(Literal("0"),
      new Least(Seq(n, len)))
    val kept =
      if (leftShift) Substring(l, Add(n, Literal(1)), len)
      else Substring(l, Literal(1), Subtract(len, n))
    val shifted =
      if (leftShift) Concat(Seq(kept, zeros))
      else Concat(Seq(zeros, kept))
    If(GreaterThanOrEqual(n, len), StringRepeat(Literal("0"), len), shifted)
  }

  /** per-position fold of two equal-length BIT strings */
  def bitStrBinOp(l: Expression, r: Expression, and: Boolean): Expression = {
    val i = NamedLambdaVariable("bi", IntegerType, nullable = false)
    def bit(e: Expression) =
      EqualTo(Substring(e, i, Literal(1)), Literal("1"))
    val cond = if (and) And(bit(l), bit(r)) else Or(bit(l), bit(r))
    val body = If(cond, Literal("1"), Literal("0"))
    val opName = if (and) "&" else "|"
    If(Not(EqualTo(Length(l), Length(r))),
      Cast(RaiseError(Literal(
        s"bitwise $opName: bitstring lengths must be equal")), StringType),
      ArrayJoin(ArrayTransform(
        new Sequence(Literal(1), Length(l), None, Some("UTC")),
        LambdaFunction(body, Seq(i))), Literal(""), None))
  }

  // ---- DuckShift width: the analyzer's short/byte -> int promotion
  // cast is looked through so 1::SMALLINT << 15 errors at width 16
  private def widthOf(e: Expression): Int = e match {
    case Cast(c, IntegerType, _, _) if c.dataType == ShortType => 16
    case Cast(c, IntegerType, _, _) if c.dataType == ByteType => 8
    case _ => e.dataType match {
      case LongType => 64
      case ShortType => 16
      case ByteType => 8
      case _ => 32
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case q0 =>
        q0.transformExpressionsUp {
        // DuckDivZeroRule's guard shape: once the divide below was
        // narrowed to FLOAT (bottom-up, the case underneath), the
        // guard's NULL branch must follow it
        case If(cond, Literal(null, DoubleType),
            c @ Cast(_: Divide, FloatType, _, _)) =>
          If(cond, Literal(null, FloatType), c)
        case cw @ CaseWhen(branches, elseV) =>
          rebind(branches.map(_._2) ++ elseV.toSeq) match {
            case Some(fixed) =>
              if (elseV.isDefined)
                CaseWhen(branches.map(_._1).zip(fixed.init),
                  Some(fixed.last))
              else CaseWhen(branches.map(_._1).zip(fixed), None)
            case None => cw
          }
        case co @ Coalesce(cs) =>
          rebind(cs).map(Coalesce(_)).getOrElse(co)
        // DuckDB/pg temporal sentinels: 'infinity' / '-infinity'
        // compare beyond every real value, 'epoch' is 1970-01-01.
        // Spark's ANSI cast rejects the words — map them onto the
        // type's extreme/zero points (rendering shows the extreme
        // datetime, not the word — documented divergence; ordering
        // and comparisons are exact).
        case c @ Cast(Literal(s, StringType), TimestampType, _, _)
            if s != null && Set("infinity", "-infinity", "epoch")
              .contains(s.toString.trim.toLowerCase) =>
          s.toString.trim.toLowerCase match {
            case "infinity" => Literal(Long.MaxValue, TimestampType)
            case "-infinity" => Literal(Long.MinValue, TimestampType)
            case _ => Literal(0L, TimestampType)
          }
        case c @ Cast(Literal(s, StringType), DateType, _, _)
            if s != null && Set("infinity", "-infinity", "epoch")
              .contains(s.toString.trim.toLowerCase) =>
          s.toString.trim.toLowerCase match {
            case "infinity" => Literal(Int.MaxValue, DateType)
            case "-infinity" => Literal(Int.MinValue, DateType)
            case _ => Literal(0, DateType)
          }
        // DuckDB computes avg over DECIMAL in DOUBLE (probed: typeof
        // of avg(DECIMAL) is DOUBLE); Spark keeps DECIMAL(p+4, s+4)
        case avg @ org.apache.spark.sql.catalyst.expressions.aggregate
            .Average(child, mode)
            if child.resolved && child.dataType.isInstanceOf[DecimalType] =>
          org.apache.spark.sql.catalyst.expressions.aggregate
            .Average(Cast(child, DoubleType, tz), mode)
        // BIT strings ('0'/'1' chars — graft's model of the BIT type)
        // shift as strings: drop from one end, zero-fill the other,
        // length fixed (probed: '0101'::BIT << 1 = '1010'). The
        // analyzer has already wrapped the string operand in its
        // implicit string→int cast — look through it (user-written
        // casts keep the numeric shift).
        case ShiftLeft(StripImplicitCast(l), r)
            if l.resolved && r.resolved && l.dataType == StringType =>
          bitStrShift(l, r, leftShift = true)
        case ShiftRight(StripImplicitCast(l), r)
            if l.resolved && r.resolved && l.dataType == StringType =>
          bitStrShift(l, r, leftShift = false)
        case ShiftLeft(l, r) if l.resolved && r.resolved =>
          DuckShift(l, r, leftShift = true, widthOf(l))
        case ShiftRight(l, r) if l.resolved && r.resolved =>
          DuckShift(l, r, leftShift = false, widthOf(l))
        case b: BinaryArithmetic if b.resolved && b.dataType == DoubleType =>
          val (l, r) = (stripDbl(b.left), stripDbl(b.right))
          val floatMix =
            (l.dataType == FloatType || r.dataType == FloatType) &&
              floatEligible(l.dataType) && floatEligible(r.dataType) &&
              // something was actually stripped — a genuine double
              // operand stays DOUBLE
              !((l eq b.left) && (r eq b.right)) &&
              // never inside lambda bodies: the repo's own HOF
              // lowerings cast float elements to double deliberately
              // (untagged), and retyping under an already-bound
              // accumulator breaks evaluation
              !b.exists(_.isInstanceOf[NamedLambdaVariable])
          if (!floatMix || b.getTagValue(narrowed).isDefined) b
          else b match {
            case d: Divide =>
              // Spark's Divide only takes DOUBLE/DECIMAL operands —
              // compute in double, narrow the result (ulp-level skew
              // from DuckDB's float-native division at most)
              d.setTagValue(narrowed, ())
              Cast(d, FloatType, tz)
            case _ =>
              def f(e: Expression) =
                if (e.dataType == FloatType) e else Cast(e, FloatType, tz)
              b.withNewChildren(Seq(f(l), f(r)))
          }
        case s: ScalarSubquery
            if s.outerAttrs.isEmpty && s.plan.resolved &&
              !s.plan.maxRows.exists(_ <= 1L) =>
          s.copy(plan = Limit(Literal(1), s.plan))
      }
    }
}

/** Resolution-batch fixes for constructs Spark will NEVER resolve by
  * itself — injected into the analyzer's fixpoint (not post-hoc) so
  * that everything DOWNSTREAM of the fixed node (ORDER BY resolving
  * through the Project, UnresolvedAlias naming, timezone assignment)
  * still happens through Spark's own rules in later iterations.
  * Post-hoc placement left `SELECT (doc_id<5)<2 AS c … ORDER BY
  * doc_id` unresolvable: the Sort could not resolve against an
  * unresolved Project, and nothing re-ran ResolveReferences after the
  * post-hoc fix. Every case here is guarded on `!resolved`, so
  * Spark's own coercions (which ran earlier in the same iteration)
  * always get first claim.
  */
object DuckResolveFixRule extends Rule[LogicalPlan] {

  private def tz = Some(SQLConf.get.sessionLocalTimeZone)

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // ---- DuckDB LIMIT/OFFSET value coercion (probed 2026-08-15):
  // NULL means "no limit/offset" (clause dropped), strings trim +
  // convert (ConversionError on bad text, like '… LIMIT ''abc'''),
  // fractional values round half-up (2.4→2, 2.5→3), booleans cast.
  // Spark's CheckAnalysis demands IntegerType.
  // Returns None to drop the clause, Some(lit) to replace it.
  private def duckLimitValue(e: Expression): Option[Option[Expression]] = {
    if (!e.resolved || !e.foldable) return None
    e.dataType match {
      case IntegerType => None // Spark-native, leave alone
      case NullType => Some(None)
      case StringType =>
        val v = e.eval()
        if (v == null) Some(None)
        else {
          val s = v.toString.trim
          val n = try java.lang.Long.parseLong(s) catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"Conversion Error: Could not convert string '$s' to INT64")
          }
          Some(Some(Literal(n.min(Int.MaxValue).toInt)))
        }
      case _: DecimalType | DoubleType | FloatType =>
        val v = e.eval()
        if (v == null) Some(None)
        else {
          val d = v match {
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case f: Float => f.toDouble
            case d: Double => d
          }
          Some(Some(Literal(math.floor(d + 0.5).toLong
            .min(Int.MaxValue).toInt)))
        }
      case BooleanType =>
        val v = e.eval()
        if (v == null) Some(None)
        else Some(Some(Literal(if (v == true) 1 else 0)))
      case LongType | ShortType | ByteType =>
        val v = e.eval()
        if (v == null) Some(None)
        else Some(Some(Literal(
          v.asInstanceOf[Number].longValue().min(Int.MaxValue).toInt)))
      case _ => None
    }
  }

  private def fixLimits(q: LogicalPlan): LogicalPlan = q match {
    case ll @ LocalLimit(e, child) => duckLimitValue(e) match {
      case Some(None) => child
      case Some(Some(lit)) => ll.copy(limitExpr = lit)
      case None => ll
    }
    case gl @ GlobalLimit(e, child) => duckLimitValue(e) match {
      case Some(None) => child
      case Some(Some(lit)) => gl.copy(limitExpr = lit)
      case None => gl
    }
    case of @ Offset(e, child) => duckLimitValue(e) match {
      case Some(None) => child
      case Some(Some(lit)) => of.copy(offsetExpr = lit)
      case None => of
    }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case q0 =>
        val q = fixLimits(q0)
        q.transformExpressionsUp {
          case cmp: BinaryComparison
              if !cmp.resolved && cmp.left.resolved && cmp.right.resolved =>
            (cmp.left.dataType, cmp.right.dataType) match {
              case (BooleanType, r) if integral(r) =>
                cmp.withNewChildren(Seq(Cast(cmp.left, r, tz), cmp.right))
              case (l, BooleanType) if integral(l) =>
                cmp.withNewChildren(Seq(cmp.left, Cast(cmp.right, l, tz)))
              case (StringType, BooleanType) =>
                cmp.withNewChildren(
                  Seq(Cast(cmp.left, BooleanType, tz), cmp.right))
              case (BooleanType, StringType) =>
                cmp.withNewChildren(
                  Seq(cmp.left, Cast(cmp.right, BooleanType, tz)))
              case _ => cmp
            }
          // DuckDB `timestamp::TIME` takes the time-of-day; Spark has
          // no timestamp→time cast — render the wall time and parse
          case Cast(child, t: org.apache.spark.sql.types.TimeType, _, _)
              if child.resolved && child.dataType == TimestampType =>
            Cast(DateFormatClass(child, Literal("HH:mm:ss.SSSSSS"), tz),
              t, tz)
          // DuckDB parses container TEXT — `'[1, 2, 3]'::INT[]`,
          // `'{"a": 1}'::STRUCT(a INT)`, nested and mixed (Spark has
          // no string→container cast, so these arrive unresolved).
          // Full probed grammar lives in functions/DuckTextCast:
          // quote-aware splitting, case-sensitive struct keys in any
          // order, exact-uppercase NULL tokens, half-away-from-zero
          // integral rounding, leaf-vs-structural TRY granularity.
          case c @ Cast(child, t @ (_: ArrayType | _: StructType), _, _)
              if !c.resolved && child.resolved &&
                child.dataType == StringType =>
            graft.functions.DuckTextCast(child, t,
              c.evalMode == EvalMode.TRY)
          // `&` / `|` on BIT strings fold per position (Spark's
          // bitwise ops take integrals only, so these arrive
          // unresolved)
          case b @ BitwiseAnd(l, r)
              if !b.resolved && l.resolved && r.resolved &&
                l.dataType == StringType && r.dataType == StringType =>
            DuckExprTailRule.bitStrBinOp(l, r, and = true)
          case b @ BitwiseOr(l, r)
              if !b.resolved && l.resolved && r.resolved &&
                l.dataType == StringType && r.dataType == StringType =>
            DuckExprTailRule.bitStrBinOp(l, r, and = false)
          case e if DuckIntervalCastRule.unresolvedFixes.isDefinedAt(e) =>
            DuckIntervalCastRule.unresolvedFixes(e)
        }
    }
}

/** Post-hoc rules can resolve expressions the Resolution batch gave
  * up on (bool<int comparisons, LIMIT coercions, numeric-cast and
  * temporal fixes) — but ResolveAliases has already run, so a bare
  * `SELECT (1 < 2) < 3` still carries UnresolvedAlias and dies in
  * CheckAnalysis with INTERNAL_ERROR. Injected LAST in the post-hoc
  * chain: assign the alias once the child is resolved, naming from
  * the expression with graft-injected (non-user) casts stripped so
  * the header reads `((1 < 2) < 3)` like DuckDB's, not
  * `(CAST(… AS INT) < 3)`. Generator children are left for Spark's
  * own MultiAlias path (they'd need multi-column names).
  */
object AssignPostHocAliasRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case q => q.transformExpressionsUp {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias
            if ua.child.resolved && !ua.child.isInstanceOf[Generator] =>
          val stripped = ua.child.transform {
            case c @ Cast(ch, _, _, _)
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => ch
          }
          Alias(ua.child,
            org.apache.spark.sql.catalyst.util.toPrettySQL(stripped))()
      }
    }
}

/** pg/DuckDB whole-row references: a bare table (or alias) name in
  * the select list is the row as a STRUCT — `SELECT t FROM t` yields
  * {'a': …, 'b': …} (probed; pg-ism widely used with to_json). Fires
  * only for names that did NOT resolve as columns (column names win)
  * and that name a relation visible below the Project, reached
  * through join/filter/sort shapes only — subquery boundaries keep
  * their own scopes.
  */
object WholeRowRefRule extends Rule[LogicalPlan] {

  private def rels(p: LogicalPlan): Map[String, Seq[Attribute]] = p match {
    case sa: SubqueryAlias =>
      Map(sa.identifier.name.toLowerCase -> sa.output)
    case j: Join => rels(j.left) ++ rels(j.right)
    case f: Filter => rels(f.child)
    case s: Sort => rels(s.child)
    case _ => Map.empty
  }

  private def bare(e: Expression): Option[String] = e match {
    case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if ua.nameParts.length == 1 => Some(ua.nameParts.head)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p: Project
          if p.child.resolved && !p.resolved &&
            p.projectList.exists(i => i.exists(e => bare(e).isDefined)) =>
        val m = rels(p.child)
        if (m.isEmpty) p
        else {
          def isRel(n: String) =
            m.contains(n.toLowerCase) &&
              !p.child.output.exists(_.name.equalsIgnoreCase(n))
          def structOf(n: String): Expression =
            CreateNamedStruct(m(n.toLowerCase).flatMap(a =>
              Seq(Literal(a.name), a)))
          val items = p.projectList.map {
            case item if bare(item).exists(isRel) =>
              val n = bare(item).get
              Alias(structOf(n), n)()
            case item => item.transformUp {
              case e if bare(e).exists(isRel) => structOf(bare(e).get)
            }.asInstanceOf[NamedExpression]
          }
          p.copy(projectList = items)
        }
    }
}
