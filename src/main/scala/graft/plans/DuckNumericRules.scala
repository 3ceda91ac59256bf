package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** DuckDB numeric conversion semantics the reference delegates
  * verbatim (src/duckdb_pgwire_extension.cpp:52), probed 2026-08-14:
  *
  *  - `DATE - DATE` is a BIGINT day count (`DATE '2024-03-01' -
  *    DATE '2024-02-01'` = 29, typeof BIGINT); Spark resolves it to a
  *    day-time INTERVAL.
  *  - `CAST(fractional AS integral)` ROUNDS, where Spark truncates —
  *    with the tie mode split by source type (probed):
  *    DECIMAL and VARCHAR sources round half AWAY from zero
  *    (2.5→3, -3.5→-4, '1090.5'→1091); DOUBLE/FLOAT sources round
  *    half to EVEN (2.5::DOUBLE→2, 3.5::DOUBLE→4, 1090.5::DOUBLE
  *    →1090 — C nearbyint). String sources route through
  *    DECIMAL(38,10) so integral strings up to 28 digits keep exact
  *    precision (a double detour would corrupt > 2^53).
  *
  * Applied at post-hoc resolution so user-written casts anywhere in
  * the plan (including subqueries) get DuckDB values. Internal
  * operators narrow only through explicit round()/floor() (audited),
  * which the idempotence guard leaves untouched.
  */
object DuckNumericCastRule extends Rule[LogicalPlan] {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** already integral-valued — rewriting would only churn the plan */
  private def alreadyRounded(e: Expression): Boolean = e match {
    case _: Round | _: Floor | _: Ceil | _: BRound => true
    case _: Conv => true // this rule's own hex/binary reading
    case c: Cast => alreadyRounded(c.child)
    case _ => false
  }

  /** DuckDB integral casts read 0x/0X hex and 0b/0B binary strings
    * (probed: '0x1F'::BIGINT = 31, '0B11'::SMALLINT = 3 — no sign,
    * no whitespace, malformed/oversized text errors like any other
    * conversion). Digit counts bound to 16/64 so Conv's unsigned
    * 64-bit space covers them; the final integral cast range-checks
    * in the ORIGINAL eval mode, so ANSI errors and TRY nulls. */
  private def radixAware(c: Cast, decimalPath: Expression): Expression = {
    val s = c.child
    def read(skip: Int, base: Int): Expression =
      Cast(Conv(new Substring(s, Literal(skip + 1)), Literal(base),
        Literal(10)), c.dataType, None, c.evalMode)
    CaseWhen(Seq(
      (RLike(s, Literal("^0[xX][0-9a-fA-F]{1,16}$")), read(2, 16)),
      (RLike(s, Literal("^0[bB][01]{1,64}$")), read(2, 2))),
      decimalPath)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case s: SubtractDates =>
        Cast(DateDiff(s.left, s.right), LongType)
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            !alreadyRounded(c.child) &&
            (c.child.dataType == DoubleType || c.child.dataType == FloatType) =>
        c.withNewChildren(Seq(BRound(c.child, Literal(0))))
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            !alreadyRounded(c.child) &&
            c.child.dataType.isInstanceOf[DecimalType] =>
        c.withNewChildren(Seq(Round(c.child, Literal(0))))
      case c: Cast
          if isIntegral(c.dataType) && c.child.resolved &&
            c.child.dataType == StringType && !alreadyRounded(c.child) =>
        // same eval mode end to end: ANSI still errors on garbage,
        // TRY still nulls — only the numeric reading changes
        radixAware(c, c.withNewChildren(Seq(Round(
          Cast(c.child, DecimalType(38, 10), None, c.evalMode),
          Literal(0)))))
      // DECIMAL→DECIMAL scale reduction TRUNCATES toward zero in
      // DuckDB (probed: 2.46→(3,1) = 2.4, 2.5→(3,0) = 2, -3.5→(3,0)
      // = -3); Spark's cast rounds HALF_UP. The truncation runs at
      // scale 38 and the original cast then only range-checks (equal
      // scales never re-round), so ANSI/TRY overflow behavior is
      // preserved and the rule cannot re-match its own output.
      case c: Cast
          if c.dataType.isInstanceOf[DecimalType] && c.child.resolved &&
            c.child.dataType.isInstanceOf[DecimalType] &&
            c.dataType.asInstanceOf[DecimalType].scale <
              c.child.dataType.asInstanceOf[DecimalType].scale =>
        val s2 = c.dataType.asInstanceOf[DecimalType].scale
        c.withNewChildren(Seq(
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            DuckStrings.getClass, DecimalType(38, s2), "decTruncate",
            Seq(c.child, Literal(s2)), Seq(c.child.dataType, IntegerType),
            propagateNull = true, returnNullable = true)))
    }
}

/** DuckDB's division/remainder by zero is NULL for EVERY numeric type
  * (probed: 1/0, 1.0/0.0, 1 % 0, 0/0, 1e0/0 all NULL — doubles do NOT
  * produce IEEE infinity), where Spark ANSI errors on exact types and
  * doubles return Infinity. The zero-divisor If guards the value; the
  * inner operator flips ANSI→TRY so the rule cannot re-match its own
  * output (TRY's only extra reach beyond the guard is integral
  * MinValue/-1 overflow — DuckDB errors there, documented skew).
  */
object DuckDivZeroRule extends Rule[LogicalPlan] {
  private def zeroOf(dt: DataType): Expression = Cast(Literal(0), dt)

  private def guard(b: BinaryArithmetic, rebuilt: Expression): Expression = {
    markGuarded(rebuilt) // the rebuilt node must not re-match either
    If(EqualTo(b.right, zeroOf(b.right.dataType)),
      Literal(null, b.dataType), rebuilt)
  }

  // Spark 4.1 carries the mode inside NumericEvalContext — a bare
  // EvalMode pattern never matches
  private def tryCtx(c: NumericEvalContext) =
    NumericEvalContext(EvalMode.TRY, c.allowDecimalPrecisionLoss)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      // `/` produces DOUBLE for EVERY operand combination in DuckDB
      // (probed: typeof(1.0/3.0) = typeof(1.5/2) = DOUBLE) — Spark
      // keeps DECIMAL division decimal-typed. `%` stays decimal in
      // both engines. The zero guard is folded in directly because
      // the NULL branch must be DOUBLE-typed too.
      case d @ Divide(l, r, ctx)
          if d.resolved && d.dataType.isInstanceOf[DecimalType] =>
        val dbl = Divide(Cast(l, DoubleType), Cast(r, DoubleType), tryCtx(ctx))
        markGuarded(dbl)
        If(EqualTo(r, zeroOf(r.dataType)), Literal(null, DoubleType), dbl)
      case d @ Divide(l, r, ctx)
          if d.resolved && ctx.evalMode == EvalMode.ANSI &&
            r.dataType.isInstanceOf[NumericType] =>
        guard(d, Divide(l, r, tryCtx(ctx)))
      case d @ IntegralDivide(l, r, ctx)
          if d.resolved && ctx.evalMode == EvalMode.ANSI =>
        guard(d, IntegralDivide(l, r, tryCtx(ctx)))
      case d @ Remainder(l, r, ctx)
          if d.resolved && ctx.evalMode == EvalMode.ANSI =>
        guard(d, Remainder(l, r, tryCtx(ctx)))
      case d @ Pmod(l, r, ctx)
          if d.resolved && ctx.evalMode == EvalMode.ANSI =>
        guard(d, Pmod(l, r, tryCtx(ctx)))
      // doubles/floats never error — they yield IEEE inf/NaN, which
      // DuckDB's NULL contract also forbids
      case d: Divide
          if d.resolved && (d.dataType == DoubleType || d.dataType == FloatType) &&
            !isGuarded(d) =>
        markGuarded(d)
        guard(d, d)
      case d: Remainder
          if d.resolved && (d.dataType == DoubleType || d.dataType == FloatType) &&
            !isGuarded(d) =>
        markGuarded(d)
        guard(d, d)
    }

  // double-typed arithmetic carries no TRY/ANSI distinction we can
  // flip, so re-match protection uses an expression tag
  private val guardedTag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.divZeroGuarded")
  private def isGuarded(e: Expression): Boolean =
    e.getTagValue(guardedTag).contains(true)
  private def markGuarded(e: Expression): Unit =
    e.setTagValue(guardedTag, true)
}

/** DuckDB's LIKE/ILIKE has NO default escape character (probed:
  * '10%' LIKE '10\%' is FALSE — the backslash is a literal; pg and
  * Spark treat backslash as an implicit escape). An explicit
  * `ESCAPE 'x'` clause still works: the parser only produces the
  * default '\\' when no clause was written (writing ESCAPE '\'
  * explicitly is indistinguishable and keeps DuckDB's reading).
  */
/** DuckDB's DOUBLE/FLOAT→VARCHAR rendering (see
  * [[DuckStrings.renderDouble]]; probed grid) replaces Spark's Java
  * `1.0E20` style wherever a floating cast to string appears —
  * including the casts the NULL-skipping concat() builds. The pgwire
  * TEXT format keeps its pg-style rendering (that surface follows the
  * protocol, not CAST semantics). */
object DuckFloatRenderRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case c: Cast
          if c.dataType == StringType && c.child.resolved &&
            c.child.dataType == DoubleType =>
        StaticInvoke(DuckStrings.getClass, StringType, "renderDouble",
          Seq(c.child), Seq(DoubleType), propagateNull = true,
          returnNullable = true)
      case c: Cast
          if c.dataType == StringType && c.child.resolved &&
            c.child.dataType == FloatType =>
        StaticInvoke(DuckStrings.getClass, StringType, "renderFloat",
          Seq(c.child), Seq(FloatType), propagateNull = true,
          returnNullable = true)
    }
}

object DuckLikeNoEscapeRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case l @ Like(left, right, '\\') => Like(left, right, '\u0000')
      case l @ ILike(left, right, '\\') => ILike(left, right, '\u0000')
    }
}

/** DuckDB's BLOB↔VARCHAR casts use the `\xHH` escape model (probed:
  * '\xFF'::BLOB is one byte; CAST(unhex('ff') AS VARCHAR) = '\xFF';
  * printable ASCII except backslash/quote renders literally; invalid
  * escapes error). Spark's casts are raw UTF-8 both ways. */
object DuckBlobCastRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case c: Cast
          if c.dataType == BinaryType && c.child.resolved &&
            c.child.dataType == StringType =>
        StaticInvoke(DuckStrings.getClass, BinaryType, "blobBytes",
          Seq(c.child), Seq(StringType), propagateNull = true,
          returnNullable = true)
      case c: Cast
          if c.dataType == StringType && c.child.resolved &&
            c.child.dataType == BinaryType =>
        StaticInvoke(DuckStrings.getClass, StringType, "renderBlob",
          Seq(c.child), Seq(BinaryType), propagateNull = true,
          returnNullable = true)
    }
}

/** Row/struct comparisons follow per-field three-valued logic in
  * DuckDB (probed: (1, NULL) = (1, 2) is NULL, (1, NULL) < (1, 2) is
  * NULL), where Spark's struct comparison treats NULL fields as
  * ordinary comparable values. Equality expands to a field-wise AND;
  * orderings expand lexicographically — both propagate NULL through
  * ordinary AND/OR semantics. Nested structs recurse naturally (the
  * expanded field comparisons re-enter the rule). */
object DuckStructCompareRule extends Rule[LogicalPlan] {
  private def fields(l: Expression, r: Expression): Seq[(Expression, Expression)] = {
    val st = l.dataType.asInstanceOf[StructType]
    st.fields.indices.map(i =>
      (GetStructField(l, i, Some(st.fields(i).name)): Expression,
        GetStructField(r, i, Some(st.fields(i).name)): Expression))
  }

  private def lex(fs: Seq[(Expression, Expression)],
      strict: (Expression, Expression) => Expression,
      last: (Expression, Expression) => Expression): Expression =
    fs match {
      case Seq((l, r)) => last(l, r)
      case (l, r) +: rest =>
        Or(strict(l, r), And(EqualTo(l, r), lex(rest, strict, last)))
    }

  /** rewrite only when a NULL can sit in a field: non-nullable
    * structs compare identically on Spark's native path, which keeps
    * struct-keyed equalities extractable as equi-join keys (the LSH
    * bucket joins rely on this — a CaseWhen key would demote them to
    * nested-loop joins). */
  private def structs(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved && l.dataType.isInstanceOf[StructType] &&
      r.dataType.isInstanceOf[StructType] &&
      l.dataType.asInstanceOf[StructType].length ==
        r.dataType.asInstanceOf[StructType].length &&
      l.dataType.asInstanceOf[StructType].nonEmpty &&
      (DuckNestedCompareRule.mayDiverge(l.dataType) ||
        DuckNestedCompareRule.mayDiverge(r.dataType))

  /** equality is a SEQUENTIAL walk, not a plain AND: the first NULL
    * field halts with NULL even when a LATER field differs (probed:
    * {'a': NULL, 'b': 1} = {'a': NULL, 'b': 2} is NULL — AND would
    * give FALSE). The ordering lex() expansion is already equivalent
    * to the sequential walk under 3VL. */
  private def eqSeq(fs: Seq[(Expression, Expression)]): Expression =
    fs match {
      case Seq((l, r)) => EqualTo(l, r)
      case (l, r) +: rest =>
        CaseWhen(Seq(
          (IsNull(EqualTo(l, r)), Literal(null, BooleanType)),
          (Not(EqualTo(l, r)), Literal(false))), eqSeq(rest))
    }

  /** Inside a join condition, UNKNOWN and FALSE both reject the row,
    * so struct equality can expand to the plain field-wise AND — which
    * Spark's planner still extracts as equi-join keys (the LSH bucket
    * joins hash-join on struct keys; the sequential CaseWhen form
    * would demote them to nested-loop joins). The expansion applies at
    * positive conjunctive/disjunctive positions only; under NOT /
    * IS NULL / CASE the UNKNOWN value is observable and the sequential
    * walk below still applies. */
  private def joinSafe(e: Expression): Expression = e match {
    case And(l, r) => And(joinSafe(l), joinSafe(r))
    case Or(l, r) => Or(joinSafe(l), joinSafe(r))
    case EqualTo(l, r) if structs(l, r) =>
      fields(l, r).map { case (a, b) => EqualTo(a, b): Expression }
        .reduce(And)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val joins = plan.transformWithSubqueries {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isDefined =>
        j.copy(condition = Some(joinSafe(j.condition.get)))
    }
    joins.transformAllExpressionsWithSubqueries {
      case EqualTo(l, r) if structs(l, r) => eqSeq(fields(l, r))
      case LessThan(l, r) if structs(l, r) =>
        lex(fields(l, r), LessThan, LessThan)
      case LessThanOrEqual(l, r) if structs(l, r) =>
        lex(fields(l, r), LessThan, LessThanOrEqual)
      case GreaterThan(l, r) if structs(l, r) =>
        lex(fields(l, r), GreaterThan, GreaterThan)
      case GreaterThanOrEqual(l, r) if structs(l, r) =>
        lex(fields(l, r), GreaterThan, GreaterThanOrEqual)
    }
  }
}

/** Interval comparisons: Spark's CalendarInterval is not orderable at
  * all; DuckDB compares intervals by the normalized key months→30
  * days, days→24 h (probed: '1 month' = '30 days' is TRUE). Every
  * BinaryComparison on CalendarIntervalType compares that key. */
object DuckIntervalCompareRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke

  private def isInterval(dt: DataType): Boolean = dt match {
    case CalendarIntervalType => true
    case _: YearMonthIntervalType | _: DayTimeIntervalType => true
    case _ => false
  }

  /** normalized comparison key in microseconds (month = 30 d) */
  private def key(e: Expression): Expression = e.dataType match {
    case CalendarIntervalType =>
      StaticInvoke(DuckStrings.getClass, LongType, "intervalMicros30",
        Seq(e), Seq(CalendarIntervalType), propagateNull = true,
        returnNullable = true)
    case _: YearMonthIntervalType =>
      // post-hoc output gets no further coercion — every operand is
      // cast to LONG explicitly
      val months = Add(
        Multiply(Cast(ExtractANSIIntervalYears(e), LongType), Literal(12L)),
        Cast(ExtractANSIIntervalMonths(e), LongType))
      Multiply(months, Literal(30L * 86400000000L))
    case _: DayTimeIntervalType =>
      Add(
        Multiply(Cast(ExtractANSIIntervalDays(e), LongType),
          Literal(86400000000L)),
        Add(
          Multiply(Cast(ExtractANSIIntervalHours(e), LongType),
            Literal(3600000000L)),
          Add(
            Multiply(Cast(ExtractANSIIntervalMinutes(e), LongType),
              Literal(60000000L)),
            Cast(Multiply(Cast(ExtractANSIIntervalSeconds(e), DoubleType),
              Literal(1000000.0d)), LongType))))
    case other => throw new IllegalStateException(s"not an interval: $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      // same-class ANSI comparisons already work natively (and agree
      // with the normalized key); rewrite the combinations Spark
      // rejects — CalendarInterval anywhere, or mixed YM vs DT
      case cmp: BinaryComparison
          if cmp.left.resolved && cmp.right.resolved &&
            isInterval(cmp.left.dataType) && isInterval(cmp.right.dataType) &&
            (cmp.left.dataType == CalendarIntervalType ||
              cmp.right.dataType == CalendarIntervalType ||
              cmp.left.dataType.getClass != cmp.right.dataType.getClass) =>
        cmp.withNewChildren(Seq(key(cmp.left), key(cmp.right)))
    }
}

/** Interval date-part extraction and DATE+TIME addition — DuckDB
  * forms Spark's resolver turns into date-typed expressions that then
  * fail the type check (probed: day(INTERVAL '3 days 4 hours') = 3,
  * year(INTERVAL '14 months') = 1, DATE + TIME = the combined
  * timestamp). Rewritten post-hoc, before CheckAnalysis fires. */
object DuckTemporalPolyRule extends Rule[LogicalPlan] {
  private def isIv(dt: DataType): Boolean = dt == CalendarIntervalType ||
    dt.isInstanceOf[YearMonthIntervalType] || dt.isInstanceOf[DayTimeIntervalType]

  /** DuckDB decomposes its (months, days, micros) triple directly —
    * months NEVER fold into days, micros never fold into days, but
    * micros DO normalize up to hours (probed: hour('90 minutes') = 1,
    * day('100 hours') = 0, hour('5 days') = 0, year('14 months') = 1,
    * month(-'14 months') = -2). Spark's ANSI intervals are a single
    * number in end-field units (probed: CAST(INTERVAL '100' HOUR AS
    * BIGINT) = 100), so the triple is reconstructed from the type's
    * field range; Spark's own ExtractANSIInterval* would reject
    * fields outside that range. */
  private def part(p: String, c: Expression): Expression = {
    val legacy = NumericEvalContext(EvalMode.LEGACY, true)
    def idiv(l: Expression, r: Long) =
      IntegralDivide(l, Literal(r), legacy)
    def rem(l: Expression, r: Long) = Remainder(l, Literal(r), legacy)
    def inv(m: String) =
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        DuckStrings.getClass, LongType, m, Seq(c),
        Seq(CalendarIntervalType), propagateNull = true,
        returnNullable = true)
    val (months, days, timeUs): (Expression, Expression, Expression) =
      c.dataType match {
        case CalendarIntervalType =>
          (inv("ivMonths"), inv("ivDays"), inv("ivMicros"))
        case t: YearMonthIntervalType =>
          val total =
            if (t.endField == YearMonthIntervalType.MONTH) Cast(c, LongType)
            else Multiply(Cast(c, LongType), Literal(12L))
          (total, Literal(0L), Literal(0L))
        case t: DayTimeIntervalType =>
          val mult = t.endField match {
            case DayTimeIntervalType.DAY => 86400000000L
            case DayTimeIntervalType.HOUR => 3600000000L
            case DayTimeIntervalType.MINUTE => 60000000L
            case _ => 1000000L
          }
          val totalUs = Multiply(Cast(c, LongType), Literal(mult))
          if (t.startField == DayTimeIntervalType.DAY) {
            val d = idiv(totalUs, 86400000000L)
            (Literal(0L), d,
              Subtract(totalUs, Multiply(d, Literal(86400000000L))))
          } else (Literal(0L), Literal(0L), totalUs)
        case other => throw new IllegalStateException(s"not an interval: $other")
      }
    p match {
      case "year" => idiv(months, 12L)
      case "month" => rem(months, 12L)
      case "day" => days
      case "hour" => idiv(timeUs, 3600000000L)
      case "minute" => rem(idiv(timeUs, 60000000L), 60L)
      case "second" => rem(idiv(timeUs, 1000000L), 60L)
      case other => throw new IllegalStateException(s"no interval part $other")
    }
  }
  private def isTime(dt: DataType): Boolean =
    dt.isInstanceOf[org.apache.spark.sql.types.TimeType]
  private def combine(d: Expression, t: Expression): Expression =
    MicrosToTimestamp(Add(
      UnixMicros(Cast(d, TimestampType, Some("UTC"))),
      GraftCall("time_micros_of", Seq(Cast(t, StringType)), LongType)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case e: Year if e.child.resolved && isIv(e.child.dataType) =>
        part("year", e.child)
      case e: Month if e.child.resolved && isIv(e.child.dataType) =>
        part("month", e.child)
      case e: DayOfMonth if e.child.resolved && isIv(e.child.dataType) =>
        part("day", e.child)
      case e: Hour if e.child.resolved && isIv(e.child.dataType) =>
        part("hour", e.child)
      case e: Minute if e.child.resolved && isIv(e.child.dataType) =>
        part("minute", e.child)
      case e: Second if e.child.resolved && isIv(e.child.dataType) =>
        part("second", e.child)
      case d @ DateAdd(l, r)
          if l.resolved && r.resolved && l.dataType == DateType &&
            isTime(r.dataType) =>
        combine(l, r)
      case d @ DateAdd(l, r)
          if l.resolved && r.resolved && isTime(l.dataType) &&
            r.dataType == DateType =>
        combine(r, l)
      // TIME + INTERVAL wraps past midnight in DuckDB (probed:
      // TIME '23:30:00' + 1 hour = 00:30:00) — Spark's
      // TimeAddInterval raises DATETIME_OVERFLOW instead. Micros of
      // day + total interval micros, wrapped mod 24 h (negative-safe
      // double-remainder), rebuilt through make_time.
      case ta: TimeAddInterval if ta.resolved =>
        val legacy = NumericEvalContext(EvalMode.LEGACY,
          allowDecimalPrecisionLoss = true)
        def rem(l: Expression, r: Long) = Remainder(l, Literal(r), legacy)
        val day = 86400000000L
        val tUs = GraftCall("time_micros_of",
          Seq(Cast(ta.time, StringType)), LongType)
        val ivUs = GraftCall("interval_micros", Seq(ta.interval), LongType)
        val w = rem(Add(rem(Add(tUs, ivUs), day), Literal(day)), day)
        Cast(MakeTimeStr(
          Cast(IntegralDivide(w, Literal(3600000000L), legacy), IntegerType),
          Cast(IntegralDivide(rem(w, 3600000000L), Literal(60000000L),
            legacy), IntegerType),
          Divide(Cast(rem(w, 60000000L), DoubleType), Literal(1000000.0d),
            legacy)), ta.dataType, Some("UTC"))
    }
}

/** DuckDB's width-checked bit shifts (probed grid 2026-08-14):
  * `<<` raises Out of Range on a negative shift (even for value 0),
  * on shift ≥ the INPUT type's bit width, on a negative value, and on
  * any overflow past the type's max (1 << 31 errors on INT32;
  * 100::TINYINT << 1 errors) — value 0 short-circuits to 0 for any
  * non-negative shift. `>>` never errors: out-of-range or negative
  * shifts give 0 (even for negative values: -8 >> 64 is 0), in-range
  * shifts are arithmetic. Spark's shiftleft/shiftright instead mask
  * the shift mod the width (1 << 40 is 256) — silent divergence.
  * The width is the ORIGINAL operand's (the analyzer's short/byte →
  * int promotion cast is looked through, so 1::SMALLINT << 15 errors
  * at width 16); the RESULT keeps Spark's promoted type, a documented
  * width edge (typeof SMALLINT in DuckDB).
  */
case class DuckShift(
    left: Expression,
    right: Expression,
    leftShift: Boolean,
    width: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = left.dataType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (leftShift) "duck_shiftleft" else "duck_shiftright"

  private def maxFor: Long = (1L << (width - 1)) - 1

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a match {
      case i: Int => i.toLong
      case l: Long => l
    }
    val s = b.asInstanceOf[Int]
    val out: Long =
      if (leftShift) {
        if (s < 0) throw new ArithmeticException(
          s"Out of Range Error: Cannot left-shift by negative number $s")
        else if (v == 0L) 0L
        else if (s >= width) throw new ArithmeticException(
          s"Out of Range Error: Left-shift value $s is out of range")
        else if (v < 0L) throw new ArithmeticException(
          s"Out of Range Error: Cannot left-shift negative number $v")
        else if (v > (maxFor >> s)) throw new ArithmeticException(
          s"Out of Range Error: Overflow in left shift ($v << $s)")
        else v << s
      } else {
        if (s < 0 || s >= width) 0L else v >> s
      }
    left.dataType match {
      case IntegerType => out.toInt
      case _ => out
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DuckShift = copy(left = l, right = r)
}
