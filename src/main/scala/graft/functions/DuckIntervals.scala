package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** DuckDB interval semantics over Spark's three interval spellings.
  *
  * DuckDB has ONE interval type — a (months, days, micros) triple
  * (delegated surface via src/duckdb_pgwire_extension.cpp:52) — while
  * Spark splits year-month (Int months) from day-time (Long micros)
  * and refuses to mix them. This file provides:
  *  - the exact DuckDB/pg text rendering (probed grid 2026-08-15:
  *    '1 year 2 months', '-3 days', '01:30:15.5', '1 day -01:00:00',
  *    all-zero → '00:00:00'); hours are NOT capped at 24 and the
  *    fraction trims trailing zeros,
  *  - [[DuckIntervalString]]: `interval::VARCHAR` in that rendering,
  *  - [[MixedIntervalExpr]]: `INTERVAL '1 month' ± INTERVAL '3 days'`
  *    as a CalendarInterval (DuckDB keeps days distinct from the time
  *    part, so a DAY-led Spark interval contributes whole days),
  *  - [[DuckIntervalCastRule]]: the post-hoc rewrite wiring both in,
  *    plus timestamp ± mixed-interval via Spark's own TimeAdd.
  */
object DuckIntervals {

  private final val MicrosPerSecond = 1000000L
  private final val MicrosPerDay = 86400L * MicrosPerSecond

  /** DuckDB text for a (months, days, micros) triple. */
  def text(months: Int, days: Int, micros: Long): String = {
    val parts = Vector.newBuilder[String]
    if (months != 0) {
      val y = months / 12; val m = months % 12
      if (y != 0) parts += s"$y year" + (if (math.abs(y) != 1) "s" else "")
      if (m != 0) parts += s"$m month" + (if (math.abs(m) != 1) "s" else "")
    }
    if (days != 0)
      parts += s"$days day" + (if (math.abs(days) != 1) "s" else "")
    if (micros != 0 || (months == 0 && days == 0)) {
      val sign = if (micros < 0) "-" else ""
      val abs = math.abs(micros)
      val h = abs / 3600000000L
      val min = (abs / 60000000L) % 60
      val s = (abs / MicrosPerSecond) % 60
      val frac = abs % MicrosPerSecond
      val fracTxt =
        if (frac == 0) ""
        else "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
      parts += f"$sign$h%02d:$min%02d:$s%02d$fracTxt"
    }
    parts.result().mkString(" ")
  }

  private val hmsRe =
    """([+-]?)(\d+):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?""".r
  private val termRe = """([+-]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)""".r
  /** unit → (months, days, micros) weight */
  private val unitWeights: Map[String, (Double, Double, Double)] = {
    def m(n: Double) = (n, 0.0, 0.0)
    def d(n: Double) = (0.0, n, 0.0)
    def us(n: Double) = (0.0, 0.0, n)
    Map(
      "millennium" -> m(12000), "millenniums" -> m(12000),
      "millennia" -> m(12000),
      "century" -> m(1200), "centuries" -> m(1200),
      "decade" -> m(120), "decades" -> m(120),
      "year" -> m(12), "years" -> m(12), "y" -> m(12), "yr" -> m(12),
      "yrs" -> m(12),
      "quarter" -> m(3), "quarters" -> m(3),
      "month" -> m(1), "months" -> m(1), "mon" -> m(1), "mons" -> m(1),
      "week" -> d(7), "weeks" -> d(7), "w" -> d(7),
      "day" -> d(1), "days" -> d(1), "d" -> d(1),
      "hour" -> us(3600e6), "hours" -> us(3600e6), "h" -> us(3600e6),
      "hr" -> us(3600e6), "hrs" -> us(3600e6),
      "minute" -> us(60e6), "minutes" -> us(60e6), "m" -> us(60e6),
      "min" -> us(60e6), "mins" -> us(60e6),
      "second" -> us(1e6), "seconds" -> us(1e6), "s" -> us(1e6),
      "sec" -> us(1e6), "secs" -> us(1e6),
      "millisecond" -> us(1e3), "milliseconds" -> us(1e3),
      "ms" -> us(1e3), "msec" -> us(1e3), "msecs" -> us(1e3),
      "microsecond" -> us(1), "microseconds" -> us(1), "us" -> us(1))
  }

  /** DuckDB's INTERVAL text grammar (probed grid 2026-08-15):
    * `HH:MM:SS[.f]` (seconds REQUIRED — '1:02' errors), or
    * `<number> <unit>` terms with independent signs and fraction
    * cascade (1.5 months = 1 month 15 days; 2.25 years = 2 years
    * 3 months; 1.5 days = 1 day 12:00:00). Throws DuckDB's own
    * Conversion Error on anything else. */
  def parseText(s0: String): CalendarInterval = {
    val s = s0.trim
    def fail() = throw new IllegalArgumentException(
      s"Conversion Error: Could not convert string '$s0' to INTERVAL")
    hmsRe.findFirstMatchIn(s).filter(_.matched == s) match {
      case Some(m) =>
        val micros = m.group(2).toLong * 3600000000L +
          m.group(3).toLong * 60000000L +
          m.group(4).toLong * MicrosPerSecond +
          Option(m.group(5)).map(_.padTo(6, '0').toLong).getOrElse(0L)
        return new CalendarInterval(0, 0,
          if (m.group(1) == "-") -micros else micros)
      case None =>
    }
    val terms = termRe.findAllMatchIn(s).toSeq
    if (terms.isEmpty) fail()
    // the terms must tile the whole string (whitespace between them)
    val tiled = terms.map(_.matched).mkString(" ")
      .replaceAll("\\s+", " ")
    if (s.replaceAll("\\s+", " ") != tiled) fail()
    var months = 0L; var days = 0L; var micros = 0L
    terms.foreach { t =>
      val v = t.group(1).toDouble
      val (wm, wd, wus) = unitWeights.getOrElse(t.group(2).toLowerCase,
        fail())
      if (wm != 0) {
        val tot = v * wm
        val whole = tot.toLong // truncate toward zero
        months += whole
        // month fraction cascades at 30 days/month (probed)
        val fracDays = (tot - whole) * 30.0
        days += fracDays.toLong
        micros += ((fracDays - fracDays.toLong) * MicrosPerDay).round
      } else if (wd != 0) {
        val tot = v * wd
        val whole = tot.toLong
        days += whole
        micros += ((tot - whole) * MicrosPerDay).round
      } else micros += (v * wus).round
    }
    new CalendarInterval(months.toInt, days.toInt, micros)
  }

  /** (months, days, micros) from any Spark interval runtime value.
    * `daysLed` — the static type led with DAY (Spark normalizes the
    * whole value to micros; DuckDB keeps user-spoken days distinct,
    * so a DAY-led interval recovers its whole days). */
  def triple(v: Any, daysLed: Boolean): (Int, Int, Long) = v match {
    case m: java.lang.Integer => (m.intValue(), 0, 0L)
    case us: java.lang.Long =>
      if (daysLed) ((0, (us / MicrosPerDay).toInt, us % MicrosPerDay))
      else (0, 0, us.longValue())
    case ci: CalendarInterval => (ci.months, ci.days, ci.microseconds)
    case other => throw new IllegalArgumentException(
      s"not an interval value: $other")
  }

  private[graft] def isDaysLed(dt: DataType): Boolean = dt match {
    case d: DayTimeIntervalType => d.startField == DayTimeIntervalType.DAY
    case _ => false
  }

  private[graft] def isInterval(dt: DataType): Boolean = dt match {
    case _: YearMonthIntervalType | _: DayTimeIntervalType |
        CalendarIntervalType => true
    case _ => false
  }

  /** a YM/DT (or CalendarInterval) pair Spark's own arithmetic
    * refuses — both sides intervals but not the same family */
  private[graft] def isIntervalMix(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved &&
      isInterval(l.dataType) && isInterval(r.dataType) &&
      !((l.dataType.isInstanceOf[YearMonthIntervalType] &&
          r.dataType.isInstanceOf[YearMonthIntervalType]) ||
        (l.dataType.isInstanceOf[DayTimeIntervalType] &&
          r.dataType.isInstanceOf[DayTimeIntervalType]))
}

/** `interval::VARCHAR` in DuckDB's text rendering. */
case class DuckIntervalString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "duck_interval_text"
  private lazy val daysLed = DuckIntervals.isDaysLed(child.dataType)
  override protected def nullSafeEval(v: Any): Any = {
    val (m, d, us) = DuckIntervals.triple(v, daysLed)
    UTF8String.fromString(DuckIntervals.text(m, d, us))
  }
  override protected def withNewChildInternal(c: Expression)
      : DuckIntervalString = copy(child = c)
}

/** `VARCHAR::INTERVAL` through DuckDB's text grammar
  * ([[DuckIntervals.parseText]]) — Spark's stringToInterval rejects
  * the `HH:MM:SS` and abbreviated-unit spellings and answers NULL
  * where DuckDB parses or errors loudly. */
case class DuckIntervalParse(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "duck_interval_parse"
  override protected def nullSafeEval(v: Any): Any =
    DuckIntervals.parseText(v.toString)
  override protected def withNewChildInternal(c: Expression)
      : DuckIntervalParse = copy(child = c)
}

/** Year-month ± day-time interval (or any mix Spark refuses) as one
  * CalendarInterval — DuckDB's single-interval-type arithmetic. */
case class MixedIntervalExpr(left: Expression, right: Expression,
    negRight: Boolean) extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = if (negRight) "interval_sub"
    else "interval_add"
  private lazy val leftDaysLed = DuckIntervals.isDaysLed(left.dataType)
  private lazy val rightDaysLed = DuckIntervals.isDaysLed(right.dataType)
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (lm, ld, lus) = DuckIntervals.triple(l, leftDaysLed)
    val (rm0, rd0, rus0) = DuckIntervals.triple(r, rightDaysLed)
    val s = if (negRight) -1 else 1
    new CalendarInterval(lm + s * rm0, ld + s * rd0, lus + s * rus0)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MixedIntervalExpr =
    copy(left = l, right = r)
}

/** DuckDB's `interval / n`: INTEGER division of EACH triple field,
  * truncating toward zero, no remainder redistribution (probed:
  * '1 day'/2 is 00:00:00 — days 1/2 = 0; '3 days'/2 is '1 day';
  * '1 month 3 days 90 minutes'/2 is '1 day 00:45:00'; '-3 days'/2 is
  * '-1 day'; /0 is NULL). Spark instead divides the normalized total
  * exactly ('1 day'/2 = 12 h). Result keeps the input's static type.
  */
case class IntervalFieldDivide(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "interval_div"
  private lazy val daysLed = DuckIntervals.isDaysLed(left.dataType)
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) return null
    val n = r.asInstanceOf[Number].longValue()
    if (n == 0L) return null // DuckDB: interval / 0 is NULL
    val (m, d, us) = DuckIntervals.triple(l, daysLed)
    val (m2, d2, us2) = ((m / n).toInt, (d / n).toInt, us / n)
    left.dataType match {
      case _: YearMonthIntervalType => m2
      case _: DayTimeIntervalType => d2 * 86400000000L + us2
      case _ => new CalendarInterval(m2, d2, us2)
    }
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntervalFieldDivide =
    copy(left = l, right = r)
}

/** Post-hoc wiring: interval→VARCHAR casts render DuckDB text; mixed
  * YM±DT arithmetic Spark refuses becomes [[MixedIntervalExpr]];
  * timestamp/date ± a mixed CalendarInterval routes through Spark's
  * own TimeAdd (the analyzer's ResolveBinaryArithmetic has already
  * run and won't get another chance).
  */
object DuckIntervalCastRule extends Rule[LogicalPlan] {
  import DuckIntervals.{isInterval, isIntervalMix}

  /** The unresolved-only fixes, shared with [[DuckResolveFixRule]]
    * (which runs them inside the analyzer's fixpoint so downstream
    * resolution — ORDER BY through the Project, alias naming,
    * timezone assignment — still happens via Spark's own rules). */
  val unresolvedFixes: PartialFunction[Expression, Expression] = {
    // the analyzer's ResolveBinaryArithmetic sees `YM ± DT` and
    // guesses "datetime + YM interval", emitting an unresolvable
    // TimestampAddYMInterval whose "timestamp" is the other
    // interval (UnaryMinus-wrapped for subtraction) — reclaim it
    case t @ TimestampAddYMInterval(l, r, _)
        if !t.resolved && isIntervalMix(l, r) => mix(l, r)
    case d @ DateAddYMInterval(l, r)
        if !d.resolved && isIntervalMix(l, r) => mix(l, r)
    case t @ TimestampAddInterval(l, r, _)
        if !t.resolved && isIntervalMix(l, r) => mix(l, r)
    case a @ Add(l, r, _) if !a.resolved && isIntervalMix(l, r) =>
      mix(l, r)
    case s @ Subtract(l, r, _) if !s.resolved && isIntervalMix(l, r) =>
      MixedIntervalExpr(l, r, negRight = true)
    // the coercion cast the analyzer wrapped around the guessed
    // node (e.g. `cast(… as interval month)`) would truncate the
    // reclaimed triple — drop it (the reclaimed node may sit
    // inside a DatetimeSub RuntimeReplaceable, so match on the
    // child's now-CalendarInterval type, not the node class;
    // user-spelled casts keep Spark's own cast error)
    case c @ Cast(ch, _: YearMonthIntervalType | _: DayTimeIntervalType,
        _, _)
        if ch.resolved && ch.dataType == CalendarIntervalType &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
          ch.exists(_.isInstanceOf[MixedIntervalExpr]) => ch
    case a @ Add(l, r, _)
        if !a.resolved && l.resolved && r.resolved &&
          isDatetime(l.dataType) && r.dataType == CalendarIntervalType =>
      datetimeAdd(l, r)
    case a @ Add(l, r, _)
        if !a.resolved && l.resolved && r.resolved &&
          isDatetime(r.dataType) && l.dataType == CalendarIntervalType =>
      datetimeAdd(r, l)
    case s @ Subtract(l, r, _)
        if !s.resolved && l.resolved && r.resolved &&
          isDatetime(l.dataType) && r.dataType == CalendarIntervalType =>
      datetimeAdd(l, UnaryMinus(r))
    case t @ TimestampAddYMInterval(l, r, _)
        if !t.resolved && l.resolved && r.resolved &&
          isDatetime(l.dataType) && r.dataType == CalendarIntervalType =>
      datetimeAdd(l, r)
    // a reclaimed CalendarInterval under an analyzer-built
    // TimestampAddInterval: the node itself accepts it but stayed
    // unresolved because ResolveTimeZone ran before the reclaim —
    // supply the session zone
    case t @ TimestampAddInterval(l, r, None)
        if !t.resolved && l.resolved && r.resolved &&
          isDatetime(l.dataType) &&
          DuckIntervals.isInterval(r.dataType) =>
      TimestampAddInterval(l, r, Some(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries { case q =>
      q.transformExpressionsUp(unresolvedFixes.orElse {
        case c: Cast if c.dataType == StringType && c.child.resolved &&
            isInterval(c.child.dataType) =>
          DuckIntervalString(c.child)
        case c: Cast if c.dataType == CalendarIntervalType &&
            c.child.resolved && c.child.dataType == StringType &&
            !c.child.isInstanceOf[DuckIntervalParse] =>
          DuckIntervalParse(c.child)
        // interval / n: DuckDB divides each triple field integerly —
        // Spark's exact micros division is a silent divergence.
        // Fractional divisors/multipliers don't bind in DuckDB at all.
        case d @ DivideDTInterval(iv, n) if d.resolved =>
          if (integral(n.dataType)) IntervalFieldDivide(iv, n)
          else throw new IllegalArgumentException(
            "Binder Error: No function matches '/(INTERVAL, " +
              s"${n.dataType.simpleString.toUpperCase})' — DuckDB " +
              "divides intervals by integers only")
        case d @ DivideYMInterval(iv, n) if d.resolved =>
          if (integral(n.dataType)) IntervalFieldDivide(iv, n)
          else throw new IllegalArgumentException(
            "Binder Error: No function matches '/(INTERVAL, " +
              s"${n.dataType.simpleString.toUpperCase})' — DuckDB " +
              "divides intervals by integers only")
        // CalendarInterval (mixed literals via make_interval) — Spark
        // redistributes the day remainder into micros; DuckDB doesn't.
        // DivideInterval demands a DOUBLE divisor, so the analyzer
        // wrapped the original in a cast — look through it
        case d @ DivideInterval(iv, n, _) if d.resolved =>
          val orig = n match {
            case c @ Cast(ch, _, _, _)
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => ch
            case other => other
          }
          if (integral(orig.dataType)) IntervalFieldDivide(iv, orig)
          else throw new IllegalArgumentException(
            "Binder Error: No function matches '/(INTERVAL, " +
              s"${orig.dataType.simpleString.toUpperCase})' — DuckDB " +
              "divides intervals by integers only")
        case m @ MultiplyDTInterval(_, n)
            if m.resolved && !integral(n.dataType) =>
          throw new IllegalArgumentException(
            "Binder Error: No function matches '*(INTERVAL, " +
              s"${n.dataType.simpleString.toUpperCase})' — DuckDB " +
              "multiplies intervals by integers only")
        case m @ MultiplyYMInterval(_, n)
            if m.resolved && !integral(n.dataType) =>
          throw new IllegalArgumentException(
            "Binder Error: No function matches '*(INTERVAL, " +
              s"${n.dataType.simpleString.toUpperCase})' — DuckDB " +
              "multiplies intervals by integers only")
      })
    }

  /** UnaryMinus folded into the sign (MixedIntervalExpr negates
    * whole triples exactly; double negation cancels) */
  private def mix(l: Expression, r: Expression): Expression = (l, r) match {
    case (_, UnaryMinus(inner, _)) if DuckIntervals.isInterval(inner.dataType) =>
      MixedIntervalExpr(l, inner, negRight = true)
    case _ => MixedIntervalExpr(l, r, negRight = false)
  }

  private def isDatetime(dt: DataType): Boolean = dt match {
    case DateType | TimestampNTZType | _: TimestampType => true
    case _ => false
  }

  // Spark 4's spelling of datetime + CalendarInterval (the analyzer's
  // ResolveBinaryArithmetic emits exactly these)
  private def datetimeAdd(dt: Expression, iv: Expression): Expression =
    dt.dataType match {
      // DuckDB: DATE + INTERVAL is a TIMESTAMP (probed)
      case DateType => TimestampAddInterval(
        Cast(dt, TimestampType, Some(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)),
        iv, Some(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      case _ => TimestampAddInterval(dt, iv, Some(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    }
}
