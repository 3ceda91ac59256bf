package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB `range` / `generate_series` list semantics, probed 2026-08:
  *
  *  - `range` is end-EXCLUSIVE, `generate_series` end-INCLUSIVE;
  *  - the default step is ALWAYS +1 — never direction-inferred (this
  *    is the trap: Spark's `sequence(5, 1)` infers step −1 and counts
  *    down, DuckDB's `range(5, 1)` / `generate_series(5, 1)` are
  *    EMPTY);
  *  - a step moving away from stop → empty list; step 0 → empty list
  *    (not an error);
  *  - `range(n)` = 0..n−1, `generate_series(n)` = 0..n (inclusive);
  *  - timestamp + INTERVAL steps supported, calendar-aware, negative
  *    intervals count down (`generate_series(ts2, ts1, -12h)`).
  *
  * One expression serves both spellings (scalar aliases and the
  * FROM-position TVFs) via `exclusive`.
  */
case class DuckSeries(start: Expression, stop: Expression,
    stepOpt: Option[Expression], exclusive: Boolean)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(start, stop) ++ stepOpt
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = if (exclusive) "range" else "generate_series"

  private def temporal: Boolean = start.dataType match {
    case _: TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  override def dataType: DataType =
    if (temporal) ArrayType(TimestampType, containsNull = false)
    else ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok =
      if (temporal) stop.dataType.isInstanceOf[TimestampType] ||
        stop.dataType == TimestampNTZType || stop.dataType == DateType
      else Seq(start, stop).forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType | NullType => true
        case _ => false
      })
    val stepOk = stepOpt.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
          CalendarIntervalType | _: DayTimeIntervalType |
          _: YearMonthIntervalType | NullType => true
      case _ => false
    })
    if (ok && stepOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(start, stop[, step]): integer bounds with integer " +
        "step, or timestamp bounds with INTERVAL step; got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  private def toLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def eval(input: InternalRow): Any = {
    val s0 = start.eval(input)
    val s1 = stop.eval(input)
    if (s0 == null || s1 == null) return null
    val stepV = stepOpt.map(_.eval(input))
    if (stepOpt.nonEmpty && stepV.contains(null)) return null
    if (temporal) evalTs(s0, s1, stepV) else evalLong(s0, s1, stepV)
  }

  private def evalLong(s0: Any, s1: Any, stepV: Option[Any]): GenericArrayData = {
    val a = toLong(s0); val b = toLong(s1)
    val st = stepV.map(toLong).getOrElse(1L)
    val out = new ArrayBuffer[Long]
    if (st != 0) {
      var cur = a
      if (st > 0) while (cur < b || (!exclusive && cur == b)) {
        out += cur
        cur = try Math.addExact(cur, st) catch { case _: ArithmeticException =>
          return new GenericArrayData(out.toArray) }
      }
      else while (cur > b || (!exclusive && cur == b)) {
        out += cur
        cur = try Math.addExact(cur, st) catch { case _: ArithmeticException =>
          return new GenericArrayData(out.toArray) }
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def evalTs(s0: Any, s1: Any, stepV: Option[Any]): GenericArrayData = {
    val zone = java.time.ZoneOffset.UTC
    def micros(v: Any, dt: DataType): Long = dt match {
      case DateType => DateTimeUtils.daysToMicros(toLong(v).toInt, zone)
      case _ => toLong(v)
    }
    val a = micros(s0, start.dataType)
    val b = micros(s1, stop.dataType)
    val (months, days, us) = stepV match {
      case Some(ci: CalendarInterval) => (ci.months, ci.days, ci.microseconds)
      case Some(l: java.lang.Long) => stepOpt.get.dataType match {
        case _: DayTimeIntervalType => (0, 0, l.longValue()) // micros
        case _ => (l.intValue(), 0, 0L) // year-month: months
      }
      case Some(i: java.lang.Integer) => (i.intValue(), 0, 0L)
      case None => (0, 1, 0L) // default: 1 day (DuckDB errors without a
                              // step for timestamps; a sane default here)
      case other => throw new IllegalArgumentException(
        s"unsupported interval step carrier: $other")
    }
    def add(t: Long): Long =
      DateTimeUtils.timestampAddInterval(t, months, days, us, zone)
    val probe = add(a)
    val ascending = probe > a
    val out = new ArrayBuffer[Long]
    if (probe != a) { // zero interval → empty
      var cur = a
      var guard = 0
      if (ascending) while ((cur < b || (!exclusive && cur == b)) &&
          guard < 10000000) { out += cur; cur = add(cur); guard += 1 }
      else while ((cur > b || (!exclusive && cur == b)) &&
          guard < 10000000) { out += cur; cur = add(cur); guard += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSeries =
    copy(start = newChildren(0), stop = newChildren(1),
      stepOpt = if (newChildren.length > 2) Some(newChildren(2)) else None)
}
