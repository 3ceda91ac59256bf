package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, DateTimeUtils, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB renders `CAST(struct AS VARCHAR)` as `{'key': value}` —
  * single-quoted keys, RAW values (strings unquoted, NULL uppercase,
  * nested lists `[1, 2]`, nested maps `{k=v}`) — where Spark renders
  * values only (`{1, x}`). Probed grid 2026-08. [[StructCastRenderRule]]
  * swaps the Cast for this renderer at post-hoc resolution.
  */
case class DuckStructString(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "struct_to_varchar"

  private def render(v: Any, dt: DataType): String =
    if (v == null) "NULL"
    else dt match {
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        st.fields.zipWithIndex.map { case (f, i) =>
          val fv = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          s"'${f.name}': ${render(fv, f.dataType)}"
        }.mkString("{", ", ", "}")
      case ArrayType(et, _) =>
        val ad = v.asInstanceOf[ArrayData]
        (0 until ad.numElements()).map(i =>
          render(if (ad.isNullAt(i)) null else ad.get(i, et), et))
          .mkString("[", ", ", "]")
      case MapType(kt, vt, _) =>
        val md = v.asInstanceOf[MapData]
        val ks = md.keyArray(); val vs = md.valueArray()
        (0 until md.numElements()).map { i =>
          render(ks.get(i, kt), kt) + "=" +
            render(if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
        }.mkString("{", ", ", "}")
      case DateType =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case _: TimestampType | TimestampNTZType =>
        DateTimeUtils.microsToLocalDateTime(v.asInstanceOf[Long])
          .toString.replace('T', ' ')
      case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
      case DoubleType => DuckStrings.doubleString(v.asInstanceOf[Double])
      case FloatType => DuckStrings.floatString(v.asInstanceOf[Float])
      case _ => v.toString
    }

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(render(v, child.dataType))

  override protected def withNewChildInternal(newChild: Expression): DuckStructString =
    copy(child = newChild)
}

object StructCastRenderRule extends Rule[LogicalPlan] {
  // fires when a struct appears ANYWHERE in the cast source type —
  // array-of-struct casts render elementwise ([{'a': 1}, ...])
  private def hasStruct(dt: DataType): Boolean = dt match {
    case _: StructType => true
    case ArrayType(et, _) => hasStruct(et)
    case MapType(kt, vt, _) => hasStruct(kt) || hasStruct(vt)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case c: Cast if c.dataType == StringType && c.child.resolved &&
          hasStruct(c.child.dataType) =>
        DuckStructString(c.child)
    }
}
