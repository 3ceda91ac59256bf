package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `array_cosine_similarity(a, b)` — native Catalyst expression with
  * whole-stage codegen (DuckDB v1.1 has this builtin; SURVEY §2.2
  * "Array/list" marks it as the one gap needing a custom Expression).
  *
  * A single fused loop over both float vectors, accumulating dot
  * product and both norms in doubles — no intermediate arrays, stays
  * inside WholeStageCodegen (vs. a zip_with + aggregate formulation
  * that materializes a struct array per row, or a Scala UDF that
  * breaks codegen entirely). This is the hot inner loop of the M5
  * similarity-search path, so it gets the full treatment.
  */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = ColumnBridge.floatArrayBinaryInput

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // All locals fresh-named: whole-stage codegen splices this block
      // into one shared method body, so fixed names collide (janino
      // "Redefinition of local variable" -> silent interpreted fallback).
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv$i = $x.getFloat($i);
         |  double yv$i = $y.getFloat($i);
         |  $dot += xv$i * yv$i; $nx += xv$i * xv$i; $ny += yv$i * yv$i;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door for graft's custom expressions. */
object GraftFunctions {
  def arrayCosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayCosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
