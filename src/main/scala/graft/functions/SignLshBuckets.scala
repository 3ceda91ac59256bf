package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `sign_lsh_buckets(embedding)` — native Catalyst expression
  * computing every band's sign-LSH bucket in ONE pass over the
  * embedding.
  *
  * The composable formulation (per plane: `aggregate(zip_with(vec,
  * planeLiteral, *), 0, +)`) allocates a zipped array per plane per
  * row — bands × bitsPerBand allocations and generic-SQL walks of the
  * vector. This expression keeps the plane matrix as a reference
  * object and accumulates dot products into primitive locals inside
  * whole-stage codegen. Per-row hot loop of
  * [[SimilaritySearch.lshTopK]].
  *
  * Output: array of `planes.length / bitsPerBand` longs; element b is
  * band b's bucket (bit j set iff dot(vec, plane[b*bitsPerBand+j]) > 0,
  * matching the sign convention of the previous formulation).
  */
case class SignLshBuckets(child: Expression, planes: Array[Array[Float]],
    bitsPerBand: Int) extends UnaryExpression {

  require(planes.nonEmpty && planes.length % bitsPerBand == 0,
    "bitsPerBand must divide the plane count")
  private val bands = planes.length / bitsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sign_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = planes(b * bitsPerBand + j)
        val lim = math.min(dims, p.length)
        var dot = 0.0d
        var d = 0
        while (d < lim) { dot += arr.getFloat(d) * p(d); d += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
      val out = ctx.freshName("buckets")
      val gad = classOf[GenericArrayData].getName
      // Every local fresh-named: fixed names collide when whole-stage
      // codegen splices two instances into one method body.
      val dims = ctx.freshName("dims"); val b = ctx.freshName("b")
      val bucket = ctx.freshName("bucket"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      s"""
         |long[] $out = new long[$bands];
         |int $dims = $x.numElements();
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    float[] $p = $planesRef[$b * $bitsPerBand + $j];
         |    int $lim = Math.min($dims, $p.length);
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) $dot += $x.getFloat($d) * $p[$d];
         |    if ($dot > 0) $bucket |= (1L << $j);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {
  def apply(c: Column, planes: Array[Array[Float]], bitsPerBand: Int): Column =
    ColumnBridge.column(SignLshBuckets(
      ColumnBridge.expression(c), planes, bitsPerBand))
}
