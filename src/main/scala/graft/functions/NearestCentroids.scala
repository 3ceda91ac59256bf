package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `nearest_centroids(embedding)` — native Catalyst expression
  * returning the `n` nearest centroid ids by cosine similarity
  * (ties broken toward the smaller id), in ONE pass.
  *
  * The composable formulation — `slice(array_sort(transform(
  * centroidLiteralArray, cosine)), 1, n)` — runs numClusters
  * interpreted cosine HOF calls plus an interpreted comparator sort
  * per row. This walks the vector once per centroid with primitive
  * accumulators and selects top-n by insertion (n ≤ numClusters ≤
  * dozens), inside whole-stage codegen. Per-row hot loop of
  * [[SimilaritySearch.ivfTopK]] (every Lloyd assignment + the final
  * index + query probes).
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Float]], n: Int) extends UnaryExpression {

  require(n >= 1 && n <= centroids.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val k = centroids.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val lim = math.min(dims, cent.length)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var d = 0
      while (d < lim) {
        val x = arr.getFloat(d).toDouble
        val y = cent(d).toDouble
        dot += x * y; nv += x * x; nc += y * y
        d += 1
      }
      sims(c) = if (nv == 0 || nc == 0) Double.NegativeInfinity
        else dot / math.sqrt(nv * nc)
      c += 1
    }
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      var best = -1
      var bs = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 || sims(j) > bs)) { best = j; bs = sims(j) }
        j += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val centsRef = ctx.addReferenceObj("cents", centroids, "float[][]")
      val k = centroids.length
      val sims = ctx.freshName("sims")
      val out = ctx.freshName("nearest")
      val taken = ctx.freshName("taken")
      val gad = classOf[GenericArrayData].getName
      // Every local fresh-named: fixed names collide when whole-stage
      // codegen splices two instances into one method body.
      val dims = ctx.freshName("dims"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val best = ctx.freshName("best")
      val bs = ctx.freshName("bs")
      s"""
         |double[] $sims = new double[$k];
         |int $dims = $x.numElements();
         |for (int $c = 0; $c < $k; $c++) {
         |  float[] cent$c = $centsRef[$c];
         |  int lim$c = Math.min($dims, cent$c.length);
         |  double dot$c = 0.0, nv$c = 0.0, nc$c = 0.0;
         |  for (int $d = 0; $d < lim$c; $d++) {
         |    double xv$d = (double) $x.getFloat($d);
         |    double yv$d = (double) cent$c[$d];
         |    dot$c += xv$d * yv$d; nv$c += xv$d * xv$d; nc$c += yv$d * yv$d;
         |  }
         |  $sims[$c] = (nv$c == 0 || nc$c == 0)
         |    ? Double.NEGATIVE_INFINITY : dot$c / Math.sqrt(nv$c * nc$c);
         |}
         |int[] $out = new int[$n];
         |boolean[] $taken = new boolean[$k];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $best = -1; double $bs = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if (!$taken[$j] && ($best < 0 || $sims[$j] > $bs)) { $best = $j; $bs = $sims[$j]; }
         |  }
         |  $taken[$best] = true;
         |  $out[$i] = $best;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(c: Column, centroids: Array[Array[Float]], n: Int): Column =
    ColumnBridge.column(NearestCentroids(
      ColumnBridge.expression(c), centroids, n))
}
