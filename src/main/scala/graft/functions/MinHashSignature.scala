package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `minhash_signature(hashedShingles)` — native Catalyst expression
  * computing a `numHashes`-wide MinHash signature in ONE fused pass.
  *
  * The composable formulation (`transform(sequence(0,n-1), j ->
  * array_min(transform(shingles, s -> xxhash64(s, j))))`) allocates
  * n intermediate arrays per row and re-walks the shingle array n
  * times through generic SQL machinery; this expression walks the
  * shingles once per hash function with a primitive `long[]`
  * accumulator and Spark's own XXH64 (seeded with the hash index),
  * inside whole-stage codegen. This is the per-row hot loop of
  * MinHash+LSH dedup (Dedup.minhashNearDups).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val minima = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(v, j)
        if (h < minima(j)) minima(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minima)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val minima = ctx.freshName("minima")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      // Every local fresh-named: fixed names collide when whole-stage
      // codegen splices two instances into one method body.
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $minima = new long[$numHashes];
         |java.util.Arrays.fill($minima, Long.MAX_VALUE);
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $x.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = $xxh.hashLong($v, (long) $j);
         |    if ($h < $minima[$j]) $minima[$j] = $h;
         |  }
         |}
         |${ev.value} = new $gad($minima);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numHashes))
}
