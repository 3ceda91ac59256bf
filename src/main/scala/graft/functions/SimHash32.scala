package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `simhash(tokenHashes)` — native Catalyst expression computing the
  * `bits`-wide SimHash fingerprint of a token-hash array in ONE pass
  * (32-bit legacy form and the 64-bit Manku et al. form the scale
  * path uses — r7: 32-bit pigeonhole chunks are only 8 bits, whose
  * 1/256 random collision rate gives a quadratic candidate floor,
  * measured 12.3× wall at 10× rows; 16-bit chunks of a 64-bit
  * fingerprint push that to 1/65536).
  *
  * The composable formulation (`bits` × `aggregate(hashes, 0,
  * vote_b)`) walks the array `bits` times through interpreted
  * higher-order-function machinery (Spark HOF lambdas do not
  * participate in whole-stage codegen). This expression keeps `bits`
  * primitive vote counters and walks the array once, inside codegen.
  * Per-row hot loop of [[Dedup.simhashNearDups]].
  */
case class SimHash32(child: Expression, bits: Int = 32) extends UnaryExpression {

  require(bits > 0 && bits <= 64, s"simhash width $bits")

  override def dataType: DataType = LongType

  override def prettyName: String = s"simhash$bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // Every local fresh-named: fixed names collide when whole-stage
      // codegen splices two instances into one method body.
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      s"""
         |int[] $votes = new int[$bits];
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b2 = 0; $b2 < $bits; $b2++) {
         |  if ($votes[$b2] > 0) $fp |= (1L << $b2);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}

object SimHash64 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c), bits = 64))
}
