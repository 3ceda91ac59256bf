package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id_argmax(tokens)` — native Catalyst expression scoring every
  * stopword profile in ONE pass over the token array and returning the
  * argmax language code (`und` when no profile hits).
  *
  * The composable formulation builds one interpreted
  * `filter(toks, array_contains(...))` HOF per profile — 6 array
  * walks per row outside whole-stage codegen. This walks the tokens
  * once against hash-set profiles held as codegen reference objects.
  *
  * Tie semantics match the previous `array_max(struct(score, lang))`
  * formulation: highest hit count wins, ties break to the
  * lexicographically greatest language code. Scores share the row's
  * token count as denominator, so comparing hit counts is equivalent.
  */
case class LangIdArgmax(child: Expression,
    profiles: Array[(String, Array[String])]) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_id_argmax"

  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1))
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
  private val und = UTF8String.fromString("und")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val np = profiles.length
    val hits = new Array[Int](np)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var p = 0
      while (p < np) {
        if (sets(p).contains(t)) hits(p) += 1
        p += 1
      }
      i += 1
    }
    var best = -1
    var p = 0
    while (p < np) {
      if (hits(p) > 0 && (best < 0 || hits(p) > hits(best) ||
          (hits(p) == hits(best) && langs(p).compareTo(langs(best)) > 0)))
        best = p
      p += 1
    }
    if (best < 0) und else langs(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val setsRef = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
      val langsRef = ctx.addReferenceObj("langs", langs,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val undRef = ctx.addReferenceObj("und", und,
        "org.apache.spark.unsafe.types.UTF8String")
      val np = profiles.length
      val hits = ctx.freshName("hits")
      val best = ctx.freshName("best")
      // Every local fresh-named: fixed names collide when whole-stage
      // codegen splices two instances into one method body.
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val p2 = ctx.freshName("p2")
      s"""
         |int[] $hits = new int[$np];
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $x.getUTF8String($i);
         |  for (int $p = 0; $p < $np; $p++) {
         |    if ($setsRef[$p].contains($t)) $hits[$p]++;
         |  }
         |}
         |int $best = -1;
         |for (int $p2 = 0; $p2 < $np; $p2++) {
         |  if ($hits[$p2] > 0 && ($best < 0 || $hits[$p2] > $hits[$best] ||
         |      ($hits[$p2] == $hits[$best] &&
         |       $langsRef[$p2].compareTo($langsRef[$best]) > 0))) $best = $p2;
         |}
         |${ev.value} = ($best < 0) ? $undRef : $langsRef[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdArgmax =
    copy(child = newChild)
}

object LangIdArgmax {
  def apply(tokens: Column, profiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(LangIdArgmax(ColumnBridge.expression(tokens),
      profiles.toArray.sortBy(_._1).map { case (l, ws) => (l, ws.toArray) }))
}
