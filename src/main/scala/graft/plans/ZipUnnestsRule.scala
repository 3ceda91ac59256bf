package graft

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Collapse the analyzer's STACKED Generates for several select-list
  * `unnest` calls into one [[ZippedGenerator]] — DuckDB zips them
  * positionally (NULL-padded to the longest), it does not
  * cross-product like nested generators do.
  *
  * Fires ONLY on the exact shape select-position multi-unnest
  * produces: a Generate whose generator is unnest-family directly
  * over another such Generate, with the outer generator referencing
  * none of the inner's output (siblings in one select list cannot
  * reference each other, so this is always true for the target shape
  * and false for any genuinely correlated nesting). FROM-position
  * unnests — `FROM unnest(a), unnest(b)` — plan as a JOIN of two
  * Generates, not a stack, and keep DuckDB's cross-product comma
  * semantics untouched.
  */
object ZipUnnestsRule extends Rule[LogicalPlan] {

  private def zipFamily(g: Generate): Boolean = g.generator match {
    case _: DuckUnnest | _: ZippedGenerator => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case outer @ Generate(_, _, false, _, _, inner: Generate)
          if zipFamily(outer) && zipFamily(inner) && !inner.outer &&
            // LATERAL VIEW carries its alias as the Generate qualifier;
            // select-position unnests have none. The comma-unnest
            // lowering (rewriteCommaUnnest) emits aliased LATERAL
            // VIEWs precisely so its chain keeps DuckDB's
            // cross-product semantics instead of zipping.
            outer.qualifier.isEmpty && inner.qualifier.isEmpty &&
            outer.generator.references
              .intersect(AttributeSet(inner.generatorOutput)).isEmpty =>
        val gens = (inner.generator, outer.generator) match {
          case (ZippedGenerator(a), ZippedGenerator(b)) => a ++ b
          case (ZippedGenerator(a), b) => a :+ b
          case (a, ZippedGenerator(b)) => a +: b
          case (a, b) => Seq(a, b)
        }
        Generate(ZippedGenerator(gens), Nil, outer = false,
          inner.qualifier.orElse(outer.qualifier),
          (inner.generatorOutput ++ outer.generatorOutput)
            .map(_.withNullability(true)),
          inner.child)
    }
}
