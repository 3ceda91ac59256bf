package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal, NamedExpression, Unevaluable}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedException}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StringType}

/** DuckDB `COLUMNS(...)` star-expression (delegated surface — the
  * reference forwards statements verbatim at
  * src/duckdb_pgwire_extension.cpp:52 and DuckDB expands COLUMNS in
  * the binder). Two forms:
  *
  *   SELECT COLUMNS('n_.*') FROM t        -- regex, partial match
  *   SELECT min(COLUMNS(*)) FROM t        -- all columns, through fn
  *
  * Spark-first shape: `columns` is registered as an ordinary function
  * resolving to [[ColumnsPlaceholder]] (never evaluable), and
  * [[ExpandColumnsRule]] — an analyzer resolution rule — replaces each
  * projection/aggregate expression containing a placeholder with one
  * copy per matched child-output column, the placeholder substituted by
  * the column and the copy aliased to the bare column name (DuckDB
  * names `min(COLUMNS(*))` results after the source column, verified
  * against DuckDB v1.x). Purely an analysis-time expansion: the
  * optimized plan is identical to writing the columns by hand, so
  * codegen/pushdown/pruning are unaffected.
  *
  * `COLUMNS(*)` needs no special star handling here: Spark's analyzer
  * expands a `*` argument of any non-count function into one argument
  * per column, so the placeholder arrives holding every attribute.
  */
case class ColumnsPlaceholder(children: Seq[Expression])
    extends Expression with Unevaluable {
  // Never resolved: analysis must not complete until the rule expands
  // it (leaving it in place would otherwise reach codegen).
  override lazy val resolved: Boolean = false
  override def dataType: DataType =
    throw new UnresolvedException("COLUMNS() must be expanded by ExpandColumnsRule")
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColumnsPlaceholder =
    copy(children = newChildren)
}

object ExpandColumnsRule extends Rule[LogicalPlan] {

  private def hasPlaceholder(exprs: Seq[Expression]): Boolean =
    exprs.exists(_.exists(_.isInstanceOf[ColumnsPlaceholder]))

  /** marker the SqlRewrites pass uses to smuggle a `COLUMNS(c -> …)`
    * lambda past Spark's non-higher-order-function lambda check */
  val LambdaMarker = "__colpred__:"

  /** Columns of `output` the placeholder selects, in output order. */
  private def matched(ph: ColumnsPlaceholder, output: Seq[Attribute]): Seq[Attribute] =
    ph.children match {
      case Seq(Literal(s, StringType)) if s != null &&
          s.toString.startsWith(LambdaMarker) =>
        // COLUMNS(c -> predicate): filters column NAMES. The body is
        // parsed back and evaluated with each name substituted for
        // the variable — it must fold from literals alone (LIKE,
        // comparisons, ||); anything else errors loudly.
        val rest = s.toString.stripPrefix(LambdaMarker)
        val ci = rest.indexOf(':')
        val varName = rest.substring(0, ci)
        val body = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(rest.substring(ci + 1))
        output.filter { a =>
          val sub = body.transform {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                if u.nameParts == Seq(varName) =>
              Literal(org.apache.spark.unsafe.types.UTF8String
                .fromString(a.name), StringType)
          }
          try sub.eval(null) == true
          catch { case e: Exception => throw new IllegalArgumentException(
            s"COLUMNS(lambda): the predicate must evaluate from the " +
              s"column name alone (LIKE/comparison/concat); failed on " +
              s"'${a.name}': ${e.getMessage}", e) }
        }
      case Seq(Literal(re, StringType)) if re != null =>
        val p = java.util.regex.Pattern.compile(re.toString)
        output.filter(a => p.matcher(a.name).find()) // partial, like DuckDB
      case _ => // star-expanded attribute list (or explicit columns)
        ph.children.collect { case a: Attribute => a }
    }

  private def expand(exprs: Seq[NamedExpression],
                     output: Seq[Attribute]): Seq[NamedExpression] =
    exprs.flatMap { e =>
      val phs = e.collect { case p: ColumnsPlaceholder => p }
      phs.headOption match {
        case None => Seq(e)
        case Some(ph) =>
          matched(ph, output).map { attr =>
            val sub = e.transform { case p: ColumnsPlaceholder if p eq ph => attr }
            sub match {
              case a: Attribute => a
              case UnresolvedAlias(child, _) => Alias(child, attr.name)()
              case Alias(child, _) => Alias(child, attr.name)()
              case other => Alias(other, attr.name)()
            }
          }
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p @ Project(list, child) if child.resolved && hasPlaceholder(list) =>
      p.copy(projectList = expand(list, child.output))
    case a: Aggregate
        if a.child.resolved && hasPlaceholder(a.aggregateExpressions) =>
      a.copy(aggregateExpressions = expand(a.aggregateExpressions, a.child.output))
  }
}
