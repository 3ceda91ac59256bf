package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** DuckDB allows SELECT-list aliases in the WHERE clause (delegated
  * surface via src/duckdb_pgwire_extension.cpp:52; probed grid
  * 2026-08-15): `SELECT a+1 AS b FROM t WHERE b > 3` filters on a+1.
  * Probed semantics reproduced exactly:
  *   - a REAL column wins a name collision (`SELECT a+1 AS a … WHERE
  *     a > 2` binds the table's a) — we substitute only names that do
  *     NOT resolve against the filter child's output;
  *   - alias chains work (`a+1 AS c, c+1 AS d … WHERE d > 3`) — the
  *     substituted expression may itself contain lateral alias names,
  *     which the next fixpoint round substitutes;
  *   - duplicate alias names bind the LAST definition (probed);
  *   - qualified references never bind to aliases (`WHERE t.x` with
  *     alias x is DuckDB's "Table t does not have a column named x");
  *   - aggregates/windows smuggled through an alias keep their loud
  *     errors (Spark's CheckAnalysis rejects them in a Filter exactly
  *     where DuckDB's binder does).
  * Spark resolves lateral aliases in the SELECT list but never in
  * WHERE (UNRESOLVED_COLUMN) — this rule substitutes the alias's own
  * expression into the filter condition for both the Project and the
  * Aggregate (GROUP BY) shapes. A direct self-reference
  * (`x+1 AS x WHERE x > 2` with no real column x) is left unresolved
  * so the analyzer still errors loudly instead of looping.
  */
object WhereAliasRule extends Rule[LogicalPlan] {

  private def substitute(cond: Expression, child: LogicalPlan,
      namedExprs: Seq[NamedExpression]): Expression = {
    val resolver = conf.resolver
    // last definition wins on duplicate alias names (probed)
    def aliasFor(name: String): Option[Alias] =
      namedExprs.reverse.collectFirst {
        case a: Alias if resolver(a.name, name) &&
            // no direct self-reference: would never terminate
            !a.child.exists {
              case ua: UnresolvedAttribute =>
                ua.nameParts.length == 1 && resolver(ua.nameParts.head, name)
              case _ => false
            } => a
      }
    def inChild(name: String): Boolean =
      child.output.exists(a => resolver(a.name, name))
    cond.transformUp {
      case ua: UnresolvedAttribute
          if ua.nameParts.length == 1 && !inChild(ua.nameParts.head) &&
            aliasFor(ua.nameParts.head).isDefined =>
        aliasFor(ua.nameParts.head).get.child
    }
  }

  private def wants(cond: Expression, child: LogicalPlan,
      namedExprs: Seq[NamedExpression]): Boolean = {
    val resolver = conf.resolver
    cond.exists {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
        !child.output.exists(a => resolver(a.name, ua.nameParts.head)) &&
          namedExprs.exists {
            case a: Alias => resolver(a.name, ua.nameParts.head)
            case _ => false
          }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p @ Project(projectList, f @ Filter(cond, child))
          if child.resolved && wants(cond, child, projectList) =>
        p.copy(child = f.copy(condition =
          substitute(cond, child, projectList)))
      case ag @ Aggregate(_, aggExprs, f @ Filter(cond, child), _)
          if child.resolved && wants(cond, child, aggExprs) =>
        ag.copy(child = f.copy(condition =
          substitute(cond, child, aggExprs)))
    }
}
