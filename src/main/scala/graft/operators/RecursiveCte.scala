package graft

import org.apache.spark.sql.DataFrame

/** Recursive CTE (`WITH RECURSIVE ... UNION ALL`) — Spark has no
  * builtin (SURVEY §2.2 "CTEs"); semantics are reproduced with the
  * standard iterative fixpoint: apply `step` to the previous
  * increment, accumulate, stop when the increment is empty.
  *
  * Scale note: each iteration is a lazy plan over the previous
  * increment; we localCheckpoint per iteration so lineage stays O(1)
  * instead of O(iterations) — the usual driver-loop blowup at scale.
  */
object RecursiveCte {

  def unionAll(
      init: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 1000): DataFrame = {
    var acc = init.localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      frontier = step(frontier).localCheckpoint(eager = true)
      if (!frontier.isEmpty) acc = acc.unionByName(frontier)
      i += 1
    }
    acc
  }
}
