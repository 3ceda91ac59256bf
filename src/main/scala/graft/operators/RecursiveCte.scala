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
      maxIterations: Int = 1000,
      checkpointEvery: Int = 8): DataFrame = {
    var acc = init.localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      val next = step(frontier)
      // Spark jobs (materialize + emptiness probe) only at checkpoint
      // boundaries: lineage depth stays <= checkpointEvery and the
      // driver loop costs ~2 jobs per K iterations instead of per
      // iteration. Between checkpoints an already-empty frontier just
      // steps to more empty frames (harmless no-op unions).
      if ((i + 1) % checkpointEvery == 0) {
        frontier = next.localCheckpoint(eager = true)
        done = frontier.isEmpty
        if (!done) {
          // checkpoint the accumulator too: downstream consumers see
          // an O(1)-depth plan instead of a union of O(iterations)
          // branches (whose analysis alone dominates at high counts)
          acc = acc.unionByName(frontier).localCheckpoint(eager = true)
        }
      } else {
        frontier = next
        if (!done) acc = acc.unionByName(frontier)
      }
      i += 1
    }
    acc
  }
}
