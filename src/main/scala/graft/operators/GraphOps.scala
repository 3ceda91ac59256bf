package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline — the step the
  * pairwise operators feed: near-dup PAIRS become duplicate CLUSTERS
  * (connected components), and each cluster elects one canonical
  * document to keep.
  *
  * Reference surface anchor: the delegated engine reaches transitive
  * closure through `WITH RECURSIVE` (forwarded verbatim by
  * `/root/reference/src/duckdb_pgwire_extension.cpp:52`); at 100 TB a
  * recursive CTE over a billion-edge dup graph is the wrong tool, so
  * the Spark-native operator is an iterative min-label propagation
  * with pointer jumping — O(log n) rounds of hash-keyed joins, every
  * stage shuffle-partitioned by node id and AQE-skew-splittable.
  */
object GraphOps {

  /** Connected components over an undirected edge set.
    *
    * @param edges two-column DataFrame; column names given by
    *              `srcCol`/`dstCol`, node ids must be orderable
    *              (cluster id = min node id in the component).
    * @return (id, component) — one row per node that appears in at
    *         least one edge; `component` is the smallest node id
    *         reachable from `id`.
    *
    * Algorithm: min-label propagation accelerated with one pointer
    * jump per round (label := label(label)), the hash-to-min shape
    * from the published map-reduce CC line of work (Rastogi et al.).
    * Plain propagation needs diameter rounds; the jump squares the
    * propagation distance, so rounds are O(log diameter). Convergence
    * is detected by the sum of labels: labels only ever decrease, so
    * an unchanged sum means a fixpoint — one cheap scalar action per
    * round, no row-wise old-vs-new comparison join.
    *
    * Scale posture: state per round is one (id, label) row per node —
    * never materializes paths or closures. Each round is two
    * hash joins + one hash aggregate keyed by node id. The edge set is
    * localCheckpointed once and reused every round; per-round label
    * frames are checkpointed to truncate the growing lineage (without
    * this, round k replays rounds 1..k-1).
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxRounds: Int = 20): DataFrame = {
    // checkpoint the INPUT edges before the symmetrizing union: both
    // union branches read `edges`, and upstream of this operator sits
    // a whole candidate-pair pipeline (posting joins, verification) —
    // without the checkpoint that pipeline would execute twice
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(eager = false)
    // repartition by dst BEFORE the checkpoint: the per-round neighbor
    // join is keyed sym.dst == labels.id, and a (src,dst)-distinct
    // frame would re-exchange sym by dst EVERY round; hash-partitioned
    // by dst once, the checkpointed partitioning satisfies the join's
    // distribution and only the (small) labels side shuffles per round
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint(eager = false) // reused every round — compute once

    // seed labels with round-1 propagation folded in: sym carries both
    // directions, so min(dst) over a node's edges is its min neighbor.
    // Checkpoints here and per round are LAZY: the convergence-sum
    // action materializes them, so each round runs ONE job, not an
    // eager-checkpoint job plus the sum job.
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint(eager = false)
    var prevSum = labels.agg(sum(col("label"))).head().getLong(0)

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // propagate: each node takes the min of its own label and its
      // neighbors' labels (one join keyed by dst, one agg keyed by id)
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val merged = labels.select(col("id"), col("label")).union(nbr)
        .groupBy(col("id")).agg(min(col("label")).as("label"))

      // pointer jump: label := label(label). Labels are node ids, so
      // the lookup is a self-join; the left join keeps roots (whose
      // label may be their own id) intact.
      val ptr = merged.select(col("id").as("pid"), col("label").as("plabel"))
      labels = merged.join(ptr, merged("label") === ptr("pid"), "left")
        .select(merged("id"), least(coalesce(col("plabel"), merged("label")),
          merged("label")).as("label"))
        // lazy: the sum action below materializes it (one job/round);
        // still truncates lineage — round k must not replay 1..k-1
        .localCheckpoint(eager = false)

      val s = labels.agg(sum(col("label"))).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      round += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }

  /** Duplicate-cluster assignment for a document corpus: run
    * [[connectedComponents]] over a near-dup pair set and emit, per
    * document in any pair, its cluster id (min doc id in the cluster)
    * and whether it is the cluster's canonical representative — the
    * row a curation pipeline keeps.
    */
  def dupClusters(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2"): DataFrame =
    connectedComponents(pairs, id1, id2)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_canonical"))
}
