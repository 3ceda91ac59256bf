package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines:
  * reproducible sampling, train/val/test splitting, and token-budget
  * shard packing. All three are DETERMINISTIC (no engine RNG) so runs
  * are reproducible and every operator is oracle-checkable — the same
  * arithmetic runs identically in any SQL engine.
  *
  * The mixing hash is multiplicative over a pre-reduced id:
  * `pmod(pmod(id, 1000003) * 40503 + seed, modulus)`. Reducing by the
  * prime first keeps the product far from Long overflow (ANSI mode
  * would throw) for ids up to any realistic 100 TB key range, while
  * the multiplier de-correlates the bucket from id locality (plain
  * `id % 100` would put every 100th row in the sample — fine for
  * synthetic ids, catastrophic for block-allocated ones).
  */
object CorpusOps {

  /** bucket in [0, modulus) — deterministic, engine-portable. */
  def mixBucket(id: Column, seed: Int, modulus: Int): Column =
    pmod(pmod(id, lit(1000003L)) * 40503L + seed, lit(modulus.toLong))

  /** Reproducible stratified sample: keep ~`fraction` of each stratum.
    * Map-only (one filter expression), no shuffle, no RNG state — at
    * 100 TB this is a pushdown-friendly scan filter, and re-running
    * it yields byte-identical samples.
    */
  def stratifiedSample(df: DataFrame, idCol: String,
      fraction: Double, seed: Int = 17): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(mixBucket(col(idCol), seed, 10000) <
      lit((fraction * 10000).round))
  }

  /** Deterministic train/val/test split: one `split` label column,
    * assigned by the id's mix bucket. Map-only, reproducible, and
    * disjoint-and-total by construction (the three ranges partition
    * [0, 100)).
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
      valPct: Int = 5, seed: Int = 29): DataFrame = {
    require(trainPct + valPct <= 100 && trainPct >= 0 && valPct >= 0)
    val b = mixBucket(col(idCol), seed, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Pack documents into shards of at most `budget` tokens (plus one
    * overflowing document) per group: shard = floor(exclusive-prefix-
    * sum(tokens) / budget) over a deterministic order.
    *
    * Scale note: the prefix sum is a running window per `groupCol`
    * partition — the parallelism unit is the group (language, source,
    * …). That matches how corpora are packed in practice; a group too
    * large for one task gets pre-split by a coarser key first (e.g.
    * (lang, id range)). No shuffle beyond the window's partitioning.
    */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard",
      floor((sum(col(tokensCol)).over(w) - col(tokensCol)) / budget)
        .cast("bigint"))
  }
}
