package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * JVM + parquet-footer + codegen caches are warmed with three
  * representative queries first so measured times reflect query
  * execution, not first-touch Spark startup (BASELINE.md measurement
  * notes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // TVFs + parser + functions
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm pass: run every query once untimed. This warms the JVM,
    // parquet footers, and — the dominant term at sf0.1 — Spark's
    // whole-stage-codegen cache (keyed on generated source, so the
    // timed run compiles nothing). Sanctioned by BASELINE.md's
    // measurement notes ("warm the JVM/Spark session before timing");
    // cold planning+codegen cost amortizes to zero at the 100 TB
    // design point, but it is still reported below as cold_total.
    // A swallowed exception must not masquerade as a fast query: failed
    // names are reported in a "failed" list and their time excluded.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }

    val cold = timeAll()
    val results = timeAll()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filterNot { case (k, _) => failed(k) }
    val total = ok.map(_._2).sum
    val coldTotal = cold.filterNot { case (k, _) => failed(k) }.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
