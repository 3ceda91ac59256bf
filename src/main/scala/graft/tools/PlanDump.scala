package graft.tools

import graft._
import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries
  * to files — the plan evidence the optimization-round deliverables
  * require (plans/r12/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <query> [query...]
  * A query name of "ALL" dumps every SparkEntry query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q>...")
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.drop(2).contains("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sp = Engine.session("local[32]")
    sp.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(sp, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    sp.stop()
  }
}
