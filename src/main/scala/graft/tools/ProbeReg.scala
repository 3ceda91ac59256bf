package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftExtensions

/** Dev tool: given a newline list of function names on stdin, print which
  * resolve in the engine session (Spark native, graft alias, or macro) and
  * which don't. Used to diff the DuckDB v1.1.1 catalog against our surface.
  */
object ProbeReg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Functions.registerAll(spark)
    val src = scala.io.Source.fromFile(args(0))
    val out = new java.io.PrintWriter(args(1))
    for (n <- src.getLines().map(_.trim).filter(_.nonEmpty)) {
      val ok =
        try spark.catalog.functionExists(n)
        catch { case _: Throwable => false }
      out.println(s"${if (ok) "OK  " else "MISS"}\t$n")
    }
    out.close(); src.close()
    spark.stop()
  }
}
