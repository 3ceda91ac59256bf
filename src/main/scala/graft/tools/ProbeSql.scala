package graft.tools

import graft.Engine

/** Dev tool: replay the DuckDB-validated conformance corpus
  * (tools/gen_conformance.py output TSV: name\tkind\tsql) through
  * Engine.query end-to-end, writing `OK|FAIL\tname\tkind\tdetail`.
  * Measures true parity: registry aliases + SqlRewrites + TVFs.
  */
object ProbeSql {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    val src = scala.io.Source.fromFile(args(0))
    val out = new java.io.PrintWriter(args(1))
    for (line <- src.getLines() if line.nonEmpty && !line.startsWith("--")) {
      val Array(name, kind, sql) = line.split("\t", 3)
      val res =
        try {
          val rows = Engine.query(spark, sql).collect()
          s"OK\t$name\t$kind\t${rows.headOption.map(_.toString.take(80)).getOrElse("")}"
        } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("\\s+", " ").take(700)
            s"FAIL\t$name\t$kind\t$msg"
        }
      out.println(res)
      out.flush()
    }
    out.close(); src.close()
    spark.stop()
  }
}
