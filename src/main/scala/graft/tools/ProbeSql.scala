package graft.tools

import graft.Engine

/** Dev tool: replay the DuckDB-validated conformance corpus
  * (tools/gen_conformance.py output TSV: name\tkind\tsql) through
  * Engine.query end-to-end, writing `OK|FAIL\tname\tkind\tdetail`.
  * The OK detail is the result rendered as one JSON document per row
  * (df.toJSON), ''-joined — tools/check_conformance.py parses
  * it back and VALUE-compares against DuckDB's own answer. Measures
  * true parity: registry aliases + SqlRewrites + TVFs.
  */
object ProbeSql {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    // explicit UTF-8: the container JVM defaults to US-ASCII, which
    // chokes on unicode probe rows
    val src = scala.io.Source.fromFile(args(0), "UTF-8")
    val out = new java.io.PrintWriter(args(1), "UTF-8")
    for (line <- src.getLines() if line.nonEmpty && !line.startsWith("--")) {
      val Array(name, kind, sql) = line.split("\t", 3)
      val res =
        try {
          val df = Engine.query(spark, sql)
          // toJSON has no codec for CalendarInterval/TIME: fall back
          // to Row.toString (the comparer counts those as execute-only)
          val rendered =
            try {
              val js = df.toJSON.collect()
              // zero-row results carry their column list so the
              // comparer can check shape, not just emptiness (an
              // all-null row renders "{}", never "")
              if (js.isEmpty) "COLS:" + df.columns.mkString(",")
              else js.mkString("")
            }
            catch { case _: Throwable =>
              "RAW:" + df.collect().map(_.toString).mkString("") }
          s"OK\t$name\t$kind\t$rendered"
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
