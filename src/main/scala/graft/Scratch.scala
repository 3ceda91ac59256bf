package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main — plan inspection during the build loop.
  * Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    Tables.registerAll(spark, dir)
    val sql =
      """SELECT e.event_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin
    val df = Engine.query(spark, sql)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
