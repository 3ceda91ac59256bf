package graft.tools
import graft._
object Dbg {
  def main(args: Array[String]): Unit = {
    val sp = Engine.session("local[2]")
    sp.sparkContext.setLogLevel("ERROR")
    val df = sp.sql("CREATE TABLE r11dbg AS SELECT 1 AS a UNION ALL SELECT 2")
    println("executedPlan class: " + df.queryExecution.executedPlan.getClass)
    println(df.queryExecution.executedPlan.toString.take(2000))
    df.queryExecution.executedPlan match {
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        c.commandPhysicalPlan.foreach { p =>
          println(s"node ${p.getClass.getSimpleName} metrics=${p.metrics.keys.mkString(",")}")
        }
      case other => println("not CommandResultExec: " + other.getClass)
    }
    sp.stop()
  }
}
