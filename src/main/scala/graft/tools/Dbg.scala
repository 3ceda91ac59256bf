package graft.tools

import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import java.util.concurrent.atomic.AtomicInteger

/** Dev scratch tool (contents change per investigation). Currently: a
  * job/stage counter for a named SparkEntry query — measures how many
  * Spark jobs a warm run schedules, since at small SF the ~0.3 s/job
  * scheduling floor dominates many-job DAGs (r11 verdict: shrink
  * q_pipeline_refine's job count).
  *
  * Usage: runMain graft.tools.Dbg <queryName> [sfDir]
  */
object Dbg {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val sp = Engine.session("local[32]")
    sp.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    val stages = new AtomicInteger()
    sp.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    SparkEntry.queries(name)(sp, dir).collect() // warm (codegen + cache)
    // min of 3 measured runs — this box drifts ±30% (BENCH_NOTES), a
    // single run can't tell plan wins from VM noise
    val runs = (1 to 3).map { _ =>
      if (!args.contains("keepcache")) sp.sharedState.cacheManager.clearCache()
      Thread.sleep(300)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(sp, dir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      (n, dt, jobs.get, stages.get)
    }
    val best = runs.minBy(_._2)
    println(f"query=$name rows=${best._1} warm_min=${best._2}%.3f " +
      f"all=${runs.map(r => f"${r._2}%.2f").mkString(",")} " +
      f"jobs=${best._3} stages=${best._4}")
    sp.stop()
  }
}
