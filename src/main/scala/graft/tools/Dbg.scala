package graft.tools

import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageSubmitted}
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
    // per-job wall + task counts for the last measured run ("joblog"
    // flag): jobId -> (t_start_nanos, numTasks, firstStageName)
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sp.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val nTasks = j.stageInfos.map(_.numTasks).sum
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobInfo.put(j.jobId, (System.nanoTime(), nTasks, site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobInfo.remove(j.jobId)).foreach { case (t0, nTasks, site) =>
          jobLines.add(
            f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e3}%9.0f us tasks=$nTasks%4d  $site")
        }
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    SparkEntry.queries(name)(sp, dir).collect() // warm (codegen + cache)
    // min of 3 measured runs — this box drifts ±30% (BENCH_NOTES), a
    // single run can't tell plan wins from VM noise
    val runs = (1 to 3).map { _ =>
      if (!args.contains("keepcache")) sp.sharedState.cacheManager.clearCache()
      Thread.sleep(300)
      jobs.set(0); stages.set(0); jobLines.clear()
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
    if (args.contains("joblog"))
      jobLines.toArray(Array.empty[String]).foreach(println)
    sp.stop()
  }
}
