package graft.tools

import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}

/** Dev tool: run ONE SparkEntry query with a stage listener that
  * prints, per completed stage, its id, name, task count, input /
  * shuffle-read / shuffle-write / spill bytes — to attribute disk
  * consumption at scale (the sf100 q_dedup_prefix DNF). A watchdog
  * kills the JVM when free disk drops under `minFreeGb` so the box is
  * not wedged by a runaway stage.
  *
  * Usage: runMain graft.tools.StageProbe <query> <sfDir> [minFreeGb]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val minFree = (if (args.length > 2) args(2).toInt else 8).toLong << 30
    val sp = Engine.session("local[32]")
    sp.sparkContext.setLogLevel("ERROR")
    sp.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        println(f"[stage ${s.stageInfo.stageId}%3d SUBMIT tasks=${s.stageInfo.numTasks}%5d] ${s.stageInfo.name.take(90)}")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val wall = (for (t0 <- s.stageInfo.submissionTime; t1 <- s.stageInfo.completionTime)
          yield (t1 - t0) / 1e3).getOrElse(-1.0)
        println(f"[stage ${s.stageInfo.stageId}%3d DONE  ${wall}%7.1fs in=${m.inputMetrics.bytesRead / 1e9}%7.2fG sr=${m.shuffleReadMetrics.totalBytesRead / 1e9}%7.2fG sw=${m.shuffleWriteMetrics.bytesWritten / 1e9}%7.2fG spill=${m.diskBytesSpilled / 1e9}%7.2fG rows=${m.shuffleWriteMetrics.recordsWritten}%12d] ${s.stageInfo.name.take(70)}")
      }
    })
    val watchdog = new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        // watch the directory shuffle spill actually lands in, not a
        // hardcoded /tmp (ADVICE r12): spark.local.dir, falling back
        // to java.io.tmpdir
        val spillDir = sp.conf.getOption("spark.local.dir")
          .orElse(sys.env.get("SPARK_LOCAL_DIRS").map(_.split(",").head))
          .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
          .split(",").head
        val free = new java.io.File(spillDir).getUsableSpace
        if (free < minFree) {
          System.err.println(s"[watchdog] free disk ${free >> 30}G < ${minFree >> 30}G — aborting")
          Runtime.getRuntime.halt(42)
        }
      }
    })
    watchdog.setDaemon(true)
    watchdog.start()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(sp, dir).count()
    println(f"[done] rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    sp.stop()
  }
}
