package graft.tools

import graft.{CacheScope, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level wall-clock profile of a single named query (round-12 session):
  * records every Spark job's duration plus per-stage task counts/run time,
  * and — the number that matters for the deep-plan queries — the GAP between
  * jobs, which is driver-side work (analysis, optimization, AQE re-planning)
  * that no stage metric shows. Run:
  *   sbt "runMain graft.tools.ProfileJobs q423_unigram_lm_tokenizer /root/testdata/sf0.1 2"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHED_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = -1L,
        var stages: List[(Int, Int, Long)] = Nil) // (stageId, nTasks, runTimeMs)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, Job(e.jobId, e.time)); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        // attach to the most recent unfinished job (local mode, serial runner)
        val it = order.iterator()
        var last: Job = null
        while (it.hasNext) { val j = jobs.get(it.next()); if (j != null && j.end < 0) last = j }
        if (last != null) last.stages ::=
          ((sid, e.stageInfo.numTasks, e.stageInfo.taskMetrics.executorRunTime))
      }
    })

    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"=== run $r: wall ${wall}%.3f s ($c rows) ===")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toList.distinct.flatMap(id => Option(jobs.get(id)))
      var prevEnd = -1L
      var jobSum = 0.0
      var gapSum = 0.0
      js.foreach { j =>
        val dur = (j.end - j.start) / 1e3
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        jobSum += math.max(dur, 0); gapSum += math.max(gap, 0)
        val st = j.stages.reverse.map { case (sid, n, rt) => s"s$sid:${n}t/${rt}ms" }.mkString(" ")
        println(f"  job ${j.id}%3d gap ${gap}%7.3f dur ${dur}%7.3f  $st")
        prevEnd = j.end
      }
      println(f"  jobs ${js.size}: sum(dur)=${jobSum}%.3f s, sum(gap between jobs)=${gapSum}%.3f s")
      CacheScope.release()
    }
    spark.stop()
  }
}
