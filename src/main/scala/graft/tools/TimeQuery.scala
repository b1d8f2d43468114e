package graft.tools

import graft.{CacheScope, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Time a single named query (best of N) without running the whole bench.
  * Run: sbt "runMain graft.tools.TimeQuery q100_decontaminate /root/testdata/sf0.1 3"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // same methodology as Bench: caches live across the runs of one query
    // (the warm run is the measurement), released once at the end
    val times = try (1 to n).map { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $dt%.3f s ($c rows)")
      dt
    } finally CacheScope.release()
    println(f"best: ${times.min}%.3f s")
    spark.stop()
  }
}
