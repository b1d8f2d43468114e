package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes one query's FULL formatted physical plan to a file (no grep, no
  * stdout truncation) — used for the plans/r{N}/<query>_{before,after}.txt
  * evidence pairs. Run:
  *   sbt "runMain graft.tools.DumpPlanFull q423_unigram_lm_tokenizer /root/testdata/sf0.1 plans/r12/q423_before.txt"
  */
object DumpPlanFull {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outPath = if (args.length > 2) args(2) else s"/tmp/plan_$name.txt"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), plan)
    println(s"[dumpplan] wrote ${plan.linesIterator.size} lines to $outPath")
    graft.CacheScope.release()
    spark.stop()
  }
}
