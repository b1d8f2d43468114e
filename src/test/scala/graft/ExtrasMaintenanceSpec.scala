package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the table-maintenance operators (q235/q236) that the content
  * oracles can't state: a dynamic-partition backfill must leave untouched
  * partitions' files byte-identical (swap, not rewrite), and compaction
  * must hit its size-targeted file count while preserving every row.
  */
class ExtrasMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def partFiles(root: java.io.File): Map[String, Seq[(String, Long)]] =
    Option(root.listFiles()).fold(Seq.empty[java.io.File])(_.toSeq)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(d => d.getName ->
        d.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length)).sortBy(_._1))
      .toMap

  test("q235 dynamic overwrite swaps only the backfilled partitions") {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "events")
      .groupBy(date_format(to_date($"ts"), "yyyy-MM-dd").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val bad = daily.select($"day").distinct().orderBy($"day".desc)
      .limit(2).collect().map(_.getString(0)).toSeq
    val table = TestSpark.tmpDir("q235spec")
    daily.withColumn("n", when($"day".isin(bad: _*), $"n" * 2L).otherwise($"n"))
      .write.mode("overwrite").partitionBy("day").parquet(table)
    val before = partFiles(new java.io.File(table))
    daily.filter($"day".isin(bad: _*))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(table)
    val after = partFiles(new java.io.File(table))
    assert(before.keySet == after.keySet, "no partition may appear or vanish")
    val badDirs = bad.map(d => s"day=$d").toSet
    before.keySet.foreach { p =>
      if (badDirs(p))
        assert(before(p) != after(p), s"$p was backfilled — files must change")
      else
        assert(before(p) == after(p),
          s"$p was NOT backfilled — files must be untouched (names + sizes)")
    }
    // and the corrupted counts are actually repaired
    val got = spark.read.parquet(table)
      .filter($"day".isin(bad: _*)).agg(sum($"n")).head().getLong(0)
    val want = daily.filter($"day".isin(bad: _*)).agg(sum($"n")).head().getLong(0)
    assert(got == want, "backfilled partitions must hold the clean recompute")
  }

  test("q236 compaction meets the size-targeted file count and keeps all rows") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val frag = TestSpark.tmpDir("q236spec-frag")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    def parts(d: String) = new java.io.File(d).listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val nFrag = parts(frag).size
    assert(nFrag > 10, s"fixture must actually fragment, got $nFrag files")
    val out = SparkEntry.queries("q236_small_file_compaction")(spark, dir)
    try {
      // content parity through the round trip (the oracle checks the same)
      val want = docs.groupBy($"lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val gotRows = out.collect()
      assert(gotRows.map(_.getAs[Long]("n_docs")).sum == want.values.sum)
    } finally CacheScope.release()
  }
}
