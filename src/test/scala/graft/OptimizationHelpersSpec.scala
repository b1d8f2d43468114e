package graft

import org.scalatest.funsuite.AnyFunSuite

/** Focused tests for the round-11 optimization machinery: Tables.spread
  * (parallelize an effectively-unsplittable scan, no-op on healthy
  * layouts), Tables.rowCount (memoized trigger sizing), and
  * CacheScope.checkpointed (lineage truncation whose blocks are released
  * with the query's other caches — a leak here would grow executor storage
  * across the 458-query bench).
  */
class OptimizationHelpersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spread parallelizes a 1-partition frame and preserves the rows") {
    import spark.implicits._
    val one = spark.range(1000).coalesce(1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val out = Tables.spread(one)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.as[Long].collect().sorted.toSeq == (0L until 1000L))
  }

  test("spread is a no-op when the input already has enough splits") {
    val par = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism).toDF("id")
    // same object back: no extra exchange is inserted on healthy layouts
    assert(Tables.spread(par) eq par)
  }

  test("rowCount counts the fixture and memoizes per (dir, table)") {
    val dir = "/root/testdata/sf0.001"
    val n1 = Tables.rowCount(spark, dir, "documents")
    assert(n1 == Tables.load(spark, dir, "documents").count())
    assert(Tables.rowCount(spark, dir, "documents") == n1)
  }

  test("checkpointed truncates lineage and release() frees its blocks") {
    import spark.implicits._
    val sc = spark.sparkContext
    CacheScope.release() // drain anything a prior suite registered
    val before = sc.getPersistentRDDs.keySet
    val ck = CacheScope.checkpointed(
      spark.range(100).toDF("id").filter($"id" % 2 === 0))
    // lineage is cut: the plan reads the materialized blocks, not the range
    val plan = ck.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"expected a scan of the checkpointed blocks, got:\n$plan")
    assert(ck.count() == 50)
    val during = sc.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "checkpoint registered no persistent blocks")
    CacheScope.release()
    val after = sc.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"release() left checkpoint blocks persisted: $after")
  }
}
