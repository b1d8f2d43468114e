package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value-level check that q117's z-order bucketing actually clusters BOTH
  * dimensions (the plan audit only checks plan shape): with 64 buckets cut
  * from the top 3+3 interleaved bits, each bucket's rows must span at most
  * 1/8 of each dimension's domain (plus the integer-scaling boundary slack).
  * If the interleave or scaling were wrong (e.g. bits from one dimension
  * only), some bucket would span a whole dimension and fail this bound.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q117 buckets stay narrow on both dimensions") {
    val rows = SparkEntry.queries("q117_zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length > 32, s"expected a mostly-populated bucket space, got ${rows.length}")
    val (minPk, maxPk) = (rows.map(_.getLong(2)).min, rows.map(_.getLong(3)).max)
    val (minSk, maxSk) = (rows.map(_.getLong(4)).min, rows.map(_.getLong(5)).max)
    // 1/8 of the domain per bucket + slack for the 16-bit scaling floor
    val pkBound = (maxPk - minPk) / 8 + (maxPk - minPk) / 64 + 2
    val skBound = (maxSk - minSk) / 8 + (maxSk - minSk) / 64 + 2
    rows.foreach { r =>
      val (bucket, pkSpan, skSpan) =
        (r.getLong(0), r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(pkSpan <= pkBound, s"bucket $bucket spans $pkSpan of l_partkey (> $pkBound)")
      assert(skSpan <= skBound, s"bucket $bucket spans $skSpan of l_suppkey (> $skBound)")
    }
  }
}
