package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees in the regime the q119 oracle cannot cover: more
  * distinct keys than counter slots, so evictions and lossy merges actually
  * fire. The sketch must still (a) report every key whose true frequency
  * exceeds n/(k+1) and (b) keep every estimate within [true - n/(k+1), true].
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Misra-Gries holds its frequency guarantees past the counter budget") {
    import spark.implicits._
    val k = operators.UdfSurface.MgK
    // two genuinely heavy keys + a 400-key tail; n = 1200 + 500 + 2000
    val data: Seq[String] =
      Seq.fill(1200)("heavy-a") ++ Seq.fill(500)("heavy-b") ++
        (0 until 400).flatMap(i => Seq.fill(5)(s"tail-$i"))
    val n = data.size
    val budget = n / (k + 1)
    // deterministic spread over 8 partitions so partial merges happen
    val words = spark.createDataset(data).repartition(8).toDF("word")
      .transform(CacheScope.cached)
    val mg = udaf(operators.UdfSurface.MisraGries)
    val est = words.agg(mg($"word")).as[Map[String, Long]].head()
    try {
      assert(est.size <= k, s"sketch holds ${est.size} > $k counters")
      val exact = data.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      for ((w, c) <- exact if c > budget)
        assert(est.contains(w), s"guaranteed heavy key $w (n=$c > $budget) missing")
      for ((w, e) <- est) {
        val c = exact(w)
        assert(e <= c, s"$w overestimated: $e > $c")
        assert(c - e <= budget, s"$w off by ${c - e} > $budget")
      }
    } finally CacheScope.release()
  }
}
