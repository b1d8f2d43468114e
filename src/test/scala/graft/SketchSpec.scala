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

  test("KMV sketch is partitioning-invariant and keeps the K smallest distinct") {
    import spark.implicits._
    val kmv = udaf(operators.UdfSurface.KmvSketch)
    val k = operators.UdfSurface.KmvK
    // 5000 values over a 400-key space: duplicates everywhere, so the
    // distinct-insert path is exercised, not just the trim
    val data: Seq[Long] = (0 until 5000).map(i => (i * 2654435761L % 400) * 7919L)
    def sketchOf(parts: Int): Array[Long] =
      spark.createDataset(data).repartition(parts).toDF("h")
        .agg(kmv($"h")).as[Array[Long]].head()
    val sk1 = sketchOf(1)
    val sk8 = sketchOf(8)
    assert(sk1.sameElements(sk8),
      "8-way partial aggregation must equal the sequential sketch")
    val expected = data.distinct.sorted.take(k)
    assert(sk8.toSeq == expected,
      "sketch must be exactly the K smallest distinct values")
  }

  test("KMV estimator lands within the theoretical relative error") {
    // est = (K-1) * P / kth_min over n distinct scattered hashes: the
    // standard error is ~1/sqrt(K-2); allow 3 sigma.
    import spark.implicits._
    val kmv = udaf(operators.UdfSurface.KmvSketch)
    val k = operators.UdfSurface.KmvK
    val p = graft.functions.TextHash.P
    val n = 5000
    val hashes = (1 to n).map(i => i.toLong * 2654435761L % p)
    assert(hashes.distinct.size == n, "fixture hashes must be distinct")
    val sk = spark.createDataset(hashes).toDF("h").agg(kmv($"h"))
      .as[Array[Long]].head()
    val est = (k - 1) * p / sk(k - 1)
    val sigma = 1.0 / math.sqrt(k - 2)
    assert(math.abs(est - n).toDouble / n <= 3 * sigma,
      s"estimate $est too far from true $n (3-sigma band ${3 * sigma})")
  }
}
