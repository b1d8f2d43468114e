package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Law behind the graph family's scalable edge selection
  * (Advanced.topWeightEdges): the histogram-cutoff + boundary-tie-rank plan
  * must pick EXACTLY the first floor(3n/10) pairs in (weight DESC, s1, s2)
  * order — the rank-based definition the SQL oracles keep as the spec —
  * including on weight distributions the parquet fixture never produces:
  * heavy ties straddling the quota boundary, a single dominating weight,
  * and quota landing exactly on a weight-cell edge.
  */
class EdgeSelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rankBased(
      wts: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    wts.withColumn("rn",
        row_number().over(Window.orderBy($"c".desc, $"s1", $"s2")))
      .withColumn("nw", count(lit(1)).over(Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter($"rn" * 10 <= $"nw" * 3)
      .select($"s1".as[Long], $"s2".as[Long]).collect().toSet
  }

  private def check(pairs: Seq[(Long, Long, Long)], label: String): Unit = {
    import spark.implicits._
    val wts = pairs.toDF("s1", "s2", "c")
    val got = operators.Advanced.topWeightEdges(wts)
      .select($"s1".as[Long], $"s2".as[Long]).collect()
    val want = rankBased(wts)
    assert(got.length == got.toSet.size, s"$label: duplicate edges selected")
    assert(got.toSet == want,
      s"$label: mismatch missing=${want -- got.toSet} extra=${got.toSet -- want}")
  }

  test("tie cell straddles the quota boundary") {
    // 10 pairs, quota 3: weights 9, 5, 5, 5, 1... — two of the three 5s
    // must be taken, in (s1, s2) order.
    val pairs = Seq((1L, 2L, 9L), (3L, 4L, 5L), (1L, 5L, 5L), (2L, 6L, 5L)) ++
      (1L to 6L).map(i => (10L + i, 20L + i, 1L))
    check(pairs, "straddle")
  }

  test("single dominating weight (all pairs in the boundary cell)") {
    val pairs = (1L to 20L).map(i => (i, 100L + i, 7L))
    check(pairs, "uniform")
  }

  test("quota lands exactly on a weight-cell edge (no tie rank needed)") {
    // 10 pairs, quota 3, top weight cell holds exactly 3 pairs.
    val pairs = Seq((1L, 2L, 8L), (2L, 3L, 8L), (3L, 4L, 8L)) ++
      (1L to 7L).map(i => (30L + i, 40L + i, 2L))
    check(pairs, "exact-edge")
  }

  test("cappedAdjacency keeps exactly the top-k by (weight desc, id) per node") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // planted hub 0 adjacent to all, plus random sparse edges
    val pairs = ((1L to 40L).map(i => (0L, i, rnd.nextInt(9) + 1L)) ++
      (1 to 60).map(_ => (1L + rnd.nextInt(40), 41L + rnd.nextInt(40),
        rnd.nextInt(9) + 1L))).distinct
      .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq // unique pairs
    val k = 5
    val got = operators.Advanced.cappedAdjacency(pairs.toDF("s1", "s2", "c"), k)
      .select($"u".as[Long], $"v".as[Long]).collect().toSet
    val brute = pairs.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(_._1).toSeq.flatMap { case (u, nbrs) =>
        nbrs.sortBy { case (_, v, c) => (-c, v) }.take(k)
          .map { case (_, v, _) => (u, v) }
      }.toSet
    assert(got == brute,
      s"capped adjacency mismatch missing=${brute -- got} extra=${got -- brute}")
    // the hub's fan-out is capped at k even though its degree is 40
    assert(got.count(_._1 == 0L) == k)
  }

  test("random weighted graphs agree with the rank spec") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val n = 5 + rnd.nextInt(60)
      val pairs = (1 to n).map { i =>
        (i.toLong, (n + 1 + rnd.nextInt(n)).toLong, (1 + rnd.nextInt(6)).toLong)
      }.distinct
      check(pairs, s"random-$trial")
    }
  }
}
