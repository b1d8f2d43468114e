package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Laws behind q347 (isotonic calibration) and q340 (raking) that the
  * fixture oracles cannot state:
  *  - the minimax identity m_i = max_{j<=i} min_{k>=i} pooledRate(j..k)
  *    must equal the classic sequential PAV pooling on exact rationals
  *    (that identity is what lets the query run as a bounded join instead
  *    of a sequential loop), the micro-rounded form must stay within one
  *    unit of it, and any minimax output is monotone by construction;
  *  - one IPF scaling round must land its own margin within one floor
  *    unit per cell (the reason q340's gaps read -1..0 on the fixture).
  */
object EvalLawProps extends Properties("EvalLaws") {

  private case class Bin(cnt: Long, pos: Long)
  private val genBin: Gen[Bin] = for {
    c <- Gen.chooseNum(0L, 50L)
    p <- Gen.chooseNum(0L, c max 0L)
  } yield Bin(c, p)
  private val genBins: Gen[Vector[Bin]] =
    Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, genBin)).map(_.toVector)
      .suchThat(_.exists(_.cnt > 0))

  /** Classic PAV: pool adjacent violators left to right, exact rationals
    * as (pos, cnt) pairs compared by cross-multiplication.
    */
  private def pav(bins: Vector[Bin]): Vector[(Long, Long)] = {
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    bins.foreach { b =>
      pools += ((b.pos, b.cnt, 1))
      // merge while the last pool's rate < the previous pool's rate
      while (pools.size >= 2 && {
        val (p2, c2, _) = pools(pools.size - 1)
        val (p1, c1, _) = pools(pools.size - 2)
        // p2/c2 < p1/c1 with empty pools treated as rate 0
        val l = if (c2 == 0) BigInt(0) else BigInt(p2) * (if (c1 == 0) 1L else c1)
        val r = if (c1 == 0) BigInt(0) else BigInt(p1) * (if (c2 == 0) 1L else c2)
        l < r
      }) {
        val (p2, c2, n2) = pools.remove(pools.size - 1)
        val (p1, c1, n1) = pools.remove(pools.size - 1)
        pools += ((p1 + p2, c1 + c2, n1 + n2))
      }
    }
    pools.toVector.flatMap { case (p, c, n) => Vector.fill(n)((p, c)) }
  }

  /** Exact minimax over pooled windows, as BigInt-compared rationals. */
  private def minimax(bins: Vector[Bin]): Vector[(Long, Long)] = {
    val n = bins.size
    val pp = bins.scanLeft(0L)(_ + _.pos)
    val pc = bins.scanLeft(0L)(_ + _.cnt)
    def rate(j: Int, k: Int): (Long, Long) = (pp(k + 1) - pp(j), pc(k + 1) - pc(j))
    def lt(a: (Long, Long), b: (Long, Long)): Boolean = {
      val av = if (a._2 == 0) BigInt(0) else BigInt(a._1) * (if (b._2 == 0) 1L else b._2)
      val bv = if (b._2 == 0) BigInt(0) else BigInt(b._1) * (if (a._2 == 0) 1L else a._2)
      av < bv
    }
    (0 until n).toVector.map { i =>
      var best: Option[(Long, Long)] = None
      (0 to i).foreach { j =>
        var mn: Option[(Long, Long)] = None
        (i until n).foreach { k =>
          val r = rate(j, k)
          if (mn.isEmpty || lt(r, mn.get)) mn = Some(r)
        }
        if (best.isEmpty || lt(best.get, mn.get)) best = mn
      }
      best.get
    }
  }

  private def ppm(r: (Long, Long)): Long =
    if (r._2 == 0) 0L else r._1 * 1000000L / r._2

  property("minimax identity equals sequential PAV on exact rationals") =
    Prop.forAll(genBins) { bins =>
      val a = minimax(bins).map(r => (BigInt(r._1), BigInt(r._2)))
      val b = pav(bins).map(r => (BigInt(r._1), BigInt(r._2)))
      // compare as exact rationals (empty cells rate 0)
      a.zip(b).forall { case ((p1, c1), (p2, c2)) =>
        val l = if (c1 == 0) BigInt(0) else p1 * (if (c2 == 0) 1 else c2)
        val r = if (c2 == 0) BigInt(0) else p2 * (if (c1 == 0) 1 else c1)
        l == r
      }
    }

  property("micro-rounded minimax (the query's form) is within 1 of exact, and monotone") =
    Prop.forAll(genBins) { bins =>
      val n = bins.size
      val pp = bins.scanLeft(0L)(_ + _.pos)
      val pc = bins.scanLeft(0L)(_ + _.cnt)
      val rounded = (0 until n).map { i =>
        (0 to i).map { j =>
          (i until n).map { k =>
            val c = pc(k + 1) - pc(j)
            if (c > 0) (pp(k + 1) - pp(j)) * 1000000L / c else 0L
          }.min
        }.max
      }
      val exact = minimax(bins).map(ppm)
      rounded.zip(exact).forall { case (r, e) => math.abs(r - e) <= 1 } &&
        rounded.sliding(2).forall {
          case Seq(a, b) => b >= a
          case _ => true
        }
    }

  property("the cross-multiplied P90 minimizes pinball loss over all constants (q329)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-500L, 500L))) { ys =>
      val n = ys.size.toLong
      val sorted = ys.sorted
      // q329's definition: smallest v in the domain with 10*cum >= 9*n
      val cum = sorted.distinct.map(v => v -> sorted.count(_ <= v).toLong)
      val p90 = cum.collectFirst { case (v, c) if 10 * c >= 9 * n => v }.get
      def loss10(q: Long): Long =
        ys.map(y => 9L * math.max(y - q, 0L) + math.max(q - y, 0L)).sum
      val atQ = loss10(p90)
      sorted.distinct.forall(v => atQ <= loss10(v))
    }

  property("one IPF scaling round lands its margin within one floor unit per cell") =
    Prop.forAll(Gen.chooseNum(2, 5), Gen.chooseNum(2, 5)) { (nr, nc) =>
      val rnd = new scala.util.Random(nr * 31 + nc)
      val cells = for (r <- 0 until nr; c <- 0 until nc)
        yield (r, c, 1L + rnd.nextInt(50)) // sample counts
      val target = (0 until nr).map(r => r -> (50L + rnd.nextInt(500))).toMap
      val w0 = 1000000L
      // one row-scaling round: w' = w * t * 1e6 / sum(n*w) over the row
      val rowSum = cells.groupBy(_._1).view
        .mapValues(_.map { case (_, _, n) => n * w0 }.sum).toMap
      val w1 = cells.map { case (r, c, n) =>
        (r, c, n, w0 * target(r) * 1000000L / rowSum(r))
      }
      // achieved margin in whole units vs target: within one unit per cell
      w1.groupBy(_._1).forall { case (r, cs) =>
        val achieved = cs.map { case (_, _, n, w) => n * w }.sum / 1000000L
        target(r) - achieved >= 0 && target(r) - achieved <= cs.size
      }
    }

  // ---- q402: the integer pass@k recurrence vs exact BigInt combinatorics

  /** The query's per-step floor recurrence in pico-units. */
  private def passAtKRecurrence(n: Long, c: Long, k: Long): Long = {
    var acc = 1000000000000L
    var i = 0L
    while (i < k) {
      acc = (acc * math.max(n - c - i, 0L)) / (n - i)
      i += 1
    }
    1000000L - acc / 1000000L
  }

  private def choose(n: Long, k: Long): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (BigInt(n - k + 1) to BigInt(n)).product /
      (BigInt(1) to BigInt(k)).product

  property("q402 pass@k recurrence within 1 ppm of the exact hypergeometric") =
    Prop.forAll(for {
      n <- Gen.chooseNum(1L, 200L)
      c <- Gen.chooseNum(0L, n)
      k <- Gen.chooseNum(1L, n)
    } yield (n, c, k)) { case (n, c, k) =>
      val rec = passAtKRecurrence(n, c, k)
      // exact: floor(1e6 * (1 - C(n-c,k)/C(n,k)))
      val exact =
        (BigInt(1000000) * (choose(n, k) - choose(n - c, k)) / choose(n, k)).toLong
      // the recurrence floors the FAIL probability downward (k losses of
      // < 1 pico each, never amplified since every factor is <= 1), so the
      // PASS side can only read high — by at most 2 ppm (one from the
      // pico-loss crossing a 1e6 boundary, one from floor-vs-ceil)
      rec >= exact && rec - exact <= 2L
    }

  property("q402 pass@k boundary laws: c=0 -> 0, c=n -> 1e6, k=n -> has-any") =
    Prop.forAll(for {
      n <- Gen.chooseNum(1L, 150L)
      c <- Gen.chooseNum(0L, n)
    } yield (n, c)) { case (n, c) =>
      passAtKRecurrence(n, 0L, math.max(1L, n / 2)) == 0L &&
      (c == 0L || passAtKRecurrence(n, n, 1L) == 1000000L) &&
      (if (c > 0) passAtKRecurrence(n, c, n) == 1000000L
       else passAtKRecurrence(n, c, n) == 0L)
    }

  // ---- q403: best-of-n order-statistic weights

  /** The query's per-row weight recurrence: pico C(i-1,n-1)/C(N,n). */
  private def bonWeight(nn: Long, n: Long, i: Long): Long = {
    var acc = (1000000000000L * n) / nn
    var j = 1L
    while (j <= n - 1) {
      acc = (acc * (i - j)) / (nn - j)
      j += 1
    }
    acc
  }

  property("q403 best-of-n weights sum to ~1 and concentrate on the top rank") =
    Prop.forAll(for {
      nn <- Gen.chooseNum(2L, 120L)
      n <- Gen.chooseNum(1L, nn)
    } yield (nn, n)) { case (nn, n) =>
      val ws = (1L to nn).map(i => bonWeight(nn, n, i))
      val sum = ws.sum
      // true weights sum to exactly 1e12 (hockey-stick identity); each
      // floored weight is short by < n picos (n floors, factors <= 1)
      sum <= 1000000000000L && 1000000000000L - sum <= nn * n &&
      // ranks below n carry exactly zero weight (a zero factor at j = i)
      (1L until n).forall(i => ws((i - 1).toInt) == 0L) &&
      // weights are monotone in rank (a higher rank tops at least as many
      // subsets) up to per-weight floor slack of n picos
      ws.sliding(2).forall { case Seq(a, b) => a <= b + n; case _ => true }
    }

  property("q403 best-of-1 is the mean and best-of-N is the max (floor error only)") =
    Prop.forAll(for {
      nn <- Gen.chooseNum(2L, 80L)
      rs <- Gen.listOfN(nn.toInt, Gen.chooseNum(0L, 1000L))
    } yield (nn, rs.sorted)) { case (nn, rs) =>
      val bon1 = rs.zipWithIndex
        .map { case (r, i0) => bonWeight(nn, 1L, i0 + 1L) * r }.sum / 100000000L
      val exactMean = rs.sum * 10000L / nn // micro-units of centi-rewards
      val bonN = rs.zipWithIndex
        .map { case (r, i0) => bonWeight(nn, nn, i0 + 1L) * r }.sum / 100000000L
      val exactMax = rs.max * 10000L
      (exactMean - bon1 >= 0L && exactMean - bon1 <= 10000L) &&
      (exactMax - bonN >= 0L && exactMax - bonN <= 10000L)
    }
}
