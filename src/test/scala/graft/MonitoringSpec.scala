package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Laws behind the monitoring family that the fixture oracles can't state:
  * the CUSUM prefix-min closed form must equal the textbook recursion on
  * ANY series (that identity is what makes the detector two window passes
  * instead of a sequential fold), and the detector must actually fire on a
  * planted level shift while staying quiet on the flat series.
  */
object MonitoringSpec extends Properties("Monitoring") {

  /** Textbook recursion: S_t = max(0, S_{t-1} + x_t - k). */
  private def recursive(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L) { case (s, x) => math.max(0L, s + x - k) }.tail

  /** The engine's closed form: S_t = P_t - min(0, min_{j<=t} P_j) with
    * P_t = sum_{i<=t} (x_i - k).
    */
  private def closedForm(xs: Seq[Long], k: Long): Seq[Long] = {
    val p = xs.scanLeft(0L) { case (s, x) => s + x - k }.tail
    val runMin = p.scanLeft(Long.MaxValue)(math.min).tail
    p.zip(runMin).map { case (pt, m) => pt - math.min(0L, m) }
  }

  property("closed form equals the recursion on any series") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L)),
      Gen.chooseNum(1L, 300L)) { (xs, k) =>
      closedForm(xs, k) == recursive(xs, k)
    }

  property("planted level shift alarms; the flat series never does") =
    Prop.forAll(Gen.chooseNum(5, 20)) { n =>
      val k = 100L
      val flat = Seq.fill(n)(100L)
      val shifted = flat ++ Seq.fill(10)(160L) // +60% sustained
      val quiet = closedForm(flat, k).forall(_ < k)
      val fired = closedForm(shifted, k).exists(_ >= k)
      quiet && fired
    }

  property("fixed KS T_micro reaches the BH thresholds under real drift") =
    // The round-7 bug divided T by an extra n1*n2, collapsing it to ~0 for
    // any realistic n — no drift could ever flag. With the correct
    // T = mx^2/(n1*n2*(n1+n2)): two clearly different samples (one all
    // below, one all above a split point) give D=1, so T = n1*n2/(n1+n2)
    // >= min(n1,n2)/2, which crosses the strictest q320 threshold
    // (3.342306 in natural units) for min(n1,n2) >= 7.
    Prop.forAll(Gen.chooseNum(10L, 3000L), Gen.chooseNum(10L, 3000L)) {
      (n1, n2) =>
        val mx = n1 * n2 // max |cum_in*n2 - cum_out*n1| at total separation
        val tMicro = (BigInt(1000000) * BigInt(mx) * BigInt(mx) /
          (BigInt(n1) * BigInt(n2) * BigInt(n1 + n2))).toLong
        val buggy = (BigInt(1000000) * BigInt(mx) * BigInt(mx) /
          (BigInt(n1) * BigInt(n2) * BigInt(n1 + n2) *
            BigInt(n1) * BigInt(n2))).toLong
        tMicro >= 3342306L && buggy < 1844440L // fixed fires; old never did
    }

  property("SPRT llr walk is linear in the prefix counts") =
    Prop.forAll(Gen.listOf(Gen.oneOf(0L, 1L))) { trials =>
      val la = 200671L
      val lb = -50010L
      // stepwise accumulation == closed form s*la + (n-s)*lb at every t
      val steps = trials.scanLeft(0L) { case (llr, y) =>
        llr + (if (y == 1L) la else lb)
      }.tail
      val closed = trials.inits.toSeq.reverse.drop(1).map { pre =>
        val s = pre.count(_ == 1L).toLong
        s * la + (pre.size - s) * lb
      }
      steps == closed
    }
}
