package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws of the training-mix / data-selection family (q364-q369) that the
  * row-level oracle can't see: the alpha-mixture flattens shares toward
  * uniform (the whole point of temperature sampling), Bradley-Terry ranks
  * are a permutation and strengths stay normalized, greedy k-center
  * coverage radii are non-increasing in pick order, and the conformal
  * gate's realized keep-rate sits at-or-above its nominal level on the
  * language with a large calibration split.
  */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("q364: alpha-mixture shares flatten toward uniform and sum to ~1e6") {
    val rows = run("q364_alpha_mixture")
    val n = rows.map(_.getAs[Long]("n_tokens"))
    val share = rows.map(_.getAs[Long]("share_ppm"))
    val tokTotal = n.sum.toDouble
    // each language's sampled share must sit between its raw share and
    // uniform (alpha in (0,1) contracts toward 1/K)
    rows.indices.foreach { i =>
      val raw = n(i) / tokTotal * 1e6
      val uni = 1e6 / rows.length
      val lo = math.min(raw, uni) - 1
      val hi = math.max(raw, uni) + 1
      assert(share(i) >= lo && share(i) <= hi,
        s"share ${share(i)} outside [$lo, $hi]")
    }
    assert(math.abs(share.sum - 1000000L) <= rows.length) // floor-div slack
  }

  test("q365: BT ranks are a permutation and strengths stay normalized") {
    val rows = run("q365_bradley_terry")
    val ranks = rows.map(_.getAs[Long]("rank")).sorted
    assert(ranks.toSeq == (1L to rows.length).toSeq)
    val pis = rows.map(_.getAs[Long]("bt_micro"))
    // normalization keeps sum at K*1e6 (floor-div slack per item)
    assert(math.abs(pis.sum - rows.length * 1000000L) <= rows.length)
    assert(pis.forall(_ > 0))
  }

  test("q367: k-center pick distances are non-increasing; coverage bounds them") {
    val rows = run("q367_kcenter_coreset").sortBy(_.getAs[Long]("pick_no"))
    val d = rows.map(_.getAs[Long]("dist"))
    // picks 1..3: farthest-point distances shrink (or tie) as centers accrue
    assert(d(1) >= d(2) && d(2) >= d(3), s"picks not monotone: ${d.toSeq}")
    // final coverage radius can't exceed the last pick's distance
    assert(d(4) <= d(3), s"coverage ${d(4)} > last pick ${d(3)}")
  }

  test("q370: calibrated curve is monotone and dominates the raw rates") {
    val rows = run("q370_monotone_calibration")
      .sortBy(_.getAs[Long]("bin"))
    val iso = rows.map(_.getAs[Long]("iso_ppm"))
    val raw = rows.map(_.getAs[Long]("raw_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    assert(iso.zip(raw).forall { case (i, r) => i >= r })
  }

  test("q372: ROI curve cumulative columns are monotone along the sweep") {
    val rows = run("q372_dedup_roi_curve")
      .sortBy(-_.getAs[Long]("match_sigs"))
    val dc = rows.map(_.getAs[Long]("docs_cum"))
    val bc = rows.map(_.getAs[Long]("bytes_cum"))
    assert(dc.zip(dc.tail).forall { case (a, b) => a <= b })
    assert(bc.zip(bc.tail).forall { case (a, b) => a <= b })
    assert(dc.last == rows.map(_.getAs[Long]("docs_new")).sum)
  }

  test("q375: streamed count-min never undercounts (the CMS law)") {
    val rows = run("q375_streaming_countmin")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"))
      assert(r.getAs[Long]("overcount") >= 0L)
    }
  }

  test("q369: realized keep-rate >= nominal 90% minus finite-sample slack") {
    val rows = run("q369_conformal_threshold")
    val en = rows.filter(_.getAs[String]("lang") == "en").head
    val nCal = en.getAs[Long]("n_calib")
    assert(nCal >= 20, s"fixture drift: en calibration split only $nCal")
    // split-conformal guarantee: P(keep) >= ceil(0.9(n+1))/(n+1) - slack;
    // allow generous sampling slack on the evaluation split
    val keptPpm = en.getAs[Long]("kept_ppm")
    assert(keptPpm >= 800000L, s"en kept_ppm $keptPpm way below nominal 90%")
  }

  test("q382: effective data sits between unique tokens and the raw allocation") {
    // D' = U + U*R*(1 - exp(-(R-1)/R*)) obeys U <= D' <= alloc whenever a
    // source runs at least one epoch (R*(1-e^(-x/R*)) <= x), and the
    // 4-epoch flag must agree with the emitted epochs_micro.
    val rows = run("q382_data_budget_epochs")
    assert(rows.length == 20)
    rows.foreach { r =>
      val u = r.getAs[Long]("unique_tokens")
      val eff = r.getAs[Long]("effective_tokens")
      val alloc = r.getAs[Long]("alloc_tokens")
      val ep = r.getAs[Long]("epochs_micro")
      assert(eff >= u, "repetition can only add effective data")
      if (ep >= 1000000L)
        assert(eff <= alloc, s"effective $eff exceeds allocation $alloc")
      assert(r.getAs[Boolean]("over_four_epochs") == (ep > 4000000L))
      assert(r.getAs[Long]("util_ppm") <= 1000000L || ep < 1000000L)
    }
  }

  test("q391: DoReMi weights floor at 1.0 for at-or-below-corpus loss and shares sum to ~1e6") {
    val rows = run("q391_doremi_reweight")
    assert(rows.length == 20)
    var shareSum = 0L
    rows.foreach { r =>
      val excess = r.getAs[Long]("excess_micro")
      val wm = r.getAs[Long]("weight_micro")
      if (excess == 0L) assert(wm == 1000000L, "exp(0) domain weight must be exactly 1.0")
      else assert(wm > 1000000L, "positive excess loss must upweight")
      assert(r.getAs[Boolean]("upweighted") ==
        (r.getAs[Long]("share_ppm") > r.getAs[Long]("token_ppm")))
      shareSum += r.getAs[Long]("share_ppm")
    }
    assert(shareSum > 1000000L - 20 && shareSum <= 1000000L,
      s"floor-div shares must sum to 1e6 minus at most one ulp per source, got $shareSum")
  }

  test("q394: ESS lies in [1, k] domains and the collapse flag matches the 0.5k rule") {
    val r = run("q394_ess_diagnostic").head
    val k = r.getAs[Long]("n_domains")
    val essMilli = r.getAs[Long]("ess_milli_domains")
    assert(essMilli >= 1000L - 1 && essMilli <= k * 1000L,
      s"Kish ESS must lie in [1, k=$k] domains, got $essMilli milli")
    assert(r.getAs[Boolean]("collapsed") == (r.getAs[Long]("ess_ppm") < 500000L))
  }

  test("q397: holdout votes partition into scored + undecided; accuracy is a proper rate") {
    val r = run("q397_preference_holdout").head
    val (total, scored, undecided) = (r.getAs[Long]("n_test_votes"),
      r.getAs[Long]("n_scored"), r.getAs[Long]("n_undecided"))
    assert(scored + undecided == total)
    val acc = r.getAs[Long]("acc_ppm")
    assert(acc >= 0L && acc <= 1000000L)
    assert(r.getAs[Long]("n_correct") * 1000000L / scored == acc)
  }

  test("q400: planner invariants — shares near 1e6, epochs consistent, effective bounded") {
    val rows = run("q400_mix_planner")
    assert(rows.length == 20)
    var shareSum = 0L
    rows.foreach { r =>
      shareSum += r.getAs[Long]("share_ppm")
      val (alloc, rt, ep) = (r.getAs[Long]("alloc_tokens"),
        r.getAs[Long]("release_tokens"), r.getAs[Long]("epochs_micro"))
      assert(ep == alloc * 1000000L / rt, "epochs must equal alloc/release")
      val eff = r.getAs[Long]("effective_tokens")
      assert(eff >= rt, "repetition only adds effective data")
      if (ep >= 1000000L) assert(eff <= alloc,
        "effective data cannot exceed the raw allocation")
      assert(r.getAs[Long]("n_docs_kept") >= 1L)
    }
    assert(shareSum > 1000000L - 20 && shareSum <= 1000000L)
  }

  test("q386: direct triple-join cyclic count equals Kendall's closed form on the complete tournament") {
    val r = run("q386_preference_cycles").head
    assert(r.getAs[Long]("n_decided") == r.getAs[Long]("n_pairs"),
      "fixture tournament must be complete for the closed-form cross-check")
    assert(r.getAs[Long]("cyclic_triads") == r.getAs[Long]("kendall_cyclic"),
      "triple join and degree formula must agree")
    val (dt, cy) = (r.getAs[Long]("decided_triples"), r.getAs[Long]("cyclic_triads"))
    assert(dt >= cy)
    assert(r.getAs[Long]("consistency_ppm") == (dt - cy) * 1000000L / dt)
  }
}
