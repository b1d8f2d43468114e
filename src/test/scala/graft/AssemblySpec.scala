package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the example-assembly/accounting batch (q411-q418) that the
  * hash oracle cannot state: partition invariants of the FIM split, the
  * packing audits' conservation laws, the floor∘sqrt exactness margin the
  * DP accountant relies on, and batch/streaming twin equality.
  */
class AssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    try SparkEntry.queries(name)(spark, dir).collect()
    finally CacheScope.release()

  test("q411 FIM spans partition each document (aggregate invariants)") {
    val rows = run("q411_fim_spans")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("spm_docs") >= 0 && r.getAs[Long]("spm_docs") <= n)
      // middle ⊆ doc: per-doc 0 <= b-a <= L sums to 0 <= sum_middle <= sum_chars
      assert(r.getAs[Long]("sum_middle") >= 0)
      assert(r.getAs[Long]("sum_middle") <= r.getAs[Long]("sum_chars"))
      assert(r.getAs[Long]("middle_share_ppm") <= 1000000L)
      assert(r.getAs[Long]("max_middle") * n >= r.getAs[Long]("sum_middle"))
    }
  }

  test("q412 packing chunks conserve tokens and pair counts") {
    val rows = run("q412_packing_contamination")
    assert(rows.length > 1, "fixture should span multiple context windows")
    // chunk ids are dense 0..K-1; every window is full except the last
    val byChunk = rows.sortBy(_.getAs[Long]("chunk"))
    byChunk.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("chunk") == i.toLong, "chunk ids must be dense")
      val clen = r.getAs[Long]("clen")
      if (i < byChunk.length - 1) assert(clen == 128L)
      assert(clen >= 1 && clen <= 128)
      val totalPairs = clen * (clen - 1) / 2
      val cross = r.getAs[Long]("cross_pairs")
      assert(cross >= 0 && cross <= totalPairs)
      // a window holding d docs has at least d-1 boundary-adjacent
      // cross pairs unless it is degenerate (clen < 2)
      if (clen >= 2 && r.getAs[Long]("n_docs") >= 2) assert(cross > 0)
    }
  }

  test("q415 window mixture entropy is bounded by ln(n_sources)") {
    val rows = run("q415_window_mixture")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("entropy_micro")
      val k = r.getAs[Long]("n_sources")
      assert(h >= 0)
      if (k == 1) assert(h == 0, "single-source window must have zero entropy")
      // micro-floor slack: each of the <= k terms rounds by < 1 micro-unit
      assert(h <= math.ceil(math.log(k.toDouble) * 1e6).toLong + k)
    }
    assert(rows.exists(_.getAs[Long]("n_sources") > 1),
      "fixture should produce at least one mixed window")
  }

  test("q416 dependency preservation decays from short to long spans") {
    val rows = run("q416_chunking_dependency_loss")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("preserved_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(r.getAs[Long]("n_preserved") <= r.getAs[Long]("n_deps"))
    }
    val byBand = rows.sortBy(_.getAs[Long]("band"))
    if (byBand.length >= 2) {
      // a window cannot hold a span longer than itself minus one; and the
      // shortest band must preserve strictly better than the longest
      assert(byBand.head.getAs[Long]("preserved_ppm") >
        byBand.last.getAs[Long]("preserved_ppm"))
    }
  }

  test("TwoPhaseCumsum equals the naive global running sum (random inputs)") {
    // the helper must agree with SUM OVER (ORDER BY id) for any id set —
    // sparse ids, empty blocks, multiple partition keys, values of zero
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val rows = (1 to 500).map { _ =>
      (math.abs(rnd.nextLong()) % 10000L, // sparse ids over ~156 blocks
        if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(50).toLong)
    }.distinctBy(r => (r._1, r._2))
    val df = rows.toDF("id", "k", "v")
    val got = TwoPhaseCumsum.cumBefore(df, Seq("k"), "id", "v")
      .select($"k", $"id", $"cum_before").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._2).flatMap { case (k, rs) =>
      rs.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), r) =>
        (r._1, acc + r._3)
      }.sliding(2).collect { case Seq((_, acc), (id, _)) => (k, id) -> acc }
    }
    assert(got.size == rows.size)
    want.foreach { case (key, exp) =>
      assert(got(key) == exp, s"$key: got ${got(key)} want $exp")
    }
  }

  test("TwoPhaseCumsum block size follows the session conf") {
    // production raises spark.graft.cumsum.block so the in-block windows
    // and the block table both stay bounded; the answer must not change
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, i % 7)).toDF("id", "v")
    def run() = TwoPhaseCumsum.cumBefore(df, Nil, "id", "v")
      .select($"id", $"cum_before", $"blk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = run()
    spark.conf.set(TwoPhaseCumsum.BlockConf, "128")
    try {
      val wide = run()
      assert(wide.map(t => (t._1, t._2)).toSet ==
        base.map(t => (t._1, t._2)).toSet)
      assert(wide.map(_._3).max == 299L / 128L) // conf actually applied
      assert(base.map(_._3).max == 299L / TwoPhaseCumsum.Block)
      spark.conf.set(TwoPhaseCumsum.BlockConf, "0")
      assertThrows[IllegalArgumentException](run())
    } finally spark.conf.unset(TwoPhaseCumsum.BlockConf)
  }

  test("floor(sqrt(x)) is the exact integer sqrt on the DP operand range") {
    // eps_centi relies on IEEE-correctly-rounded SQRT never rounding up
    // across an integer boundary; exhaustive boundary probes + random
    // points over the operand bound rho_centi*lc <= ~1e9 << 2^40.
    def check(x: Long): Unit = {
      val r = math.floor(math.sqrt(x.toDouble)).toLong
      assert(r * r <= x && (r + 1) * (r + 1) > x, s"x=$x r=$r")
    }
    val rnd = new java.util.Random(42)
    (1 to 100000).foreach(_ => check(math.abs(rnd.nextLong()) % (1L << 40)))
    // the hard cases sit one off a perfect square
    (1 to 20000).foreach { _ =>
      val n = 1L + math.abs(rnd.nextLong()) % ((1L << 20) - 2)
      Seq(n * n - 1, n * n, n * n + 1).foreach(check)
    }
    Seq(0L, 1L, 3L, 4L, (1L << 20) * ((1L << 20) + 2), (1L << 40) - 1).foreach(check)
  }

  test("q413 ledger: total row composes the per-type rows; eps matches float form") {
    val rows = run("q413_dp_accountant")
    val (tot, parts) = rows.partition(_.getAs[String]("event_type") == "__total")
    assert(tot.length == 1 && parts.nonEmpty)
    assert(tot.head.getAs[Long]("n_queries") ==
      parts.map(_.getAs[Long]("n_queries")).sum)
    assert(tot.head.getAs[Long]("rho_pico") ==
      parts.map(_.getAs[Long]("rho_pico")).sum)
    rows.foreach { r =>
      val rho = r.getAs[Long]("rho_pico") / 1e12
      // the centi-unit ledger truncates ln(1e6) at centi resolution: the
      // readout may undershoot the real-valued eps by up to ~0.2% of the
      // sqrt term, never overshoot by more than 1 centi of rounding
      val eps = rho + 2 * math.sqrt(rho * math.log(1e6))
      val got = r.getAs[Long]("eps_centi") / 100.0
      assert(got <= eps + 0.02, s"${r.getAs[String]("event_type")}: $got > $eps")
      assert(got >= eps - 0.005 * eps - 0.03,
        s"${r.getAs[String]("event_type")}: $got too far below $eps")
    }
  }

  test("q417 recovers exactly the planted single-token mutants") {
    val rows = run("q417_deletion_neighborhood")
    // one mutant is planted per 50th doc; the blocking + verify must
    // find each planted pair and nothing else on this fixture
    assert(rows.length == 10)
    rows.foreach { r =>
      val a = r.getAs[Long]("a_id")
      assert(a % 50 == 0, s"unexpected base doc $a")
      assert(r.getAs[Long]("b_id") == a + 1000000000000L)
      val p = r.getAs[Long]("diff_pos")
      assert(p >= 1 && p <= r.getAs[Long]("len"))
    }
  }

  test("q418 branching entropy respects its information bounds") {
    val rows = run("q418_branching_entropy")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("cond_entropy_micro")
      val nTriples = r.getAs[Long]("n_triples")
      val det = r.getAs[Long]("deterministic_ppm")
      assert(h >= 0 && det >= 0 && det <= 1000000L)
      // H(next | ctx) <= ln(branching) <= ln(n_triples); micro slack for
      // the per-term floors
      assert(h <= math.ceil(math.log(nTriples.toDouble) * 1e6).toLong + nTriples)
      if (det == 1000000L) assert(h == 0)
    }
  }

  test("q414 streaming ledger equals q413 batch ledger row for row") {
    val batch = run("q413_dp_accountant").map(_.toString).sorted
    val streamed = run("q414_streaming_dp_ledger").map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("q419 streaming FIM accounting equals q411 batch accounting row for row") {
    val batch = run("q411_fim_spans").map(_.toString).sorted
    val streamed = run("q419_streaming_fim_spans").map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("q429 waste ordering: concat <= bucketed <= pad-each-doc per source") {
    // Provable dominance the hash oracle can't state as a law: concat's
    // ceil(T/64) is the fewest contexts any strategy can use, and a
    // 16-bucket context holds at least one residual, so bucketed contexts
    // never exceed pad-each-doc's one-per-residual. Waste is monotone in
    // contexts at fixed T.
    val rows = run("q429_padding_waste")
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val w = rs.map(r =>
        r.getAs[String]("strategy") -> r.getAs[Long]("waste_ppm")).toMap
      assert(w("concat_chunk") <= w("bucket16_pack"),
        s"$src: concat must not out-waste bucketed")
      assert(w("bucket16_pack") <= w("pad_each_doc"),
        s"$src: bucketed must not out-waste pad-each-doc")
      w.values.foreach(v => assert(v >= 0L && v < 1000000L))
    }
  }
}
