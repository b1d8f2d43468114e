package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the web-corpus operators that the hash oracles can't state
  * directly: count-min's one-sided error and mergeability under any
  * partitioning, canonicalization idempotence (a canon URL re-canonicalizes
  * to itself), and the mixture's expectation contract.
  */
class WebCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("count-min estimates are one-sided and partitioning-invariant") {
    import spark.implicits._
    val cms = udaf(operators.WebCorpus.CmsSketch)
    // 2000 tokens over a 300-key space — far above the 64-counter width,
    // so bucket collisions are guaranteed
    val data: Seq[Long] = (0 until 2000).map(i => (i * i % 300).toLong)
    val exact = data.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
    def sketchOf(parts: Int): Array[Long] =
      spark.createDataset(data).repartition(parts).toDF("h")
        .agg(cms($"h")).as[Array[Long]].head()
    val sk1 = sketchOf(1)
    val sk8 = sketchOf(8) // partial sketches merged across 8 partitions
    assert(sk1.sameElements(sk8),
      "merge must be exact: 8-way partial aggregation differs from sequential")
    val (d, w) = (operators.WebCorpus.CmsDepth, operators.WebCorpus.CmsWidth)
    val n = data.size
    for ((h, c) <- exact) {
      val est = (0 until d).map { dd =>
        val b = (((2 * dd + 1) * h + 1000003L * dd + 12345L) %
          graft.functions.TextHash.P % w).toInt
        sk8(dd * w + b)
      }.min
      assert(est >= c, s"CMS must never undercount: key $h est $est < true $c")
      assert(est - c <= 2L * n / w * d,
        s"key $h overcount ${est - c} implausibly large for depth-$d width-$w")
    }
  }

  test("URL canonicalization is idempotent (canon(canon(u)) = canon(u))") {
    // Run q164, then feed its canon_url back through the same parse +
    // canonicalize expressions; every row must be a fixed point — the
    // property that makes incremental re-crawls stable.
    import spark.implicits._
    val canon = SparkEntry.queries("q164_url_canonicalize")(spark, dir)
      .select($"doc_id", $"canon_url")
    try {
      val again = canon.select($"doc_id", $"canon_url".as("url"))
        .withColumn("scheme", expr("lower(regexp_extract(url, '^([A-Za-z]+)://', 1))"))
        .withColumn("auth", expr("lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))"))
        .withColumn("pathq", expr("regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1)"))
        .withColumn("again", expr(operators.WebCorpus.canonUrlSqlForTest))
        .filter($"again" =!= $"url")
      assert(again.count() === 0, "canonicalization must be a fixed point")
      // and it actually merges variants: fewer distinct canon urls than docs
      val docs = canon.count()
      val distinctCanon = canon.select($"canon_url").distinct().count()
      assert(distinctCanon < docs, "fixture variants should collapse")
    } finally CacheScope.release()
  }

  test("mixture rates land the expected sample near the target") {
    import spark.implicits._
    val out = SparkEntry.queries("q165_source_mixture")(spark, "/root/testdata/sf0.01")
    try {
      val rows = out.collect()
      val expected = rows.map(r =>
        r.getAs[Long]("n_docs") * r.getAs[Long]("rate_ppm") / 1000000.0).sum
      // the rate table is built to make the expectation ~MixTarget (200);
      // hash-threshold realization then lands within sampling noise
      assert(math.abs(expected - 200.0) < 2.0,
        s"expected sample size $expected drifted from the 200 target")
      val sampled = rows.map(_.getAs[Long]("n_sampled")).sum
      assert(math.abs(sampled - 200.0) < 45.0,
        s"realized sample $sampled implausibly far from the 200 target")
      // flattening property: smallest group is sampled at a HIGHER rate
      val byN = rows.sortBy(_.getAs[Long]("n_docs"))
      assert(byN.head.getAs[Long]("rate_ppm") > byN.last.getAs[Long]("rate_ppm"),
        "alpha=0.5 must up-weight the smallest source group")
    } finally CacheScope.release()
  }

  test("robots.txt evaluator: RFC 9309 group selection, longest match, " +
    "Allow tie-break, comments, shared agent lines") {
    import graft.functions.Robots
    val txt =
      """# top comment
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /a    # trailing comment
        |Allow: /a/ok
        |Crawl-delay: 5
        |
        |User-agent: *
        |Disallow: /b
        |Disallow:
        |""".stripMargin
    val g = Robots.parse(txt)
    // consecutive User-agent lines share the rule block
    assert(g("graftbot") == g("otherbot"))
    assert(g("graftbot") ==
      Vector(Robots.Rule(false, "/a"), Robots.Rule(true, "/a/ok")))
    // empty Disallow contributes no rule; crawl-delay ignored
    assert(g("*") == Vector(Robots.Rule(false, "/b")))
    // group selection: specific over *, prefix agent match, else * fallback,
    // else allow-all
    assert(Robots.groupFor(g, "GraftBot/1.2") == g("graftbot"))
    assert(Robots.groupFor(g, "strangerbot") == g("*"))
    assert(Robots.groupFor(Map.empty, "anyone") == Vector.empty)
    // longest-prefix match: the /a/ok Allow overrides the /a Disallow
    assert(Robots.evaluate(g("graftbot"), "/a/ok/page") == ((true, true)))
    assert(Robots.evaluate(g("graftbot"), "/a/page") == ((false, false)))
    assert(Robots.evaluate(g("graftbot"), "/c/page") == ((true, false)))
    // Allow wins an exact length tie
    val tie = Vector(Robots.Rule(false, "/x"), Robots.Rule(true, "/x"))
    assert(Robots.evaluate(tie, "/x/1") == ((true, true)))
    // longer Disallow beats shorter Allow
    val rev = Vector(Robots.Rule(true, "/a"), Robots.Rule(false, "/a/b"))
    assert(Robots.evaluate(rev, "/a/b/c") == ((false, false)))
    assert(Robots.evaluate(rev, "/a/c") == ((true, false)))
  }
}
