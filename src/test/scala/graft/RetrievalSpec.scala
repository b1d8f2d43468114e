package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the retrieval/maintenance batch (q169-q172) that the hash
  * oracles can't state directly: BM25's tf saturation and idf ordering,
  * boilerplate removal actually removing the planted frame, incremental
  * aggregation's cutoff-invariance, and MaxSim's self-similarity bound.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q169 BM25: scores bounded by sum of positive idf, tf saturates") {
    import spark.implicits._
    val out = SparkEntry.queries("q169_bm25_topk")(spark, dir)
    try {
      val rows = out.collect()
      assert(rows.length == 20, "top-k must fill at sf0.001")
      // ranked output: scores non-increasing, doc_id tie-break ascending
      val scores = rows.map(_.getAs[Long]("score_pico"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing down the ranking")
      // every returned doc matched at least one of the <= 5 query terms
      val matches = rows.map(_.getAs[Long]("n_match"))
      assert(matches.forall(m => m >= 1 && m <= 5))
    } finally CacheScope.release()
  }

  test("q169 BM25 monotonicity: higher tf scores higher, all else equal") {
    // Two synthetic docs of identical length, one with the query term twice:
    // the doubled-tf doc must score strictly higher, and the increment must
    // be smaller than the first occurrence's (saturation: concave in tf).
    // Uses the same integer formula as the query (k1=1.2, b=0.75).
    def frac(tf: Long, dl: Long, a: Long): Long =
      (22 * tf * a * 1000000L) / (10 * tf * a + 3 * a + 9 * dl * 1000000L)
    val a = 10000000L // avgdl 10 tokens, micro units
    val s1 = frac(1, 10, a)
    val s2 = frac(2, 10, a)
    val s3 = frac(3, 10, a)
    assert(s2 > s1, "tf=2 must beat tf=1")
    assert(s3 - s2 < s2 - s1, "marginal gain must shrink (saturation)")
    assert(s3 < 2200000L, "fraction bounded by k1+1 = 2.2")
  }

  test("q170 line dedup removes the planted frame from every document") {
    import spark.implicits._
    val out = SparkEntry.queries("q170_line_dedup")(spark, dir)
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // header + footer are planted in every doc and are above any sane
      // document-frequency threshold, so every doc must lose >= 2 lines
      assert(rows.forall(r =>
        r.getAs[Long]("n_lines") - r.getAs[Long]("n_kept") >= 2L),
        "every doc must shed at least its nav header and copyright footer")
      // but the dedup must not erase the documents wholesale
      assert(rows.exists(r => r.getAs[Long]("n_kept") > 0L),
        "real content lines must survive")
    } finally CacheScope.release()
  }

  test("q171 incremental merge is invariant to the cutoff date") {
    import spark.implicits._
    // The oracle certifies merge(base, delta) == full recompute at the
    // query's fixed cutoff; this pins the stronger law — ANY cutoff yields
    // the same merged state — by re-running the merge logic at a different
    // split point and comparing to the query's own output.
    val q = SparkEntry.queries("q171_incremental_agg")(spark, dir)
    try {
      val orders = Tables.load(spark, dir, "orders")
        .select($"o_custkey", $"o_orderdate",
          expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("pn"), sum($"cents").as("ps"))
      val cut = lit("1994-03-15").cast("timestamp") // a different split point
      val base = partial(orders.filter($"o_orderdate" < cut))
        .select($"o_custkey", $"pn".as("bn"), $"ps".as("bs"))
      val delta = partial(orders.filter($"o_orderdate" >= cut))
        .select($"o_custkey", $"pn".as("dn"), $"ps".as("ds"))
      val other = base.join(delta, Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          (coalesce($"bn", lit(0L)) + coalesce($"dn", lit(0L))).as("n_orders"),
          (coalesce($"bs", lit(0L)) + coalesce($"ds", lit(0L))).as("sum_cents"))
      assert(q.exceptAll(other).isEmpty && other.exceptAll(q).isEmpty,
        "merged state must not depend on where the base/delta cutoff falls")
    } finally CacheScope.release()
  }

  test("q172 MaxSim: a vector's best match is itself") {
    import spark.implicits._
    // The query excludes self-pairs; this pins WHY that is needed — with
    // self included, MaxSim(q, q) dominates every cross score, because each
    // query token's max-dot is against its own (identical) token.
    val e = Tables.load(spark, dir, "embeddings").limit(20)
    val gm = e.agg(max(expr(
      "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")).as("gm"))
    val tok = e.crossJoin(broadcast(gm))
      .select($"vec_id", explode(expr("sequence(0, 3)")).as("t"), $"embedding", $"gm")
      .withColumn("tv", expr(
        "transform(slice(embedding, t*16+1, 16), " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / gm + 0.5) AS BIGINT))"))
      .select($"vec_id", $"t", $"tv")
    val pairs = tok.select($"vec_id".as("q_id"), $"t".as("qt"), $"tv".as("qv"))
      .join(tok.select($"vec_id".as("cand_id"), $"t".as("dt"), $"tv".as("dv")),
        lit(true), "inner")
      .withColumn("dot", expr(
        "aggregate(zip_with(qv, dv, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .groupBy($"q_id", $"cand_id", $"qt").agg(max($"dot").as("md"))
      .groupBy($"q_id", $"cand_id").agg(sum($"md").as("score"))
    val best = pairs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"score".desc, $"cand_id")))
      .filter($"rn" === 1)
    assert(best.filter($"q_id" =!= $"cand_id").count() == 0,
      "self must be the argmax of MaxSim for every query vector")
  }
}
