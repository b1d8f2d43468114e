package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Connected components by ALTERNATING STAR CONTRACTION (the large-star /
  * small-star algorithm of Kiveris et al. 2014, "Connected Components in
  * MapReduce and Beyond") — the O(log d)-round upgrade over q106's
  * min-label propagation (O(diameter) rounds): each round is two
  * keyed aggregations + joins, and the edge set monotonically contracts
  * toward a star forest rooted at each component's minimum id. At 100 TB
  * the round count is what matters — a long-chain component costs label
  * propagation one round per hop, star contraction a logarithmic number.
  *
  * Two implementations of the SAME rounds: a pure Set-based one (law-
  * tested by StarContractionProps against union-find ground truth on
  * random graphs) and the distributed DataFrame one (q457; QueriesSpec
  * additionally pins q457 == q106 on the fixture — two different
  * algorithms, one answer).
  */
object StarContraction {

  // ---- pure reference implementation (law-testing surface) ----

  /** One large-star round: for each node u, connect every LARGER neighbor
    * to the minimum of u's closed neighborhood.
    */
  def largeStar(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
    val sym = edges.iterator.flatMap { case (a, b) =>
      if (a == b) Iterator.empty else Iterator(a -> b, b -> a)
    }.toSeq
    sym.groupBy(_._1).iterator.flatMap { case (u, es) =>
      val nbrs = es.map(_._2)
      val m = (nbrs :+ u).min
      nbrs.filter(_ > u).map(v => (v, m))
    }.filter(e => e._1 != e._2).toSet
  }

  /** One small-star round: orient edges toward the larger endpoint; for
    * each node u, connect u and all its smaller neighbors to their
    * minimum.
    */
  def smallStar(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
    val o = edges.iterator.collect {
      case (a, b) if a != b => if (a > b) (a, b) else (b, a)
    }.toSeq
    o.groupBy(_._1).iterator.flatMap { case (u, es) =>
      val nbrs = es.map(_._2) // all < u
      val m = nbrs.min
      (nbrs.filterNot(_ == m) :+ u).map(v => (v, m))
    }.filter(e => e._1 != e._2).toSet
  }

  private def canon(e: Set[(Long, Long)]): Set[(Long, Long)] =
    e.collect { case (a, b) if a != b => if (a > b) (a, b) else (b, a) }

  /** Pure components: node -> component minimum, for every node that
    * appears in an edge.
    */
  def components(edges: Set[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] = {
    var cur = canon(edges)
    var rounds = 0
    var done = cur.isEmpty
    while (!done) {
      val next = canon(smallStar(largeStar(cur)))
      rounds += 1
      require(rounds <= maxRounds, s"star contraction did not converge in $maxRounds rounds")
      if (next == cur) done = true else cur = next
    }
    val labels = cur.map { case (v, m) => v -> m }.toMap
    labels ++ cur.map(_._2).map(m => m -> m)
  }

  /** Distributed components over an edge DataFrame with columns (a, b):
    * returns (doc_id, cluster). Rounds are driver-unrolled with a
    * localCheckpoint per round (the q106/q229 iterative discipline);
    * convergence = the canonical edge set reaches a fixpoint.
    */
  def componentsDF(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    def canonDF(e: DataFrame): DataFrame =
      e.filter($"a" =!= $"b")
        .select(greatest($"a", $"b").as("a"), least($"a", $"b").as("b"))
        .distinct()
    def largeStarDF(e: DataFrame): DataFrame = {
      val sym = e.select($"a", $"b")
        .unionAll(e.select($"b".as("a"), $"a".as("b")))
      val mins = sym.groupBy($"a")
        .agg(least(min($"b"), $"a").as("m"))
      sym.filter($"b" > $"a").join(mins, "a")
        .select($"b".as("a"), $"m".as("b"))
        .filter($"a" =!= $"b").distinct()
    }
    def smallStarDF(e: DataFrame): DataFrame = {
      val o = canonDF(e) // (a > b) orientation
      val mins = o.groupBy($"a").agg(min($"b").as("m"))
      o.join(mins, "a")
        .filter($"b" =!= $"m")
        .select($"b".as("a"), $"m".as("b"))
        .unionAll(mins.select($"a", $"m".as("b")))
        .filter($"a" =!= $"b").distinct()
    }
    var cur = canonDF(edges).localCheckpoint(true)
    // memoize each round's edge count: the fixpoint test needs this
    // round's count and LAST round's, so recounting `cur` every round was
    // one redundant job per round (driver-job overhead dominates the late,
    // tiny rounds)
    var curCount = cur.count()
    var rounds = 0
    var done = curCount == 0
    while (!done) {
      val next = canonDF(smallStarDF(largeStarDF(cur))).localCheckpoint(true)
      rounds += 1
      require(rounds <= maxRounds,
        s"star contraction did not converge in $maxRounds rounds")
      // fixpoint: same count and no edge outside the previous set
      val nextCount = next.count()
      val changed = nextCount != curCount ||
        next.as("n").join(cur.as("c"),
          $"n.a" === $"c.a" && $"n.b" === $"c.b", "left_anti").count() > 0
      if (!changed) done = true
      cur = next
      curCount = nextCount
    }
    cur.select($"a".as("doc_id"), $"b".as("cluster"))
      .unionAll(cur.select($"b", $"b").distinct()
        .toDF("doc_id", "cluster"))
      .distinct()
  }
}
