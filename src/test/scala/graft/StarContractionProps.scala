package graft

import graft.operators.StarContraction
import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

/** Laws for the alternating large-star/small-star contraction on RANDOM
  * graphs against union-find ground truth — the fixture's shallow dup
  * components (pairs, the odd triple) could never distinguish a subtly
  * wrong star rule; long chains, cliques-with-tails, and disconnected
  * clutter can.
  */
object StarContractionProps extends Properties("StarContraction") {

  private def unionFind(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // label every touched node with its component MINIMUM
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val byRoot = nodes.groupBy(find)
    nodes.map(n => n -> byRoot(find(n)).min).toMap
  }

  private val genEdges: Gen[Set[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 40)
    m <- Gen.chooseNum(1, 70)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, n.toLong - 1)
      b <- Gen.chooseNum(0L, n.toLong - 1)
    } yield (a, b))
  } yield es.toSet

  property("components == union-find minima on random graphs") =
    Prop.forAll(genEdges) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      (real.nonEmpty ==> {
        val got = StarContraction.components(real)
        val want = unionFind(real)
        (got == want) :| s"star=$got uf=$want"
      })
    }

  property("a long chain contracts (the O(log d) case propagation pays " +
    "O(d) for)") = Prop.forAll(Gen.chooseNum(2, 200)) { len =>
    val chain = (0 until len).map(i => (i.toLong, i.toLong + 1)).toSet
    val got = StarContraction.components(chain)
    got.values.forall(_ == 0L) && got.size == len + 1
  }

  property("each round preserves connectivity (large then small star)") =
    Prop.forAll(genEdges) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      (real.nonEmpty ==> {
        val after = StarContraction.smallStar(StarContraction.largeStar(real))
        // node set may only gain the component minima (already present);
        // component structure must be identical where nodes survive
        val want = unionFind(real)
        val got = unionFind(after)
        got.forall { case (n, m) => want(n) == m }
      })
    }
}
