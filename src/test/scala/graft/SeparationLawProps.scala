package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck law behind q312's zero-pairs class-separation plan: the
  * sufficient-statistics identities must equal the brute-force pairwise
  * sums EXACTLY (integer arithmetic, no tolerance) for any integer vector
  * sets —
  *   Σ_{i≠j∈A} ||xi−xj||²          = 2·(n_A·Q_A − ||S_A||²)
  *   Σ_{i∈A, j∈B} ||xi−xj||²      = n_B·Q_A + n_A·Q_B − 2·⟨S_A,S_B⟩
  * where S is the per-dim sum vector and Q = Σ||x||². This is what lets
  * the operator run as ONE aggregation over any corpus size.
  */
object SeparationLawProps extends Properties("SeparationLaw") {

  private val dims = 6
  private val genVec: Gen[Vector[Long]] =
    Gen.listOfN(dims, Gen.chooseNum(-127L, 127L)).map(_.toVector)
  private val genSet: Gen[Vector[Vector[Long]]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, genVec)).map(_.toVector)

  private def sq(a: Vector[Long], b: Vector[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def stats(vs: Vector[Vector[Long]]): (Long, Vector[Long], Long) =
    (vs.size.toLong,
      vs.transpose.map(_.sum),
      vs.map(v => v.map(x => x * x).sum).sum)

  property("intra identity equals brute-force pairwise sum") =
    Prop.forAll(genSet) { vs =>
      val brute = (for (i <- vs.indices; j <- vs.indices if i != j)
        yield sq(vs(i), vs(j))).sum
      val (n, s, q) = stats(vs)
      brute == 2L * (n * q - s.map(x => x * x).sum)
    }

  property("inter identity equals brute-force cross sum") =
    Prop.forAll(genSet, genSet) { (a, b) =>
      val brute = (for (x <- a; y <- b) yield sq(x, y)).sum
      val (na, sa, qa) = stats(a)
      val (nb, sb, qb) = stats(b)
      val dot = sa.zip(sb).map { case (x, y) => x * y }.sum
      brute == nb * qa + na * qb - 2L * dot
    }
}
