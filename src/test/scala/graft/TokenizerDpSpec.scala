package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for q423's weighted-Viterbi DP + backtrace generators
  * (TextAnalysis.emDpSpark / emBacktraceSpark) against an independent
  * reference DP, over seeded-random words and vocabularies. The oracle
  * hash pins the fixture corpus; this pins the ALGORITHM on inputs the
  * fixture never produces (missing multi-char coverage, cost ties,
  * pathological repetition).
  *
  * Checked per word: (1) the backtraced pieces concatenate exactly to the
  * word; (2) every piece is in the vocabulary; (3) the sum of packed piece
  * costs (cost*1024 + 1) equals best[len] — the path REALIZES the DP
  * value; (4) best[len] equals an independently coded reference DP's
  * minimum — the DP value is actually optimal.
  */
class TokenizerDpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceBest(word: String, cost: Map[String, Long]): Long = {
    val inf = graft.operators.TextAnalysis.EmInf.toLong
    val n = word.length
    val best = Array.fill(n + 1)(Long.MaxValue / 4)
    best(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(4, i)) {
      val c = cost.getOrElse(word.substring(i - l, i), inf)
      val cand = best(i - l) + c * 1024 + 1
      if (cand < best(i)) best(i) = cand
    }
    best(n)
  }

  test("DP + backtrace match the reference on seeded random words/vocabs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab"
    (0 until 3).foreach { round =>
      // vocab: all single chars + random multi-char pieces, random costs
      val singles = alphabet.map(_.toString)
      val multis = (0 until 12).map { _ =>
        val l = 2 + rnd.nextInt(3)
        (0 until l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct.filterNot(singles.contains)
      val vocab = (singles ++ multis).distinct
        .map(p => p -> (1L + rnd.nextInt(20000000))).toMap
      val words = (0 until 120).map { _ =>
        val l = 1 + rnd.nextInt(14)
        (0 until l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val cmCol = map_from_arrays(
        lit(vocab.keys.toArray),
        lit(vocab.values.toArray))
      val out = words.toDF("word")
        .withColumn("cm", cmCol)
        .withColumn("barr", expr(graft.operators.TextAnalysis.emDpSpark("cm")))
        .withColumn("ps", expr(
          graft.operators.TextAnalysis.emBacktraceSpark("cm", "barr")))
        .select($"word", expr("element_at(barr, CAST(length(word) + 1 AS INT))")
          .as("best"), $"ps")
        .collect()
      assert(out.length == words.length)
      out.foreach { r =>
        val word = r.getAs[String]("word")
        val best = r.getAs[Long]("best")
        val ps = r.getSeq[String](2)
        // the backtrace walks end -> start, so pieces arrive reversed
        assert(ps.reverse.mkString("") == word,
          s"round $round: pieces ${ps.mkString("|")} don't rebuild '$word'")
        assert(ps.forall(vocab.contains),
          s"round $round: '$word' used a piece outside the vocabulary")
        val pathCost = ps.map(p => vocab(p) * 1024 + 1).sum
        assert(pathCost == best,
          s"round $round: '$word' path cost $pathCost != DP value $best")
        assert(best == referenceBest(word, vocab),
          s"round $round: '$word' DP value $best != reference")
      }
    }
  }
}
