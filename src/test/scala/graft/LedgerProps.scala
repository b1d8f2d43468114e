package graft

import graft.consumer.AckLedger
import graft.log.LogId
import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the ack/pending ledger: any interleaving of ack and
  * defer calls across several writers (driver + partition tags) must (a)
  * survive a restart as the exact union of every writer's records, and (b)
  * compact to exactly {pending} ∪ {acks above the committed floor} — acks
  * at or below the floor are unreachable (their batches can never replay)
  * unless the id is also pending, whose redelivery path is the pending
  * drain. A second restart after compaction must agree with the compacted
  * in-memory view (the files are the restart truth).
  */
object LedgerProps extends Properties("AckLedger") {

  private case class Op(writer: Int, ack: Boolean, id: LogId)

  private val genOp: Gen[Op] = for {
    w <- Gen.chooseNum(0, 2)
    a <- Gen.oneOf(true, false)
    m <- Gen.chooseNum(1L, 5L)
    s <- Gen.chooseNum(0L, 3L)
  } yield Op(w, a, LogId(m * 1000, s))

  property("multi-writer restart union and floor compaction") =
    Prop.forAll(Gen.listOf(genOp)) { ops =>
      val dir = java.nio.file.Paths.get(TestSpark.tmpDir("ledger-props"))
      val writers = Seq(new AckLedger(dir, "driver"),
        new AckLedger(dir, "p0"), new AckLedger(dir, "p1"))
      ops.foreach { op =>
        if (op.ack) writers(op.writer).ack(op.id.toString)
        else writers(op.writer).defer(op.id.toString)
      }
      val acked = ops.filter(_.ack).map(_.id.toString).toSet
      val pending = ops.filterNot(_.ack).map(_.id.toString).toSet
      val restarted = new AckLedger(dir, "driver")
      val unionOk = restarted.acked == acked &&
        restarted.deferred == (pending -- acked)
      val floor = LogId(3000, 3)
      restarted.compact(Some(floor))
      val expected = acked.filter(id =>
        pending.contains(id) || LogId.parse(id) > floor)
      val compactOk = restarted.acked == expected
      val reread = new AckLedger(dir, "reader")
      val rereadOk = reread.acked == expected &&
        reread.deferred == (pending -- expected)
      unionOk :| "restart union diverged" &&
        compactOk :| "compaction kept the wrong ack set" &&
        rereadOk :| "post-compaction restart diverged"
    }
}
