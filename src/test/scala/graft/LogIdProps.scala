package graft

import graft.log.LogId
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for log ids (SURVEY.md §5 test plan item 3): parse/print
  * round-trip, total ordering consistent with (millis, seq) tuples, and
  * monotonicity of the id-assignment rule.
  */
object LogIdProps extends Properties("LogId") {
  private val genId: Gen[LogId] = for {
    m <- Gen.chooseNum(0L, 4102444800000L)
    s <- Gen.chooseNum(0L, 1000000L)
  } yield LogId(m, s)

  property("parse/toString round-trips") = Prop.forAll(genId) { id =>
    LogId.parse(id.toString) == id
  }

  property("ordering matches tuple ordering") = Prop.forAll(genId, genId) { (a, b) =>
    (a compare b).sign == Ordering[(Long, Long)]
      .compare((a.millis, a.seq), (b.millis, b.seq)).sign
  }

  property("assignment rule is strictly monotonic") = Prop.forAll(genId,
    Gen.chooseNum(-1000L, 1000L)) { (last, drift) =>
    val now = last.millis + drift
    val next = if (now > last.millis) LogId(now, 0) else LogId(last.millis, last.seq + 1)
    next > last
  }

  property("tryParse rejects malformed ids") = Prop.forAll(Gen.alphaStr) { s =>
    LogId.tryParse(s).isEmpty
  }
}
