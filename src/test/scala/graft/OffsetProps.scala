package graft

import graft.log.LogId
import graft.sources.GraftLogOffset
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the source offset wire format: single-stream offsets
  * keep the flat legacy JSON (checkpoint compatibility), multi-stream
  * offsets round-trip through the `{"streams":{...}}` form with arbitrary
  * stream names, and serialization is deterministic (names sorted).
  */
object OffsetProps extends Properties("GraftLogOffset") {
  private val genId: Gen[LogId] = for {
    m <- Gen.chooseNum(0L, 4102444800000L)
    s <- Gen.chooseNum(0L, 1000000L)
  } yield LogId(m, s)

  private val genName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(32))

  private val genMulti: Gen[Map[String, LogId]] = for {
    n <- Gen.chooseNum(1, 6)
    names <- Gen.listOfN(n, genName).map(_.distinct)
    ids <- Gen.listOfN(names.size, genId)
  } yield names.zip(ids).toMap

  property("single-stream json keeps the flat legacy format") =
    Prop.forAll(genName, genId) { (st, id) =>
      val json = GraftLogOffset.single(st, id).json()
      json == s"""{"millis":${id.millis},"seq":${id.seq}}"""
    }

  property("parse(json) round-trips for any stream map") =
    Prop.forAll(genMulti) { ids =>
      val off = GraftLogOffset(ids)
      val defaultStream = ids.keys.head
      GraftLogOffset.parse(off.json(), defaultStream) == off
    }

  property("json is deterministic regardless of map iteration order") =
    Prop.forAll(genMulti) { ids =>
      GraftLogOffset(ids).json() ==
        GraftLogOffset(ids.toSeq.reverse.toMap).json()
    }
}
