package graft

import graft.functions.Warc
import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the strict WARC parser (functions/Warc.scala) over
  * random archives: parse must invert the encoder for any record count /
  * header set / payload (INCLUDING payloads that contain the two-CRLF
  * record separator — boundaries come from Content-Length alone), offsets
  * must be the exact prefix sums of record byte lengths, and truncating or
  * corrupting a valid archive must throw rather than resync.
  */
object WarcProps extends Properties("Warc") {

  private def encode(recs: Seq[(Seq[(String, String)], String)]): String =
    recs.map { case (headers, payload) =>
      "WARC/1.0\r\n" +
        headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
        s"Content-Length: ${payload.length}\r\n\r\n" +
        payload + "\r\n\r\n"
    }.mkString

  private val genPayload: Gen[String] = for {
    words <- Gen.listOfN(6, Gen.oneOf("alpha", "beta", "\r\n\r\n", "--", ""))
  } yield words.mkString(" ")

  private val genRecord: Gen[(Seq[(String, String)], String)] = for {
    id <- Gen.chooseNum(0L, 9999L)
    extra <- Gen.chooseNum(0, 3)
    payload <- genPayload
  } yield {
    val hs = Seq("WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:$id>") ++
      (1 to extra).map(i => s"X-Extra-$i" -> s"v$i")
    (hs, payload)
  }

  private val genArchive: Gen[List[(Seq[(String, String)], String)]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genRecord))

  property("parse inverts encode (headers, payloads, separator-in-payload)") =
    Prop.forAll(genArchive) { recs =>
      val blob = encode(recs)
      val parsed = Warc.parse(blob)
      (parsed.size == recs.size) :| "record count" &&
        Prop.all(parsed.zip(recs).map { case (p, (hs, payload)) =>
          (p.payload == payload) :| "payload intact" &&
            (p.version == "WARC/1.0") :| "version" &&
            (p.headers.size == hs.size + 1) :| "header count" &&
            Prop.all(hs.map { case (k, v) =>
              (p.headers.get(k).contains(v)) :| s"header $k"
            }: _*)
        }: _*)
    }

  property("offsets are exact prefix sums of record byte lengths") =
    Prop.forAll(genArchive) { recs =>
      val blob = encode(recs)
      val parsed = Warc.parse(blob)
      val lens = recs.map { case (hs, p) =>
        encode(Seq((hs, p))).length.toLong
      }
      val expected = lens.scanLeft(0L)(_ + _).init
      (parsed.map(_.offset) == expected.toVector) :| "prefix sums" &&
        (expected.lastOption.forall(_ + lens.last == blob.length)) :| "total"
    }

  property("any strict truncation of a valid archive throws") =
    Prop.forAll(genArchive, Gen.chooseNum(1, 64)) { (recs, cut) =>
      val blob = encode(recs)
      val t = blob.substring(0, blob.length - (cut % blob.length).max(1))
      Prop.throws(classOf[Exception])(Warc.parse(t))
    }

  property("over-declared Content-Length fails loudly, never misparses") =
    Prop.forAll(genArchive) { recs =>
      val (hs, p) = recs.head
      val bad = encode(recs).replaceFirst(
        s"Content-Length: ${p.length}",
        s"Content-Length: ${p.length + 100000}")
      Prop.throws(classOf[Exception])(Warc.parse(bad))
    }

  property("a record missing its separator fails at the right offset") =
    Prop.forAll(genRecord) { rec =>
      val blob = encode(Seq(rec)).dropRight(4) + "XXXX"
      Prop.throws(classOf[Exception])(Warc.parse(blob))
    }
}
