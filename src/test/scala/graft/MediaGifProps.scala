package graft

import graft.multimodal.Codecs
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck law for the exact-palette GIF codec (q269): ANY raster whose
  * distinct-color count fits the 256-entry palette budget must round-trip
  * pixel-for-pixel through encodeGif -> ImageIO decode — not just the
  * deterministic fixture pattern MediaPipelineSpec pins. Colors are drawn
  * from a random bounded palette so the indexed write path sees arbitrary
  * palette sizes, orders, and repetitions.
  */
object MediaGifProps extends Properties("GifCodec") {

  private val genImage: Gen[Codecs.RgbImage] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    nColors <- Gen.chooseNum(1, 256)
    palette <- Gen.listOfN(nColors, Gen.chooseNum(0, 0xffffff)).map(_.distinct)
    idx <- Gen.listOfN(w * h, Gen.chooseNum(0, palette.size - 1))
  } yield {
    val px = new Array[Byte](3 * w * h)
    idx.zipWithIndex.foreach { case (pi, i) =>
      val c = palette(pi)
      px(3 * i) = ((c >> 16) & 0xff).toByte
      px(3 * i + 1) = ((c >> 8) & 0xff).toByte
      px(3 * i + 2) = (c & 0xff).toByte
    }
    Codecs.RgbImage(w, h, px)
  }

  property("encodeGif/decode round-trips any <=256-color raster exactly") =
    Prop.forAll(genImage) { img =>
      val bytes = Codecs.encodeGif(img)
      val back = Codecs.decode(bytes).get
      Codecs.isGif(bytes) && back.width == img.width &&
        back.height == img.height &&
        java.util.Arrays.equals(back.pixels, img.pixels)
    }
}
