package graft.functions

import graft.GenSampling
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the pure-JVM codecs: encode→decode roundtrips
  * over random dimensions/content, and decode-never-throws over garbage. */
class MediaCodecPropertySpec extends AnyFunSuite with GenSampling {

  test("BMP encode->decode roundtrip for random dims and pixel content") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 20)
      n <- Gen.choose(0, MediaCodec.bmpRowSize(40) * 20 + 32)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte))
    } yield (w, h, bytes)
    forAllSamples(gen, n = 60) { case (w, h, pixels) =>
      val d = MediaCodec.decode(MediaCodec.encodeBmp24(w, h, pixels)).get
      assert(d.format == "bmp" && d.width == w && d.height == h && d.channels == 3)
      val expected = new Array[Byte](MediaCodec.bmpRowSize(w) * h)
      System.arraycopy(pixels, 0, expected, 0,
        math.min(pixels.length, expected.length))
      assert(d.region.toSeq == expected.toSeq)
    }
  }

  test("WAV encode->decode roundtrip for random formats and samples") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 2)
      bits <- Gen.oneOf(8, 16)
      frames <- Gen.choose(0, 50)
      bytes <- Gen.containerOfN[Array, Byte](frames * ch * bits / 8,
        Gen.choose(-128, 127).map(_.toByte))
    } yield (rate, ch, bits, bytes, frames)
    forAllSamples(gen, n = 60) { case (rate, ch, bits, samples, frames) =>
      val d = MediaCodec.decode(MediaCodec.encodeWav(rate, ch, bits, samples)).get
      assert(d.format == "wav" && d.width == rate &&
        d.height == frames && d.channels == ch)
      assert(d.region.toSeq == samples.toSeq)
    }
  }

  test("decode never throws on arbitrary bytes, including magic-prefixed garbage") {
    val garbage = Gen.choose(0, 120).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte)))
    val prefixed = for {
      p <- Gen.oneOf(Array[Byte]('B', 'M'),
        "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes)
      g <- garbage
    } yield p ++ g
    forAllSamples(Gen.oneOf(garbage, prefixed), n = 200) { bytes =>
      MediaCodec.decode(bytes) // Some or None, but never an exception
    }
  }
}
