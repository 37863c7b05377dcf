package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.multimodal.Multimodal

/** Fuzz properties for the hand-written binary header walkers — the
  * classic crash class for format parsers is an unchecked length/
  * offset on GARBAGE or TRUNCATED input, so every parser must be
  * TOTAL: any byte array returns (possibly the stub), never throws,
  * never loops. Deterministic ScalaCheck generators with fixed seeds
  * (the EnginePropertySpec discipline — raw Gen, offline-friendly);
  * pure JVM kernels, so thousands of cases are cheap. */
class MultimodalFuzzSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // arbitrary garbage of arbitrary length (incl. empty)
  private val garbage: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 600)
    bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield bs.toArray

  // garbage that STARTS like each format: magic bytes + random tail —
  // this is what actually exercises the post-signature walkers
  private val magics: Seq[Array[Byte]] = Seq(
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "GIF89a".getBytes("US-ASCII"),
    "GIF87a".getBytes("US-ASCII"),
    "BM".getBytes("US-ASCII"),
    "RIFF1234WAVE".getBytes("US-ASCII"),
    "RIFF1234AVI ".getBytes("US-ASCII"),
    "RIFF1234AVI LIST1234movi00dc".getBytes("US-ASCII"),
    "P6 ".getBytes("US-ASCII"),
    "ID3".getBytes("US-ASCII"),
    Array[Byte](0xff.toByte, 0xfb.toByte),
    Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p'))

  private val magicHeaded: Gen[Array[Byte]] = for {
    m <- Gen.oneOf(magics)
    tail <- garbage
  } yield m ++ tail

  test("decode is total on arbitrary and magic-headed garbage") {
    val cases = sample(garbage, seed = 41L, n = 400) ++
      sample(magicHeaded, seed = 42L, n = 600)
    cases.foreach { b =>
      val (w, h, nf, fp) = Multimodal.decode(b) // must not throw/loop
      assert(w >= 1 && h >= 1 && nf >= 1)
      assert(fp >= 0L)
    }
  }

  test("resize kernels and feature extraction are total on garbage") {
    val cases = sample(magicHeaded, seed = 43L, n = 400)
    cases.foreach { b =>
      Multimodal.resizePpm(b, 4, 4)
      Multimodal.resizeBmp(b, 4, 4)
      Multimodal.resizeImage(b, 4, 4)
      val f = Multimodal.featureKernel(b, 8)
      assert(f.length === 8 && f.forall(v => !v.isNaN))
      Multimodal.wavPcm16(b)
      Multimodal.ppmPixelOffset(b)
    }
  }

  test("truncations of VALID fixtures never half-parse into a crash") {
    // build one honest file per format, then feed every prefix
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def enc(fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    val ppm = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ Array.fill(18)(7.toByte)
    val mp3 = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Array.fill(413)(0x55.toByte)
    val fixtures = Seq(enc("png"), enc("jpg"), enc("gif"), enc("bmp"), ppm, mp3)
    fixtures.foreach { full =>
      (0 to full.length).foreach { cut =>
        val b = full.take(cut)
        Multimodal.decode(b)
        Multimodal.resizeImage(b, 2, 2)
        Multimodal.featureKernel(b, 8)
      }
    }
  }

  test("IMA ADPCM decode is total: garbage, lying headers, truncated fixtures") {
    // WAVE-headed garbage must never throw from the ADPCM walkers
    val waveHeaded: Gen[Array[Byte]] = for {
      tail <- garbage
    } yield "RIFF1234WAVE".getBytes("US-ASCII") ++ tail
    sample(waveHeaded, seed = 47L, n = 600).foreach { b =>
      Multimodal.wavImaAdpcm(b)
      Multimodal.imaAdpcmSamples(b) // must not throw/loop/alloc-bomb
      Multimodal.wavFactSamples(b)
    }
    // every prefix of a VALID ADPCM fixture parses or rejects cleanly
    val full = graft.multimodal.MediaFixtures.wavImaAdpcm(9, 12)
    (0 to full.length).foreach { cut =>
      val b = full.take(cut)
      Multimodal.imaAdpcmSamples(b)
      Multimodal.decode(b)
    }
    // a fact chunk DECLARING more frames than blocks hold must cap at
    // the block math, never over-allocate or read past the data
    val lying = full.clone()
    // fact PAYLOAD starts after RIFF(12) + fmt chunk(8+20) + fact
    // tag+size(8): offset 48
    lying(48) = 0xff.toByte; lying(49) = 0xff.toByte
    lying(50) = 0x7f.toByte; lying(51) = 0x00.toByte
    val Some((_, _, capped)) = Multimodal.imaAdpcmSamples(lying)
    assert(capped.length === 12 * 2 + 1,
      "a lying fact count must cap at what the blocks actually hold")
    // and the recurrence state machine is total on every (pred, idx,
    // nib) in range — clamps can never escape int16 / [0, 88]
    for (idx <- 0 to 88; nib <- 0 to 15; pred <- Seq(-32768, -1, 0, 32767)) {
      val (p, i) = Multimodal.imaStep(pred, idx, nib)
      assert(p >= -32768 && p <= 32767 && i >= 0 && i <= 88)
    }
  }
}
