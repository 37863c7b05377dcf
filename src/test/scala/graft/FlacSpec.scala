package graft

import graft.multimodal.{MediaFixtures, Multimodal}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The FLAC decode tier (RFC 9639 subset) beyond what the oracle
  * queries gate: llm_flac_audio_twin hash-gates the FIXED-order-2
  * mono path end-to-end, so this spec covers the REST of the decoder
  * — constant / verbatim / LPC subframes, stereo decorrelation, CRC
  * rejection, and totality on garbage and truncations (the
  * MultimodalFuzzSpec discipline: a format parser must parse or
  * reject, never throw, loop, or alloc-bomb). Frames are
  * hand-assembled bit streams through the same BitWriter the fixture
  * encoder uses, with CRCs from the production crc8/crc16. */
class FlacSpec extends SparkTestBase {

  // ---- hand assembly helpers (mirror MediaFixtures.flacFixed but
  // parameterized over channels / subframe payloads)

  private def streamInfo(n: Int, channels: Int, total: Int): Array[Byte] = {
    val si = new Array[Byte](34)
    si(0) = (n >> 8).toByte; si(1) = (n & 0xff).toByte
    si(2) = si(0); si(3) = si(1)
    val rate = 8000
    si(10) = (rate >> 12).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) | (15 >> 4)).toByte
    si(13) = ((15 & 0xf) << 4).toByte
    si(16) = (total >> 8).toByte; si(17) = (total & 0xff).toByte
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
  }

  /** One frame: header (chAsgn, block size n) + the caller's subframe
    * bits + CRCs. */
  private def frame(n: Int, chAsgn: Int,
      subframes: MediaFixtures.BitWriter => Unit): Array[Byte] = {
    val w = new MediaFixtures.BitWriter
    w.writeBits(0x3ffe, 14); w.writeBits(0, 1); w.writeBits(0, 1)
    w.writeBits(6, 4)       // 8-bit block size − 1 follows
    w.writeBits(0, 4)       // rate from STREAMINFO
    w.writeBits(chAsgn, 4)
    w.writeBits(4, 3)       // 16-bit samples
    w.writeBits(0, 1)
    w.writeBits(0, 8)       // frame number 0
    w.writeBits(n - 1L, 8)
    val header = w.bytes
    val w2 = new MediaFixtures.BitWriter
    subframes(w2)
    val body = header ++ Array(Multimodal.crc8(header, 0, header.length).toByte) ++ w2.bytes
    val c16 = Multimodal.crc16(body, 0, body.length)
    body ++ Array((c16 >> 8).toByte, (c16 & 0xff).toByte)
  }

  private def writeRice2(w: MediaFixtures.BitWriter, s: Array[Int]): Unit = {
    w.writeBits(0, 2); w.writeBits(0, 4); w.writeBits(4, 4) // Rice(4), 1 partition
    (2 until s.length).foreach { i =>
      val e = s(i) - 2 * s(i - 1) + s(i - 2)
      val u = if (e >= 0) 2 * e else -2 * e - 1
      w.writeUnary(u >> 4); w.writeBits(u & 0xf, 4)
    }
  }

  test("fixed-order-2 fixtures round-trip exactly; corruption rejects (CRC)") {
    for (g <- 0 until 32; n <- Seq(16, 24, 48)) {
      val b = MediaFixtures.flacFixed(g, n)
      val want = MediaFixtures.flacSampleSeq(g, n)
      val Some((rate, ch, got)) = Multimodal.flacSamples(b)
      assert(rate === 8000 && ch === 1)
      assert(got.toSeq === want.toSeq, s"g=$g n=$n")
      assert(Multimodal.parseFlac(b) === Some((8000, 1, n)))
      val c = b.clone(); c(c.length - 5) = (c(c.length - 5) ^ 0x40).toByte
      assert(Multimodal.flacSamples(c).isEmpty, s"corrupt subframe accepted g=$g")
      val h = b.clone(); h(44) = (h(44) ^ 0x01).toByte // frame header byte
      assert(Multimodal.flacSamples(h).isEmpty, s"corrupt header accepted g=$g")
    }
  }

  test("constant and verbatim subframes decode") {
    val n = 16
    val const = streamInfo(n, 1, n) ++ frame(n, 0, { w =>
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1) // CONSTANT
      w.writeBits(-513L & 0xffff, 16)
    })
    assert(Multimodal.flacSamples(const).map(_._3.toSeq) ===
      Some(Seq.fill(n)(-513)))
    val vals = Array.tabulate(n)(i => i * 997 % 30000 - 15000)
    val verb = streamInfo(n, 1, n) ++ frame(n, 0, { w =>
      w.writeBits(0, 1); w.writeBits(1, 6); w.writeBits(0, 1) // VERBATIM
      vals.foreach(v => w.writeBits(v.toLong & 0xffff, 16))
    })
    assert(Multimodal.flacSamples(verb).map(_._3.toSeq) === Some(vals.toSeq))
  }

  test("LPC with coefficients [2, -1] shift 0 equals the fixed-order-2 predictor") {
    val n = 24; val g = 7
    val s = MediaFixtures.flacSampleSeq(g, n)
    val lpc = streamInfo(n, 1, n) ++ frame(n, 0, { w =>
      w.writeBits(0, 1); w.writeBits(32 | 1, 6); w.writeBits(0, 1) // LPC order 2
      w.writeBits(s(0).toLong & 0xffff, 16); w.writeBits(s(1).toLong & 0xffff, 16)
      w.writeBits(3, 4)  // precision 4 bits
      w.writeBits(0, 5)  // shift 0
      w.writeBits(2L & 0xf, 4); w.writeBits(-1L & 0xf, 4) // coefs 2, −1
      writeRice2(w, s)
    })
    assert(Multimodal.flacSamples(lpc).map(_._3.toSeq) === Some(s.toSeq),
      "LPC [2,−1]/0 must reconstruct the same samples as FIXED order 2")
  }

  test("left/side stereo decorrelation reconstructs right = left − side") {
    val n = 16; val g = 3; val k = 777
    val left = MediaFixtures.flacSampleSeq(g, n)
    val st = streamInfo(n, 2, n) ++ frame(n, 8, { w =>
      // subframe 0: left, FIXED order 2, 16 bits
      w.writeBits(0, 1); w.writeBits(8 | 2, 6); w.writeBits(0, 1)
      w.writeBits(left(0).toLong & 0xffff, 16)
      w.writeBits(left(1).toLong & 0xffff, 16)
      writeRice2(w, left)
      // subframe 1: side = k CONSTANT, 17 bits (the decorrelation
      // difference channel carries one extra bit)
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1)
      w.writeBits(k.toLong & 0x1ffff, 17)
    })
    val Some((_, ch, got)) = Multimodal.flacSamples(st)
    assert(ch === 2)
    val gotL = (0 until n).map(i => got(2 * i))
    val gotR = (0 until n).map(i => got(2 * i + 1))
    assert(gotL === left.toSeq)
    assert(gotR === left.map(_ - k).toSeq)
  }

  test("decoder is total: fLaC-headed garbage and every truncation parse or reject") {
    val garbage: Gen[Array[Byte]] = for {
      n <- Gen.chooseNum(0, 300)
      bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield "fLaC".getBytes("US-ASCII") ++ bs.toArray
    (0 until 600).flatMap(i =>
      garbage.apply(Gen.Parameters.default, Seed(4242L + i))).foreach { b =>
      Multimodal.flacSamples(b) // must not throw/loop/alloc-bomb
      Multimodal.parseFlac(b)
    }
    val full = MediaFixtures.flacFixed(11, 32)
    (0 to full.length).foreach { cut =>
      val b = full.take(cut)
      assert(cut == full.length || Multimodal.flacSamples(b).isEmpty)
      Multimodal.decode(b)
    }
  }

  test("FIXED subframe with order > blockSize rejects (no out-of-bounds warmup write)") {
    // blockSize 1 with a FIXED order-2 subframe: the warmup alone
    // would overrun the block — must reject cleanly, not AIOOBE
    // (random fuzz can't reach this path: it needs a valid CRC-8)
    val crafted = streamInfo(1, 1, 1) ++ frame(1, 0, { w =>
      w.writeBits(0, 1); w.writeBits(8 | 2, 6); w.writeBits(0, 1)
      w.writeBits(5, 16); w.writeBits(7, 16) // 2 warmup samples > block
    })
    assert(Multimodal.flacSamples(crafted).isEmpty)
  }

  test("unknown-length stream (STREAMINFO total=0, RFC 9639) decodes its frames") {
    // total=0 means "length unknown": the sample tier must decode
    // until the frames run dry and return what accumulated — the
    // metadata tier (parseFlac) accepts the same stream, and the two
    // tiers must not disagree on validity
    val b = MediaFixtures.flacFixed(9, 32)
    val want = Multimodal.flacSamples(b).get._3.toSeq
    val unknown = b.clone()
    // zero the 36-bit total field: low nibble of byte 13 + bytes 14-17
    unknown(4 + 4 + 13) = (unknown(4 + 4 + 13) & 0xf0).toByte
    (14 to 17).foreach(i => unknown(4 + 4 + i) = 0)
    assert(Multimodal.flacSamples(unknown).map(_._3.toSeq) === Some(want),
      "unknown-length FLAC must decode the same samples as the known-length twin")
    assert(Multimodal.parseFlac(unknown).isDefined)
  }

  test("a lying STREAMINFO total cannot out-allocate the decoded frames") {
    // declare 2^16 total samples but supply one 16-sample frame: the
    // decoder must reject cheaply (frames ran dry), never pre-allocate
    // the declared total
    val b = MediaFixtures.flacFixed(5, 16)
    val lying = b.clone()
    lying(4 + 4 + 14) = 1; lying(4 + 4 + 15) = 0 // total bits 31..16 = 1 → 65536
    lying(4 + 4 + 16) = 0; lying(4 + 4 + 17) = 0
    assert(Multimodal.flacSamples(lying).isEmpty)
  }

  test("metadata walk: padding block after STREAMINFO; STREAMINFO-not-first rejects") {
    val base = MediaFixtures.flacFixed(2, 16)
    // un-flag STREAMINFO as last, splice a 4-byte PADDING block (type
    // 1, last-flagged) between it and the frame
    val padded = base.slice(0, 4) ++ Array[Byte]((base(4) & 0x7f).toByte) ++
      base.slice(5, 42) ++ Array[Byte](0x81.toByte, 0, 0, 4, 0, 0, 0, 0) ++
      base.drop(42)
    assert(Multimodal.flacSamples(padded).map(_._3.toSeq) ===
      Multimodal.flacSamples(base).map(_._3.toSeq))
    assert(Multimodal.parseFlac(padded) === Some((8000, 1, 16)))
    // a stream whose FIRST block is not STREAMINFO is malformed
    val swapped = base.slice(0, 4) ++ Array[Byte](0x01.toByte, 0, 0, 4, 0, 0, 0, 0) ++
      base.drop(4)
    assert(Multimodal.parseFlac(swapped).isEmpty)
  }
}
