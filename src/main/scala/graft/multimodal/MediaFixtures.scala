package graft.multimodal

/** Deterministic synthetic-media generators — real encoders (the
  * JDK's ImageIO writers plus hand-assembled RIFF/PPM containers)
  * driven by integer parameters, so an encode→decode round trip is
  * PREDICTABLE arithmetic: a DuckDB oracle can state what the codec
  * must parse out of the bytes without ever seeing them. This is what
  * lets the binary codec tier sit under the driver's hash gate
  * (llm_multimodal_codec_twin) instead of only under specs.
  * Also reusable as spec fixtures. */
private[graft] object MediaFixtures {

  private def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def img(w: Int, h: Int, rowShift: Int = 0,
      xCoef: Int = 37): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = if (y == 0) rowShift else 0
        im.setRGB(x, y, ((x * xCoef + y * 101 + d) % 255) << 8)
        x += 1
      }
      y += 1
    }
    im
  }

  private def encode(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, baos)
    baos.toByteArray
  }

  def png(w: Int, h: Int): Array[Byte] = encode(img(w, h), "png")

  /** PNG with a per-image x-gradient coefficient — structurally
    * DISTINCT content per seed, so unrelated fixtures hash far apart
    * (the single shared gradient of png(w, h) makes every image a
    * near-dup of every other, which defeats a dedup demo). */
  def pngSeeded(w: Int, h: Int, xCoef: Int): Array[Byte] =
    encode(img(w, h, 0, xCoef), "png")

  /** [[pngSeeded]] whose TOP ROW's green channel is shifted by
    * `delta` (mod 255) — the controlled near-duplicate: only dHash
    * grid row 0 can change (≤ 8 of 56 bits), and since a uniform
    * shift preserves pairwise sample order except across the mod-255
    * wrap, the Hamming distance is small or zero — exactly the
    * perceptual-hash invariance the dedup operator exists to exploit. */
  def pngRowShift(w: Int, h: Int, delta: Int, xCoef: Int): Array[Byte] =
    encode(img(w, h, delta, xCoef), "png")
  def jpeg(w: Int, h: Int): Array[Byte] = encode(img(w, h), "jpg")
  def bmp(w: Int, h: Int): Array[Byte] = encode(img(w, h), "bmp")

  /** Animated GIF with `frames` frames of w×h via the JDK sequence
    * writer (the same frame list gifFrameCount walks). */
  def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val stream = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(stream)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { _ =>
      writer.writeToSequence(new javax.imageio.IIOImage(img(w, h), null, null), null)
    }
    writer.endWriteSequence()
    stream.close(); writer.dispose()
    baos.toByteArray
  }

  /** Mono 16-bit PCM WAV, 8 kHz, `n` samples of a deterministic ramp. */
  def wavPcm(n: Int): Array[Byte] = wavPcmSeeded(n, 257, 1, 1)

  /** [[wavPcm]] with a per-fixture ramp stride and an exact num/den
    * gain. Both divisions run on NON-NEGATIVE ints before the offset
    * subtraction, so truncation equals floor and any engine's integer
    * division reproduces the samples exactly (Scala `/` truncates
    * toward zero, DuckDB `//` floors — they agree only on ≥ 0). */
  def wavPcmSeeded(n: Int, stride: Int, num: Int, den: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((i * stride % 30000) * num) / den - (15000 * num) / den
      data(i * 2) = (v & 0xff).toByte; data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    ("RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000L) ++ le32(16000L) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong)) ++ data
  }

  /** Mono IMA ADPCM WAV (fmt 0x11, 8 kHz, one block) whose nibble
    * stream, initial predictor, and initial step index are EXACT
    * integer formulas of `g` — so an oracle can re-run the public
    * IMA recurrence (diff = step/8 + bit-selected step/4 + step/2 +
    * step, sign from bit 3, int16 clamp, index table walk) as pure
    * arithmetic and state every decoded sample without seeing the
    * bytes. Layout is spec-faithful: extended fmt chunk (cbSize = 2,
    * wSamplesPerBlock), a `fact` chunk carrying the true frame count
    * (header sample + one per nibble), and a 4-byte-aligned data
    * block of `nibbleBytes` bytes, low nibble first.
    *   predictor₀ = (g·997) mod 24001 − 12000
    *   index₀     = g mod 89
    *   nibble(i)  = (g·7 + i·5) mod 16
    * `nibbleBytes` must be a multiple of 4 (the spec's per-channel
    * group size). */
  def wavImaAdpcm(g: Int, nibbleBytes: Int): Array[Byte] = {
    require(nibbleBytes > 0 && nibbleBytes % 4 == 0, "nibble bytes must be 4-aligned")
    val pred0 = (g * 997) % 24001 - 12000
    val idx0 = g % 89
    val nSamples = 1 + nibbleBytes * 2
    val blockAlign = 4 + nibbleBytes
    val data = new Array[Byte](blockAlign)
    data(0) = (pred0 & 0xff).toByte
    data(1) = ((pred0 >> 8) & 0xff).toByte
    data(2) = idx0.toByte
    data(3) = 0
    var i = 0
    while (i < nibbleBytes) {
      val lo = (g * 7 + (2 * i) * 5) % 16
      val hi = (g * 7 + (2 * i + 1) * 5) % 16
      data(4 + i) = ((hi << 4) | lo).toByte
      i += 1
    }
    ("RIFF".getBytes("US-ASCII") ++ le32(4L + 8 + 20 + 8 + 4 + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++ le16(0x11) ++ le16(1) ++
      le32(8000L) ++ le32(4000L) /* nominal avg byte rate */ ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(nSamples) ++
      "fact".getBytes("US-ASCII") ++ le32(4) ++ le32(nSamples.toLong) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong)) ++ data
  }

  /** Big-endian bit packer for the FLAC frame layer (private[graft]:
    * FlacSpec hand-assembles the subframe variants — constant,
    * verbatim, LPC, stereo — the query fixtures don't emit). */
  private[graft] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { writeBits(0, q); writeBits(1, 1) }
    def alignToByte(): Unit = if (nBits != 0) writeBits(0, 8 - nBits)
    def bytes: Array[Byte] = { alignToByte(); buf.toArray }
  }

  /** The exact sample recurrence [[flacFixed]] encodes — shared with
    * its oracle rendering so both sides read ONE definition:
    *   s(0) = (g·31) mod 200 − 100
    *   s(1) = s(0) + (g mod 40) − 20
    *   s(i) = 2·s(i−1) − s(i−2) + e(i),  e(i) = (g·7 + i·5) mod 16 − 8
    * Residuals stay in [−8, 7] and |s| < 20 000 for n ≤ 48, safely
    * inside 16-bit range. */
  private[graft] def flacSampleSeq(g: Int, n: Int): Array[Int] = {
    val s = new Array[Int](n)
    s(0) = (g * 31) % 200 - 100
    s(1) = s(0) + g % 40 - 20
    var i = 2
    while (i < n) {
      s(i) = 2 * s(i - 1) - s(i - 2) + ((g * 7 + i * 5) % 16 - 8)
      i += 1
    }
    s
  }

  /** Mono 16-bit FLAC, 8 kHz, one frame of `n` samples encoded with a
    * FIXED ORDER-2 predictor and one Rice(4) partition — a REAL
    * spec-faithful FLAC stream (RFC 9639: STREAMINFO, frame sync +
    * header CRC-8, UTF-8-coded frame number, zigzag-folded Rice
    * residuals, whole-frame CRC-16) whose decoded samples are the
    * exact integer recurrence [[flacSampleSeq]] — so an oracle can
    * state every decoded sample as pure arithmetic without seeing a
    * byte, while the decoder must genuinely bit-unpack, Rice-decode,
    * reconstruct the order-2 polynomial predictor, and pass both
    * CRCs to produce them. `n` must be in [16, 256] (streaminfo min
    * block size floor per spec; 8-bit block-size-minus-1 field). */
  def flacFixed(g: Int, n: Int): Array[Byte] = {
    require(n >= 16 && n <= 256, "block size out of the fixture's field range")
    val s = flacSampleSeq(g, n)
    // ---- STREAMINFO (the mandatory first metadata block, last-flagged)
    val si = new Array[Byte](34)
    si(0) = (n >> 8).toByte; si(1) = (n & 0xff).toByte // min block
    si(2) = si(0); si(3) = si(1)                       // max block
    // bytes 4..9: min/max frame size unknown (0)
    val rate = 8000
    si(10) = (rate >> 12).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | (0 << 1) | (15 >> 4)).toByte // ch−1=0, bps−1=15
    si(13) = (((15 & 0xf) << 4) | 0).toByte // total samples bits 35..32 = 0
    si(14) = 0; si(15) = 0
    si(16) = (n >> 8).toByte; si(17) = (n & 0xff).toByte
    // bytes 18..33: MD5 unset (0 = unknown)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    // ---- one frame
    val w = new BitWriter
    w.writeBits(0x3ffe, 14) // sync
    w.writeBits(0, 1)       // reserved
    w.writeBits(0, 1)       // fixed-blocksize stream
    w.writeBits(6, 4)       // block size: 8-bit value−1 follows
    w.writeBits(0, 4)       // sample rate: from STREAMINFO
    w.writeBits(0, 4)       // channel assignment: mono
    w.writeBits(4, 3)       // sample size: 16-bit
    w.writeBits(0, 1)       // reserved
    w.writeBits(0, 8)       // UTF-8 coded frame number 0
    w.writeBits(n - 1L, 8)  // block size − 1
    val headerBytes = w.bytes // 6 bytes, already aligned
    val crc8v = Multimodal.crc8(headerBytes, 0, headerBytes.length)
    val w2 = new BitWriter
    w2.writeBits(0, 1)      // subframe zero padding
    w2.writeBits(0x0a, 6)   // FIXED, order 2
    w2.writeBits(0, 1)      // no wasted bits
    w2.writeBits(s(0).toLong & 0xffff, 16) // warmup
    w2.writeBits(s(1).toLong & 0xffff, 16)
    w2.writeBits(0, 2)      // residual method: Rice 4-bit params
    w2.writeBits(0, 4)      // partition order 0
    w2.writeBits(4, 4)      // Rice parameter 4
    var i = 2
    while (i < n) {
      val e = s(i) - 2 * s(i - 1) + s(i - 2)
      val u = if (e >= 0) 2 * e else -2 * e - 1 // zigzag fold
      w2.writeUnary(u >> 4)
      w2.writeBits(u & 0xf, 4)
      i += 1
    }
    val sub = w2.bytes
    val frameNoCrc = headerBytes ++ Array(crc8v.toByte) ++ sub
    val crc16v = Multimodal.crc16(frameNoCrc, 0, frameNoCrc.length)
    head ++ frameNoCrc ++ Array((crc16v >> 8).toByte, (crc16v & 0xff).toByte)
  }

  /** PPM P6 of w×h with a deterministic byte pattern. */
  def ppm(w: Int, h: Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(w * h * 3)(i => ((i * 31) % 251).toByte)

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ body)

  private def aviContainer(w: Int, h: Int, frameChunks: Array[Byte],
      nFrames: Int): Array[Byte] = {
    val avih = new Array[Byte](56)
    System.arraycopy(le32(nFrames.toLong), 0, avih, 16, 4) // dwTotalFrames
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)       // dwWidth
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)       // dwHeight
    val body = "AVI ".getBytes("US-ASCII") ++
      riffList("hdrl", riffChunk("avih", avih)) ++
      riffList("movi", frameChunks)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** MJPEG AVI: `frames` JPEG frames of w×h in a spec-faithful
    * RIFF('AVI '){ LIST(hdrl){avih}, LIST(movi){##dc…} } container. */
  def aviMjpeg(w: Int, h: Int, frames: Int): Array[Byte] = {
    val frame = jpeg(w, h)
    aviContainer(w, h,
      Array.fill(frames)(riffChunk("00dc", frame)).flatten, frames)
  }

  /** Uncompressed (BI_RGB) AVI: one '00db' raw DIB frame per entry of
    * `shifts` — bottom-up BGR rows, stride padded to 4 bytes, the
    * standard uncompressed-video AVI layout. Frame f's pixels are the
    * exact integer formula gray(x, y) = (x·7 + y·11 + shifts(f)) % 256
    * on all three channels, so a DuckDB oracle reproduces every
    * decoded luma (ITU-601 weights sum to 1000 → luma of gray g IS g)
    * as pure arithmetic — the codec-twin discipline at pixel level
    * for VIDEO, which lossy MJPEG can never offer. */
  def aviDib(w: Int, h: Int, shifts: Seq[Int]): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    def frame(s: Int): Array[Byte] = {
      val buf = new Array[Byte](stride * h)
      var fy = 0
      while (fy < h) {
        val y = h - 1 - fy // bottom-up row order
        var x = 0
        while (x < w) {
          val g = ((x * 7 + y * 11 + s) % 256).toByte
          val o = fy * stride + x * 3
          buf(o) = g; buf(o + 1) = g; buf(o + 2) = g // B, G, R
          x += 1
        }
        fy += 1
      }
      buf
    }
    aviContainer(w, h,
      shifts.toArray.flatMap(s => riffChunk("00db", frame(s))), shifts.size)
  }
}
