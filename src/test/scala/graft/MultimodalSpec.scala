package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: opaque binary columns flow through typed
  * mapPartitions decode/frame-sample stages with deterministic stub
  * kernels (no codecs in this container — the Spark-side shape is
  * what's under test). */
class MultimodalSpec extends SparkTestBase {

  private def media(): org.apache.spark.sql.Dataset[MediaRow] = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", "fake-png-bytes".getBytes),
      MediaRow(2L, "video", "fake-mp4-bytes".getBytes),
      MediaRow(3L, "video", Array[Byte]())).toDS()
  }

  test("probe derives stable metadata per media object, no shuffle") {
    val meta = Multimodal.probe(media())
    // partition-preserving: no Exchange in the plan
    assert(!meta.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = meta.collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).n_bytes === 14L)
    assert(rows.forall(m => m.width >= 1 && m.width <= 640))
    assert(rows.forall(m => m.height >= 1 && m.height <= 480))
    // determinism: same content → same fingerprint on re-run
    val again = Multimodal.probe(media()).collect().sortBy(_.media_id)
    assert(rows.map(_.fingerprint).toSeq === again.map(_.fingerprint).toSeq)
  }

  test("sampleFrames fans out only videos, every Nth frame") {
    val frames = Multimodal.sampleFrames(media(), everyN = 50).collect()
    assert(frames.forall(f => Set(2L, 3L).contains(f.media_id)))
    assert(frames.forall(_.frame_no % 50 === 0))
    val f2 = frames.filter(_.media_id === 2L).map(_.frame_no).sorted
    val expected = Multimodal.decodeStub("fake-mp4-bytes".getBytes)._3
    assert(f2.length === (expected + 49) / 50)
  }

  test("extractFeatures emits fixed-dim embedding-shaped vectors, no shuffle") {
    val feats = Multimodal.extractFeatures(media(), dim = 16)
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length === 3)
    assert(rows.forall(_.feature.length === 16))
    assert(rows.forall(_.feature.forall(v => v >= -1f && v <= 1f)))
    // deterministic per content; distinct contents diverge
    val again = Multimodal.extractFeatures(media(), dim = 16).collect().sortBy(_.media_id)
    assert(rows.map(_.feature.toSeq) === again.map(_.feature.toSeq))
    assert(rows(0).feature.toSeq !== rows(1).feature.toSeq)
    // flows into the similarity surface: embeddings-table layout
    import spark.implicits._
    val asEmb = feats.toDF().selectExpr("media_id AS vec_id", "feature AS embedding")
    assert(asEmb.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
  }

  test("resize normalizes payload size to the target dims, deterministic, no shuffle") {
    val out = Multimodal.resize(media(), w = 64, h = 64)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect().sortBy(_.media_id)
    assert(rows.forall(r => r.width === 64 && r.height === 64))
    // bounded by the target budget (64·64/64 + 1 = 65) and the source
    assert(rows.forall(r => r.content.length <= 65))
    assert(rows.find(_.media_id === 3L).get.content.isEmpty) // empty stays empty
    val again = Multimodal.resize(media(), 64, 64).collect().sortBy(_.media_id)
    assert(rows.map(_.content.toSeq) === again.map(_.content.toSeq))
  }

  test("fromDocuments wraps a text table into opaque media rows") {
    import spark.implicits._
    val docs = Seq((1L, "hello"), (3L, "world")).toDF("doc_id", "text")
    val rows = Multimodal.fromDocuments(spark, docs).collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq === Seq("image", "video"))
    assert(new String(rows(0).content) === "hello")
  }

  // ---- real header-only codecs on synthesized fixtures ------------

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def bmpFixture(w: Int, h: Int): Array[Byte] = {
    val pixels = new Array[Byte](w * h * 3)
    ("BM".getBytes("US-ASCII") ++ le32(54L + pixels.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong & 0xffffffffL) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(pixels.length.toLong) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0)) ++ pixels
  }

  private def wavFixture(rate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val data = new Array[Byte](nSamples * blockAlign)
    ("RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate.toLong) ++ le32(rate.toLong * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong)) ++ data
  }

  private def ppmFixture(w: Int, h: Int): Array[Byte] =
    s"P6\n# graft test fixture\n$w $h\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](w * h * 3)

  test("decode parses true BMP/WAV/PPM header metadata; unknown bytes fall back to the stub") {
    assert(Multimodal.parseBmp(bmpFixture(320, 200)) === Some((320, 200, 1)))
    // top-down BMP: negative height stores |rows|
    val topDown = bmpFixture(320, 200)
    le32((-200L) & 0xffffffffL).copyToArray(topDown, 22)
    assert(Multimodal.parseBmp(topDown) === Some((320, 200, 1)))
    assert(Multimodal.parseWav(wavFixture(44100, 2, 1000)) === Some((44100, 2, 1000)))
    assert(Multimodal.parsePpm(ppmFixture(64, 48)) === Some((64, 48, 1)))
    // truncated/garbage headers reject cleanly instead of throwing
    assert(Multimodal.parseBmp("BM".getBytes) === None)
    assert(Multimodal.parseWav("RIFFxxxxWAVE".getBytes) === None)
    assert(Multimodal.parsePpm("P6\n-3 4\n255\n".getBytes) === None)
    // a corrupt chunk size near u32 max must terminate (would wrap an
    // Int cursor into a non-advancing infinite loop), not hang
    val evil = wavFixture(44100, 2, 10)
    le32(0xFFFFFFF0L).copyToArray(evil, 16) // fmt chunk claims ~4 GB
    assert(Multimodal.parseWav(evil) === None)
    val (w, h, nf, _) = Multimodal.decode("not-a-media-file".getBytes)
    assert((w, h, nf) === (Multimodal.decodeStub("not-a-media-file".getBytes)._1,
      Multimodal.decodeStub("not-a-media-file".getBytes)._2,
      Multimodal.decodeStub("not-a-media-file".getBytes)._3))
  }

  test("probe returns true dimensions for real-format fixtures end to end") {
    import spark.implicits._
    val ds = Seq(
      MediaRow(10L, "image", bmpFixture(640, 360)),
      MediaRow(11L, "audio", wavFixture(16000, 1, 16000)), // 1s of 16 kHz mono
      MediaRow(12L, "image", ppmFixture(128, 96)),
      MediaRow(13L, "image", "opaque".getBytes)).toDS()
    val rows = Multimodal.probe(ds).collect().sortBy(_.media_id)
    assert((rows(0).width, rows(0).height, rows(0).n_frames) === (640, 360, 1))
    assert((rows(1).width, rows(1).height, rows(1).n_frames) === (16000, 1, 16000))
    assert((rows(2).width, rows(2).height, rows(2).n_frames) === (128, 96, 1))
    // the stub path still serves unknown formats in the same batch
    val stub = Multimodal.decodeStub("opaque".getBytes)
    assert((rows(3).width, rows(3).height, rows(3).n_frames) === (stub._1, stub._2, stub._3))
  }

  // ---- PNG / JPEG dimension headers (compressed pixels, public
  //      container headers — parseable without a codec) --------------

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngFixture(w: Int, h: Int): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth 8, RGBA; CRC not checked

  private def jpegFixture(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8).map(_.toByte) ++                          // SOI
      Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++             // APP0/JFIF
      "JFIF ".getBytes("US-ASCII") ++ new Array[Byte](9) ++
      Array(0xff, 0xdb).map(_.toByte) ++ be16(4) ++ new Array[Byte](2) ++ // DQT stub
      Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++             // SOF0
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 0x11.toByte, 0)

  test("decode parses true PNG/JPEG dimensions; truncation rejects to the stub") {
    assert(Multimodal.parsePng(pngFixture(800, 600)) === Some((800, 600, 1)))
    assert(Multimodal.parseJpeg(jpegFixture(1024, 768)) === Some((1024, 768, 1)))
    // progressive JPEG: SOF2 carries dimensions the same way
    val prog = jpegFixture(320, 240)
    prog(prog.length - 11) = 0xc2.toByte // SOF marker byte: len(2)+payload(9) behind it
    assert(Multimodal.parseJpeg(prog) === Some((320, 240, 1)))
    // truncated signature / header-less payloads reject, never throw
    assert(Multimodal.parsePng(pngFixture(800, 600).take(20)) === None)
    assert(Multimodal.parseJpeg(jpegFixture(1024, 768).take(6)) === None)
    assert(Multimodal.parsePng("PNGnope".getBytes) === None)
    // EOI before any SOF (a JPEG with its frame stripped) rejects
    assert(Multimodal.parseJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
    // zero dimensions are invalid per both specs
    assert(Multimodal.parsePng(pngFixture(0, 600)) === None)
    assert(Multimodal.parseJpeg(jpegFixture(0, 768)) === None)
    // end to end through probe
    import spark.implicits._
    val ds = Seq(
      MediaRow(20L, "image", pngFixture(800, 600)),
      MediaRow(21L, "image", jpegFixture(1024, 768))).toDS()
    val rows = Multimodal.probe(ds).collect().sortBy(_.media_id)
    assert((rows(0).width, rows(0).height) === (800, 600))
    assert((rows(1).width, rows(1).height) === (1024, 768))
  }

  private def gifFixture(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  /** Minimal ISO-BMFF: ftyp box, then moov{mvhd v0, trak{tkhd v0}}. */
  private def mp4Fixture(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val mvhd = box("mvhd",
      new Array[Byte](12) ++ be32(timescale.toLong) ++ be32(duration.toLong) ++
        new Array[Byte](80))
    // tkhd v0: 84-byte payload, width/height 16.16 fixed in the last 8
    val tkhd = box("tkhd",
      new Array[Byte](76) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](8)) ++
      box("moov", mvhd ++ box("trak", tkhd))
  }

  test("decode parses GIF and MP4 container headers; malformed boxes reject") {
    assert(Multimodal.parseGif(gifFixture(480, 320)) === Some((480, 320, 1)))
    assert(Multimodal.parseGif("GIF89a".getBytes) === None) // truncated descriptor
    assert(Multimodal.parseGif(gifFixture(0, 320)) === None)
    // 2s at timescale 1000 → 30fps grid → 61 sampled frame slots
    assert(Multimodal.parseMp4(mp4Fixture(640, 480, 1000, 2000)) === Some((640, 480, 61)))
    // audio-only (zero tkhd dims) still yields duration-derived frames
    assert(Multimodal.parseMp4(mp4Fixture(0, 0, 1000, 1000)) === Some((1, 1, 31)))
    // a moov box whose declared size overruns the buffer must clamp,
    // not read out of bounds; losing mvhd entirely rejects
    val evil = mp4Fixture(640, 480, 1000, 2000)
    be32(0x7fffffffL).copyToArray(evil, 20) // moov size field claims 2 GB
    assert(Multimodal.parseMp4(evil).isDefined || Multimodal.parseMp4(evil).isEmpty) // no throw
    assert(Multimodal.parseMp4("ftypnope".getBytes) === None)
    // end to end: a video MP4 row through sampleFrames uses the TRUE
    // frame count now, not the stub's
    import spark.implicits._
    val ds = Seq(MediaRow(30L, "video", mp4Fixture(640, 480, 1000, 2000))).toDS()
    val frames = Multimodal.sampleFrames(ds, everyN = 10).collect()
    assert(frames.length === 7) // ceil(61/10)
  }

  test("decode parses MP3 frame headers (with and without ID3v2); reserved bits reject") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, stereo: header FF FB 90 00,
    // frame length 144*128000/44100 = 417 bytes
    def mp3Fixture(frames: Int, id3: Boolean): Array[Byte] = {
      val frame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
        Array.fill(413)(0x55.toByte)
      val tag =
        if (id3) "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 0)
        else Array.emptyByteArray
      tag ++ Array.fill(frames)(frame).flatten
    }
    assert(Multimodal.parseMp3(mp3Fixture(3, id3 = false)) === Some((44100, 2, 3)))
    assert(Multimodal.parseMp3(mp3Fixture(2, id3 = true)) === Some((44100, 2, 2)))
    // mono flag (channel mode 3): C0 in byte 3
    val mono = mp3Fixture(1, id3 = false)
    mono(3) = 0xc0.toByte
    assert(Multimodal.parseMp3(mono) === Some((44100, 1, 1)))
    // free-format bitrate (index 0) and reserved samplerate reject
    val free = mp3Fixture(1, id3 = false); free(2) = 0x00
    assert(Multimodal.parseMp3(free) === None)
    val badSr = mp3Fixture(1, id3 = false); badSr(2) = 0x9c.toByte
    assert(Multimodal.parseMp3(badSr) === None)
    // an ID3 tag whose syncsafe size overruns the buffer rejects
    val lying = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(Multimodal.parseMp3(lying) === None)
    // lost sync rejects
    assert(Multimodal.parseMp3(Array[Byte](0x12, 0x34, 0x56, 0x78)) === None)

    // padding bit: FF FB 92 00 = same frame +1 byte (418); the walk must
    // honor it or it desyncs at the second frame header
    val padded = Array[Byte](0xff.toByte, 0xfb.toByte, 0x92.toByte, 0x00) ++
      Array.fill(414)(0x55.toByte)
    assert(Multimodal.parseMp3(padded ++ padded) === Some((44100, 2, 2)))
    // VBR: a 160 kbps frame (FF FB A0 00, 522 bytes) after a 128 kbps one —
    // per-frame bitrate lookup counts both exactly
    val f128 = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Array.fill(413)(0x55.toByte)
    val f160 = Array[Byte](0xff.toByte, 0xfb.toByte, 0xa0.toByte, 0x00) ++
      Array.fill(518)(0x55.toByte)
    assert(Multimodal.parseMp3(f128 ++ f160 ++ f128) === Some((44100, 2, 3)))
    // ID3v2 footer flag (header flags bit 4) shifts the audio start 10 bytes
    val withFooter = "ID3".getBytes ++ Array[Byte](3, 0, 0x10, 0, 0, 0, 0) ++
      Array.fill(10)(0.toByte) ++ f128
    assert(Multimodal.parseMp3(withFooter) === Some((44100, 2, 1)))
    // trailing garbage (e.g. an ID3v1 tag) ends the walk, frames still count
    assert(Multimodal.parseMp3(f128 ++ "TAG-junk".getBytes) === Some((44100, 2, 1)))
  }

  test("featureKernel matches an independently computed byte-statistics fixture") {
    // all 256 byte values once: uniform histogram, known moments
    val content = Array.tabulate(256)(_.toByte)
    val dim = 8 // 4 bins + 4 moments
    val got = Multimodal.featureKernel(content, dim)
    // independent recomputation (collections code, not the while loop)
    val vals = content.map(_ & 0xff)
    val n = vals.length.toDouble
    val ps = (0 until 4).map(b => vals.count(v => v * 4 / 256 == b) / n)
    val mean = vals.sum / n
    val variance = vals.map(v => v.toDouble * v).sum / n - mean * mean
    val entropy = -ps.filter(_ > 0).map(p => p * math.log(p)).sum
    val expected = ps.map(_.toFloat) ++ Seq(
      (mean / 255.0).toFloat,
      (math.sqrt(variance) / 255.0).toFloat,
      (entropy / math.log(4.0)).toFloat,
      (math.log1p(n) / 32.0).toFloat)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6f, s"got ${got.toSeq}, expected $expected")
    }
    // uniform bytes: each bin 0.25, entropy ratio exactly 1
    assert(got.take(4).forall(p => math.abs(p - 0.25f) < 1e-6f))
    assert(math.abs(got(6) - 1f) < 1e-6f)
    // discrimination: constant payload has zero variance and entropy
    val const = Multimodal.featureKernel(Array.fill(100)(65.toByte), dim)
    assert(const(5) === 0f && const(6) === 0f)
    assert(const(0) === 0f && const(1) === 1f) // all bytes in bin 1 (65*4/256)
    // empty payload → zero vector, no division by zero
    assert(Multimodal.featureKernel(Array.emptyByteArray, dim).forall(_ === 0f))
  }

  test("resize performs a REAL nearest-neighbor pixel resize for PPM and BMP") {
    import spark.implicits._
    // 2x2 PPM, distinct colors: TL=red TR=green BL=blue BR=white
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    // 1x1: floor mapping keeps the top-left (red)
    val one = Multimodal.resizePpm(ppm, 1, 1).get
    assert(new String(one.take(11), "US-ASCII") === "P6\n1 1\n255\n")
    assert(one.drop(11).toSeq === Seq(255.toByte, 0, 0))
    // 2x1: top row survives (red, green)
    val wide = Multimodal.resizePpm(ppm, 2, 1).get
    assert(wide.drop(11).toSeq === Seq[Byte](255.toByte, 0, 0, 0, 255.toByte, 0))
    // upscale 4x2: each source pixel doubles horizontally
    val up = Multimodal.resizePpm(ppm, 4, 2).get
    assert(Multimodal.parsePpm(up) === Some((4, 2, 1)))
    assert(up.drop(11).take(6).toSeq === Seq[Byte](255.toByte, 0, 0, 255.toByte, 0, 0))

    // BMP 2x2 bottom-up 24bpp, same logical colors: rows are stored
    // bottom-first and BGR, each row padded to 4 bytes (2px*3B=6 → 8)
    def bgr(r: Int, g: Int, b: Int) = Array[Byte](b.toByte, g.toByte, r.toByte)
    val rowBottom = bgr(0, 0, 255) ++ bgr(255, 255, 255) ++ Array[Byte](0, 0) // BL, BR
    val rowTop = bgr(255, 0, 0) ++ bgr(0, 255, 0) ++ Array[Byte](0, 0)       // TL, TR
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val bmp = ("BM".getBytes("US-ASCII") ++ le32(54L + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)) ++
      rowBottom ++ rowTop
    assert(Multimodal.parseBmp(bmp) === Some((2, 2, 1)))
    val bOne = Multimodal.resizeBmp(bmp, 1, 1).get
    assert(Multimodal.parseBmp(bOne) === Some((1, 1, 1)))
    // the single surviving pixel is the logical top-left = red (BGR)
    assert(bOne.drop(54).take(3).toSeq === Seq[Byte](0, 0, 255.toByte))
    // resized BMP round-trips through the dataset-level resize stage
    val ds = Seq(MediaRow(9L, "image", bmp)).toDS()
    val out = Multimodal.resize(ds, 1, 1).collect()(0)
    assert(out.content.toSeq === bOne.toSeq)
    // compressed/unknown payloads keep the deterministic stub seam
    val stub = Multimodal.resize(
      Seq(MediaRow(8L, "image", "fake-png-bytes".getBytes)).toDS(), 4, 4)
      .collect()(0)
    assert(stub.content.length <= 4 * 4 / 64 + 1)
  }

  test("audioStats computes REAL per-channel PCM statistics; non-audio yields no rows") {
    import spark.implicits._
    // stereo 16-bit PCM fixture: ch0 = square wave ±1000 (alternating
    // sign every sample), ch1 = constant 500 (no crossings)
    val n = 8
    val data = new Array[Byte](n * 2 * 2)
    def put16(o: Int, v: Int): Unit = {
      data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte
    }
    for (i <- 0 until n) {
      put16((i * 2) * 2, if (i % 2 == 0) 1000 else -1000) // ch0
      put16((i * 2 + 1) * 2, 500)                          // ch1
    }
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val wav = ("RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000L) ++ le32(8000L * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong)) ++ data
    val ds = Seq(
      MediaRow(1L, "audio", wav),
      MediaRow(2L, "audio", "not-audio".getBytes)).toDS()
    val out = Multimodal.audioStats(ds).collect().sortBy(_.channel)
    assert(out.length === 2) // only the real WAV, one row per channel
    val ch0 = out(0); val ch1 = out(1)
    assert(ch0.sample_rate === 8000 && ch0.n_samples === 8)
    assert(ch0.rms === 1000.0 && ch0.peak === 1000)
    assert(ch0.zero_crossings === 7L) // sign flips between all 8 samples
    assert(ch1.rms === 500.0 && ch1.peak === 500 && ch1.zero_crossings === 0L)
  }

  // ---- ImageIO tier: real pixel decode for compressed still images ----

  /** 2x2 test pattern: TL=red TR=green BL=blue BR=white. */
  private def pattern2x2(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  test("resize decodes REAL PNG pixels (exact fixture, stub untouched)") {
    import spark.implicits._
    val png = encode(pattern2x2(), "png")
    assert(Multimodal.parsePng(png).map(t => (t._1, t._2)) === Some((2, 2)))
    // 1x1: floor mapping keeps the top-left (red); output is lossless PNG
    val one = Multimodal.resize(Seq(MediaRow(1L, "image", png)).toDS(), 1, 1)
      .collect()(0)
    val oneImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(one.content))
    assert(oneImg.getWidth === 1 && oneImg.getHeight === 1)
    assert((oneImg.getRGB(0, 0) & 0xffffff) === 0xff0000)
    // upscale 4x2: each source pixel doubles horizontally, exact grid
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(png, 4, 2).get))
    val want = Seq(0xff0000, 0xff0000, 0x00ff00, 0x00ff00,
      0x0000ff, 0x0000ff, 0xffffff, 0xffffff)
    val got = for (y <- 0 until 2; x <- 0 until 4) yield up.getRGB(x, y) & 0xffffff
    assert(got === want)
  }

  test("resize decodes REAL JPEG pixels (exact vs reference decode)") {
    val jpeg = encode(pattern2x2(), "jpg")
    assert(Multimodal.parseJpeg(jpeg).map(t => (t._1, t._2)) === Some((2, 2)))
    // JPEG is lossy: the fixture is the JDK's own decode of the same
    // bytes with the same floor mapping — bit-exact, not approximate.
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(jpeg, 4, 4).get))
    for (y <- 0 until 4; x <- 0 until 4)
      assert((out.getRGB(x, y) & 0xffffff) ===
        (ref.getRGB(x * 2 / 4, y * 2 / 4) & 0xffffff))
  }

  test("extractFeatures featurizes decoded pixels: PNG == same pixels as PPM") {
    import spark.implicits._
    val png = encode(pattern2x2(), "png")
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val ds = Seq(MediaRow(1L, "image", png), MediaRow(2L, "image", ppm)).toDS()
    val fs = Multimodal.extractFeatures(ds, 8).collect().sortBy(_.media_id)
    // two ENCODINGS of the same pixels → identical feature vectors
    assert(fs(0).feature.toSeq === fs(1).feature.toSeq)
    // and they equal the kernel over the raw RGB plane, not the encoded bytes
    val plane = Multimodal.rgbBytes(pattern2x2())
    assert(fs(0).feature.toSeq === Multimodal.featureKernel(plane, 8).toSeq)
    assert(fs(0).feature.toSeq !== Multimodal.featureKernel(png, 8).toSeq)
  }

  test("AVI/MJPEG: real container walk, real frame offsets, real frame pixel decode") {
    import spark.implicits._
    // the production fixture generator IS the container spec — the
    // spec used to hand-duplicate its byte layout line for line, which
    // only added a second place for a layout fix to miss
    val jpeg = graft.multimodal.MediaFixtures.jpeg(2, 2)
    val avi = graft.multimodal.MediaFixtures.aviMjpeg(2, 2, 2)

    val (w, h, frames) = Multimodal.parseAvi(avi).get
    assert((w, h, frames.size) === (2, 2, 2))
    // decode() reports the real dims + movi frame count
    val (dw, dh, nf, _) = Multimodal.decode(avi)
    assert((dw, dh, nf) === (2, 2, 2))
    // sampleFrames emits the REAL chunk offsets, and the bytes at the
    // offset ARE a decodable JPEG with the expected top-left pixel
    val refs = Multimodal.sampleFrames(
      Seq(MediaRow(5L, "video", avi)).toDS(), 1).collect().sortBy(_.frame_no)
    assert(refs.map(_.frame_no).toSeq === Seq(0, 1))
    refs.foreach { fr =>
      assert(avi.slice(fr.byte_offset.toInt, fr.byte_offset.toInt + 2).toSeq ===
        Seq(0xff.toByte, 0xd8.toByte)) // JPEG SOI at the reported offset
    }
    val img = Multimodal.frameImage(avi, 1).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert((img.getRGB(0, 0) & 0xffffff) === (ref.getRGB(0, 0) & 0xffffff))
    // out-of-range frame and non-AVI payloads reject
    assert(Multimodal.frameImage(avi, 2) === None)
    assert(Multimodal.frameImage("not-a-video".getBytes, 0) === None)
  }

  test("AVI/DIB: uncompressed frames decode to formula-exact pixels; luma sums match arithmetic") {
    val w = 5; val h = 3 // stride 16 > w*3 = 15: padding exercised
    val shifts = Seq(10, 10, 200)
    val avi = graft.multimodal.MediaFixtures.aviDib(w, h, shifts)
    val (pw, ph, frames) = Multimodal.parseAvi(avi).get
    assert((pw, ph, frames.size) === (w, h, 3))
    // every pixel of every frame equals the fixture formula exactly
    for (f <- shifts.indices; y <- 0 until h; x <- 0 until w) {
      val g = (x * 7 + y * 11 + shifts(f)) % 256
      val img = Multimodal.frameImage(avi, f).get
      assert((img.getRGB(x, y) & 0xffffff) === ((g << 16) | (g << 8) | g),
        s"frame $f pixel ($x,$y)")
    }
    // luma of gray is identity → the sum is the closed-form double sum
    val want = (0 until h).flatMap(y => (0 until w).map(x =>
      ((x * 7 + y * 11 + 200) % 256).toLong)).sum
    assert(Multimodal.frameLumaSum(avi, 2) === Some(want))
    // identical shifts → delta 0; scene boundary → delta > 0
    assert(Multimodal.frameLumaSum(avi, 0) === Multimodal.frameLumaSum(avi, 1))
    assert(Multimodal.frameLumaSum(avi, 1) !== Multimodal.frameLumaSum(avi, 2))
    // a size-mismatched chunk must NOT decode as DIB
    assert(Multimodal.dibImage(new Array[Byte](17), w, h) === None)
  }

  test("audioStats decodes REAL G.711 mu-law/A-law samples (ITU reference points)") {
    import spark.implicits._
    // ITU G.711 extremes pin the expansion: ulaw 0x00 = -32124,
    // 0xFF = 0; alaw 0xD5 = +8, 0x55 = -8, 0xAA = +32256
    assert(Multimodal.ulawDecode(0x00.toByte) === -32124)
    assert(Multimodal.ulawDecode(0xff.toByte) === 0)
    assert(Multimodal.alawDecode(0xd5.toByte) === 8)
    assert(Multimodal.alawDecode(0x55.toByte) === -8)
    assert(Multimodal.alawDecode(0xaa.toByte) === 32256)
    // sign symmetry: flipping the mu-law sign bit negates the sample
    for (v <- Seq(0x10, 0x34, 0x7f))
      assert(Multimodal.ulawDecode((v ^ 0x80).toByte) === -Multimodal.ulawDecode(v.toByte))

    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def wav(fmt: Int, data: Array[Byte]) =
      ("RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(fmt) ++ le16(1) ++
        le32(8000L) ++ le32(8000L) ++ le16(1) ++ le16(8) ++
        "data".getBytes("US-ASCII") ++ le32(data.length.toLong)) ++ data
    // mono mu-law: [max-negative, silence] -> peak 32124, one crossing? no:
    // -32124 then 0 (0 is not negative, sign changes) -> zc = 1
    val mu = wav(7, Array(0x00.toByte, 0xff.toByte))
    val muStats = Multimodal.audioStats(Seq(MediaRow(1L, "audio", mu)).toDS())
      .collect()(0)
    assert(muStats.peak === 32124 && muStats.n_samples === 2)
    assert(muStats.zero_crossings === 1L)
    // mono A-law: [+8, -8, +32256]
    val al = wav(6, Array(0xd5.toByte, 0x55.toByte, 0xaa.toByte))
    val alStats = Multimodal.audioStats(Seq(MediaRow(2L, "audio", al)).toDS())
      .collect()(0)
    assert(alStats.peak === 32256 && alStats.zero_crossings === 2L)
    assert(math.abs(alStats.rms - math.sqrt((8.0 * 8 + 8 * 8 + 32256.0 * 32256) / 3)) < 1e-9)
  }

  test("IMA ADPCM decodes for real: recurrence, fixture round-trip, stereo interleave") {
    import spark.implicits._
    // the recurrence at known points, stepped by hand from the public
    // IMA spec: pred=0, index=0 (step 7), nibble 4 -> diff = 7/8 + 7
    // = 7, sign bit set -> -7; index += 2
    assert(Multimodal.imaStep(0, 0, 0x4 | 0x8) === ((-7, 2)))
    // nibble 7 (all magnitude bits): diff = 7/8 + 7/4 + 7/2 + 7 = 11;
    // index += indexTable(7) = 8
    assert(Multimodal.imaStep(0, 0, 0x7) === ((11, 8)))
    // clamp both ways, index floor at 0
    assert(Multimodal.imaStep(32760, 88, 0x7)._1 === 32767)
    assert(Multimodal.imaStep(-32760, 88, 0xf)._1 === -32768)
    assert(Multimodal.imaStep(0, 0, 0x0) === ((0, 0))) // index -1 clamps to 0

    // fixture round trip: metadata rides the fact chunk, samples ride
    // the real block decode; recompute the recurrence independently
    val g = 13
    val nb = 8
    val wavB = graft.multimodal.MediaFixtures.wavImaAdpcm(g, nb)
    assert(Multimodal.parseWav(wavB) === Some((8000, 1, nb * 2 + 1)))
    val Some((rate, ch, got)) = Multimodal.imaAdpcmSamples(wavB)
    assert(rate === 8000 && ch === 1 && got.length === nb * 2 + 1)
    var pred = (g * 997) % 24001 - 12000
    var idx = g % 89
    val want = Array.newBuilder[Int]
    want += pred
    for (i <- 0 until nb * 2) {
      val (p, ix) = Multimodal.imaStep(pred, idx, (g * 7 + i * 5) % 16)
      pred = p; idx = ix; want += p
    }
    assert(got.toSeq === want.result().toSeq)

    // audioStats rides the same decode (peak = max |sample|)
    val st = Multimodal.audioStats(
      Seq(Multimodal.MediaRow(5L, "audio", wavB)).toDS()).collect()(0)
    assert(st.n_samples === nb * 2 + 1)
    assert(st.peak === got.map(math.abs).max)

    // stereo: hand-assemble a 2-channel single-group block and check
    // the 4-byte-per-channel round-robin interleave — ch0's first
    // data byte decodes frames 1-2 of channel 0, ch1's decodes
    // frames 1-2 of channel 1
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val blockAlign = 2 * 4 + 2 * 4 // 2 headers + one 4-byte group each
    val block = new Array[Byte](blockAlign)
    // ch0: pred 100, idx 0; ch1: pred -200, idx 10
    block(0) = 100; block(1) = 0; block(2) = 0
    block(4) = (-200 & 0xff).toByte; block(5) = ((-200 >> 8) & 0xff).toByte
    block(6) = 10
    block(8) = 0x21 // ch0 nibbles 1, 2
    block(12) = 0x43 // ch1 nibbles 3, 4
    val stereo = ("RIFF".getBytes("US-ASCII") ++ le32(4L + 28 + 12 + 8 + blockAlign) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++ le16(0x11) ++ le16(2) ++
      le32(8000L) ++ le32(8000L) ++ le16(blockAlign) ++ le16(4) ++
      le16(2) ++ le16(9) ++
      "fact".getBytes("US-ASCII") ++ le32(4) ++ le32(9L) ++
      "data".getBytes("US-ASCII") ++ le32(blockAlign.toLong)) ++ block
    val Some((_, ch2, inter)) = Multimodal.imaAdpcmSamples(stereo)
    assert(ch2 === 2)
    assert(inter.length === 18) // 9 frames x 2 channels
    assert(inter(0) === 100 && inter(1) === -200) // header frame
    val (c0f1, i01) = Multimodal.imaStep(100, 0, 1)
    val (c0f2, _) = Multimodal.imaStep(c0f1, i01, 2)
    val (c1f1, i11) = Multimodal.imaStep(-200, 10, 3)
    val (c1f2, _) = Multimodal.imaStep(c1f1, i11, 4)
    assert(inter(2) === c0f1 && inter(4) === c0f2)
    assert(inter(3) === c1f1 && inter(5) === c1f2)
  }

  test("probe counts REAL animated-GIF frames via the frame walk") {
    // two-frame animated GIF via the JDK's own sequence writer
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    assume(writers.hasNext, "no gif writer")
    val writer = writers.next()
    val baos = new java.io.ByteArrayOutputStream()
    val stream = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(stream)
    writer.prepareWriteSequence(null)
    writer.writeToSequence(new javax.imageio.IIOImage(pattern2x2(), null, null), null)
    writer.writeToSequence(new javax.imageio.IIOImage(pattern2x2(), null, null), null)
    writer.endWriteSequence()
    stream.close(); writer.dispose()
    val gif = baos.toByteArray
    val (w, h, nf, _) = Multimodal.decode(gif)
    assert((w, h, nf) === (2, 2, 2))
    // single-frame GIF still reports 1
    val (_, _, nf1, _) = Multimodal.decode(encode(pattern2x2(), "gif"))
    assert(nf1 === 1)
  }
}
