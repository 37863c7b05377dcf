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
}
