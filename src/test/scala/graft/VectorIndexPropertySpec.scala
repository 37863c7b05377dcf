package graft

import java.nio.file.Files
import scala.util.Random
import org.apache.spark.sql.functions.col
import graft.core._
import graft.plans.FloatsFromPayload

/** Model-based lifecycle fuzz for the persisted vector index: random
  * interleavings of put / overwrite / refresh / compactVectorIndex /
  * compactBucket / erase, checked after every refresh point against a
  * trivial in-memory model (the last write per key wins; erased keys
  * are gone). The example-based VectorIndexSpec pins known corners;
  * this spec exists for the corners nobody thought to write down —
  * the round-12 hazard (compactBucket LWW-folding the superseded
  * table row so refresh lost its tombstone evidence) is exactly the
  * kind of interleaving a seeded random walk reaches and a curated
  * spec missed. Seeds are FIXED: every run replays the same walks.
  *
  * Checked invariants at each sync point (watermark == currentSeq):
  *  - vectorIndexInverted() == model: same key set, same float32
  *    vector per key, one row per key (tombstone-resolved).
  *  - vectorIndexStats() populations sum to |model|.
  *  - annSearch over all cells returns exactly the model's keys.
  */
class VectorIndexPropertySpec extends SparkTestBase {

  private val Dim = 4

  private def fresh(): (Engine, TestClock) = {
    val dir = Files.createTempDirectory("graft-vprop").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions(
      databaseName = "vprop", dataDir = dir,
      indexDepth = 1, payloadSize = 4 * Dim,
      bucketDuration = 1000L, resolution = 10L,
      maxHotBuckets = 12)
    (new Engine(spark, opts, clock), clock)
  }

  private def vecOf(rnd: Random): Seq[Float] =
    Seq.fill(Dim)((rnd.nextInt(41) - 20) / 10.0f) // coarse grid — exact float32s

  private def checkModel(e: Engine, model: Map[String, Seq[Float]]): Unit = {
    val inv = e.vectorIndexInverted()
      .select(col("tag0"), col("vec"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toSeq)
    assert(inv.length === model.size,
      s"inverted file must hold one live row per key: got ${inv.length}, want ${model.size}")
    assert(inv.toMap === model, "stored vectors must be the last write per key")
    if (model.nonEmpty) {
      val stats = e.vectorIndexStats().collect()
      assert(stats.map(_.getAs[Long]("n_rows")).sum === model.size.toLong)
      val q = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(org.apache.spark.sql.Row(1L, Seq(1f, 0f, 0f, 0f))), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("qid",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("qv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, false)))))
      val served = e.annSearch(q, nprobe = 4, topk = model.size + 5)
        .collect().map(_.getAs[String]("tag0")).toSet
      assert(served === model.keySet,
        "an all-cell probe must serve exactly the live keys")
    }
  }

  test("random put/overwrite/refresh/compact/erase walks agree with the LWW model") {
    for (seed <- Seq(101, 202, 303)) {
      val rnd = new Random(seed)
      val (e, _) = fresh()
      var model = Map.empty[String, Seq[Float]]
      // seed corpus: 6 keys across two far-apart clusters, then build
      val keys = (0 until 6).map(i => s"k$i")
      keys.zipWithIndex.foreach { case (k, i) =>
        val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)
        val v = base.zip(vecOf(rnd)).map { case (b, j) => b + j * 0.01f }
        assert(e.put(Seq(Point(11000L + 10L * i, Seq(k), FloatsFromPayload.encode(v)))) ===
          Map("ok" -> 1L))
        model += k -> v
      }
      e.buildVectorIndex(k = 2, iters = 2)
      checkModel(e, model)
      var nextKey = 6
      for (step <- 1 to 12) {
        rnd.nextInt(5) match {
          case 0 => // new key
            val k = s"k$nextKey"; nextKey += 1
            val v = vecOf(rnd)
            assert(e.put(Seq(Point(11000L + 10L * (nextKey + 6), Seq(k),
              FloatsFromPayload.encode(v)))) === Map("ok" -> 1L))
            model += k -> v
            e.refreshVectorIndex()
          case 1 if model.nonEmpty => // overwrite an existing key at its slot
            val k = model.keySet.toSeq.sorted.apply(rnd.nextInt(model.size))
            // the key's slot comes from the stored index — the engine
            // is the source of truth for where the key lives
            val storedSlot = e.vectorIndexInverted()
              .filter(col("tag0") === k).collect()(0).getAs[Long]("slot_ns")
            val v = vecOf(rnd)
            assert(e.put(Seq(Point(storedSlot, Seq(k),
              FloatsFromPayload.encode(v)))) === Map("ok" -> 1L))
            model += k -> v
            // half the time, LWW-fold the table BEFORE the refresh —
            // the round-12 tombstone-evidence hazard, walked randomly
            if (rnd.nextBoolean()) e.compactBucket(storedSlot - storedSlot % 1000L)
            e.refreshVectorIndex()
          case 2 => // fold the index chain
            e.compactVectorIndex()
          case 3 if model.nonEmpty => // erase a key
            val k = model.keySet.toSeq.sorted.apply(rnd.nextInt(model.size))
            e.erase(Seq(k))
            model -= k
          case _ => // compact a random touched bucket (table-side LWW fold)
            val buckets = e.bucketsOnDisk()
            if (buckets.nonEmpty) e.compactBucket(buckets(rnd.nextInt(buckets.length)))
        }
        if (step % 3 == 0) checkModel(e, model)
      }
      e.refreshVectorIndex()
      checkModel(e, model)
    }
  }
}
