package graft

import java.nio.file.Files
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Property tests (SURVEY.md §5 plan): invariants that must hold for
  * ALL writes, not just the golden scenarios. Uses raw ScalaCheck
  * generators with fixed seeds (deterministic, offline-friendly —
  * the scalatestplus bridge isn't in the dependency cache); small
  * case counts because each case spins real Spark jobs. */
class EnginePropertySpec extends SparkTestBase {

  private val Now = 11999L
  private def freshEngine(): Engine = {
    val dir = Files.createTempDirectory("graft-prop").toString
    new Engine(spark,
      EngineOptions("propdb", dir, 2, 4, 1000L, 10L),
      new TestClock(Now))
  }

  // writes land in the hot window [10000, 11999]
  private val genPoint: Gen[Point] = for {
    ts <- Gen.choose(10000L, 11990L)
    t0 <- Gen.oneOf("a", "b", "c")
    t1 <- Gen.oneOf("a", "b", "c")
    b <- Gen.choose[Byte](1, 127)
  } yield Point(ts, Seq(t0, t1), Array[Byte](b, b, b, b))

  private val params = Gen.Parameters.default.withSize(8)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).getOrElse(sys.error("gen failed"))

  private def cases(n: Int): Seq[List[Point]] =
    (1 to n).map(s => sample(Gen.nonEmptyListOf(genPoint), s.toLong))

  test("get() always returns exactly (end-start)/resolution rows, any writes") {
    for (pts <- cases(4)) {
      val e = freshEngine()
      e.put(pts)
      assert(e.get(10500L, 11000L, Seq("a", "b")).count() === 50L)
    }
  }

  test("put→get roundtrip: the last write per (series, slot) is what get returns") {
    for (pts <- cases(4)) {
      val e = freshEngine()
      e.put(pts)
      // expected: per (tags, slot), the payload of the LAST point in
      // call order (seq order) — the reference's positional overwrite
      val expected = pts.zipWithIndex
        .groupBy { case (p, _) => (p.tags, p.ts - p.ts % 10L) }
        .map { case (k, group) => k -> group.maxBy(_._2)._1.payload.toSeq }
      pts.map(_.tags).distinct.foreach { tags =>
        val got = e.get(10000L, 12000L, tags).collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
        assert(got.size === 200)
        (10000L until 12000L by 10L).foreach { slot =>
          val want = expected.getOrElse((tags, slot), Seq[Byte](0, 0, 0, 0))
          assert(got(slot) === want, s"series $tags slot $slot")
        }
      }
    }
  }

  test("find(wildcard) covers get(): every series get() sees is in find() with same values") {
    for (pts <- cases(3)) {
      val e = freshEngine()
      e.put(pts)
      val found = e.find(10000L, 11990L, Seq("", ""))
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)) ->
          r.getAs[Array[Byte]]("payload").toSeq)
        .toMap
      pts.map(_.tags).distinct.foreach { tags =>
        e.get(10000L, 11990L, tags).collect().foreach { r =>
          val key = ((tags(0), tags(1)), r.getLong(0))
          assert(found(key) === r.getAs[Array[Byte]]("payload").toSeq)
        }
      }
    }
  }

  test("snapshot properties: getAsOf(currentSeq) ≡ get; earlier watermarks see earlier writes") {
    for (pts <- cases(3)) {
      val e = freshEngine()
      // two put calls: the watermark between them is a real snapshot
      val (first, second) = pts.splitAt(math.max(1, pts.size / 2))
      e.put(first)
      val mid = e.currentSeq()
      if (second.nonEmpty) e.put(second)
      pts.map(_.tags).distinct.foreach { tags =>
        // the full snapshot equals the live read, byte for byte
        val live = e.get(10000L, 12000L, tags).collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq)
        val snap = e.getAsOf(10000L, 12000L, tags, e.currentSeq()).collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq)
        assert(snap.toSeq === live.toSeq)
      }
      // the mid watermark reproduces exactly the first batch's world
      first.map(_.tags).distinct.foreach { tags =>
        val expected = first.zipWithIndex
          .filter(_._1.tags == tags)
          .groupBy { case (p, _) => p.ts - p.ts % 10L }
          .map { case (slot, g) => slot -> g.maxBy(_._2)._1.payload.toSeq }
        val got = e.getAsOf(10000L, 12000L, tags, mid).collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
        (10000L until 12000L by 10L).foreach { slot =>
          assert(got(slot) === expected.getOrElse(slot, Seq[Byte](0, 0, 0, 0)),
            s"series $tags slot $slot at watermark $mid")
        }
      }
    }
  }

  test("retention never affects data at or after the cutoff") {
    for (pts <- cases(3)) {
      val e = freshEngine()
      e.put(pts)
      // everything written is in buckets 10000/11000; cutoff below both
      e.removeBefore(10000L)
      pts.map(_.tags).distinct.foreach { tags =>
        assert(e.get(10000L, 12000L, tags).count() === 200L)
      }
    }
  }

  private def dump(e: Engine, tags: Seq[String]): Seq[(Long, Seq[Byte])] =
    e.get(10000L, 12000L, tags).collect()
      .map(r => r.getAs[Long]("slot_ns") -> r.getAs[Array[Byte]]("payload").toSeq).toSeq

  test("compaction is invisible to reads, for ANY write history (incl. overwrites)") {
    for ((pts, i) <- cases(3).zipWithIndex) {
      val e = freshEngine()
      // two independent random batches so LWW resolution spans batches
      // (overlapping (series, slot) writes resolve across them); the
      // union of BOTH batches' series is asserted, so single-batch
      // series from either put are covered too
      val pts2 = sample(Gen.nonEmptyListOf(genPoint), 1000L + i)
      e.put(pts)
      e.put(pts2)
      val tagSets = (pts ++ pts2).map(_.tags).distinct
      val before = tagSets.map(t => t -> dump(e, t)).toMap
      e.compactBucket(10000L)
      e.compactBucket(11000L)
      tagSets.foreach(t => assert(dump(e, t) === before(t), s"tags $t changed under compaction"))
      // idempotence: compacting both buckets again changes nothing
      e.compactBucket(10000L)
      e.compactBucket(11000L)
      tagSets.foreach(t => assert(dump(e, t) === before(t), s"tags $t changed under re-compaction"))
    }
  }

  test("reopen equivalence: an equal-options engine reads identically; any layout drift throws") {
    for (pts <- cases(2)) {
      val dir = Files.createTempDirectory("graft-prop-reopen").toString
      val opts = EngineOptions("rdb", dir, 2, 4, 1000L, 10L)
      val clock = new TestClock(Now)
      val e1 = new Engine(spark, opts, clock)
      e1.put(pts)
      val tagSets = pts.map(_.tags).distinct
      val expected = tagSets.map(t => t -> dump(e1, t)).toMap
      val e2 = new Engine(spark, opts, clock)
      tagSets.foreach(t => assert(dump(e2, t) === expected(t)))
      for (bad <- Seq(opts.copy(indexDepth = 3), opts.copy(payloadSize = 8),
          opts.copy(bucketDuration = 2000L), opts.copy(resolution = 20L))) {
        val eBad = new Engine(spark, bad, clock)
        val tags = Seq.fill(bad.indexDepth)("a")
        val ex = intercept[IllegalArgumentException](eBad.get(10000L, 10010L, tags))
        assert(ex.getMessage.contains(EngineErrors.OptionsMismatch))
      }
    }
  }

  test("DistributedRank ntile ≡ literal ntile for arbitrary (N, k, duplicate keys)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.DistributedRank
    // random sizes and bucket counts with duplicate-heavy keys — the
    // closed-form remainder rule and boundary-straddling ties must
    // hold for every shape, not just the fixture sizes
    val shapes = (1 to 6).map { s =>
      (sample(Gen.choose(1, 400), 100L + s), sample(Gen.choose(1, 9), 200L + s),
        sample(Gen.choose(2, 11), 300L + s))
    }
    for ((n, k, mod) <- shapes) {
      val df = spark.range(n.toLong).selectExpr("id", s"id % $mod AS key")
      val order = Seq(col("key"), col("id"))
      val got = DistributedRank.withNtile(df, "t", k, order)
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("key"), col("id"))))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got === want, s"mismatch at n=$n k=$k mod=$mod")
    }
  }
}
