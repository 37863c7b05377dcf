package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TopK
import graft.functions.VectorFunctions._
import graft.operators.{Ivf, Pq}

/** r14 optimization equivalence pins: the window-rank top-k /
  * argmin paths were replaced by k-bounded typed aggregators and
  * per-row array argmins (guide §2.4 — the qid window funnels a
  * query's whole candidate population through one task; the assign
  * window shuffled k copies of every vector). These tests pin the
  * REPLACEMENT ≡ the exact window formulation it replaced, on data
  * with deliberate score ties, so the oracle twins' bit-equality
  * gate can never drift silently at the operator level. */
class TopKWindowEquivalenceSpec extends SparkTestBase {

  private def vectors = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("TopTaggedAgg(desc) == row_number window (score desc, tags, slot), with ties") {
    import spark.implicits._
    // scores quantized to force ties; tags/slot make the key unique
    val cand = spark.range(2000).select(
      (col("id") % 7).as("qid"),
      (col("id") % 5).cast("double").as("score"),
      array(concat(lit("t"), (col("id") % 11).cast("string"))).as("tags"),
      col("id").as("slot"),
      (col("id") % 3).as("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("tags").getItem(0), col("slot"))
    val viaWindow = cand
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .select(col("qid"), col("rk"), col("tags").getItem(0).as("tag0"),
        col("slot"), col("score"))
    val tk = udaf(TopK.TopTaggedAgg(4, asc = false))
    val viaAgg = cand
      .groupBy(col("qid"))
      .agg(tk(col("score"), col("tags"), col("slot"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "s")))
      .select(col("qid"), (col("rk0") + 1).as("rk"),
        col("s.tags").getItem(0).as("tag0"), col("s.slot").as("slot"),
        col("s.score").as("score"))
    assert(viaWindow.exceptAll(viaAgg).count() === 0L)
    assert(viaAgg.exceptAll(viaWindow).count() === 0L)
  }

  test("TopTaggedAgg(asc) == row_number window (score asc, tags, slot), with ties") {
    val cand = spark.range(1500).select(
      (col("id") % 6).as("qid"),
      (col("id") % 4).cast("double").as("score"),
      array((col("id") % 13).cast("string")).as("tags"),
      col("id").as("slot"),
      lit(0L).as("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score"), col("tags").getItem(0), col("slot"))
    val viaWindow = cand
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("qid"), col("rk"), col("slot"))
    val tk = udaf(TopK.TopTaggedAgg(3, asc = true))
    val viaAgg = cand
      .groupBy(col("qid"))
      .agg(tk(col("score"), col("tags"), col("slot"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "s")))
      .select(col("qid"), (col("rk0") + 1).as("rk"), col("s.slot").as("slot"))
    assert(viaWindow.exceptAll(viaAgg).count() === 0L)
    assert(viaAgg.exceptAll(viaWindow).count() === 0L)
  }

  test("Ivf.assign (array argmin) == crossJoin + window rank reference") {
    val cent = Ivf.train(vectors, k = 8, iters = 1)
    val viaArgmin = Ivf.assign(vectors, cent)
      .select(col("vec_id"), col("cid"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    val viaWindow = vectors.crossJoin(broadcast(cent))
      .withColumn("dist", l2sq(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    assert(viaArgmin.exceptAll(viaWindow).count() === 0L)
    assert(viaWindow.exceptAll(viaArgmin).count() === 0L)
  }

  test("Pq.encode (per-row argmin) == explode + window rank reference") {
    val (m, dim) = (8, 64)
    val books = Pq.train(vectors, m, dim, k = 16, iters = 1)
    val viaRowPass = Pq.encode(vectors, books, m, dim)
    // reference: the pre-r14 shape — explode subs, window-rank per
    // (vec, sub), reassemble by sub
    val sd = dim / m
    val subs = vectors.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("embedding").cast("array<double>").as("ev"))
      .select(col("vec_id"), col("sub"),
        slice(col("ev"), col("sub") * sd + 1, lit(sd)).as("sv"))
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dist"), col("cid"))
    val viaWindow = subs.join(broadcast(books), Seq("sub"))
      .withColumn("dist", l2sq(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
      .select(col("vec_id"),
        transform(col("sc"), s => s.getField("cid")).as("codes"))
    assert(viaRowPass.exceptAll(viaWindow).count() === 0L)
    assert(viaWindow.exceptAll(viaRowPass).count() === 0L)
  }

  test("Pq.search top-k via negated-score TopKAgg == (adc asc, nid) window reference") {
    val (m, dim) = (8, 64)
    val books = Pq.train(vectors, m, dim, k = 16, iters = 1)
    val enc = Pq.encode(vectors, books, m, dim)
    val qs = vectors.filter(col("vec_id") <= 3)
    // compare (qid, rk, nid) — adc is a groupBy double sum whose
    // partial-agg fold order may differ between the two PLANS (both
    // correct); the twins gate adc via rounding for the same reason
    val got = Pq.search(enc, books, qs, m, dim, topk = 5)
      .select(col("qid"), col("rk"), col("nid"))
    // reference: same ADC sums, ranked by the old window rule
    val table = vectors.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("qid"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("embedding").cast("array<double>").as("ev"))
      .select(col("qid"), col("sub"),
        slice(col("ev"), col("sub") * sd(m, dim) + 1, lit(sd(m, dim))).as("sv"))
      .join(books, Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"), l2sq(col("sv"), col("cv")).as("dsq"))
    val codes = enc.select(col("vec_id").as("nid"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
      .select(col("nid"), col("sub").cast("int").as("sub"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    val ref = codes.join(broadcast(table), Seq("sub", "cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("dsq")).as("adc"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("nid"))
    assert(got.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(got).count() === 0L)
  }

  private def sd(m: Int, dim: Int): Int = dim / m
}
