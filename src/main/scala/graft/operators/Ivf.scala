package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Trained IVF index for ANN over an embedding column: k-means coarse
  * centroids (deterministic Lloyd iterations — init is the first k
  * vectors by id, ties in assignment break by centroid id), an
  * inverted file (vector → cell), and cell-probed exact search.
  *
  * Scale shape: training is iters × (one broadcast pass + one
  * groupBy); the inverted file is the partitioning key for the
  * corpus; a query touches nprobe/k of the data. Probing ALL cells
  * degenerates to exact brute force — the property the spec pins
  * (llm_similarity_ivf is the static-quantizer, oracle-verified
  * variant of the same idea).
  */
object Ivf {

  /** Deterministic k-means centroids as (cid, cv). `vectors` must
    * have (vec_id LONG, embedding ARRAY<FLOAT|DOUBLE>). The centroid
    * table is collected to the driver after every iteration (k tiny
    * rows) and re-created — without that plan reset, each iteration
    * references the previous centroid PLAN twice and the unexecuted
    * tree (and recompute cost) grows as 2^iters. */
  def train(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame = {
      val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      rows.toSeq.toDF("cid", "cv")
    }
    var cent = materialize(vectors.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv")))
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, cent)
      // element-wise mean per cell: explode dims → avg → re-assemble
      val recomputed = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cid"), transform(col("dims"), d => d.getField("m")).as("mv"))
      // a cell that attracted no points keeps its previous centroid —
      // otherwise k silently shrinks and probe()/nprobe sizing lies
      cent = materialize(cent.join(recomputed, Seq("cid"), "left_outer")
        .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv")))
    }
    cent
  }

  /** Inverted file: each vector labeled with its nearest cell. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("dist", l2sq(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** Exact top-k cosine over the nprobe nearest cells per query.
    * Takes the PRE-BUILT inverted file (from [[assign]], ideally
    * persisted/stored partitioned by cid) — rebuilding the corpus
    * assignment per probe call would defeat the index: the inverted
    * file is query-independent and amortizes across every probe.
    * Output: (qid, rk, nid, cos). */
  def probe(inverted: DataFrame, centroids: DataFrame, queries: DataFrame,
            nprobe: Int, topk: Int): DataFrame = {
    val inv = inverted
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cid"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    val probed = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", l2sq(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    probed.join(inv, Seq("cid")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= topk)
      .select(col("qid"), col("rk"), col("nid"), col("cos"))
  }
}
