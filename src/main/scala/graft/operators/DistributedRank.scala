package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` moves every row to one
  * partition — the canonical 100 TB straggler. The decomposition
  * here is the classic distributed sort-rank: range-partition by the
  * full sort order (boundaries come from sampling, but ANY
  * sort-consistent boundaries yield exact ranks — sampling affects
  * balance, never correctness, because the order columns must form a
  * TOTAL order), rank within each partition (a partitioned window —
  * distributed), collect the per-partition row counts (one tiny
  * row per partition), and add each partition's cumulative offset
  * back. The branch point is localCheckpoint-pinned so the offsets
  * map and the final pass see the SAME physical partitioning — a
  * re-sampled exchange between two actions would mismatch them.
  *
  * ntile derives from the global rank in closed form, reproducing
  * SQL ntile's first-(N mod k)-buckets-get-one-extra rule — the
  * llm_curriculum_order decomposition generalized to arbitrary sort
  * keys (the histogram variant there needs a low-cardinality first
  * key; this one only needs a total order). */
object DistributedRank {

  /** df + `rankName` column holding the exact 1-based global rank by
    * `order` (which MUST be a total order — add a unique tiebreak).
    * One range shuffle + one partitioned window; the input is
    * materialized via localCheckpoint at the branch point. */
  def withGlobalRank(df: DataFrame, rankName: String, order: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val local = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .localCheckpoint()
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = counts.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), pid) =>
        (pid, acc + counts(pid))
      }
      .sliding(2).collect { case Seq((_, acc), (pid, _)) => (pid, acc) }
      .toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (c, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(c)
    }
    local.withColumn(rankName, offCol + col("__lr")).drop("__pid", "__lr")
  }

  /** df + `rankName` = exact 1-based global DENSE rank by `order` —
    * equal keys share a rank, ranks are consecutive over the distinct
    * key set. Same decomposition as [[withGlobalRank]] but WITHOUT
    * requiring (or building) a distinct input: range-partition by the
    * order (equal keys land in one partition by the RangePartitioner
    * contract), dense_rank within each partition, then add the
    * cumulative count of DISTINCT keys in earlier partitions (= each
    * partition's max local dense rank — one tiny row per partition).
    *
    * r14: this replaces the `distinct → withGlobalRank → join back`
    * shape (3 exchanges + a join per call) the suffix machinery paid
    * PER DOUBLING ROUND with ONE range exchange and no join — the
    * rank attaches in place. Rank values are bit-identical: a dense
    * rank over the same total order. */
  def withGlobalDenseRank(df: DataFrame, rankName: String,
      order: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val local = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ldr", dense_rank().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .localCheckpoint()
    val counts = local.groupBy(col("__pid"))
      .agg(max(col("__ldr")).as("n")) // distinct keys in partition
      .collect().map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
    val offsets = counts.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), pid) =>
        (pid, acc + counts(pid))
      }
      .sliding(2).collect { case Seq((_, acc), (pid, _)) => (pid, acc) }
      .toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (c, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(c)
    }
    local.withColumn(rankName, offCol + col("__ldr")).drop("__pid", "__ldr")
  }

  /** df + `outName` = exact EXCLUSIVE running sum of `valueCol` in
    * `order` (sum over all STRICTLY-preceding rows; the first row
    * gets 0) — the same decomposition as [[withGlobalRank]] but for
    * prefix sums: range-partition by the sort order, partial prefix
    * sums inside each partition (a partitioned window), collect one
    * per-partition total, add the cumulative offset back. `order`
    * must be a total order and `valueCol` an integer column (the
    * per-partition totals fold on the driver as exact Longs).
    * Replaces `sum() OVER (ORDER BY …)` — the other single-partition
    * window shape — with one range shuffle. */
  def withPrefixSum(df: DataFrame, valueCol: Column, outName: String,
      order: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val local = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__ps", sum(col("__v")).over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .localCheckpoint()
    val totals = local.groupBy(col("__pid")).agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = totals.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), pid) =>
        (pid, acc + totals(pid))
      }
      .sliding(2).collect { case Seq((_, acc), (pid, _)) => (pid, acc) }
      .toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (c, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(c)
    }
    local.withColumn(outName, offCol + coalesce(col("__ps"), lit(0L)))
      .drop("__pid", "__v", "__ps")
  }

  /** Multi-column variant of [[withPrefixSum]]: ONE range shuffle
    * computes an exact exclusive prefix sum for EACH (valueCol →
    * outName) pair. The k-sample statistics need one running sum per
    * sample (KS: two ECDFs; k-sample AD/KW: one per group) — calling
    * [[withPrefixSum]] k times would range-shuffle the same frame k
    * times; this pays the shuffle once and carries k window columns
    * through the same partitioned pass. */
  def withPrefixSums(df: DataFrame, sums: Seq[(Column, String)],
      order: Seq[Column]): DataFrame = {
    require(sums.nonEmpty)
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = sums.zipWithIndex.foldLeft(
      df.repartitionByRange(parts, order: _*)
        .withColumn("__pid", spark_partition_id())) {
      case (acc, ((c, _), i)) =>
        acc.withColumn(s"__v$i", c.cast("long"))
          .withColumn(s"__ps$i", sum(col(s"__v$i")).over(w))
    }
    val local = staged.localCheckpoint()
    val totAggs = sums.indices.map(i => sum(col(s"__v$i")).as(s"t$i"))
    val totals = local.groupBy(col("__pid"))
      .agg(totAggs.head, totAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sums.indices.map(i => r.getLong(i + 1)))
      .toMap
    val pids = totals.keys.toSeq.sorted
    val out = sums.zipWithIndex.foldLeft(local) { case (acc, ((_, name), i)) =>
      val offsets = pids
        .scanLeft((Int.MinValue, 0L)) { case ((_, cum), pid) =>
          (pid, cum + totals(pid)(i))
        }
        .sliding(2).collect { case Seq((_, cum), (pid, _)) => (pid, cum) }
        .toMap
      val offCol = offsets.foldLeft(lit(0L)) { case (c, (pid, off)) =>
        when(col("__pid") === pid, lit(off)).otherwise(c)
      }
      acc.withColumn(name, offCol + coalesce(col(s"__ps$i"), lit(0L)))
    }
    sums.indices.foldLeft(out.drop("__pid")) { (acc, i) =>
      acc.drop(s"__v$i", s"__ps$i")
    }
  }

  /** df + `tileName` = exact SQL-ntile(k) bucket by `order` (total
    * order required), via [[withGlobalRank]] + the closed-form
    * remainder rule. */
  def withNtile(df: DataFrame, tileName: String, k: Int, order: Seq[Column]): DataFrame = {
    require(k > 0)
    val ranked = withGlobalRank(df, "__r", order)
    val n = ranked.count() // served from the checkpoint, no recompute
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    val tile =
      if (base == 0) col("__r") // fewer rows than buckets: rank IS the tile
      else when(col("__r") <= cut, expr(s"(__r + $base) div ${base + 1}"))
        .otherwise(lit(rem) + expr(s"(__r - $cut + $base - 1) div $base"))
    ranked.withColumn(tileName, tile.cast("int")).drop("__r")
  }
}
