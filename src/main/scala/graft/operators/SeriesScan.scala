package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Per-series sequential scans WITHOUT a per-series window funnel.
  *
  * `sum(...) OVER (PARTITION BY series ORDER BY ts)` funnels each
  * series' ENTIRE history through one task — with a handful of series
  * (this store's event_type has ~5) that is the 100 TB straggler the
  * repo's own weighted-median doc forbids, merely disguised by the
  * partitionBy. The decomposition here extends
  * [[DistributedRank.withPrefixSum]] (range-partition the total
  * order, scan locally, add back tiny per-partition carries) to
  * PER-SERIES scan state: range-partition by (series ++ order) so
  * each physical partition holds a contiguous run of at most a few
  * series, run every window partitioned by (partition-id, series) —
  * parallelism = #partitions, never #series — then collect ONE
  * boundary row per (partition, series) (≤ partitions + series rows,
  * driver-side), fold the boundary state sequentially per series in
  * partition order, and broadcast the per-(partition, series)
  * corrections back.
  *
  * Two scan states are supported, both exact int64:
  *   - EXCLUSIVE per-series prefix sum of an integer column (the
  *     volume clock of kdb_volume_bars / kdb_vpin);
  *   - the TICK-RULE direction (Easley/López de Prado/O'Hara): sign
  *     of the last non-zero value delta so far, nulls carried. The
  *     delta at a partition boundary needs the PREVIOUS partition's
  *     last value; the boundary fold reconstructs each partition-head
  *     row's delta sign (`sfirst`) on the driver and threads the
  *     carry through: dir(r) = latest non-null of [carry entering the
  *     partition, sfirst, local signs at rows 2..r]. Rows before any
  *     non-zero delta stay null (callers choose the default).
  *
  * Reference analog: none (extended analytics surface; the reference
  * stores opaque payloads, kdb.go:27-28). */
object SeriesScan {

  /** df + per-series scan columns, one range shuffle total.
    *
    * @param seriesCol  low-cardinality series key column NAME
    * @param order      within-series total order (must be unique)
    * @param valueCol   integer value column (cast to long)
    * @param exclName   output: exact per-series EXCLUSIVE prefix sum
    * @param totName    output: per-series grand total (optional)
    * @param dirName    output: tick-rule carried sign, null until the
    *                   series' first non-zero delta (optional)
    */
  def scan(df: DataFrame, seriesCol: String, order: Seq[Column],
      valueCol: Column, exclName: String, totName: Option[String] = None,
      dirName: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val wloc = Window.partitionBy(col("__pid"), col(seriesCol)).orderBy(order: _*)
    val wrun = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.repartitionByRange(parts, (col(seriesCol) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__ps", sum(col("__v")).over(
        wloc.rowsBetween(Window.unboundedPreceding, -1)))
    val staged =
      if (dirName.isEmpty) base
      else base
        .withColumn("__d", col("__v") - lag(col("__v"), 1).over(wloc))
        .withColumn("__s",
          when(col("__d") > 0, 1L).when(col("__d") < 0, -1L))
        .withColumn("__c", last(col("__s"), ignoreNulls = true).over(wrun))
    // pin the partitioning: the boundary collect and the final pass
    // must see the SAME physical __pid assignment
    val local = staged.localCheckpoint()

    // one boundary row per (partition, series): series total, first/
    // last value in order, and (dir only) the last non-null LOCAL sign
    val obs = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    def keyed(v: Column, n: String) = struct((obs :+ v.as(n)): _*)
    val aggs = Seq(
      sum(col("__v")).as("tot"),
      min(keyed(col("__v"), "v")).as("fst"),
      max(keyed(col("__v"), "v")).as("lst")) ++
      (if (dirName.isDefined)
        Seq(max(when(col("__s").isNotNull, keyed(col("__s"), "s"))).as("ls"))
      else Nil)
    val bdf = local.groupBy(col("__pid"), col(seriesCol))
      .agg(aggs.head, aggs.tail: _*)
    val boundaries = bdf.collect()
    val pidIdx = bdf.schema.fieldIndex("__pid")
    val keyIdx = bdf.schema.fieldIndex(seriesCol)

    // sequential fold per series in partition order: each boundary row
    // yields the correction entering that (partition, series) group
    final case class B(pid: Int, key: Any, tot: Long, firstV: Long,
        lastV: Long, lastS: Option[Long])
    val bs = boundaries.map { r =>
      val tot = r.getLong(bdf.schema.fieldIndex("tot"))
      val firstV = r.getStruct(bdf.schema.fieldIndex("fst"))
        .getLong(order.size)
      val lastV = r.getStruct(bdf.schema.fieldIndex("lst"))
        .getLong(order.size)
      val lastS =
        if (dirName.isEmpty) None
        else Option(r.getStruct(bdf.schema.fieldIndex("ls")))
          .map(_.getLong(order.size))
      B(r.getInt(pidIdx), r.get(keyIdx), tot, firstV, lastV, lastS)
    }
    val corrections = bs.groupBy(_.key).toSeq.flatMap { case (key, rows) =>
      var off = 0L
      var lastCents: Option[Long] = None
      var carry: Option[Long] = None
      var totAll = 0L
      rows.foreach(b => totAll += b.tot)
      rows.sortBy(_.pid).map { b =>
        val sfirst: Option[Long] = lastCents.flatMap { lc =>
          val d = b.firstV - lc
          if (d > 0) Some(1L) else if (d < 0) Some(-1L) else None
        }
        val row = Row(b.pid, key, off, totAll,
          sfirst.map(Long.box).orNull, carry.map(Long.box).orNull)
        off += b.tot
        carry = b.lastS.orElse(sfirst).orElse(carry)
        lastCents = Some(b.lastV)
        row
      }
    }
    val corrSchema = StructType(Seq(
      StructField("__pid", bdf.schema(pidIdx).dataType, nullable = false),
      bdf.schema(keyIdx).copy(name = "__key"),
      StructField("__off", LongType, nullable = false),
      StructField("__tot", LongType, nullable = false),
      StructField("__sf", LongType, nullable = true),
      StructField("__ci", LongType, nullable = true)))
    val corr = spark.createDataFrame(
      spark.sparkContext.parallelize(corrections, 1), corrSchema)

    // null-safe key equality: a window PARTITION BY treats NULL as its
    // own group and keeps the rows; a plain === here would silently
    // DROP every null-series row (null === null is null)
    val joined = local.join(broadcast(corr),
      local("__pid") === corr("__pid") &&
        local(seriesCol) <=> corr("__key"))
      .drop(corr("__pid")).drop("__key")
      .withColumn(exclName, col("__off") + coalesce(col("__ps"), lit(0L)))
    val withTot = totName.fold(joined)(n => joined.withColumn(n, col("__tot")))
    val withDir = dirName.fold(withTot)(n => withTot.withColumn(n,
      coalesce(col("__c"), col("__sf"), col("__ci"))))
    withDir.drop("__pid", "__v", "__ps", "__off", "__tot", "__sf", "__ci")
      .drop("__d", "__s", "__c")
  }

  /** Per-series LAG columns (depth 1 or 2) without the per-series
    * window funnel — `lag(x, d) OVER (PARTITION BY series ORDER BY …)`
    * done as the same range-partition + local-window + boundary-fold
    * decomposition as [[scan]]: rows at local positions ≤ d take their
    * lag from the previous partition's tail (the last two values per
    * lag source, threaded through the driver fold). LEADs are lags
    * under a DESCENDING order. Each lag source is cast to long (the
    * integer-scan contract shared with [[scan]]).
    *
    * @param lags (source column, output name, depth ∈ {1, 2}) */
  def withLags(df: DataFrame, seriesCol: String, order: Seq[Column],
      lags: Seq[(Column, String, Int)]): DataFrame = {
    require(lags.nonEmpty && lags.forall(l => l._3 == 1 || l._3 == 2),
      "withLags supports depths 1 and 2")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val wloc = Window.partitionBy(col("__pid"), col(seriesCol)).orderBy(order: _*)
    val wcnt = Window.partitionBy(col("__pid"), col(seriesCol))
    val staged0 = df.repartitionByRange(parts, (col(seriesCol) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(wloc))
      .withColumn("__cnt", count(lit(1)).over(wcnt))
    val staged = lags.zipWithIndex.foldLeft(staged0) {
      case (acc, ((c, _, depth), i)) =>
        acc.withColumn(s"__v$i", c.cast("long"))
          .withColumn(s"__lag$i", lag(col(s"__v$i"), depth).over(wloc))
          // group-tail values, flagged per row so ONE agg finds them
          .withColumn(s"__last$i",
            when(col("__rn") === col("__cnt"), col(s"__v$i")))
          .withColumn(s"__slast$i",
            when(col("__rn") === col("__cnt") - 1, col(s"__v$i")))
    }
    val local = staged.localCheckpoint()
    val aggs = lags.indices.flatMap(i =>
      Seq(max(col(s"__last$i")).as(s"l$i"), max(col(s"__slast$i")).as(s"s$i"))) :+
      count(lit(1)).as("n")
    val bdf = local.groupBy(col("__pid"), col(seriesCol))
      .agg(aggs.head, aggs.tail: _*)
    val boundaries = bdf.collect()
    val pidIdx = bdf.schema.fieldIndex("__pid")
    val keyIdx = bdf.schema.fieldIndex(seriesCol)
    def optLong(r: Row, name: String): Option[Long] = {
      val i = bdf.schema.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    val corrections = boundaries.groupBy(_.get(keyIdx)).toSeq.flatMap {
      case (key, rows) =>
        // tail per lag source: (most recent, second most recent)
        val t1 = Array.fill[Option[Long]](lags.size)(None)
        val t2 = Array.fill[Option[Long]](lags.size)(None)
        rows.sortBy(_.getInt(pidIdx)).map { r =>
          val row = Row.fromSeq(
            r.getInt(pidIdx) +: key +:
              lags.indices.flatMap(i => Seq(
                t1(i).map(Long.box).orNull, t2(i).map(Long.box).orNull)))
          val n = r.getLong(bdf.schema.fieldIndex("n"))
          lags.indices.foreach { i =>
            val last = optLong(r, s"l$i")
            val slast = optLong(r, s"s$i")
            if (n >= 2) { t2(i) = slast; t1(i) = last }
            else { t2(i) = t1(i); t1(i) = last }
          }
          row
        }
    }
    val corrSchema = StructType(
      StructField("__pid", bdf.schema(pidIdx).dataType, nullable = false) +:
        bdf.schema(keyIdx).copy(name = "__key") +:
        lags.indices.flatMap(i => Seq(
          StructField(s"__p1_$i", LongType, nullable = true),
          StructField(s"__p2_$i", LongType, nullable = true))))
    val corr = spark.createDataFrame(
      spark.sparkContext.parallelize(corrections, 1), corrSchema)
    val joined = local.join(broadcast(corr),
      local("__pid") === corr("__pid") &&
        local(seriesCol) <=> corr("__key"))
      .drop(corr("__pid")).drop("__key")
    val out = lags.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name, depth), i)) =>
        acc.withColumn(name,
          if (depth == 1)
            when(col("__rn") === 1, col(s"__p1_$i")).otherwise(col(s"__lag$i"))
          else
            when(col("__rn") === 1, col(s"__p2_$i"))
              .when(col("__rn") === 2, col(s"__p1_$i"))
              .otherwise(col(s"__lag$i")))
    }
    lags.indices.foldLeft(out.drop("__pid", "__rn", "__cnt")) { (acc, i) =>
      acc.drop(s"__v$i", s"__lag$i", s"__last$i", s"__slast$i",
        s"__p1_$i", s"__p2_$i")
    }
  }

  /** Per-series EXCLUSIVE running MAX (max over strictly-preceding
    * rows; null until the second row of a series) — the watermark
    * shape (`max(event_time) OVER (… ROWS … AND 1 PRECEDING)`), same
    * decomposition: local exclusive running max + one boundary max
    * per (partition, series), carries folded on the driver. */
  def withPrefixMax(df: DataFrame, seriesCol: String, order: Seq[Column],
      valueCol: Column, outName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val wloc = Window.partitionBy(col("__pid"), col(seriesCol)).orderBy(order: _*)
    val local = df.repartitionByRange(parts, (col(seriesCol) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__pm", max(col("__v")).over(
        wloc.rowsBetween(Window.unboundedPreceding, -1)))
      .localCheckpoint()
    val bdf = local.groupBy(col("__pid"), col(seriesCol))
      .agg(max(col("__v")).as("m"))
    val boundaries = bdf.collect()
    val pidIdx = bdf.schema.fieldIndex("__pid")
    val keyIdx = bdf.schema.fieldIndex(seriesCol)
    val mIdx = bdf.schema.fieldIndex("m")
    val corrections = boundaries.groupBy(_.get(keyIdx)).toSeq.flatMap {
      case (key, rows) =>
        var carry: Option[Long] = None
        rows.sortBy(_.getInt(pidIdx)).map { r =>
          val row = Row(r.getInt(pidIdx), key, carry.map(Long.box).orNull)
          val m = if (r.isNullAt(mIdx)) None else Some(r.getLong(mIdx))
          carry = (carry ++ m).reduceOption(_ max _)
          row
        }
    }
    val corrSchema = StructType(Seq(
      StructField("__pid", bdf.schema(pidIdx).dataType, nullable = false),
      bdf.schema(keyIdx).copy(name = "__key"),
      StructField("__ci", LongType, nullable = true)))
    val corr = spark.createDataFrame(
      spark.sparkContext.parallelize(corrections, 1), corrSchema)
    local.join(broadcast(corr),
      local("__pid") === corr("__pid") &&
        local(seriesCol) <=> corr("__key"))
      .drop(corr("__pid")).drop("__key")
      // Spark's greatest skips nulls: null only when BOTH are (the
      // very first row of a series) — exactly exclusive-max semantics
      .withColumn(outName, greatest(col("__pm"), col("__ci")))
      .drop("__pid", "__v", "__pm", "__ci")
  }
}
