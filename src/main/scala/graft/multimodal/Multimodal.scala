package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata structs, processed in
  * partition-sized batches — the Spark-side shape a 100 TB media
  * pipeline needs (schema, batching, partitioning are real).
  *
  * The decode kernels themselves are DETERMINISTIC STUBS: this
  * container ships no image/audio codecs, so `decodeStub` derives
  * fake-but-stable dimensions from a content hash. Swapping in a real
  * codec changes only the function body passed to mapPartitions —
  * batch shape, schema, and the query plan are unchanged. (In PySpark
  * the same seam is a Pandas UDF over mapInPandas; here it is typed
  * mapPartitions, the Scala-native equivalent: per-partition iterator
  * in, per-partition iterator out, no per-row JVM boundary crossing.)
  */
object Multimodal {

  /** Input: one media object. `content` is the opaque payload. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata — what a real codec probe would return. */
  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, fingerprint: Long)

  /** One sampled frame reference (video frame-sampling shape). */
  final case class FrameRef(media_id: Long, frame_no: Int, byte_offset: Long)

  /** Deterministic stand-in for a codec probe: stable pseudo-metadata
    * from a 64-bit FNV-1a of the content (graft.plans.Fnv64, the same
    * hash exposed to SQL as fnv64()). REPLACE the body (not the
    * signature) with a real decoder when codecs are available. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int, Long) = {
    val pos = graft.plans.Fnv64.hash(content) & Long.MaxValue
    ((pos % 640).toInt + 1, ((pos >> 16) % 480).toInt + 1, ((pos >> 32) % 300).toInt + 1, pos)
  }

  /** Probe metadata for every media object. Partition-preserving
    * (no shuffle): each task decodes its partition's batch locally. */
  def probe(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, hgt, nf, fp) = decodeStub(r.content)
        MediaMeta(r.media_id, r.kind, r.content.length.toLong, w, hgt, nf, fp)
      }
    }
  }

  /** Frame sampling: every `everyN`-th frame of each video as a
    * (media_id, frame_no, byte_offset) row — the flatMap shape of a
    * real frame extractor (1 input row → k output rows). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, nFrames, _) = decodeStub(r.content)
        (0 until nFrames by everyN).map { f =>
          FrameRef(r.media_id, f, f.toLong * 4096L) // stub offset: fixed frame stride
        }
      }
    }
  }

  /** One resized media object (decoded dims + re-encoded payload). */
  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, content: Array[Byte])

  /** Resize: media → fixed-target-dimension media, the 1:1 transform
    * shape of an image resize/transcode stage. Partition-preserving;
    * output payload size is bounded by the target dimensions rather
    * than the input (what makes downstream stages plannable — a resize
    * stage normalizes the byte budget per row). Stub kernel: a strided
    * byte subsample of the source, deterministic in (content, w, h);
    * a real codec swaps the body, never the plan. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    require(w > 0 && h > 0)
    import media.sparkSession.implicits._
    val targetBytes = w * h / 64 + 1 // stand-in for the re-encoded size
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = r.content
        val out =
          if (src.isEmpty) Array.emptyByteArray
          else {
            val n = math.min(targetBytes, src.length)
            val stride = math.max(1, src.length / n)
            Array.tabulate(n)(i => src(math.min(i * stride, src.length - 1)))
          }
        ResizedMedia(r.media_id, r.kind, w, h, out)
      }
    }
  }

  /** One extracted feature vector (the embedding-extraction shape). */
  final case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  /** Feature extraction: media → fixed-dim float vector, the batch
    * shape of an embedding model applied to decoded media. Partition-
    * preserving like probe; the output column is exactly the
    * embeddings-table layout (`Array[Float]`), so extracted features
    * flow straight into the similarity/ANN operators (cosine top-k,
    * sign-LSH, IVF) with no schema adaptation. The kernel is the same
    * deterministic stub seam as decodeStub: a real model swaps the
    * function body, never the plan. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    require(dim > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val seed = graft.plans.Fnv64.hash(r.content)
        val vec = new Array[Float](dim)
        var h = seed
        var i = 0
        while (i < dim) {
          // splitmix64 step: deterministic, well-mixed per dimension
          h += 0x9e3779b97f4a7c15L
          var z = h
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          vec(i) = ((z >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
          i += 1
        }
        MediaFeature(r.media_id, r.kind, vec)
      }
    }
  }

  /** Demo source: wrap any (id, text) table into opaque media rows —
    * lets the plumbing run against the driver's documents table. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
      col("text").cast("binary").as("content"))
      .as[MediaRow]
  }
}
