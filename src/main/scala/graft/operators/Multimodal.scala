package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition. The Spark
  * side — schema, partition-parallel decode, typed output — is real; the
  * codec itself is STUBBED (deterministic fake derived from the payload
  * bytes) because this container ships no image/audio libraries. A real
  * deployment swaps `decodeStub` for a JNI/FFI codec call (or mapInPandas
  * + PIL on the PySpark surface) without touching the plumbing.
  *
  * Scale notes: payloads never pass through a driver collect; decode is
  * mapPartitions (one codec init per partition, not per row); feature
  * records are small and columnar downstream.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, fmt: String, n_bytes: Int,
                          width: Int, height: Int, frames: Int)

  /** documents -> (doc_id, payload binary, meta struct) — the storage
    * schema of a multimodal dataset. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("origin"), col("lang"), col("n_chars")).as("meta"))

  /** STUB decode: deterministic pseudo-dimensions from payload length.
    * Replace with a real codec; the signature and batching stay. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val n = bytes.length
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaFeature(id, fmt, n, n % 640 + 16, n % 480 + 16, n % 24 + 1)
  }

  /** Partition-parallel feature extraction over the binary column. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeature] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize here, once per partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Feature summary per format — exercises binary encode -> typed
    * mapPartitions decode -> relational agg end-to-end. Oracle-able
    * because the stub's arithmetic is reproducible from n_chars (the
    * text is ASCII, so n_bytes == n_chars). */
  val q76_multimodal: Q = (s, d) => {
    extractFeatures(withPayload(Tables.documents(s, d)))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
           sum(col("n_bytes")).as("total_bytes"),
           sum(col("width")).as("sum_w"),
           sum(col("height")).as("sum_h"),
           max(col("frames")).as("max_frames"))
      .orderBy(col("fmt"))
  }

  case class FrameSample(doc_id: Long, n_frames: Int, n_sampled: Int, sampled_bytes: Long)

  /** Video-path plumbing: chunk each payload into fixed-size "frames",
    * keep every `every`-th one (uniform temporal sampling), account the
    * sampled bytes. A real pipeline decodes the kept frames; the chunking,
    * sampling rate, and per-partition batching are exactly this shape. */
  def sampleFrames(payloads: DataFrame, frameSize: Int = 64,
                   every: Int = 4): Dataset[FrameSample] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val frames = bytes.grouped(frameSize).toArray
          val sampled = frames.indices.filter(_ % every == 0)
          FrameSample(id, frames.length, sampled.length,
            sampled.map(i => frames(i).length.toLong).sum)
        }
      }
  }

  /** Frame sampling per document, oracle-reproducible from n_chars
    * (ASCII text -> n_bytes == n_chars; frame lengths are arithmetic). */
  val q122_frame_sample: Q = (s, d) => {
    sampleFrames(withPayload(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q76_multimodal" -> q76_multimodal,
    "q122_frame_sample" -> q122_frame_sample,
  )

  val oracles: Map[String, String] = Map(
    "q76_multimodal" ->
      """WITH f AS (SELECT doc_id, length(text) AS n,
        |    CASE length(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |         ELSE 'webp' END AS fmt
        |  FROM documents)
        |SELECT fmt, COUNT(1) AS n,
        |  CAST(SUM(n) AS BIGINT) AS total_bytes,
        |  CAST(SUM(n % 640 + 16) AS BIGINT) AS sum_w,
        |  CAST(SUM(n % 480 + 16) AS BIGINT) AS sum_h,
        |  MAX(n % 24 + 1) AS max_frames
        |FROM f GROUP BY fmt ORDER BY fmt""".stripMargin,
    "q122_frame_sample" ->
      """SELECT doc_id,
        |  CAST(ceil(length(text) / 64.0) AS INT) AS n_frames,
        |  CAST(len(range(0, CAST(ceil(length(text) / 64.0) AS INT), 4)) AS INT) AS n_sampled,
        |  CAST(COALESCE(list_aggregate(
        |    list_transform(range(0, CAST(ceil(length(text) / 64.0) AS INT), 4),
        |                   i -> least(64, length(text) - 64 * i)),
        |    'sum'), 0) AS BIGINT) AS sampled_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
