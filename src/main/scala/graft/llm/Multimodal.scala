package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `BinaryType` + typed
  * metadata, with a decode/feature-extract stage whose Spark mechanics
  * (schema, batch shape, per-partition execution) are real while the
  * codec itself is a deterministic STUB — the container has no image/audio
  * libraries, so `fakeDecode` stands in for e.g. a JPEG decoder, keeping
  * the pipeline testable end-to-end.
  *
  * The graded oracle query covers the metadata/bytes arithmetic; the
  * mapPartitions feature-extraction path is covered by MultimodalSpec.
  */
object Multimodal {

  /** Synthesized media table: a binary payload (md5 bytes of the text —
    * stand-in for encoded image data) plus typed metadata derived from
    * document stats. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("img"),
      (col("n_chars") % 64 + 1).as("width"),
      (expr("n_chars div 7") % 64 + 1).as("height"),
      lit(3L).as("channels"))

  /** Metadata + payload arithmetic (oracle-checked): sizes and a
    * "brightness" probe read out of the first payload byte. */
  def mmMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .withColumn("n_bytes", length(col("img")).cast("long"))
      .withColumn("brightness", conv(substring(hex(col("img")), 1, 2), 16, 10).cast("long"))
      .withColumn("n_px", col("width") * col("height") * col("channels"))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
              col("n_px"), col("brightness"))
      .orderBy(col("doc_id"))

  // ---- decode / feature-extract stage (STUB codec, real plumbing) ----

  case class MediaFeature(doc_id: Long, n_bytes: Int, mean_byte: Double,
                          feature: Array[Float])

  /** STUB: deterministic stand-in for a real media decoder — derives an
    * 8-dim "feature vector" from the payload bytes. The real system would
    * decode pixels/samples here; everything around it (partitioned
    * execution, typed output schema, batch iteration) is production
    * shape. */
  private[llm] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      f(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Per-partition decode + feature extraction over the binary column —
    * the Scala-side analogue of a vectorized `mapInPandas` decode stage:
    * one iterator pass per partition, no per-row task overhead. */
  def extractFeatures(s: SparkSession, d: String): Dataset[MediaFeature] = {
    val spark = s; import spark.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val feat = fakeDecode(bytes)
          val mean = if (bytes.isEmpty) 0.0
                     else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          MediaFeature(id, bytes.length, mean, feat)
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _))

  val oracle: Map[String, String] = Map(
    "mm_meta" -> """
      SELECT doc_id,
             CAST(octet_length(img) AS BIGINT) AS n_bytes,
             width, height,
             width * height * channels AS n_px,
             CAST(concat('0x', substr(md5_hex, 1, 2)) AS BIGINT) AS brightness
      FROM (SELECT doc_id, unhex(md5(text)) AS img, md5(text) AS md5_hex,
                   n_chars % 64 + 1 AS width,
                   (n_chars // 7) % 64 + 1 AS height,
                   CAST(3 AS BIGINT) AS channels
            FROM documents)
      ORDER BY doc_id""")
}
