package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bus captures in interchange formats beyond parquet. The reference's
  * bus is replayable only while the broker retains it (core NATS keeps
  * nothing, reference yarn.lock:90-96); a capture makes it a table.
  * Parquet is the primary layout ([[BusLayout]] — columnar, partitioned,
  * prunable); CSV and JSON-lines exist for interchange with
  * non-columnar tooling.
  *
  * Reads take the schema EXPLICITLY: inference costs a full extra scan
  * and is type-lossy (CSV would land `ts` as STRING and every integer as
  * the widest type) — at 100 TB an inference pass is a second read of
  * the corpus. The timestamp format pins microsecond precision so a
  * round-trip is lossless for the engine's micros-resolution event time.
  */
object Capture {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .json(path)
}
