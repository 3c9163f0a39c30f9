package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for repeated co-located joins.
  *
  * A join key both sides are bucketed on (same bucket count) lets Spark
  * plan the join with NO shuffle exchange on either side — at 100 TB the
  * difference between re-shuffling the fact table on every query and
  * reading co-located buckets. Use for the keys the workload joins
  * repeatedly (orders⋈customer on custkey, lineitem⋈orders on orderkey).
  */
object Bucketing {

  /** Persist `df` as a bucketed (+ in-bucket sorted) table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
