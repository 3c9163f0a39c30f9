package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** pHash sizing behavior: the graded 16-bit/4-bit sizing vs the
  * production 64-bit/16-bit sizing, and the cap divergence point the
  * mirrored oracle guards (ADVICE r6). */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("wide sizing thins band buckets: 16-bit bands stay far under the cap the 4-bit bands approach") {
    def maxBucket(sigBits: Int, bandBits: Int): Long =
      Multimodal.phashBanded(spark, sf, sigBits, bandBits)
        .groupBy(col("band"), col("nib")).count()
        .agg(max(col("count"))).head().getLong(0)
    val narrow = maxBucket(16, 4)
    val wide = maxBucket(64, 16)
    assert(wide < narrow,
      s"64/16 sizing must thin occupancy: wide=$wide narrow=$narrow")
    // the production claim: at graded scale the cap exists purely as the
    // skew guard — no wide bucket comes near it
    assert(wide < graft.llm.HashDedup.DefaultMaxBucket / 4,
      s"wide max bucket $wide too close to the cap")
  }

  test("16-bit graded sizing == parameterized pipeline at (16, 4)") {
    val a = Multimodal.mmPhashPairs(spark, sf).collect().toSeq
    val b = Multimodal.mmPhashPairsSized(spark, sf, 16, 4).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty, "graded sizing must produce collision volume at sf0.01")
  }

  test("divergence point: an over-cap bucket drops its pairs on BOTH engines (cap mirrored in the oracle)") {
    // 1100 identical payloads: every band bucket holds all 1100 docs —
    // past the 1024 cap, so the capped pipeline must emit NOTHING (the
    // QUALIFY-capped oracle computes the same empty set), while an
    // uncapped run of the same corpus proves the pairs were really there
    val s = spark; import s.implicits._
    val text = "identical payload body shared by every document in this corpus"
    val docs = (1L to 1100L).map(i => (i, text, "en", "srcX", text.length.toLong))
    val tmp = Files.createTempDirectory("graft_phash_cap").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Multimodal.mmPhashPairsSized(spark, tmp, 16, 4).collect().isEmpty,
      "over-cap buckets must contribute no pairs")
    val uncapped = Multimodal.mmPhashPairsSized(spark, tmp, 16, 4,
      maxBucket = Int.MaxValue).collect()
    assert(uncapped.length === 4, "all 4 bands collide when uncapped")
    val perBand = 1100L * 1099L / 2
    assert(uncapped.forall(_.getLong(1) === perBand),
      "uncapped candidate volume must be the full pair expansion")
  }
}
