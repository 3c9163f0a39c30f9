package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OTHER skew tool, demonstrated: AQE's runtime skew-join split.
  * The manual `Salt` path (SaltSpec) rewrites the plan at authoring
  * time; AQE re-plans at runtime from observed partition sizes. A 100 TB
  * deployment runs with BOTH armed — salt for aggregations and the
  * joins you know are skewed, AQE for the ones you discover in
  * production. docs/SCALE.md §"Skew" records the tradeoff. */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the skewed join partition at runtime; rows identical to the un-split join") {
    val s = spark; import s.implicits._
    // 99% of fact rows share one key; the pad column gives the hot
    // partition real bytes so the size-based skew detector can see it
    val fact = (1L to 60000L).map { i =>
      val k = if (i % 100 != 0) "hot" else s"cold_${i % 37}"
      (i, k, "x" * 64)
    }.toDF("id", "k", "pad")
    val dim = (Seq("hot") ++ (0 until 37).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, v) => (k, v.toLong) }.toDF("k", "label")

    def joined() = fact.join(dim, Seq("k")).select(col("id"), col("label"))

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      // force a sort-merge join (no broadcast escape hatch), and lower
      // the skew thresholds to test-corpus scale — at 100 TB the
      // DEFAULTS (256 MB threshold, 5x median) fire on real skew
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")

      val df = joined()
      val withAqe = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"the final AQE plan must mark the join skew-split; got:\n$plan")

      // correctness is non-negotiable: the split must be a pure physical
      // rewrite, identical to the same join with AQE off
      conf.set("spark.sql.adaptive.enabled", "false")
      val without = joined().collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(withAqe === without)
      assert(withAqe.length === 60000)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
