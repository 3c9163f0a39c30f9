package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

/** The typed top-k Aggregator: partial-per-partition + merge equals the
  * brute-force answer (no global sort involved). */
class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("top-3 across many partitions matches brute force, ties by id") {
    val s = spark; import s.implicits._
    val data = (1L to 1000L).map(i => (i, (i % 97).toDouble))
    val ds = s.createDataset(data).repartition(8)
    val got = ds.select(new TopKAggregator(3).toColumn).collect().head
    val want = data.sortBy { case (id, sc) => (-sc, id) }.take(3)
    assert(got === want) // (96,96.0) then (193,96.0) then (290,96.0)
  }

  test("bottomk_by_hash sample is invariant to partition layout") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.bottomk_by_hash
    val s = spark; import s.implicits._
    val df = (1L to 5000L).map(i => (s"g${i % 7}", i)).toDF("g", "v")
    def sample(parts: Int) = df.repartition(parts)
      .groupBy(col("g")).agg(bottomk_by_hash(col("v"), 4).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val a = sample(2)
    val b = sample(17)
    assert(a === b, "sample must be a pure function of the value set")
    assert(a.values.forall(_.length === 4))
  }

  test("grouped top-2 per key") {
    val s = spark; import s.implicits._
    val data = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 7.0),
                   ("b", 4L, 1.0), ("b", 5L, 2.0))
    val got = s.createDataset(data)
      .groupByKey(_._1)
      .mapValues { case (_, id, sc) => (id, sc) }
      .agg(new TopKAggregator(2).toColumn)
      .collect().toMap
    assert(got("a") === Seq((2L, 9.0), (3L, 7.0)))
    assert(got("b") === Seq((5L, 2.0), (4L, 1.0)))
  }
}
