package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.VectorOps

/** Similarity-search semantics not covered by the oracle: IVF structure,
  * determinism, and recall against the exact brute force. */
class VectorOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("ann_ivf: 3 ranked results per query, deterministic across runs") {
    val a = VectorOps.annIvf(spark, sf).collect()
    val b = VectorOps.annIvf(spark, sf).collect()
    assert(a.sameElements(b), "IVF search must be deterministic")
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(Array(1L, 2L, 3L)))
      val scores = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        "scores descend with rank")
    }
  }

  test("ann_ivf recall vs exact brute force is nontrivial and scores never exceed exact") {
    val exact = VectorOps.cosTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(1)).toSet).toMap
    val ivf = VectorOps.annIvf(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.sorted.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / 3.0
    }
    // weakly-clustered synthetic data: demand signal, not perfection
    assert(recalls.sum / recalls.length > 0.0,
      s"IVF should find at least some exact neighbors, recalls=$recalls")
    info(f"IVF recall@3 vs exact top-5: ${recalls.sum / recalls.length}%.2f")
  }
}
