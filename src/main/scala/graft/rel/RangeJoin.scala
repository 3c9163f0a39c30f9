package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval RANGE JOIN executed as an EQUI join on
  * time bins — the optimization Spark itself lacks (a pure range
  * predicate with no equi conjunct plans as BroadcastNestedLoopJoin:
  * O(|points|·|intervals|), the first thing to die at corpus scale).
  *
  * Shape: points land in the single bin containing their timestamp;
  * each interval EXPLODES to every bin it overlaps (⌈len/width⌉ + 1
  * rows — intervals are short relative to the corpus, so this is the
  * cheap side); the join is then a plain equi join on the bin id —
  * hash-partitioned, broadcastable, AQE-skew-splittable, everything a
  * real join gets — and the exact range predicate filters within the
  * bin-matched candidates. Each (point, interval) match survives
  * EXACTLY once: the point occupies one bin, so no dedup step is
  * needed. Work is O(|points| + Σ interval-bins + matches·density)
  * instead of the nested-loop product.
  *
  * Bin width tunes the trade: wider bins → fewer interval rows but
  * more false candidates per bin; the right width is ~the typical
  * interval length (every interval then covers ≤2 bins). Binning uses
  * whole-second timestamps (`unix_timestamp` truncation) — safe for
  * any width ≥ 1s because bin assignment only needs monotonicity; the
  * EXACT predicate runs on the full-precision timestamps, so boundary
  * semantics ([lo, hi)) are sub-second-exact.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose [lo, hi) contains
    * the point's `pointTs`. Column arguments are NAMES (the frames are
    * re-rooted internally); `binSeconds` is the bin width. */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, lo: String, hi: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds >= 1L, "bin width must be at least one second")
    val pb = points.withColumn("__bin",
      floor(unix_timestamp(col(pointTs)) / binSeconds))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(unix_timestamp(col(lo)) / binSeconds),
                       floor(unix_timestamp(col(hi)) / binSeconds))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointTs) >= col(lo) && col(pointTs) < col(hi))
      .drop("__bin")
  }
}
