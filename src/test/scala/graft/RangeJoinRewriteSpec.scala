package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The transparent range-join rewrite ([[graft.plans.RangeJoinRewrite]],
  * VERDICT r12 #1/#2/#8): a RAW theta join — DataFrame or SQL text, no
  * [[graft.rel.RangeJoin]] call anywhere — whose only condition is a
  * point-in-interval / band / overlap predicate must execute
  * nested-loop-free AND row-identical to the naive plan it replaces;
  * the rule must stand down on an equi conjunct; the stats-derived bin
  * width is pinned on adversarial corpora. */
class RangeJoinRewriteSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  /** Collect rows as sorted strings with the rewrite DISABLED — the
    * ground truth the transparent plan must reproduce bit-for-bit. */
  private def naiveRows(df: => DataFrame): Seq[String] =
    withDisabled { df.collect().map(_.toString).sorted.toSeq }

  private def withDisabled[A](body: => A): A = {
    spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
    try body
    finally spark.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
  }

  private def executedPlan(df: DataFrame): String = {
    df.collect() // finalize adaptive re-planning before inspecting
    df.queryExecution.executedPlan.toString
  }

  private def assertNoNestedLoop(plan: String, what: String): Unit =
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"$what fell back to a nested loop:\n$plan")

  // the raw point-in-interval theta join over the corpus, built fresh
  // per call (fresh exprIds — exactly what a user query looks like)
  private def rawPointJoin(): DataFrame = {
    val ev = Tables.events(spark, sf)
    val wins = ev.select(date_trunc("DAY", col("ts")).as("day")).distinct()
      .select(col("day"), (col("day") + expr("INTERVAL 10 HOURS")).as("lo"),
        (col("day") + expr("INTERVAL 14 HOURS")).as("hi"))
    ev.join(wins, col("ts") >= col("lo") && col("ts") < col("hi"))
      .select(col("event_id"), col("day"))
  }

  test("raw point-in-interval theta join: executes nested-loop-free with " +
       "the rule, row-identical to the disabled (BNLJ) plan — and the " +
       "disabled plan really is a nested loop") {
    val withRule = rawPointJoin()
    val plan = executedPlan(withRule)
    assertNoNestedLoop(plan, "raw point-in-interval join")
    assert(plan.contains("Generate") || plan.contains("explode"),
      s"no interval explode in the rewritten plan — did the rule fire?\n$plan")
    val got = withRule.collect().map(_.toString).sorted.toSeq
    assert(got === naiveRows(rawPointJoin()))
    // the kill really is the rule's: disabled, the same query nested-loops
    withDisabled {
      val off = executedPlan(rawPointJoin())
      assert(off.contains("BroadcastNestedLoopJoin") ||
             off.contains("CartesianProduct"),
        s"disabled baseline did not nested-loop — test premise broken:\n$off")
    }
  }

  test("negative: an extra equi conjunct makes the rule stand down — " +
       "Spark's own hash join, no Generate synthesized") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    def q(): DataFrame = p.join(c,
        col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 DAY") &&
        col("cts") < col("pts"))
      .select(col("pid"), col("cts"))
    val plan = executedPlan(q())
    assert(!plan.contains("Generate"),
      s"rule fired despite the equi conjunct (bins synthesized):\n$plan")
    assertNoNestedLoop(plan, "equi-keyed interval join")
    assert(q().collect().map(_.toString).sorted.toSeq === naiveRows(q()))
  }

  test("raw band join (DataFrame) and raw overlap join: nested-loop-free " +
       "and row-identical to the disabled plans, null values included") {
    // band — with nulls on both sides to pin inherited null semantics
    val lv = spark.range(0, 200).select(col("id").as("lid"),
      when(col("id") % 17 === 0, lit(null)).otherwise(col("id") * 0.013d).as("lv"))
    val rv = spark.range(0, 200).select(col("id").as("rid"),
      when(col("id") % 13 === 0, lit(null)).otherwise(col("id") * 0.017d).as("rv"))
    def band(): DataFrame =
      lv.join(rv, abs(col("lv") - col("rv")) <= 0.05d)
        .select(col("lid"), col("rid"))
    val bandPlan = executedPlan(band())
    assertNoNestedLoop(bandPlan, "raw band join")
    assert(bandPlan.contains("Generate"),
      s"band rule did not fire:\n$bandPlan")
    assert(band().collect().map(_.toString).sorted.toSeq === naiveRows(band()))

    // overlap — the spans corpus of overlap_join_binned, raw predicate
    val spans = Tables.events(spark, sf).filter(col("user_id") < 20)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .localCheckpoint(true)
    val a = spans.select(col("user_id").as("ua"), col("day").as("da"),
      col("lo").as("alo"), col("hi").as("ahi"))
    val b = spans.select(col("user_id").as("ub"), col("day").as("db"),
      col("lo").as("blo"), col("hi").as("bhi"))
    def ov(): DataFrame =
      a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select(col("ua"), col("da"), col("ub"), col("db"))
    val ovPlan = executedPlan(ov())
    assertNoNestedLoop(ovPlan, "raw overlap join")
    val got = ov().collect().map(_.toString).sorted.toSeq
    assert(got === got.distinct,
      "canonical-bin rule failed through the rewrite: a pair matched twice")
    assert(got === naiveRows(ov()))
  }

  test("raw SQL text plans binned too: the graded range_join_sql query " +
       "executes nested-loop-free") {
    val df = graft.rel.RelQueries.queries("range_join_sql")(spark, sf)
    val plan = executedPlan(df)
    assertNoNestedLoop(plan, "SQL-text range join")
    assert(plan.contains("Generate"),
      s"SQL-text range join was not rewritten:\n$plan")
  }

  test("graded auto rows execute nested-loop-free (the plan contract of " +
       "the correctness rows)") {
    for (name <- Seq("range_join_auto", "band_join_auto", "overlap_join_auto")) {
      val df = graft.rel.RelQueries.queries(name)(spark, sf)
      assertNoNestedLoop(executedPlan(df), name)
    }
  }

  test("numeric axis: a raw DOUBLE point-in-interval theta join plans " +
       "binned, razor-edge values included, and the explode ceiling " +
       "widens the width for a pathological interval") {
    // razor-edge corpus: points sitting exactly on / one ulp around
    // multiples of plausible power-of-two widths, intervals with
    // razor endpoints — binned must equal naive pair-for-pair (the
    // monotone-division coverage argument, exercised where it bites)
    val pts = (-40 to 400).flatMap { k =>
      val v = k * 0.0625d
      Seq(v, math.nextAfter(v, Double.NegativeInfinity),
        math.nextAfter(v, Double.PositiveInfinity), v + 0.031d)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val p = spark.createDataFrame(pts).toDF("id", "v")
    val ivs = (0 until 60).map { k =>
      (k.toLong, k * 0.34d - 2d, k * 0.34d - 2d + (k % 7 + 1) * 0.11d)
    }
    val iv = spark.createDataFrame(ivs).toDF("iid", "lo", "hi")
    def q(): DataFrame = p.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("iid"))
    val plan = executedPlan(q())
    assertNoNestedLoop(plan, "raw numeric point-in-interval join")
    assert(plan.contains("Generate"), s"numeric rule did not fire:\n$plan")
    assert(q().collect().map(_.toString).sorted.toSeq === naiveRows(q()))
    // explode ceiling: one interval 10^6 wide among unit-scale ones
    // must NOT produce a million-bin sequence — the width widens until
    // the longest interval spans <= 4096 bins, and rows still match
    val skew = spark.createDataFrame(
      ivs :+ (999L, -500000d, 500000d)).toDF("iid", "lo", "hi")
    def sq(): DataFrame = p.join(skew, col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("iid"))
    val sPlan = executedPlan(sq()) // completing at all proves the bound
    assertNoNestedLoop(sPlan, "skew-interval numeric join")
    assert(sq().collect().map(_.toString).sorted.toSeq === naiveRows(sq()))
    // the graded numeric row, nested-loop-free
    val g = graft.rel.RelQueries.queries("range_join_values")(spark, sf)
    assertNoNestedLoop(executedPlan(g), "range_join_values")
    // DATE endpoints bin through unix_timestamp like timestamps
    val dp = spark.range(0, 300).select(col("id"),
      date_add(lit("2024-01-01").cast("date"), (col("id") % 90).cast("int"))
        .as("d"))
    val di = spark.range(0, 12).select(col("id").as("iid"),
      date_add(lit("2024-01-01").cast("date"), (col("id") * 7).cast("int"))
        .as("dlo"))
      .withColumn("dhi", date_add(col("dlo"), 5))
    def dq(): DataFrame = dp.join(di, col("d") >= col("dlo") && col("d") < col("dhi"))
      .select(col("id"), col("iid"))
    val dPlan = executedPlan(dq())
    assertNoNestedLoop(dPlan, "raw date point-in-interval join")
    assert(dPlan.contains("Generate"), s"date rule did not fire:\n$dPlan")
    assert(dq().collect().map(_.toString).sorted.toSeq === naiveRows(dq()))
  }

  test("stats-derived width: the integer decision is the documented " +
       "power-of-two clamp, pinned on adversarial corpora (many short " +
       "intervals vs few long ones)") {
    import graft.rel.RangeJoin
    // pure integer decision
    assert(RangeJoin.widthFromStats(0L, 0L) === 1L)      // degenerate
    assert(RangeJoin.widthFromStats(10L, 100L) === 1L)   // sub-second mean
    assert(RangeJoin.widthFromStats(9000L, 100L) === 64L)   // mean 90 s
    assert(RangeJoin.widthFromStats(1800000L, 100L) === 16384L) // mean 5 h
    assert(RangeJoin.widthFromStats(Long.MaxValue / 4, 1L) ===
      RangeJoin.MaxBinSeconds) // ceiling holds
    // one-pass derivation over frames: many short intervals...
    def ivs(n: Int, lenSec: Int): DataFrame =
      spark.range(0, n).select(
        (lit("2024-01-01 00:00:00").cast("timestamp") +
          expr(s"make_interval(0,0,0,0,0,0, id * 400)")).as("lo"))
        .withColumn("hi", col("lo") + expr(s"INTERVAL $lenSec SECONDS"))
    assert(RangeJoin.deriveBinSeconds(ivs(500, 90), "lo", "hi") === 64L)
    // ...vs few long ones
    assert(RangeJoin.deriveBinSeconds(ivs(3, 18000), "lo", "hi") === 16384L)
    // empty / all-null interval side falls back to the default
    assert(RangeJoin.deriveBinSeconds(ivs(0, 90), "lo", "hi") ===
      RangeJoin.DefaultBinSeconds)
    // and the auto API matches the fixed-width form row-for-row
    val ev = Tables.events(spark, sf)
    val wins = ev.select(date_trunc("DAY", col("ts")).as("day")).distinct()
      .select(col("day"), (col("day") + expr("INTERVAL 10 HOURS")).as("lo"),
        (col("day") + expr("INTERVAL 14 HOURS")).as("hi"))
    val auto = RangeJoin.pointInIntervalAuto(ev, "ts", wins, "lo", "hi")
      .select(col("event_id"), col("day")).collect().map(_.toString).sorted.toSeq
    val naive = ev.join(wins, col("ts") >= col("lo") && col("ts") < col("hi"))
      .select(col("event_id"), col("day"))
    assert(auto === naiveRows(naive))
  }
}
