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

  test("ann_ivfadc: deterministic, and never beats the full-corpus ADC distance at any rank") {
    val a = VectorOps.annIvfAdc(spark, sf).collect()
    val b = VectorOps.annIvfAdc(spark, sf).collect()
    assert(a.sameElements(b), "IVF-PQ search must be deterministic")
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(Array(1L, 2L, 3L)))
      val d = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(d.zip(d.tail).forall { case (x, y) => x <= y }, "ADC ascends with rank")
    }
    // the probed-cell restriction can only LOSE candidates: at each rank the
    // IVF-PQ distance is >= the full-corpus ADC distance for that query
    val full = VectorOps.annAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    a.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(r.getDouble(3) >= full(key) - 1e-9,
        s"probed search beat the full scan at $key")
    }
  }

  test("ivfadc_recall_sweep: full grid, recall monotone in nprobe, and the " +
      "nprobe=2/4x16 point agrees with ivfadc_recall's aggregate") {
    val rows = VectorOps.ivfadcRecallSweep(spark, sf).collect()
    // complete operating-point grid: {4,8} subspaces x nprobe {1,2,4}
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (for (s <- Set(4L, 8L); n <- Set(1L, 2L, 4L)) yield (s, n)))
    rows.foreach(r => assert(r.getLong(2) === 15L, "n_exact = 5 queries x top-3"))
    // more probed cells monotonically widen the candidate set; at this
    // codebook scale recall never decreases along nprobe
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byProbe = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        s"recall not monotone in nprobe: ${g.mkString(", ")}")
    }
    // the (4x16, nprobe=2) sweep point IS the graded ivfadc_recall
    // pipeline's operating point: total hits must agree
    val sweepHits = rows
      .find(r => r.getLong(0) == 4L && r.getLong(1) == 2L).get.getLong(3)
    val recallHits = VectorOps.ivfadcRecall(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(sweepHits === recallHits,
      s"sweep point (4x16, nprobe=2) hits $sweepHits != ivfadc_recall $recallHits")
  }

  test("semantic_dedup: hand-built clusters pin the keep-farthest rule — a " +
      "chain through the nearest member drops ONLY that member") {
    val s = spark; import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    Seq(
      // label 1: two identical + one orthogonal → 1 pair, tie drops the
      // higher vec_id
      (10L, Array(1f, 0f), 1), (11L, Array(1f, 0f), 1), (12L, Array(0f, 1f), 1),
      // label 2: singleton → nothing to drop
      (20L, Array(3f, 4f), 2),
      // label 3: (2,1) is nearer the (1.5,0.5) centroid than (1,0) → the
      // nearer member drops, the farther is kept
      (30L, Array(1f, 0f), 3), (31L, Array(2f, 1f), 3),
      // label 4: A-B and B-C are dup pairs, A-C is not; B is the cluster
      // center (cc=1.0) → keep-farthest drops ONLY B (a keep-nearest
      // rule would drop A and C — 2 drops — so the count distinguishes)
      (40L, Array(1f, 0f), 4), (41L, Array(1f, 1f), 4), (42L, Array(0f, 1f), 4))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = SparkEntry.queries("semantic_dedup")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.toSeq === Seq(
      (1L, 3L, 1L, 1L, 0.3333),
      (2L, 1L, 0L, 0L, 0.0),
      (3L, 2L, 1L, 1L, 0.5),
      (4L, 3L, 2L, 1L, 0.3333)))
    // graded table: drops never exceed pairs or volume; rate in [0, 1]
    val g = SparkEntry.queries("semantic_dedup")(spark, sf).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) < r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("embed_matryoshka: n_hit equals the brute-force prefix∩full top-3 intersection") {
    import org.apache.spark.sql.functions._
    val got = VectorOps.embedMatryoshka(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === (0L until 5L).toSet)
    got.values.foreach(h => assert(h >= 0L && h <= 3L))
    // independent brute force on the driver (sf0.001 is small)
    val vs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(x: Array[Double], y: Array[Double], n: Int): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    (0L until 5L).foreach { q =>
      def top3(n: Int): Set[Long] = vs.keys.filter(_ != q).toSeq
        .sortBy(v => (-cos(vs(q), vs(v), n), v)).take(3).toSet
      assert(got(q) === top3(64).intersect(top3(16)).size.toLong, s"query $q")
    }
  }

  test("embed_neardup matches the graded query at the default cap (no block near it)") {
    val rows = VectorOps.nearDup(spark, sf).collect()
    // sf0.001 has ≤63-vector label blocks — nothing skipped, so results
    // equal full enumeration; sanity: pairs are ordered and thresholded
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "a < b")
      assert(r.getDouble(3) >= 0.4)
    }
  }

  test("embed_neardup degenerate hot label: over-cap blocks are skipped with a " +
      "reported metric; under-cap blocks still pair; per-task work stays bounded") {
    val s = spark; import s.implicits._
    val observed = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => observed.put(n, r) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })

    // label 0: a 40-vector hot block of IDENTICAL vectors (every pair
    // cosine 1.0 — the O(block²) worst case); label 1: a 2-vector block
    val hot = (0L until 40L).map(i => (0L, i, Array.fill(4)(1.0d)))
    val cool = Seq((1L, 100L, Array.fill(4)(2.0d)), (1L, 101L, Array.fill(4)(2.0d)))
    val e = (hot ++ cool).toDF("label", "vec_id", "v")
      .withColumn(
        "n2", graft.functions.GraftFunctions.dot_product(
          org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("v")))

    val pairs = VectorOps.nearDupPairs(e, maxBlock = 16).collect()
    // the hot label is over the cap: its ~780 pairs are NOT enumerated...
    assert(!pairs.exists(_.getLong(0) == 0L), "over-cap label must not expand pairs")
    // ...but the under-cap label still pairs normally
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 100L, 101L)))

    // the skip is observable, not silent: poll for the async listener
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var metric: Option[org.apache.spark.sql.Row] = None
    while (metric.isEmpty && System.nanoTime() < deadline) {
      import scala.jdk.CollectionConverters._
      metric = observed.asScala.collectFirst {
        case (name, row) if name.startsWith("lsh_skew") &&
          Option(row.getAs[java.lang.Long]("rows_in_oversized_buckets"))
            .exists(_.longValue > 0) => row
      }
      if (metric.isEmpty) Thread.sleep(100)
    }
    assert(metric.isDefined, "no lsh_skew metric reported skipped rows")
    assert(metric.get.getAs[Long]("max_bucket_size") === 40L)
    // >= not ==: the final orderBy's range-partitioner SAMPLING pass
    // re-executes the observe subtree, so the counter can double
    assert(metric.get.getAs[Long]("rows_in_oversized_buckets") >= 40L)
  }

  test("rrf_fusion: contiguous ranks, rrf recomputes from the leg ranks, " +
       "fusion genuinely outer (some rows carry one leg only), lexical " +
       "join broadcasts the query terms") {
    val df = VectorOps.rrfFusion(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"ranks not contiguous: ${ranks.toSeq}")
      assert(ranks.length <= 10)
    }
    rows.foreach { r =>
      val dr = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val lr = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(dr.isDefined || lr.isDefined, "row in neither ranking")
      val expect = dr.map(x => 1d / (60 + x)).getOrElse(0d) +
                   lr.map(x => 1d / (60 + x)).getOrElse(0d)
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"rrf ${r.getDouble(3)} != recomputed $expect")
    }
    // outer fusion: depth 20 legs over a 10-row cut should surface at
    // least one single-leg row at this sf (both legs disagree plenty)
    assert(rows.exists(r => r.isNullAt(4) ^ r.isNullAt(5)),
      "every output row appeared in both legs — outer fusion not exercised")
    // the lexical probe must broadcast the small query-term side, never
    // shuffle the corpus term frame against it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("IVF-PQ store lifecycle: loaded index answers identically to inline; " +
      "stale or fingerprint-less stores fail fast") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    // private copy of the embeddings fixture — this test mutates it
    val snap = Files.createTempDirectory("graft_ivfpq_snap").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .coalesce(1).write.mode("overwrite").parquet(s"$snap/embeddings.parquet")
    val store = Files.createTempDirectory("graft_ivfpq_store").toString
    VectorOps.writeIvfPq(spark, snap, store)
    val (cents, codes) = VectorOps.loadIvfPq(spark, store, snap)
    assert(cents.count() > 0 && codes.count() > 0)
    assert(cents.columns.toSeq === Seq("cell", "cv", "cn2"))
    assert(codes.columns.toSeq === Seq("vec_id", "label", "subspace", "code"))
    // the graded parity itself: loaded == inline on the real sf dir
    val inline0 = VectorOps.annIvfAdc(spark, sf).collect().map(_.toString).toSeq
    val loaded0 = VectorOps.annIvfAdcLoaded(spark, sf).collect().map(_.toString).toSeq
    assert(loaded0 === inline0,
      "persisted IVF-PQ index must answer exactly like the inline build")

    // rebuild the snapshot (same path, new bytes): the store must refuse
    Thread.sleep(1100) // distinct mtime even on coarse filesystems
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("label", col("label") + 1)
      .coalesce(1).write.mode("overwrite").parquet(s"$snap/embeddings.parquet")
    val stale = intercept[IllegalArgumentException] {
      VectorOps.loadIvfPq(spark, store, snap)
    }
    assert(stale.getMessage.contains("stale IVF-PQ store"))

    // a store without the sidecar proves nothing: also fail fast
    java.nio.file.Files.delete(java.nio.file.Paths.get(store, "_built_from.json"))
    val unfingerprinted = intercept[IllegalArgumentException] {
      VectorOps.loadIvfPq(spark, store, snap)
    }
    assert(unfingerprinted.getMessage.contains("_built_from"))
  }

  test("IVF-PQ incremental append: codebook frozen, codes grow by exactly the " +
      "delta, fingerprint advances through the load gate, bare dirs refuse") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val base = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
    assert(delta.count() > 0, "fixture must contain a nonempty delta slice")
    val store = Files.createTempDirectory("graft_ivfpq_appspec").toString
    VectorOps.writeIvfPqFrom(base, store, sf, "yesterday")
    val centsBefore = spark.read.parquet(s"$store/centroids")
      .collect().map(_.toString).sorted.toSeq
    val codesBefore = spark.read.parquet(s"$store/codes").count()

    VectorOps.appendIvfPq(spark, store, delta, sf, VectorOps.embFingerprint(sf),
      deltaId = "spec-delta")

    // FROZEN codebook: the append must not touch a single centroid byte
    val centsAfter = spark.read.parquet(s"$store/centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(centsAfter === centsBefore, "append retrained the codebook")
    // codes grew by exactly the delta, and every delta vector is encoded
    val codesAfter = spark.read.parquet(s"$store/codes")
    assert(codesAfter.count() === codesBefore + delta.count() * 4,
      "append must add 4 subspace codes per delta vector, nothing else")
    val deltaIds = delta.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val codedIds = codesAfter.select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deltaIds.subsetOf(codedIds), "a delta vector is missing its codes")
    // the fingerprint advanced: the load gate now accepts the store
    // against the FULL corpus (this is what makes the append usable)
    val (cents, codes) = VectorOps.loadIvfPq(spark, store, sf)
    assert(cents.count() > 0 && codes.count() === codesBefore + delta.count() * 4)
    // an unfingerprinted directory cannot absorb a delta
    val bare = Files.createTempDirectory("graft_ivfpq_bare").toString
    val refused = intercept[IllegalArgumentException] {
      VectorOps.appendIvfPq(spark, bare, delta, sf, "x", deltaId = "spec-delta")
    }
    assert(refused.getMessage.contains("_built_from"))
    // IDEMPOTENCE: the same delta cannot be absorbed twice — a retry
    // after a post-meta crash (or an accidental double call) would
    // double the code rows and corrupt every ADC sum
    val dup = intercept[IllegalArgumentException] {
      VectorOps.appendIvfPq(spark, store, delta, sf,
        VectorOps.embFingerprint(sf), deltaId = "spec-delta")
    }
    assert(dup.getMessage.contains("already absorbed"))
    assert(spark.read.parquet(s"$store/codes").count() ===
      codesBefore + delta.count() * 4, "refused append must not write")
    // graded shape: 5 queries x ranks 1..3, deterministic
    val served = VectorOps.annIvfAdcAppend(spark, sf).collect()
    assert(served.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    assert(served.sameElements(VectorOps.annIvfAdcAppend(spark, sf).collect()))
  }

  test("r12: maxsim_topk — the late-interaction grid replicates in plain " +
      "Scala, the ranking genuinely leaves the single-vector cosine order, " +
      "and reruns are bit-identical") {
    import org.apache.spark.sql.functions._
    val got = VectorOps.maxsimTopk(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    // replicate query 0's rank-1 score OUTSIDE Spark: same 16x16 integer
    // grid (floor-quantized slice dots, max over doc tokens, sum over
    // query tokens) in plain Scala arithmetic
    val top = got.find(r => r.getLong(0) == 0L && r.getLong(2) == 1L).get
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def vec(id: Long): Array[Double] = emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val (qv, dv) = (vec(0L), vec(top.getLong(1)))
    val ms = (0 until 16).map { i =>
      (0 until 16).map { j =>
        val dot = (0 until 4).map(k => qv(i * 4 + k) * dv(j * 4 + k)).sum
        math.floor(dot * 1e6d).toLong
      }.max
    }.sum
    val expected = spark.range(1)
      .select(round(lit(ms).cast("double") / 1e6d, 6)).head().getDouble(0)
    assert(top.getDouble(3) === expected,
      "engine MaxSim differs from the hand-computed interaction grid")
    // token-level interaction must not collapse to single-vector cosine
    val cos3 = VectorOps.cosTopk(spark, sf).collect().filter(_.getLong(2) <= 3)
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val ms3 = got.map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(ms3 !== cos3, "maxsim collapsed to the cosine ranking")
    assert(VectorOps.maxsimTopk(spark, sf).collect().map(_.toString).toSeq ===
      got.map(_.toString).toSeq)
  }

  test("r12: maxsim_rerank — every winner comes from the dense top-20 pool, " +
      "the re-rank genuinely reorders it, scores match the standalone kernel") {
    import org.apache.spark.sql.functions._
    val got = VectorOps.maxsimRerank(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    // candidate containment: dense_rank is the retriever's own position
    assert(got.forall(r => r.getLong(4) >= 1L && r.getLong(4) <= 20L))
    // the re-rank must not be a pass-through of the dense order: some
    // winner sits deeper than rank 3 in the retriever's list
    assert(got.exists(_.getLong(4) > 3L),
      "re-rank returned the dense top-3 — stage 2 inert?")
    // stage-2 scores equal the full-corpus kernel's scores wherever the
    // same (qid, vec_id) pair also wins in maxsim_topk
    val full = VectorOps.maxsimTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(r.getDouble(3) === s, "rerank scored a pair differently")
      }
    }
  }

  test("r12: maxsim_rerank_ivf — the index serves the pool (adc_rank in " +
      "[1, 20]), the re-rank reorders it, and only the pool is re-scored") {
    val got = VectorOps.maxsimRerankIvf(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    assert(got.forall(r => r.getLong(4) >= 1L && r.getLong(4) <= 20L))
    assert(got.exists(_.getLong(4) > 3L),
      "re-rank returned the ADC top-3 — stage 2 inert?")
    // determinism across reruns (both stages integer-exact)
    assert(VectorOps.maxsimRerankIvf(spark, sf).collect().map(_.toString).toSeq
      === got.map(_.toString).toSeq)
  }

  test("r12: absorbIvfPqAppend — first offer appends, redelivery under the " +
      "same op id is a silent no-op, a new op id still appends") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val base = all.filter(col("vec_id") % 10 =!= 7)
    val d1 = all.filter(col("vec_id") % 20 === 7)
    val d2 = all.filter(col("vec_id") % 20 === 17)
    assert(d1.count() > 0 && d2.count() > 0, "fixture needs nonempty deltas")
    val store = Files.createTempDirectory("graft_ivfpq_absorb").toString
    VectorOps.writeIvfPqFrom(base, store, sf, "yesterday")
    val n0 = spark.read.parquet(s"$store/codes").count()
    assert(VectorOps.absorbIvfPqAppend(spark, store, d1, sf, "mid", "op-1"))
    val n1 = spark.read.parquet(s"$store/codes").count()
    assert(n1 === n0 + d1.count() * 4)
    // redelivery (an at-least-once retry): same id — refused silently,
    // store untouched; this is what lets a foreachBatch consumer replay
    assert(!VectorOps.absorbIvfPqAppend(spark, store, d1, sf, "mid", "op-1"))
    assert(spark.read.parquet(s"$store/codes").count() === n1)
    // a genuinely new delta under a new id still appends exactly once
    assert(VectorOps.absorbIvfPqAppend(spark, store, d2, sf,
      VectorOps.embFingerprint(sf), "op-2"))
    assert(spark.read.parquet(s"$store/codes").count() === n1 + d2.count() * 4)
  }

  test("r12: IVF-PQ delete-then-append — codebook frozen throughout, final " +
      "codes == rebuild minus deleted plus delta; half-applied marker and " +
      "duplicate delete refuse loudly") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val store = Files.createTempDirectory("graft_ivfpq_delspec").toString
    VectorOps.writeIvfPqFrom(all, store, sf, VectorOps.embFingerprint(sf))
    val centsBefore = spark.read.parquet(s"$store/centroids")
      .collect().map(_.toString).sorted.toSeq
    val before = spark.read.parquet(s"$store/codes")
      .collect().map(_.toString).toSet

    // DELETE the 3-slice, then APPEND a disjoint synthetic delta (new ids)
    val delIds = all.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
    val delta = all.filter(col("vec_id") % 10 === 7)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    VectorOps.deleteIvfPq(spark, store, delIds, sf,
      VectorOps.embFingerprint(sf), deleteId = "spec-del")
    VectorOps.appendIvfPq(spark, store, delta, sf,
      VectorOps.embFingerprint(sf), deltaId = "spec-app")

    // frozen codebook through BOTH ops
    assert(spark.read.parquet(s"$store/centroids")
      .collect().map(_.toString).sorted.toSeq === centsBefore,
      "maintenance retrained the codebook")
    // final codes are exactly rebuild-minus-deleted-plus-delta
    val deleted = delIds.collect().map(_.getLong(0)).toSet
    val after = spark.read.parquet(s"$store/codes")
      .collect().map(_.toString).toSet
    val expectDelta = graft.llm.VectorOps.pqCodesOfForSpec(delta,
        spark.read.parquet(s"$store/centroids"))
      .collect().map(_.toString).toSet
    val expect = before.filterNot { row =>
      deleted.exists(id => row.startsWith(s"[$id,")) } ++ expectDelta
    assert(after === expect,
      "post-maintenance codes diverge from rebuild-minus-deleted-plus-delta")

    // duplicate delete refused, store untouched
    val dup = intercept[IllegalArgumentException] {
      VectorOps.deleteIvfPq(spark, store, delIds, sf,
        VectorOps.embFingerprint(sf), deleteId = "spec-del")
    }
    assert(dup.getMessage.contains("already applied"))

    // a half-applied maintenance op (crash between codes and meta
    // writes) leaves the pending marker: serve AND maintenance refuse
    Files.write(java.nio.file.Paths.get(store, "_maintenance_pending.json"),
      """{"op":"append","id":"crashed"}""".getBytes("UTF-8"))
    val pendingServe = intercept[IllegalArgumentException] {
      VectorOps.loadIvfPq(spark, store, sf)
    }
    assert(pendingServe.getMessage.contains("half-applied"))
    val pendingAppend = intercept[IllegalArgumentException] {
      VectorOps.appendIvfPq(spark, store, delta, sf,
        VectorOps.embFingerprint(sf), deltaId = "spec-app-2")
    }
    assert(pendingAppend.getMessage.contains("half-applied"))
    Files.delete(java.nio.file.Paths.get(store, "_maintenance_pending.json"))

    // graded shape: 5 queries x ranks 1..3, deterministic, and no
    // deleted vector ever surfaces as a candidate
    val served = VectorOps.annIvfAdcDelete(spark, sf).collect()
    assert(served.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    assert(served.forall(_.getLong(1) % 10 !== 3),
      "a deleted vector surfaced as a served candidate")
  }

  test("r12: upsertIvfPq replaces codes in one journaled op — == the " +
      "delete-then-append composition, never duplicates, refuses retries") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val updated = all.filter(col("vec_id") % 10 === 3)
      .withColumn("v", reverse(col("v")))
    def build(): String = {
      val dir = Files.createTempDirectory("graft_ivfpq_upsspec").toString
      VectorOps.writeIvfPqFrom(all, dir, sf, VectorOps.embFingerprint(sf))
      dir
    }
    // path A: one upsert; path B: deleteIvfPq then appendIvfPq
    val a = build()
    VectorOps.upsertIvfPq(spark, a, updated, sf,
      VectorOps.embFingerprint(sf), upsertId = "u1")
    val b = build()
    VectorOps.deleteIvfPq(spark, b, updated.select(col("vec_id")), sf,
      VectorOps.embFingerprint(sf), deleteId = "d1")
    VectorOps.appendIvfPq(spark, b, updated, sf,
      VectorOps.embFingerprint(sf), deltaId = "a1")
    val codesA = spark.read.parquet(s"$a/codes").collect().map(_.toString).toSet
    val codesB = spark.read.parquet(s"$b/codes").collect().map(_.toString).toSet
    assert(codesA === codesB, "upsert != delete-then-append composition")
    // replace, not duplicate: exactly 4 code rows per vec_id survive
    val perId = spark.read.parquet(s"$a/codes")
      .groupBy(col("vec_id")).count().filter(col("count") =!= 4).count()
    assert(perId === 0L, "an upserted vector holds duplicated code rows")
    // retry refused
    val dup = intercept[IllegalArgumentException] {
      VectorOps.upsertIvfPq(spark, a, updated, sf,
        VectorOps.embFingerprint(sf), upsertId = "u1")
    }
    assert(dup.getMessage.contains("already applied"))
    // graded shape: deterministic 5x3 and rerun-stable
    val served = VectorOps.annIvfAdcUpsert(spark, sf).collect()
    assert(served.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      (for (q <- 0L until 5L; r <- 1L to 3L) yield (q, r)).toSet)
    assert(served.sameElements(VectorOps.annIvfAdcUpsert(spark, sf).collect()))
  }

  test("r12: annFilteredAuto flips between the indexed and exact plans at the " +
      "posting-list threshold, and each branch equals its fixed graded twin") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    // a broad list (all documents) sits above nprobe*N/|cells| -> indexed
    val broad = docs.select(col("doc_id").as("vec_id"))
    assert(!VectorOps.annFilteredChoiceIsExact(spark, sf, broad),
      "the full corpus must choose the indexed plan")
    // a very selective list sits below the threshold -> exact
    val narrow = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("vec_id"))
    assert(VectorOps.annFilteredChoiceIsExact(spark, sf, narrow),
      "a 4% posting list must choose the exact plan")
    // the graded row serves through whichever branch its filter picks,
    // row-identical to that fixed branch's own lineage (score renamed)
    val auto = VectorOps.annFilteredAuto(spark, sf)
    assert(auto.columns.toSeq === Seq("qid", "vec_id", "rank", "score"))
    val en = docs.filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
    val branch =
      if (VectorOps.annFilteredChoiceIsExact(spark, sf, en))
        VectorOps.annFilteredExact(spark, sf).withColumnRenamed("d2", "score")
      else VectorOps.annIvfAdcFiltered(spark, sf).withColumnRenamed("adc", "score")
    assert(auto.collect().map(_.toString).toSeq ===
      branch.collect().map(_.toString).toSeq,
      "auto must serve exactly the chosen branch's rows")
  }

  test("ann_ivfadc_filtered: every hit satisfies the metadata filter, the " +
       "restriction genuinely reorders, and each query still fills top-3") {
    val got = VectorOps.queries("ann_ivfadc_filtered")(spark, sf).collect()
    val allowed = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got.forall(r => allowed.contains(r.getLong(1))),
      "a hit escaped the posting-list filter")
    // top-3 per query (the filtered cells keep enough candidates at 4 probes)
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L), s"query $q")
    }
    // the filter bites: at least one unfiltered top hit was non-English
    val plain = VectorOps.queries("ann_ivfadc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(got.exists(r => plain.get((r.getLong(0), r.getLong(2)))
        .exists(_ != r.getLong(1))),
      "filtered ranking identical to unfiltered — degenerate filter")
  }

  test("mmr_rerank: 5 selections per query; step 1 is the relevance argmax; " +
      "the diversity term reorders at least one later step") {
    import org.apache.spark.sql.functions._
    val mmr = VectorOps.mmrRerank(spark, sf).collect()
    val byQ = mmr.groupBy(_.getLong(0))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // greedy scores never increase along the selection
      val scores = rows.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(scores === scores.sorted.reverse,
        s"MMR scores must be non-increasing, got $scores")
    }
    // selections come from the fused candidate set only
    val cand = VectorOps.queries("rrf_fusion")(spark, sf)
      .select(col("qid"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mmr.forall(r => cand.contains((r.getLong(0), r.getLong(2)))))
    // the diversity term does real work: the MMR order differs from the
    // pure-relevance order for at least one query (else lambda is vacuous
    // on this corpus and the operator is untested)
    val mmrPicks = byQ.map { case (q, rows) =>
      q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val relTop = VectorOps.relevanceTop5ForSpec(spark, sf)
    assert(mmrPicks.exists { case (q, picks) => relTop.get(q).exists(_ != picks) },
      "MMR selection identical to pure relevance on every query — " +
        "diversity term never fired")
  }

  test("r13: emb_margin_mine — the margin rule rejects the hub vector a " +
       "raw cosine argmax would pick, and keeps the true match") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val dim = 64
    def unit(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    // x side (label 0): four near-orthogonal probes
    val xs = (0 until 4).map(i => (i.toLong, unit(i), "0"))
    // y side (label 1): y10 is the HUB — equal positive weight on every
    // probe axis (cos ≈ 0.5+ to all four); y11..y14 are true matches,
    // each mostly one probe's axis but with cos to its probe BELOW the
    // hub's (0.45 direct weight vs the hub's alignment) — raw cosine
    // would pick the hub for every probe
    val hub = (10L, Array.tabulate(dim)(j => if (j < 4) 0.5f else 0.0f), "1")
    // each match: 0.45 on its probe's axis + 0.893 on a private spare
    // axis (4+i — overlaps no probe), so cos(x_i, m_i) = 0.45 < 0.5 =
    // cos(x_i, hub), but the hub's neighborhood sum (4 × 500000) drags
    // its margin below the match's
    val matches = (0 until 4).map { i =>
      val v = Array.tabulate(dim)(j =>
        if (j == i) 0.45f else if (j == 4 + i) 0.893f else 0.0f)
      (11L + i, v, "1")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_margin").toString
    (xs ++ Seq(hub) ++ matches)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.llm.VectorOps.queries("emb_margin_mine")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the margin rule must pick each probe's true match, never the hub
    // (which wins the RAW cosine for every probe: 0.5 vs 0.45)
    assert(got === Map(0L -> 11L, 1L -> 12L, 2L -> 13L, 3L -> 14L),
      s"margin mining selection wrong: $got")
  }

  test("r13: ann_hamming — sign-pack halves are exact, Hamming equals the " +
       "flipped-sign count on crafted vectors, and the graded ranking is " +
       "deterministic") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    // base vector: alternating signs; flips at positions 3, 17 (half 1)
    // and 40, 41, 63 (half 2) → hamming 2 + 3 = 5
    val base = (1 to 64).map(i => if (i % 2 == 0) 1.0f else -1.0f).toArray
    val flipped = base.clone()
    Seq(3, 17, 40, 41, 63).foreach(i => flipped(i - 1) = -flipped(i - 1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ham").toString
    Seq((0L, base, "a"), (1L, flipped, "b"),
        // 5 query slots so vec_id<5 picks these; pad with copies of base
        (2L, base, "c"), (3L, base, "c"), (4L, base, "c"),
        (5L, flipped, "d"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.llm.VectorOps.queries("ann_hamming")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // query 0 vs vec 1: exactly the 5 flipped positions
    assert(got.collect { case (0L, 1L, h) => h } === Seq(5L))
    // query 0 vs the base copies: distance 0, ranked first by vec_id
    assert(got.filter(_._1 == 0L).take(2).map(t => (t._2, t._3)) ===
      Seq((2L, 0L), (3L, 0L)))
    // reruns bit-identical
    assert(graft.llm.VectorOps.queries("ann_hamming")(spark, tmp)
      .collect().map(_.toString).toSeq ===
      graft.llm.VectorOps.queries("ann_hamming")(spark, tmp)
        .collect().map(_.toString).toSeq)
  }
}
