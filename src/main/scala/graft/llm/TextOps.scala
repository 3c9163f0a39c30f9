package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for the training-data pipeline (north star):
  * exact/normalized dedup, token statistics, term frequencies, quality
  * scoring, language-ID heuristic, document fingerprinting, BPE-ish token
  * counting. All are single-pass scans + one hash aggregation — the shape
  * that scales linearly on a cluster.
  *
  * Float-determinism rule: every ratio that crosses the oracle boundary is
  * computed from exact integer sums (`sum(int)/sum(int)`), never from
  * `avg(double)` over per-row divisions.
  */
object TextOps {

  /** Normalized dedup key: lowercase, strip non-alphanumerics, squeeze
    * whitespace. */
  private def normCol = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
  private val NormSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Dedup rates per source: documents vs distinct texts vs distinct
    * normalized texts. */
  def dedupStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // distinct-count the 16-byte FINGERPRINT, not the body: the
      // partial agg's exchange then carries md5 keys instead of
      // multi-KB documents (the decode-once rule applied to shuffles —
      // at 100 TB the body never leaves the scan projection)
      .withColumn("fp", md5(col("text")))
      .withColumn("fpn", md5(normCol))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_uniq"),
           countDistinct(col("fpn")).as("n_uniq_norm"))
      .orderBy(col("source"))

  /** Exact dedup, materialized: keep the lowest doc_id per text —
    * grouped on the md5 fingerprint so the exchange carries 16-byte
    * keys, never document bodies. */
  def dedupExactKeep(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Whitespace-token statistics per language. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("sum_tok"),
           max(col("n_tok")).as("max_tok"),
           round(sum(col("n_tok")).cast("double") / count(lit(1)), 3).as("avg_tok"))
      .orderBy(col("lang"))

  /** Global term frequencies: explode → count → top 20. */
  def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  private val CmsDepth = 4
  // width 16 is sized to the testdata's 31-word vocabulary so the audit
  // exercises REAL collisions (8 of the top-20 rows overcount at sf0.01;
  // width 64 made every estimate exact — a degenerate audit). Production
  // sizing is width ≈ e/ε for an ε·N error bound; the query shape is
  // width-independent.
  private val CmsWidth = 16

  /** Count-Min sketch heavy-hitter audit — the mergeable-sketch path for
    * counting over a vocabulary too wide to exact-aggregate: the sketch
    * is depth × width (4 × 16) integer counters, built in ONE
    * map-side-combinable aggregation (every partition folds its tokens
    * into ≤64 cells locally, merge is cell-wise +), and an item's
    * estimate is the MIN of its depth bucket counters — an overestimate,
    * never an undercount. The audit reports the exact top-20 words next
    * to their CMS estimate and the collision overcount. All counters are
    * exact integer sums over md5-derived buckets, so both engines build
    * the bit-identical sketch — a rare fully-oracle-checkable sketch
    * (contrast `approx_distinct`, rows-only). At 100 TB the sketch side
    * never shuffles more than depth·width cells per partition; only the
    * audit's exact side pays a vocabulary-keyed shuffle. */
  /** The depth-[[CmsDepth]] CMS bucket coordinates of a token — shared
    * by [[cmsHeavyHitters]] and the streaming sketch grade
    * (`StreamGrade.streamCms`), so batch and live build the
    * bit-identical counter grid. */
  private[graft] def cmsBuckets(c: Column): Column = {
    def bucket(seed: Int): Column =
      conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 8), 16, 10)
        .cast("long") % CmsWidth
    array((0 until CmsDepth).map(bucket): _*)
  }

  /** The top-20-by-exact-count audit over a given CMS counter grid —
    * factored so the streaming grade can point the SAME audit at a
    * sketch the STREAMING engine maintained. */
  private[graft] def cmsAudit(s: SparkSession, d: String, cms: DataFrame): DataFrame =
    cmsAuditFromCounts(
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("exact_n")),
      cms)

  /** [[cmsAudit]] over an already-aggregated exact (word, exact_n)
    * frame, so the batch row can feed ONE token pass to both the sketch
    * and the audit. */
  private def cmsAuditFromCounts(wc: DataFrame, cms: DataFrame): DataFrame = {
    val top = wc.orderBy(col("exact_n").desc, col("word")).limit(20)
    top
      .select(col("word"), col("exact_n"),
        posexplode(cmsBuckets(col("word"))).as(Seq("seed", "bucket")))
      .join(broadcast(cms), Seq("seed", "bucket"))
      .groupBy(col("word"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
      .withColumn("overcount", col("est_n") - col("exact_n"))
      .orderBy(col("exact_n").desc, col("word"))
  }

  def cmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    // r17 (§2.3 narrow the work, §2.4 remove redundant passes): the old
    // form exploded every token occurrence TWICE (sketch + audit) and
    // ran the 4 md5 bucket hashes PER OCCURRENCE. The per-word exact
    // counts — which the audit needs anyway — are aggregated once from
    // one token pass (map-side combinable, like the sketch fold it
    // replaces), checkpointed (vocabulary-sized), and the sketch becomes
    // Σ exact_n per bucket over DISTINCT words: bit-identical counters
    // (integer sums over the same md5 buckets), with the md5s now per
    // word instead of per occurrence. At 100 TB the sketch side still
    // never shuffles more than the vocabulary projection.
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("exact_n"))
      .localCheckpoint(true)
    val cms = wc
      .select(col("exact_n"), posexplode(cmsBuckets(col("word"))).as(Seq("seed", "bucket")))
      .groupBy(col("seed"), col("bucket")).agg(sum(col("exact_n")).as("c"))
    cmsAuditFromCounts(wc, cms)
  }

  /** Corpus-balance audit: per-language source diversity as Gini
    * impurity 1 − Σ(nᵢ/N)² — 0 means one source dominates, →1 means an
    * even mix — the number a data-mixture review reads before training.
    * Computed entropy-free (log would be libm and cross-engine-unsafe):
    * numerator Σnᵢ² is an exact BIGINT sum, then ONE double division and
    * subtraction in the same order on both engines. Two-level hash agg,
    * no window, no shuffle beyond the (lang, source) reduction. */
  def sourceDiversity(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
           sum(col("n")).as("n_docs"),
           sum(col("n") * col("n")).as("ss"))
      .withColumn("gini",
        round(lit(1d) - col("ss").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")), 6))
      .select(col("lang"), col("n_docs"), col("n_sources"), col("gini"))
      .orderBy(col("lang"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Quality scoring: token count + stopword ratio → bucket. Ratios are
    * aggregated from exact integer sums. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("n_stop", size(filter(col("ws"), w => array_contains(stopArr, w))).cast("long"))
      .withColumn("bucket",
        when(col("n_tok") >= 60 && col("n_stop") * 5 >= col("n_tok"), "high")
          .when(col("n_tok") >= 30, "mid")
          .otherwise("low"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("n_stop")).cast("double") / sum(col("n_tok")), 4).as("stop_ratio"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** `\b`-anchored alternation counting marker-word hits — one codegen'd
    * regex pass per language (the lambda-filter form runs interpreted). */
  private def markerRegex(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")

  /** Language-ID heuristic: stopword-marker votes with a deterministic
    * precedence cascade (CJK presence → zh; else max marker hits,
    * ties resolved fr > es > de > en). Output is the confusion matrix
    * against the labelled lang.
    *
    * The marker counting runs as ONE codegen'd scan
    * ([[graft.functions.MarkerCountsExpr]]) instead of four
    * `regexp_count` passes + a CJK `rlike` — identical semantics (the
    * oracle twin still uses the regexes and hash-matches), ~5× less
    * string work on the hot path. */
  def langId(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .withColumn("sc", graft.functions.GraftFunctions.marker_counts(col("text"), langMarkers))
      .withColumn("guess",
        when(col("sc.cjk"), "zh")
          .when(col("sc.h_fr") > col("sc.h_en") && col("sc.h_fr") >= col("sc.h_es") && col("sc.h_fr") >= col("sc.h_de"), "fr")
          .when(col("sc.h_es") > col("sc.h_en") && col("sc.h_es") >= col("sc.h_de"), "es")
          .when(col("sc.h_de") > col("sc.h_en"), "de")
          .otherwise("en"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))
  }

  /** Document fingerprint: md5 over the normalized text (identical
    * digest both engines). */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(normCol).as("fp"))
      .orderBy(col("doc_id"))

  /** BPE-ish token counting: runs of letters, runs of digits, or single
    * punctuation — the common pre-tokenizer regex shape. */
  def tokenCountBpe(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_bpe",
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("sum_bpe"))
      .orderBy(col("source"))

  /** One distributed BPE merge iteration — the tokenizer-TRAINING shape
    * (Sennrich et al. 2016), graded like [[graft.llm.VectorOps]]'
    * `kmeans_step` grades one clustering iteration: from the corpus at
    * the character-symbol stage, the next merge table is the adjacent
    * symbol pairs ranked by frequency. Emits the top-20 candidate merges
    * with their occurrence mass and vocabulary spread.
    *
    * Scale shape: pair counting runs over the DISTINCT-WORD frame (the
    * classic BPE-training trick — |vocab| rows, not |corpus| tokens),
    * weighted by word frequency, so the expensive explode touches each
    * word form once no matter how often it occurs; at 100 TB the word
    * count agg is map-side-combinable and the pair agg's key space is
    * bounded by |alphabet|². The ranked cut is TakeOrderedAndProject
    * (orderBy + limit), never a global sort materialization; ties break
    * on the pair text so the cut is deterministic cross-engine. */
  def bpeMergeStep(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    wc.filter(length(col("w")) >= 2)
      .select(col("w"), col("c"),
        explode(transform(sequence(lit(0), length(col("w")) - 2),
          i => col("w").substr(i + 1, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(countDistinct(col("w")).as("n_words"), sum(col("c")).as("total_occ"))
      .orderBy(col("total_occ").desc, col("pair"))
      .limit(20)
  }

  /** k greedy BPE merge iterations — the full tokenizer-training loop
    * [[bpeMergeStep]] grades one step of: pick the most frequent
    * adjacent symbol pair, fuse it everywhere, re-count, repeat. Emits
    * the k-row merge table (step, pair, merged, n_words, total_occ) —
    * exactly what `merges.txt` of a trained BPE tokenizer holds.
    *
    * Representation: each word's symbol sequence is a boundary-
    * delimited string `" a  b  c "` (single space flanks, double space
    * between symbols; words are space-split so symbols can never
    * contain the delimiter). Fusing pair (a, b) is then ONE
    * `replace(s, " a  b ", " ab ")` — and because `replace` scans
    * left-to-right non-overlapping in both Spark and DuckDB, the
    * classic BPE greedy semantics ("aaa" + merge(a,a) → [aa, a]) fall
    * out for free, with no per-row fold/UDF and no codegen fallback.
    * The pair key is the plain string "a b", so the deterministic
    * tie-break (desc mass, then pair text) compares identical strings
    * on both engines.
    *
    * Scale shape: like [[bpeMergeStep]], the loop runs on the
    * DISTINCT-WORD frame (|vocab| rows, not |corpus| tokens), weighted
    * by word frequency. Each iteration is one hash agg over that frame
    * plus a broadcast of the 1-row winner into the fuse expression —
    * the argmax never touches the driver. The re-symbolized frame is
    * localCheckpointed per iteration ([[graft.llm.HashDedup]]
    * `dedup_components` discipline) so lineage stays k-deep-free and
    * the word frame materializes once per step, not once per
    * downstream consumer. k is a constant (3 graded); at 32k merges
    * the same loop runs with the winner batched per iteration. */
  def bpeMergeK(s: SparkSession, d: String, k: Int = 3): DataFrame =
    bpeLearn(s, d, k)._1.reduce(_.unionByName(_))
      .select(col("step"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"),
        col("n_words"), col("total_occ"))
      .orderBy(col("step"))

  /** The shared BPE training loop behind [[bpeMergeK]] (the merge table)
    * and [[bpeApply]] (the segmentation it produces): returns the k
    * ≤1-row argmax frames and the final re-symbolized distinct-word
    * frame. A step with NO fusable pair (e.g. an all-single-character
    * corpus) yields an empty argmax and the fuse is a NO-OP — the
    * winner attaches by LEFT join and `coalesce` keeps the unfused
    * symbols, so the word frame survives and [[bpeApply]] reports
    * compression 1 instead of silently returning zero rows
    * (ADVICE r8; spec-pinned). */
  private def bpeLearn(s: SparkSession, d: String, k: Int): (Seq[DataFrame], DataFrame) = {
    val words0 = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("s", regexp_replace(col("w"), "(.)", " $1 "))
    var cur = words0.localCheckpoint()
    val steps = Seq.newBuilder[DataFrame]
    for (i <- 1 to k) {
      val top = cur
        .withColumn("syms", split(trim(col("s")), "  "))
        .filter(size(col("syms")) >= 2)
        .select(col("w"), col("c"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            j => concat_ws(" ",
              element_at(col("syms"), j),
              element_at(col("syms"), j + 1)))).as("pair"))
        .groupBy(col("pair"))
        .agg(countDistinct(col("w")).as("n_words"),
             sum(col("c")).as("total_occ"))
        .orderBy(col("total_occ").desc, col("pair"))
        .limit(1)
        .select(lit(i).as("step"), col("pair"), col("n_words"), col("total_occ"))
        .localCheckpoint()
      steps += top
      cur = cur
        .join(broadcast(top.select(col("pair").as("mp"))), lit(true), "left")
        .withColumn("s", coalesce(expr(
          "replace(s, ' ' || replace(mp, ' ', '  ') || ' ', " +
          "' ' || replace(mp, ' ', '') || ' ')"), col("s")))
        .select(col("w"), col("c"), col("s"))
        .localCheckpoint()
    }
    (steps.result(), cur)
  }

  /** BPE tokenizer APPLICATION — the inference path next to
    * [[bpeMergeK]]'s training path: segment every word with the k = 3
    * learned merges and report the per-source compression the merge
    * table buys (char-level token count vs post-merge symbol count).
    * This is the table a tokenizer rollout decision reads: compression
    * ≈ 1 for a source means the learned merges don't help it.
    *
    * Scale shape: each DISTINCT word is segmented exactly once (the
    * |vocab|-row frame from the shared loop), then a hash join fans the
    * per-word symbol count out to the per-(source, word) occurrence
    * counts — the corpus is never re-segmented per occurrence. Both
    * sides of the join key on the word; the ratio divides two exact
    * integer sums once, rounded at 4 decimals. */
  def bpeApply(s: SparkSession, d: String): DataFrame =
    bpeCompression(s, d,
      bpeLearn(s, d, 3)._2
        .select(col("w"),
          size(split(trim(col("s")), "  ")).cast("long").as("n_syms")))

  /** Shared per-source compression aggregation behind [[bpeApply]] and
    * [[bpeApplyFrom]]: fan the per-distinct-word symbol count out to the
    * (source, word) occurrence counts and reduce. */
  private def bpeCompression(s: SparkSession, d: String, seg: DataFrame): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .join(seg, "w")
      .groupBy(col("source"))
      .agg(countDistinct(col("w")).as("n_words"),
           sum(col("c") * length(col("w"))).as("n_tokens_char"),
           sum(col("c") * col("n_syms")).as("n_tokens_bpe"),
           round(sum(col("c") * length(col("w"))).cast("double") /
                 sum(col("c") * col("n_syms")), 4).as("compression"))
      .orderBy(col("source"))

  // ---- persisted merge-table lifecycle (the bandStoreOf contract,
  //      graft.llm.HashDedup.writeBandStore:288-316 lineage) ----

  /** Persist the learned BPE merge table WITH its freshness contract:
    * the store directory carries a `_built_from.json` sidecar recording
    * a fingerprint of the training corpus's documents table (underscore-
    * prefixed so parquet readers ignore it, like _SUCCESS). This is
    * `merges.txt` of a trained tokenizer as a governed artifact: built
    * once per corpus snapshot, consumed by every later [[bpeApplyFrom]]
    * without re-running the training loop. */
  def writeMerges(s: SparkSession, corpusDir: String, outPath: String,
                  k: Int = 3): Unit = {
    bpeMergeK(s, corpusDir, k).write.mode("overwrite").parquet(outPath)
    val fp = graft.llm.HashDedup.dirFingerprint(corpusDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath, "_built_from.json"),
      s"""{"corpus_dir":"$corpusDir","fingerprint":"$fp","k":$k}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a persisted merge table, failing FAST unless its `_built_from`
    * fingerprint still matches `corpusDir`'s documents table — a merge
    * table trained on a superseded snapshot must never silently segment
    * the rebuilt corpus (the [[graft.llm.HashDedup.loadBandStore]]
    * discipline extended to the tokenizer artifact). */
  def loadMerges(s: SparkSession, storePath: String,
                 corpusDir: String): DataFrame = {
    val metaPath = java.nio.file.Paths.get(storePath, "_built_from.json")
    require(java.nio.file.Files.exists(metaPath),
      s"merge store at $storePath has no _built_from.json fingerprint — " +
        "rebuild it with writeMerges (an unfingerprinted merge table " +
        "cannot prove which corpus trained it)")
    val meta = new String(java.nio.file.Files.readAllBytes(metaPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val stored = """"fingerprint"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(meta).map(_.group(1))
    val now = graft.llm.HashDedup.dirFingerprint(corpusDir)
    require(stored.contains(now),
      s"stale merge table: $storePath was trained on corpus fingerprint " +
        s"${stored.getOrElse("<unreadable>")} but $corpusDir now " +
        s"fingerprints $now — retrain before applying")
    s.read.parquet(storePath)
  }

  /** [[bpeApply]] from a PERSISTED merge table instead of the in-session
    * training loop: replay the merges in step order as sequential fuse
    * expressions over the distinct-word frame (later merges see earlier
    * fusions, exactly the training-time semantics), then the shared
    * compression aggregation. The merge list is collected to the driver
    * deliberately — it is the tokenizer ARTIFACT, ≤k rows by
    * construction (a tokenizer's merges.txt is loaded by every consumer
    * the same way), never data-scale. Row-identical to [[bpeApply]] on
    * the training corpus (spec-pinned). */
  def bpeApplyFrom(s: SparkSession, d: String, merges: DataFrame): DataFrame = {
    val ms = merges.select(col("step"), col("pair")).collect()
      .sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    val vocab = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .withColumn("s", regexp_replace(col("w"), "(.)", " $1 "))
    val fused = ms.foldLeft(vocab) { (df, pair) =>
      df.withColumn("s", org.apache.spark.sql.functions.replace(col("s"),
        lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + pair.replace(" ", "") + " ")))
    }
    bpeCompression(s, d,
      fused.select(col("w"),
        size(split(trim(col("s")), "  ")).cast("long").as("n_syms")))
  }

  /** Deterministic waterfilling token-budget allocation — the mix
    * planner's core step: fill a budget B (half the corpus here) from
    * per-source availabilities with EQUAL priority, capping each source
    * at what it has. Small sources are taken whole ("saturated"); the
    * rest split the remaining budget evenly, the classic max-min-fair
    * waterline. Emits per source: available tokens, allocated tokens,
    * the saturation flag, and the take rate — Σ alloc = B exactly.
    *
    * All in INTEGER math so the allocation is byte-stable cross-engine:
    * sources sort by (avail, source); a source saturates iff
    * avail·m ≤ rem (m = sources from it on, rem = budget left before
    * it — saturation is provably a prefix of that order); the first
    * unsaturated row fixes the waterline rem* div m* with the rem* mod
    * m* remainder handed to the first unsaturated sources in order.
    *
    * Scale shape: the only corpus-sized work is the per-source token
    * count (one scan, map-side combinable). Everything after — the
    * total orders, the global windows — runs on the ≤|sources| aggregate
    * frame, the documented exception to the no-total-order rule. */
  def tokenBudget(s: SparkSession, d: String): DataFrame =
    tokenBudgetFrom(
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail")))

  /** Temperature-scaled sampling mix — the multilingual-corpus classic
    * (share ∝ avail^α, α = 0.7): flattens the raw size distribution so
    * small sources upsample and giants downsample, the standard
    * alternative to [[tokenBudget]]'s hard waterline. Emits per source
    * the raw share, the temperature share, and the effective
    * upsampling factor.
    *
    * Scale shape: one corpus scan to the ≤|sources| avail frame; the
    * two normalizers broadcast as a 1-row crossJoin. FP note: `power`
    * is libm on both engines (the `ln` precedent of [[lmXent]]); the
    * Σ over ≤|sources| doubles is rounding-absorbed like the tfidf
    * family — no SELECTION rides the float, only reported shares. */
  def mixTemperature(s: SparkSession, d: String): DataFrame = {
    val av = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail"))
    val tot = av.agg(sum(col("avail")).as("tot"),
                     sum(pow(col("avail").cast("double"), lit(0.7d))).as("ptot"))
    av.crossJoin(broadcast(tot))
      .select(col("source"), col("avail"),
        round(col("avail").cast("double") / col("tot"), 6).as("raw_share"),
        round(pow(col("avail").cast("double"), lit(0.7d)) / col("ptot"), 6)
          .as("temp_share"),
        round((pow(col("avail").cast("double"), lit(0.7d)) / col("ptot")) /
              (col("avail").cast("double") / col("tot")), 4).as("upsample"))
      .orderBy(col("source"))
  }

  private val DsirBuckets = 64

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023 — hashed n-gram features): score every
    * document by Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b]) over
    * [[DsirBuckets]] hashed unigram buckets, target = the corpus's
    * English slice (the "quality domain" stand-in), raw = everything;
    * Laplace-smoothed bucket distributions. A source whose mean weight
    * is high looks like the target under the hashed-feature model —
    * the cheap pre-filter that decides what the expensive quality
    * classifier even sees.
    *
    * Scale shape: ONE explode pass to the (doc, bucket, count) frame
    * (localCheckpointed: it feeds the two ≤64-row distributions AND the
    * scoring join); both distributions broadcast back as ≤64-row
    * lookup tables. The bucket hash is the md5-prefix arithmetic every
    * cross-engine hash in this repo uses. Only the per-source MEAN of
    * the log weight is reported (rounded; no selection rides the
    * float). */
  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val db = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b",
        conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long") % DsirBuckets)
      .groupBy(col("doc_id"), col("source"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // smoothed distribution over the FULL bucket domain: a bucket the
    // slice never hit still carries the Laplace floor 1/(T+64), so the
    // scoring join below is total
    def dist(df: DataFrame, name: String): DataFrame = {
      val spine = s.range(DsirBuckets).select(col("id").as("b"))
      val tot = df.agg(sum(col("c")).as("t"))
      spine.join(df.groupBy(col("b")).agg(sum(col("c")).as("cb")), Seq("b"), "left")
        .na.fill(0L, Seq("cb"))
        .crossJoin(broadcast(tot))
        .select(col("b"),
          ((col("cb") + 1).cast("double") /
           (col("t") + DsirBuckets).cast("double")).as(name))
    }
    val pt = dist(db.filter(col("lang") === "en"), "p_t")
    val pr = dist(db, "p_r")
    db.join(broadcast(pt), Seq("b"))
      .join(broadcast(pr), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c").cast("double") * (log(col("p_t")) - log(col("p_r"))))
        .as("logw"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("logw")), 4).as("mean_logw"))
      .orderBy(col("source"))
  }

  /** T5-style span-corruption PLAN: deterministic masking arithmetic per
    * document — budget = ⌊0.15·n⌋ masked tokens in mean-length-3 spans,
    * n_spans = ⌈budget/3⌉ — aggregated per source (total spans, masked
    * tokens, realized mask rate). The plan a span-corruption dataloader
    * executes; keeping it deterministic-integer makes the realized rate
    * auditable cross-engine (the stochastic jitter of a real sampler
    * changes nothing about the totals a budget reviewer reads).
    * One scan, map-side integer arithmetic, ≤|sources| output rows. */
  def spanCorruptionPlan(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("budget", expr("(n * 15) DIV 100"))
      .withColumn("n_spans", expr("CASE WHEN budget = 0 THEN 0 ELSE (budget + 2) DIV 3 END"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n")).as("n_tokens"),
           sum(col("budget")).as("n_masked"),
           sum(col("n_spans")).as("n_spans"),
           round(sum(col("budget")).cast("double") / sum(col("n")), 4)
             .as("mask_rate"))
      .orderBy(col("source"))

  /** Waterfilling core over a prepared (source, avail) frame — split out
    * so the scalacheck property can drive ARBITRARY availability sets
    * through the exact production plan. */
  private[graft] def tokenBudgetFrom(per: DataFrame): DataFrame = {
    val tot = per.agg(sum(col("avail")).as("t"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("avail"), col("source"))
    val all = Window.partitionBy()
    per.crossJoin(broadcast(tot))
      .withColumn("b", expr("t div 2"))
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("pre", coalesce(
        sum(col("avail")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("m", col("n") - col("j") + 1L)
      .withColumn("rem", col("b") - col("pre"))
      .withColumn("sat", col("avail") * col("m") <= col("rem"))
      .withColumn("jstar", min(when(!col("sat"), col("j"))).over(all))
      .withColumn("rem_star", max(when(col("j") === col("jstar"), col("rem"))).over(all))
      .withColumn("m_star", max(when(col("j") === col("jstar"), col("m"))).over(all))
      .withColumn("alloc", when(col("sat"), col("avail")).otherwise(
        expr("rem_star div m_star") +
          when(col("j") - col("jstar") + 1L <= expr("rem_star % m_star"), 1L)
            .otherwise(0L)))
      .select(col("source"), col("avail"), col("alloc"),
        col("sat").as("saturated"),
        round(col("alloc").cast("double") / col("avail"), 4).as("take_rate"))
      .orderBy(col("source"))
  }

  /** Heaps-law vocabulary-growth audit: cumulative token mass vs
    * cumulative DISTINCT vocabulary per source at corpus-order deciles
    * (global doc_id range split in 10 — the ingestion-order proxy). The
    * curve answers the curation question "is this source still
    * contributing new vocabulary, or just more of the same tokens?" —
    * a flattening curve is the classic crawl-exhaustion signal.
    *
    * Scale shape: a token's decile contribution reduces to its FIRST
    * occurrence (min doc_id — a hash agg to |vocab| rows), and token
    * mass to per-doc counts (|docs| rows, localCheckpointed: it feeds
    * the broadcast max, the source grid, and the mass rollup — the
    * 2-plus-consumers rule). Decile edges are integer `div` on the
    * broadcast global max, so bucketing is stateless and exact on both
    * engines — no per-source total order, no percentile sketch. The
    * only window is the cumulative sum over the ≤10-rows-per-source
    * grid. */
  def vocabGrowth(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
              explode(split(col("text"), " ")).as("tok"))
    val docToks = toks.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_toks")).localCheckpoint()
    val firstSeen = toks.groupBy(col("source"), col("tok"))
      .agg(min(col("doc_id")).as("first_doc"))
    val mx = docToks.agg(max(col("doc_id")).as("mx"))
    val bucketOf = expr("CAST(doc_id * 10 DIV (mx + 1) AS INT) + 1")
    val tokMass = docToks.crossJoin(broadcast(mx))
      .groupBy(col("source"), bucketOf.as("bucket"))
      .agg(sum(col("n_toks")).as("b_toks"))
    val vocabAdds = firstSeen.withColumnRenamed("first_doc", "doc_id")
      .crossJoin(broadcast(mx))
      .groupBy(col("source"), bucketOf.as("bucket"))
      .agg(count(lit(1)).as("b_vocab"))
    val grid = docToks.select(col("source")).distinct()
      .select(col("source"), explode(sequence(lit(1), lit(10))).as("bucket"))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(tokMass, Seq("source", "bucket"), "left")
      .join(vocabAdds, Seq("source", "bucket"), "left")
      .select(col("source"), (col("bucket") * 10).as("pct"),
        sum(coalesce(col("b_toks"), lit(0L))).over(w).as("cum_tokens"),
        sum(coalesce(col("b_vocab"), lit(0L))).over(w).as("cum_vocab"))
      .orderBy(col("source"), col("pct"))
  }

  /** Tokenizer-fertility audit: BPE-ish tokens per whitespace word, per
    * language — the table that decides whether a tokenizer is efficient
    * for a language mix (fertility ≫ 1 means the language fragments into
    * many subword tokens and its token budget buys fewer words). Same
    * one-pass scan + regex kernel as [[tokenCountBpe]]; the ratio
    * divides exact integer sums once. */
  def tokenFertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_bpe",
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bpe")).as("sum_bpe"),
           sum(col("n_words")).as("sum_words"),
           round(sum(col("n_bpe")).cast("double") / sum(col("n_words")), 4)
             .as("fertility"))
      .orderBy(col("lang"))

  /** Deterministic train/val/test split by md5 bucket of the doc id —
    * reproducible across engines and runs (unlike RNG sampling), stable
    * under re-partitioning, and exactly what a 100 TB corpus needs for
    * consistent splits: bucket = md5(doc_id) % 10 → 8/1/1. */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 10)
      .withColumn("split",
        when(col("bucket") < 8, "train").when(col("bucket") === 8, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))

  /** Deterministic per-language corpus sample via the custom KMV
    * aggregate ([[graft.functions.BottomKByHashAgg]]): the 3 docs whose
    * md5(doc_id) digests are smallest — identical sample on any cluster
    * layout, O(k) state per group. */
  def sampleBottomK(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(graft.functions.GraftFunctions.bottomk_by_hash(col("doc_id"), 3).as("ids"))
      .select(col("lang"), posexplode(col("ids")).as(Seq("i", "doc_id")))
      .select(col("lang"), (col("i") + 1).cast("long").as("rank"), col("doc_id"))
      .orderBy(col("lang"), col("rank"))

  /** Repetition filter (Gopher-style quality rule): a doc whose single
    * most frequent token exceeds 10% of all tokens is flagged repetitive.
    * The threshold compares exact integers (maxc*10 > ntok) and the
    * reported ratio divides exact integer sums — no per-row float avg. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(max(col("cnt")).as("maxc"), sum(col("cnt")).as("ntok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("maxc") * 10 > col("ntok"), 1L).otherwise(0L)).as("n_repetitive"),
           round(sum(col("maxc")).cast("double") / sum(col("ntok")), 4).as("mean_top_ratio"))
      .orderBy(col("lang"))

  private val mixQuotas = Seq("src0" -> 20L, "src1" -> 10L, "src2" -> 10L)
  private val mixDefault = 5L

  /** Training-mix construction: per-source quotas (upweighted sources get
    * more docs), selection by md5 order within each source — the same
    * deterministic-hash discipline as [[sampleSplit]], so the mix is
    * reproducible on any cluster layout and quota changes only ever
    * add/remove the tail of a source's selection. */
  def corpusMix(s: SparkSession, d: String): DataFrame = {
    val spark = s; import spark.implicits._
    val quotas = mixQuotas.toDF("source", "quota")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w))
      .join(broadcast(quotas), Seq("source"), "left")
      .filter(col("rk") <= coalesce(col("quota"), lit(mixDefault)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
           sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_id"),
           max(col("doc_id")).as("max_id"))
      .orderBy(col("source"))
  }

  /** PII scrub regexes — restricted to the Java/RE2 common subset so the
    * identical pattern runs on both engines. */
  private val EmailRx = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scan: per-source email / IPv4 incidence — the detection pass a
    * scrubbing pipeline runs before redaction (single linear scan, counts
    * via non-overlapping regex matches; redaction itself is the same scan
    * with regexp_replace). */
  def piiScan(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("lo", lower(col("text")))
      .withColumn("n_email", regexp_count(col("lo"), lit(EmailRx)).cast("long"))
      .withColumn("n_ip", regexp_count(col("lo"), lit(Ipv4Rx)).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_with_email"),
           sum(col("n_email")).as("total_emails"),
           sum(when(col("n_ip") > 0, 1L).otherwise(0L)).as("docs_with_ip"),
           sum(col("n_ip")).as("total_ips"))
      .orderBy(col("source"))

  /** PII REDACTION — the transform [[piiScan]] only plans: emails →
    * `<email>` then IPv4 → `<ip>` (fixed pass order, both engines),
    * reduced to a per-source audit whose `content_fp` column is the sum
    * of 32-bit md5 prefixes of every REDACTED document — so the graded
    * hash pins the transformed TEXT itself, not just counts. A
    * redaction bug that counted right but scrubbed wrong bytes flips
    * the fingerprint.
    *
    * Scale shape: one linear scan, two non-overlapping regex passes per
    * document map-side (same RE2/Java common-subset patterns as the
    * scan), exact-integer aggregation; nothing shuffles but the
    * ≤|sources|-row agg. `chars_removed` may go negative when a match
    * is shorter than its placeholder — it is a delta, not a loss. */
  def piiRedact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("lo", lower(col("text")))
      .withColumn("red", regexp_replace(
        regexp_replace(col("lo"), EmailRx, "<email>"), Ipv4Rx, "<ip>"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("red") =!= col("lo"), 1L).otherwise(0L)).as("docs_changed"),
           sum(length(col("lo")).cast("long") - length(col("red"))).as("chars_removed"),
           sum(conv(substring(md5(col("red")), 1, 8), 16, 10).cast("long"))
             .as("content_fp"))
      .orderBy(col("source"))

  private val SegWords = 3

  /** Segment-level exact dedup: non-overlapping [[SegWords]]-word
    * segments shared by more than one document within a source — the
    * sub-document sibling of exact dedup (boilerplate/chrome detection;
    * on prose the segmenter would split sentences instead). Explode →
    * distinct → hash-agg on the segment key: linear, no pair expansion. */
  def segmentDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= SegWords)
      .select(col("source"), col("doc_id"),
        explode(transform(
          sequence(lit(0), (size(col("ws")) / SegWords).cast("int") - 1),
          i => array_join(slice(col("ws"), i * SegWords + 1, lit(SegWords)), " "))).as("seg"))
      .distinct()
      .groupBy(col("source"), col("seg"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_dup_segments"),
           sum(col("n_docs")).as("n_doc_hits"),
           max(col("n_docs")).as("max_spread"))
      .orderBy(col("source"))

  /** Per-source top-3 terms by tf·idf. The idf is the RAW ratio N/df —
    * one IEEE division then one multiplication, so the score is
    * bit-reproducible cross-engine (a log-idf would hinge on libm ulp
    * agreement between the JVM and DuckDB — see the determinism rule in
    * the object doc). N arrives as a broadcast 1-row aggregate, never a
    * driver action. */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    val win = Window.partitionBy(col("source")).orderBy(col("score").desc, col("w"))
    tfidfScored(s, d)
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("source"), col("w"), col("rnk"), round(col("score"), 3).as("score"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Per-source token-distribution Shannon entropy — the corpus
    * DIVERSITY audit (a source whose entropy collapses toward 0 is
    * template spam; one near ln V is healthy prose): H in nats plus
    * the V-normalized form, computed as H = ln T − (Σ c·ln c)/T so
    * both engines evaluate the identical expression tree — the inner
    * sum is over per-term counts (map-side-combinable hash agg to the
    * ≤|sources|·|vocab| frame, then ≤|sources| rows), never per-token
    * FP. */
  def tokenEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
           count(lit(1)).as("vocab"),
           sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclc"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(log(col("n_tokens").cast("double")) -
              col("sclc") / col("n_tokens"), 4).as("entropy"),
        round((log(col("n_tokens").cast("double")) - col("sclc") / col("n_tokens")) /
              log(col("vocab").cast("double")), 4).as("norm_entropy"))
      .orderBy(col("source"))

  /** BM25 per-source top terms — the retrieval-grade scorer next to
    * [[tfidfTopTerms]] (Robertson–Spärck Jones idf, k₁ = 1.2,
    * b = 0.75): per-(doc, term) saturated tf with length
    * normalization, summed to per-(source, term) mass, top-3 per
    * source. The length normalization is what tf-idf lacks — a term
    * stuffed into one long document stops accumulating score.
    *
    * Scale shape: ONE explode pass reduces to the per-(doc, term)
    * frame; dl is a window sum PARTITIONED BY doc (bounded by one
    * doc's vocabulary — never a corpus order), and the frame is
    * localCheckpointed for its three consumers (df agg, corpus stats,
    * scoring join). Stats broadcast; df joins on the term key; the
    * per-source cut rides the mergeable [[graft.functions.TopKByScoreAgg]]
    * (partial top-3 per partition + O(k) merges in ONE hash aggregate —
    * never a window sort over the per-source term frame, the
    * [[tfidfTopTermsAgg]] discipline). Constants are spelled identically
    * in both engines so the FP expression trees match term-for-term,
    * and the ORDERING score is quantized at 1e-9 on both sides so an
    * FP-tie-adjacent term pair cannot flip ranks cross-engine as the
    * corpus grows (ADVICE r8). */
  def bm25TopTerms(s: SparkSession, d: String): DataFrame = {
    val tfd = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dl", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
      .localCheckpoint()
    val dft = tfd.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val st = tfd.agg(countDistinct(col("doc_id")).as("n_docs"),
                     sum(col("c")).as("n_toks"))
    val scored = tfd.join(dft, Seq("w"))
      .crossJoin(broadcast(st))
      .withColumn("avgdl", col("n_toks").cast("double") / col("n_docs"))
      .withColumn("sc",
        log(lit(1.0d) + (col("n_docs") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d))) *
          (col("c") * lit(2.2d)) /
          (col("c") + lit(1.2d) *
            (lit(1.0d) - lit(0.75d) + lit(0.75d) * col("dl") / col("avgdl"))))
      .groupBy(col("source"), col("w"))
      .agg(round(sum(col("sc")), 9).as("score"))
    scored.groupBy(col("source"))
      .agg(graft.functions.GraftFunctions.topk_by_score(col("w"), col("score"), 3).as("tops"))
      .select(col("source"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("source"), col("t.w").as("w"),
              (col("pos") + 1).cast("long").as("rnk"),
              round(col("t.score"), 3).as("score"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Per-(source, word) tf-idf scores — shared lineage of the two top-k
    * forms. ONE explode pass, no materialization: reduce to per-(doc,
    * word) counts, cascade to per-(source, word) tf carrying the
    * per-source doc count, then derive the global df as a WINDOW sum
    * over the word partition (docs live in exactly one source, so
    * Σ df_part = df). N comes from a count-only documents scan — no
    * second explode. */
  private def tfidfScored(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("w"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df_part"))
      .withColumn("df", sum(col("df_part")).over(Window.partitionBy(col("w"))))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
    tf.crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * (col("n_total").cast("double") / col("df")))
  }

  /** Scale twin of [[tfidfTopTerms]]: the per-source top-3 comes from the
    * mergeable [[graft.functions.TopKByScoreAgg]] — partial top-k per
    * partition + O(k) merges inside ONE hash aggregate — instead of a
    * row_number window, whose per-source sort serializes a dominant
    * source into one task at 100 TB. Same total order (score desc, term
    * asc), so the output is ROW-IDENTICAL to the windowed form and
    * shares its DuckDB oracle verbatim. */
  def tfidfTopTermsAgg(s: SparkSession, d: String): DataFrame =
    tfidfScored(s, d)
      .groupBy(col("source"))
      .agg(graft.functions.GraftFunctions.topk_by_score(col("w"), col("score"), 3).as("tops"))
      .select(col("source"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("source"), col("t.w").as("w"),
              (col("pos") + 1).cast("long").as("rnk"),
              round(col("t.score"), 3).as("score"))
      .orderBy(col("source"), col("rnk"))

  /** Type-token ratio (lexical diversity) per source: vocabulary size
    * over token count — integer counts, one division. */
  def vocabTtr(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
           countDistinct(col("w")).as("n_vocab"),
           round(countDistinct(col("w")).cast("double") / count(lit(1)), 4).as("ttr"))
      .orderBy(col("source"))

  private val PackBudget = 512L

  /** Sequence packing plan: assign documents (in stable doc_id order per
    * source) to fixed token-budget bins by their running-token OFFSET —
    * the batch-shaping step before training (contiguous packing, documents
    * split at bin boundaries). One window sum of exact integers per
    * source partition + one hash agg; each source's stream packs
    * independently, so the window never sees more than one source's rows
    * — at corpus scale the parallelism unit is the source, and a
    * per-(source, shard) key would subdivide further if one source
    * dominated. */
  def seqPacking(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / PackBudget))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Curriculum binning: per-source difficulty quartiles over an exact
    * integer score (token count — swap in any integer quality score),
    * reported as per-(source, bin) counts and score ranges: the split
    * audit behind curriculum training and staged data mixes. ntile runs
    * inside each source partition — parallel across sources, never a
    * global total order (a corpus-wide ntile would serialize one task's
    * sort at 100 TB; a hot source takes the domain_caps salting, since
    * quartile boundaries refine the same way the cap rank does). */
  def curriculumBins(s: SparkSession, d: String): DataFrame =
    curriculumBinsOf(docsWithTok(s, d))

  private[graft] def curriculumBinsOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_tok"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"), col("n_tok"))
      .withColumn("bin", ntile(4).over(w).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
      .orderBy(col("source"), col("bin"))
  }

  /** Scale twin of [[curriculumBins]] — the 100 TB path, same discipline
    * as [[qualityFilterPctApprox]]: the per-source quartile EDGES come
    * from one mergeable GK sketch pass (`percentile_approx` at 0.25 /
    * 0.5 / 0.75), broadcast back, and binning is a stateless three-
    * comparison expression — no ntile, no per-source total order. Bin
    * populations match ntile's ±(tie run at each edge): ntile splits a
    * tie group across bins to equalize counts, a value edge cannot —
    * pinned in SaltSpec (dominant corpus) and QueriesSpec (graded
    * tables). Rows-only in the oracle, as for every sketch query. */
  def curriculumBinsApprox(s: SparkSession, d: String): DataFrame =
    curriculumBinsApproxOf(docsWithTok(s, d))

  private[graft] def curriculumBinsApproxOf(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("n_tok"))
    val edges = base.groupBy(col("source"))
      .agg(percentile_approx(col("n_tok"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("e"))
      .select(col("source"), col("e").getItem(0).as("q1"),
              col("e").getItem(1).as("q2"), col("e").getItem(2).as("q3"))
    base.join(broadcast(edges), "source")
      .withColumn("bin", lit(1L)
        + (col("n_tok") > col("q1")).cast("long")
        + (col("n_tok") > col("q2")).cast("long")
        + (col("n_tok") > col("q3")).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
      .orderBy(col("source"), col("bin"))
  }

  /** Content-level snapshot diff — the audit behind "what did today's
    * re-crawl actually change": two deterministic 90 % slices of the
    * corpus stand in for yesterday (md5 buckets 0–8) and today (1–9),
    * and each side membership-tests the OTHER side's 16-byte content
    * fingerprints. Per source: today's size, docs whose content is new
    * (fp absent from yesterday), yesterday's docs whose content
    * disappeared, and the retained remainder. Both membership probes
    * are fp-keyed left joins — the incremental_dedup discipline: no
    * exchange ever carries a body, the narrow (source, fp, bkt) frame
    * is checkpointed once so the corpus is scanned ONCE for all four
    * branch consumers. */
  def snapshotDelta(s: SparkSession, d: String): DataFrame = {
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 10
    val docs = Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("fp"), bkt.as("bkt"))
      .localCheckpoint()
    val y = docs.filter(col("bkt") <= 8)
    val t = docs.filter(col("bkt") >= 1)
    val yf = y.select(col("fp")).distinct().withColumn("was", lit(1))
    val tf = t.select(col("fp")).distinct().withColumn("is_now", lit(1))
    val add = t.join(yf, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_today"),
           sum(when(col("was").isNull, 1L).otherwise(0L)).as("n_added"))
    val rem = y.join(tf, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_yesterday"),
           sum(when(col("is_now").isNull, 1L).otherwise(0L)).as("n_removed"))
    add.join(rem, Seq("source"), "full")
      .select(col("source"),
              coalesce(col("n_yesterday"), lit(0L)).as("n_yesterday"),
              coalesce(col("n_today"), lit(0L)).as("n_today"),
              coalesce(col("n_added"), lit(0L)).as("n_added"),
              coalesce(col("n_removed"), lit(0L)).as("n_removed"),
              (coalesce(col("n_today"), lit(0L))
                - coalesce(col("n_added"), lit(0L))).as("n_retained"))
      .orderBy(col("source"))
  }

  /** Distribution drift between corpus snapshots — total-variation
    * distance over the global top-[[MixShiftTerms]] token distribution,
    * per source, between the same two deterministic slices
    * [[snapshotDelta]] diffs (yesterday = md5 buckets 0–8, today =
    * 1–9). TV = Σ|p−q|/2 is computed in CROSS-MULTIPLIED integers —
    * Σ|cy·Tt − ct·Ty| is an exact, order-independent long sum (each
    * term ≤ count·total ≈ 2⁴⁰ at sf0.1; a 100 TB deployment sizes this
    * to DECIMAL, noted here), with ONE double division and rounding at
    * the end — so the hash can't drift on float summation order. The
    * per-(source, term) frame is ≤ sources·terms rows; totals ride a
    * broadcast join. */
  val MixShiftTerms = 100

  def mixShift(s: SparkSession, d: String): DataFrame = {
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 10
    val toks = Tables.documents(s, d)
      .select(col("source"), bkt.as("bkt"), explode(split(col("text"), " ")).as("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(MixShiftTerms).select(col("tok"))
    val counts = toks.join(broadcast(top), Seq("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(sum(when(col("bkt") <= 8, 1L).otherwise(0L)).as("cy"),
           sum(when(col("bkt") >= 1, 1L).otherwise(0L)).as("ct"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("cy")).as("ty"), sum(col("ct")).as("tt"))
    counts.join(broadcast(totals), "source")
      .groupBy(col("source"))
      .agg(max(col("ty")).as("n_y_occ"), max(col("tt")).as("n_t_occ"),
           sum(abs(col("cy") * col("tt") - col("ct") * col("ty"))).as("num"))
      .select(col("source"), col("n_y_occ"), col("n_t_occ"),
              when(col("n_y_occ") * col("n_t_occ") === 0, lit(null).cast("double"))
                .otherwise(round(col("num").cast("double") /
                  (col("n_y_occ") * col("n_t_occ") * 2).cast("double"), 4))
                .as("tv_dist"))
      .orderBy(col("source"))
  }

  /** Tokenizer-vocabulary coverage: fix the vocabulary at the global
    * top-[[OovVocabSize]] tokens (count desc, token asc — a total order
    * both engines share) and report each source's out-of-vocabulary
    * occurrence rate — the "how well does a corpus-level tokenizer fit
    * each slice" audit run before committing a vocab. The vocab cut is
    * a TakeOrdered over the token-count aggregate (never a global
    * sort), broadcast back; the probe is a map-side hash join over the
    * second token stream. Integer counts + one rounded division. */
  val OovVocabSize = 1000

  def vocabOovRate(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(OovVocabSize)
      .select(col("tok")).withColumn("inv", lit(1))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_occ"),
           sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_occ"), col("n_oov"),
              round(col("n_oov").cast("double") / col("n_occ").cast("double"), 4)
                .as("oov_rate"))
      .orderBy(col("source"))
  }

  /** Partition-key balance audit — the question asked before keying any
    * 100 TB exchange: does md5(doc_id) spread rows evenly over k=32
    * hash buckets? Emits per-bucket counts plus the integer-exact hot
    * flag n·k > 2·total (a bucket holding over 2× its fair share).
    * The total rides a broadcast 1-row cross join (the repo's scalar
    * discipline), so the audit is one scan + one ≤k-row agg. */
  def bucketBalance(s: SparkSession, d: String): DataFrame = {
    val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 32
    val per = Tables.documents(s, d)
      .select(bkt.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val total = per.agg(sum(col("n_docs")).as("total"))
    per.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_docs"),
              (col("n_docs") * 32 > col("total") * 2).as("hot"))
      .orderBy(col("bucket"))
  }

  /** Doc-length power-law audit: per (source, ⌊log₂ n_tok⌋) bucket,
    * document and token mass — the Zipf-ish length histogram read
    * before choosing pack/truncation budgets. The bucket is computed
    * WITHOUT transcendentals (⌊log₂ n⌋ = len(bin(n)) − 1, exact
    * integer both engines) so the oracle hash cannot drift on libm. */
  def lengthZipf(s: SparkSession, d: String): DataFrame =
    docsWithTok(s, d)
      .filter(col("n_tok") >= 1)
      .withColumn("bucket", (length(bin(col("n_tok"))) - 1).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
           min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
      .orderBy(col("source"), col("bucket"))

  /** Driver-checkable claim for [[curriculumBinsApprox]] — the GK rank
    * guarantee per quartile edge, in integers (the
    * [[graft.rel.RelQueries.approxPercentilesBound]] discipline): each
    * sketch edge e_i must have a possible rank within n/accuracy of
    * i·n/4, tested as cnt_le·acc ≥ n·(2500·i) − n − acc and
    * cnt_lt·acc ≤ n·(2500·i) + n + acc with acc = 10000. DuckDB's twin
    * emits the matching `true` rows, so the sketch's error contract is
    * hash-checked, not just spec-pinned. */
  def curriculumBinsBound(s: SparkSession, d: String): DataFrame = {
    val base = docsWithTok(s, d).select(col("source"), col("n_tok"))
    val edges = base.groupBy(col("source"))
      .agg(percentile_approx(col("n_tok"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("e"))
      .select(col("source"), col("e").getItem(0).as("q1"),
              col("e").getItem(1).as("q2"), col("e").getItem(2).as("q3"))
    val joined = base.join(broadcast(edges), "source")
    val counted = joined.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("n_tok") < col("q1"), 1L).otherwise(0L)).as("lt1"),
           sum(when(col("n_tok") <= col("q1"), 1L).otherwise(0L)).as("le1"),
           sum(when(col("n_tok") < col("q2"), 1L).otherwise(0L)).as("lt2"),
           sum(when(col("n_tok") <= col("q2"), 1L).otherwise(0L)).as("le2"),
           sum(when(col("n_tok") < col("q3"), 1L).otherwise(0L)).as("lt3"),
           sum(when(col("n_tok") <= col("q3"), 1L).otherwise(0L)).as("le3"))
    def ok(i: Int) =
      (col(s"le$i") * 10000 >= col("n") * (2500 * i) - col("n") - 10000 &&
       col(s"lt$i") * 10000 <= col("n") * (2500 * i) + col("n") + 10000)
        .as(s"q${i}_ok")
    counted.select(col("source"), ok(1), ok(2), ok(3)).orderBy(col("source"))
  }

  /** Driver-checkable claim for [[qualityFilterPctApprox]]: the
    * per-source GK median threshold's rank must sit within n/accuracy
    * of n/2 (acc = 10000), same integer two-sided rank test as
    * [[curriculumBinsBound]]. */
  def qualityPctBound(s: SparkSession, d: String): DataFrame = {
    val base = docsWithTok(s, d).select(col("source"), col("n_tok"))
    val thr = base.groupBy(col("source"))
      .agg(percentile_approx(col("n_tok"), lit(0.5), lit(10000)).as("thr"))
    base.join(broadcast(thr), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("n_tok") < col("thr"), 1L).otherwise(0L)).as("lt"),
           sum(when(col("n_tok") <= col("thr"), 1L).otherwise(0L)).as("le"))
      .select(col("source"),
              (col("le") * 10000 >= col("n") * 5000 - col("n") - 10000 &&
               col("lt") * 10000 <= col("n") * 5000 + col("n") + 10000)
                .as("thr_ok"))
      .orderBy(col("source"))
  }

  /** Incremental ingestion dedup — the daily corpus-refresh shape: a NEW
    * batch (the sample_split hash discipline: md5(doc_id) bucket 9, a
    * 10% increment uncorrelated with source — doc_id modulo would alias
    * the source rotation) is deduped against the existing SNAPSHOT (the
    * other 90%) by membership-testing 16-byte md5 fingerprints (a left
    * join + null test — anti-join semantics that still lets one agg
    * produce total AND fresh counts from one batch scan), so the
    * increment never triggers a global re-dedup of the full corpus
    * and no exchange ever carries a document body. Counts batch rows
    * verbatim — intra-batch copies are [[dedupExactKeep]]'s job; this op
    * answers "how much of today's crawl did we already have". */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
              bucket.as("bkt"))
    val snapshot = docs.filter(col("bkt") =!= 9)
      .select(col("fp")).distinct().withColumn("seen", lit(1L))
    // LEFT join + null test instead of anti join + a second totals scan:
    // every batch row survives into ONE aggregation that yields both the
    // total and the fresh count — one batch scan, one snapshot scan
    docs.filter(col("bkt") === 9)
      .join(snapshot, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_batch"),
           sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"),
           sum(when(col("seen").isNotNull, 1L).otherwise(0L)).as("n_dup_vs_snapshot"))
      .orderBy(col("source"))
  }

  /** Deterministic stratified sample: the same fraction of every source,
    * chosen by md5-hash order (reproducible across engines and runs, no
    * RNG state) — the eval-split / data-ablation primitive. Rank and
    * stratum size come from one window pass; the quota compares the same
    * IEEE product on both engines. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val wRank = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    Tables.documents(s, d)
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("n_src", count(lit(1)).over(wAll))
      .filter(col("rnk") <= ceil(col("n_src") * lit(0.1d)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"), max(col("n_src")).as("n_total"),
           sum(col("n_chars")).as("sum_chars"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))
  }

  /** Length-outlier detection per source: documents whose token count
    * sits beyond 1.5σ of their source's mean — the truncation/concatenation
    * anomaly scan of a corpus audit. Mean and variance are computed from
    * exact integer sums (Σx, Σx², n) with a FIXED expression order —
    * never the built-in stddev (Welford accumulation order differs per
    * engine) — so the z-threshold compares identically cross-engine. */
  def lengthOutliers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
    val docs = Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val withStats = docs
      .withColumn("sx", sum(col("n_tok")).over(w))
      .withColumn("sxx", sum(col("n_tok") * col("n_tok")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("variance",
        (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n"))
          / (col("n") - 1))
    withStats
      .filter((col("n_tok").cast("double") - col("mean")) *
              (col("n_tok").cast("double") - col("mean")) >
              lit(2.25d) * col("variance"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_outliers"), min(col("n_tok")).as("min_tok"),
           max(col("n_tok")).as("max_tok"))
      .orderBy(col("source"))
  }

  /** Per-source frequency cap (the C4/RefinedWeb "domain cap" curation
    * step): keep at most [[DomainCap]] documents per source, chosen
    * deterministically by md5(doc_id) so the keep-set is identical on any
    * cluster or engine; emit the per-source kept/dropped audit.
    *
    * Scale shape: one shuffle on `source` + a per-partition streaming
    * row_number — linear. At 100 TB a single hot domain serializes its
    * partition's sort; [[domainCapsSalted]] is the two-phase production
    * variant (salted per-bucket top-N, then a refine over the ≤ salt·N
    * survivors), graded separately and parity-pinned in `SaltSpec`.
    * This windowed form stays as the semantic spec. */
  val DomainCap = 10

  def domainCaps(s: SparkSession, d: String): DataFrame =
    domainCapsOf(Tables.documents(s, d))

  private[graft] def domainCapsOf(docs: DataFrame): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
    docs
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("rn") <= DomainCap, 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("rn") > DomainCap, 1L).otherwise(0L)).as("n_dropped"),
           sum(when(col("rn") <= DomainCap, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** The SCALED execution of [[domainCaps]] — the two-phase salted cap
    * the scaladoc used to promise, now code: a hot domain never
    * serializes one task's sort. Phase 1 ranks within (source, salt) —
    * `salts` parallel partitions per domain — and keeps each bucket's
    * top-[[DomainCap]] CANDIDATES (the true per-source top-N is a
    * subset: any row in the global top-N is within the top-N of its own
    * bucket, because ranks only shrink when restricted). Phase 2 refines
    * the ≤ salts·cap survivors per source — a frame bounded by
    * salts·cap·|sources| rows regardless of corpus size — to the exact
    * keep set; the per-source TOTALS come from a plain hash agg (no
    * window, no total order). Same deterministic md5(doc_id) order as
    * the windowed form, so the keep set — and every output row — is
    * bit-identical to it; `SaltSpec` pins the parity on a corpus with
    * one dominant source. */
  def domainCapsSalted(s: SparkSession, d: String): DataFrame =
    domainCapsSaltedOf(Tables.documents(s, d))

  private[graft] def domainCapsSaltedOf(docs: DataFrame, salts: Int = 16): DataFrame = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val wBucket = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("h"), col("doc_id"))
    val wRefine = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val kept = docs
      .withColumn("h", h)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .withColumn("brn", row_number().over(wBucket))
      .filter(col("brn") <= DomainCap)
      .withColumn("rn", row_number().over(wRefine))
      .filter(col("rn") <= DomainCap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k_kept"), sum(col("n_chars")).as("k_chars"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
              coalesce(col("k_kept"), lit(0L)).as("n_kept"),
              (col("n_docs") - coalesce(col("k_kept"), lit(0L))).as("n_dropped"),
              coalesce(col("k_chars"), lit(0L)).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** RAG-style sliding-window chunking: [[ChunkWords]]-word chunks at
    * stride [[ChunkStride]], fingerprinted (16-hex md5 prefix) instead of
    * materialized so the audit stays narrow; reports per-source chunk
    * inventory + the cross-document chunk dedup rate (n_uniq_chunks vs
    * n_chunks). Explode fan-out is ~n_tok/stride per doc — bounded and
    * linear; the chunk rows never leave the partial aggregation. */
  val ChunkWords  = 20
  val ChunkStride = 15

  def docChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .withColumn("start", explode(sequence(lit(0), col("n") - 1, lit(ChunkStride))))
      .withColumn("chunk",
        array_join(slice(col("ws"), col("start") + 1, lit(ChunkWords)), " "))
      .withColumn("h", substring(md5(col("chunk").cast("binary")), 1, 16))
      .withColumn("cw", least(lit(ChunkWords), col("n") - col("start")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
           countDistinct(col("h")).as("n_uniq_chunks"),
           sum(col("cw")).as("sum_chunk_words"))
      .orderBy(col("source"))

  /** Collocation strength over adjacent word pairs — PMI-style lift kept
    * cross-engine exact: lift = c_ab·W²/(T·c_a·c_b) uses only IEEE
    * multiply/divide over exact integer counts in a FIXED left-to-right
    * order (no log — transcendentals differ per libm), rounded to 3
    * decimals. Support floor c_ab ≥ [[BigramMinCount]]; top-15 by
    * (c_ab desc, bigram). The unigram join is an equi-join on the word —
    * vocabulary-sized, shuffle-partitioned, no broadcast assumption. */
  val BigramMinCount = 5

  def bigramLift(s: SparkSession, d: String): DataFrame = {
    // corpus totals come from ONE explode-free scan (Σ size(ws) words,
    // Σ (size(ws)−1) bigrams) — the naive form re-exploded the corpus
    // for each scalar. The unigram-count frame is checkpointed because
    // it feeds BOTH sides of the pair join (vocabulary-sized; identical
    // subtrees are not exchange-reused under AQE). Two explodes remain
    // (unigram, bigram) — intrinsic.
    val docs = Tables.documents(s, d).withColumn("ws", split(col("text"), " "))
    val wc = docs.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bgc = docs
      .filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= BigramMinCount)
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
    val totals = docs.agg(
      sum(size(col("ws")).cast("long")).as("w_tot"),
      sum(when(size(col("ws")) >= 2, size(col("ws")).cast("long") - 1L)
        .otherwise(0L)).as("t_tot"))
    bgc
      .join(wc.withColumnRenamed("w", "a").withColumnRenamed("c", "ca"), "a")
      .join(wc.withColumnRenamed("w", "b").withColumnRenamed("c", "cb"), "b")
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        round(col("cab").cast("double") * col("w_tot") * col("w_tot")
          / col("t_tot") / col("ca") / col("cb"), 3))
      .select(col("bg"), col("cab"), col("ca"), col("cb"), col("lift"))
      .orderBy(col("cab").desc, col("bg"))
      .limit(15)
  }

  /** Edit-distance near-duplicate pairs — the fuzzy-dedup family member
    * between exact hash and MinHash: Levenshtein over the first
    * [[EditPrefix]] chars of the normalized text, blocked on
    * (⌊len/20⌋, first-4-chars) so only plausible pairs are compared.
    * Levenshtein is integer DP — bit-identical cross-engine, fully
    * oracle-checkable (unlike sketches). The block cap is MIRRORED in
    * the DuckDB twin (QUALIFY) so a mass-duplicate corpus can never
    * silently diverge the oracle — the lesson from the LSH bucket cap. */
  val EditBlockCap = 256
  val EditMaxDist  = 5
  val EditPrefix   = 40

  def editdistPairs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), normCol.as("norm"))
      .withColumn("p", substring(col("norm"), 1, EditPrefix))
      .withColumn("blk", concat_ws("|",
        floor(length(col("norm")) / 20).cast("string"),
        substring(col("norm"), 1, 4)))
    val bounded = base
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("bn") <= EditBlockCap)
    val a = bounded.select(col("blk"), col("doc_id").as("doc_a"), col("p").as("pa"))
    val b = bounded.select(col("blk"), col("doc_id").as("doc_b"), col("p").as("pb"))
    a.join(b, "blk")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("dist") <= EditMaxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-source quality-quantile gate: keep documents at or above their
    * source's median token count (percent_rank ≥ 0.5 over a TOTAL order —
    * doc_id tiebreak makes rank = row_number, so percent_rank is the
    * exact integer ratio (rn−1)/(n−1), deterministic cross-engine). The
    * quantile-filter pattern generalizes to any integer quality score.
    * This is the SEMANTIC form; [[qualityFilterPctApprox]] is the scale
    * path (no per-source total order — a hot source serializes this
    * window's sort into one task at 100 TB). */
  def qualityFilterPct(s: SparkSession, d: String): DataFrame =
    qualityFilterPctOf(docsWithTok(s, d))

  private def docsWithTok(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("n_chars"))

  private[graft] def qualityFilterPctOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_tok"), col("doc_id"))
    docs
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           min(col("n_tok")).as("min_kept_tok"),
           sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** Scale twin of [[qualityFilterPct]] — the 100 TB path. The per-source
    * median token count comes from the mergeable GK sketch
    * (`percentile_approx`: map-side partial sketches, one ≤|sources|-row
    * final merge), joins back as a broadcast threshold frame, and ONE
    * stateless filter+agg pass keeps docs at/above their source's
    * threshold. No per-source total order anywhere — the only exchanges
    * are hash partial-aggs, so a 90 %-dominant source costs the same as
    * a uniform one (machine-checked: no Window node, SaltSpec).
    *
    * Semantics note: thresholding at the sketch median keeps the docs
    * the windowed form keeps ± the tie group AT the threshold (the
    * windowed form splits ties by doc_id; a value threshold cannot), so
    * the two agree within that tie group — pinned in SaltSpec on a
    * dominant corpus and in QueriesSpec on the graded tables. Sketch cut
    * points aren't bit-reproducible cross-engine (DuckDB's
    * approx_quantile is a t-digest), so the query is graded rows-only,
    * like the other sketch family members. */
  def qualityFilterPctApprox(s: SparkSession, d: String): DataFrame =
    qualityFilterPctApproxOf(docsWithTok(s, d))

  private[graft] def qualityFilterPctApproxOf(docs: DataFrame): DataFrame = {
    val thr = docs.groupBy(col("source"))
      .agg(percentile_approx(col("n_tok"), lit(0.5), lit(10000)).as("thr"))
    docs.join(broadcast(thr), "source")
      .filter(col("n_tok") >= col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           min(col("n_tok")).as("min_kept_tok"),
           sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** The curation funnel with PER-STAGE attribution — the audit a
    * training-data team actually reads: per source, how many documents
    * survive each gate (raw → exact-dedup representative → quality gate
    * → domain cap). ONE documents scan, ONE window pass (the fp-keyed
    * exact-dedup rank), one aggregation.
    *
    * The cap stage carries NO window at all: this funnel reports
    * COUNTS, and the count of cap survivors is order-independent —
    * whatever deterministic order picks the keep set, exactly
    * min(n_quality, cap) rows clear it — so `n_final =
    * least(n_quality, cap)` is bit-identical to ranking and throws
    * away the per-source total order that would serialize a hot
    * domain's task at 100 TB (the r7 verdict's one perf-weak path).
    * The membership-bearing composition — WHICH rows survive, and
    * their char mass — is [[curationFunnelChars]], which pays for
    * selection with the two-phase salted cap, never a full-corpus
    * per-source sort. */
  def curationFunnel(s: SparkSession, d: String): DataFrame = {
    // the exact-dedup window partitions on the md5 FINGERPRINT so its
    // exchange hashes and carries 16 bytes per row, not the body; n_tok
    // is the only other text derivative and both project map-side,
    // letting Catalyst prune `text` below the first shuffle
    val wExact = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("fp", md5(col("text")))
      .select(col("doc_id"), col("source"), col("n_tok"), col("fp"))
      .withColumn("ex", row_number().over(wExact) === 1)
      .withColumn("q", col("ex") && col("n_tok") >= 30)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("ex"), 1L).otherwise(0L)).as("n_exact"),
           sum(when(col("q"), 1L).otherwise(0L)).as("n_quality"),
           least(sum(when(col("q"), 1L).otherwise(0L)), lit(DomainCap.toLong))
             .as("n_final"))
      .orderBy(col("source"))
  }

  /** The SELECTION-bearing funnel: per-stage document counts AND char
    * mass, where the final stage's `final_chars` depends on exactly
    * WHICH documents clear the domain cap — the question
    * [[curationFunnel]]'s count-only output lets it sidestep. The keep
    * set is the same deterministic md5(doc_id) order as
    * [[domainCaps]], but executed as the TWO-PHASE SALTED cap
    * ([[domainCapsSaltedOf]]): phase 1 ranks within (source, salt) —
    * parallel buckets, each keeping its top-cap candidates — and the
    * phase-2 refine window sees at most salts·cap rows per source, so
    * no per-source total order ever touches the unbounded survivor
    * stream. DuckDB's twin runs the plain windowed form: the
    * cross-engine hash match is the proof that salted selection is
    * EXACT, not approximate.
    *
    * The narrow post-window frame (doc_id, source, n_chars, flags — no
    * text) feeds both the stage aggregate and the cap branch;
    * localCheckpoint materializes it once so the scan, md5(text), and
    * fp-window are not recomputed per branch (the bigramLift
    * discipline; ~40 bytes/row, far cheaper than a second pass over
    * the corpus). */
  def curationFunnelChars(s: SparkSession, d: String): DataFrame =
    curationFunnelCharsOf(Tables.documents(s, d))

  private[graft] def curationFunnelCharsOf(docs: DataFrame, salts: Int = 16): DataFrame = {
    val wExact = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val base = docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("fp", md5(col("text")))
      .select(col("doc_id"), col("source"), col("n_chars"), col("n_tok"), col("fp"))
      .withColumn("ex", row_number().over(wExact) === 1)
      .withColumn("q", col("ex") && col("n_tok") >= 30)
      .select(col("doc_id"), col("source"), col("n_chars"), col("ex"), col("q"))
      .localCheckpoint()
    val stage = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("raw_chars"),
           sum(when(col("ex"), 1L).otherwise(0L)).as("n_exact"),
           sum(when(col("ex"), col("n_chars")).otherwise(0L)).as("exact_chars"),
           sum(when(col("q"), 1L).otherwise(0L)).as("n_quality"),
           sum(when(col("q"), col("n_chars")).otherwise(0L)).as("quality_chars"))
    val wBucket = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("h"), col("doc_id"))
    val wRefine = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val fin = base.filter(col("q"))
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .withColumn("brn", row_number().over(wBucket))
      .filter(col("brn") <= DomainCap) // ≤ salts·cap rows/source reach the refine
      .withColumn("rn", row_number().over(wRefine))
      .filter(col("rn") <= DomainCap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k_final"), sum(col("n_chars")).as("k_chars"))
    stage.join(fin, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("raw_chars"),
              col("n_exact"), col("exact_chars"),
              col("n_quality"), col("quality_chars"),
              coalesce(col("k_final"), lit(0L)).as("n_final"),
              coalesce(col("k_chars"), lit(0L)).as("final_chars"))
      .orderBy(col("source"))
  }

  /** Corpus-conditional bigram novelty — the log-free stand-in for an
    * n-gram-LM fluency score: a transition a→b is "novel" when its
    * corpus conditional probability is under 1/8, tested as the exact
    * integer comparison 8·c(a,b) < c(a,·) (no log, no float sum — the
    * repo-wide determinism rule). High novel-transition fractions flag
    * incoherent/garbled text; near-zero flags boilerplate. The exploded
    * occurrence frame feeds the count build AND the probe: it is
    * deliberately NOT checkpointed (tfidf precedent — materializing a
    * corpus-scale stream costs more block I/O than re-running a cheap
    * scan+explode; the counts' shuffle is paid either way), so ScanAudit
    * shows the same intrinsic documents×2 as tfidf. First-word totals
    * come from a window over the bigram-count frame (vocab-sized);
    * hot-bigram probe skew is AQE-split like every equi-join here. */
  def bigramNovelty(s: SparkSession, d: String): DataFrame = {
    val bg = Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("cab"))
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("ca", sum(col("cab")).over(Window.partitionBy(col("a"))))
      .select(col("bg"), col("cab"), col("ca"))
    bg.join(counts, Seq("bg"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_trans"),
           sum(when(col("cab") * 8 < col("ca"), lit(1L)).otherwise(lit(0L)))
             .as("n_novel"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(sum(col("n_novel")).cast("double") / sum(col("n_trans")), 4)
             .as("novel_frac"),
           sum(when(col("n_novel") * 2 > col("n_trans"), lit(1L))
             .otherwise(lit(0L))).as("n_incoherent"))
      .orderBy(col("source"))
  }

  /** Inverted-index builder with BOUNDED posting samples: per top-df
    * term, its document frequency plus a deterministic bottom-4-by-hash
    * sample of its posting list via the O(k)-state KMV aggregate
    * ([[graft.functions.BottomKByHashAgg]]) — the scale-safe inverted-
    * index shape: a corpus-hot term keeps k docs of aggregation state,
    * never its full posting list (a collect_list here is the OOM-able
    * anti-pattern). Exploded to rows for the oracle hash. */
  def termPostings(s: SparkSession, d: String): DataFrame = {
    val td = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val top = td.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
           graft.functions.GraftFunctions.bottomk_by_hash(col("doc_id"), 4)
             .as("sample_docs"))
      .orderBy(col("df").desc, col("term"))
      .limit(50)
    top.select(col("term"), col("df"),
               posexplode(col("sample_docs")).as(Seq("i", "doc_id")))
      .select(col("term"), col("df"),
              (col("i") + 1).cast("long").as("rank"), col("doc_id"))
      .orderBy(col("df").desc, col("term"), col("rank"))
  }

  /** Mixture resampling: down-sample each source toward an EQUAL token
    * share by a deterministic hash threshold — the op that materializes
    * a curriculum mix (corpus_mix computes weights; this applies them).
    * keep(doc) ⇔ h20(doc_id) < floor(min(1, T/(n_src·tok_s)) · 2^20):
    * the threshold derives from exact integer token totals through two
    * IEEE ops (one divide, one multiply — identical cross-engine), and
    * the per-doc gate is a pure integer compare, so the kept set is
    * byte-stable on any engine or cluster layout. The ≤|sources| token
    * frame broadcasts; docs never shuffle (map-side gate + one agg). */
  def mixApply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("h20",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % (1L << 20))
    val perSrc = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("tok_s"))
    val tot = perSrc.agg(sum(col("tok_s")).as("t_total"),
                         count(lit(1)).as("n_src"))
    val thr = perSrc.crossJoin(broadcast(tot))
      .withColumn("p", least(lit(1.0d),
        col("t_total").cast("double") / (col("n_src") * col("tok_s"))))
      .withColumn("thr", floor(col("p") * lit(1048576.0d)).cast("long"))
      .select(col("source").as("src2"), col("thr"))
    docs.join(broadcast(thr), col("source") === col("src2"))
      .filter(col("h20") < col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
           sum(col("n_tok")).as("n_tokens_kept"),
           max(col("thr")).as("thr"))
      .orderBy(col("source"))
  }

  private val NShards = 16

  /** Deterministic training-shard assignment: shard = md5(doc_id) mod 16
    * — the write-side global shuffle that breaks source/time locality
    * before sequence packing (every shard sees an unbiased corpus
    * sample). Reports per-shard doc/token mass so imbalance is an
    * audited number, not an assumption; the md5 hash also fixes a
    * within-shard order, making re-runs byte-stable. Map-side hash +
    * one 16-group agg — no shuffle of note at any scale. */
  def shardAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("shard", col("h") % NShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
           min(col("h")).as("min_h"))
      .orderBy(col("shard"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bigram_novelty" -> (bigramNovelty _),
    "shard_assign"   -> (shardAssign _),
    "term_postings"  -> (termPostings _),
    "mix_apply"      -> (mixApply _),
    "cms_heavy_hitters"  -> (cmsHeavyHitters _),
    "source_diversity"   -> (sourceDiversity _),
    "curation_funnel"    -> (curationFunnel _),
    "curation_funnel_chars" -> (curationFunnelChars _),
    "domain_caps"        -> (domainCaps _),
    "domain_caps_salted" -> (domainCapsSalted _),
    "curriculum_bins"    -> (curriculumBins _),
    "mix_temperature"    -> (mixTemperature _),
    "dsir_weights"       -> (dsirWeights _),
    "span_corruption_plan" -> (spanCorruptionPlan _),
    // curriculumBinsApprox / qualityFilterPctApprox are UNLISTED
    // diagnostics since r9 — graded via their hash-checked *_bound twins
    "curriculum_bins_bound"     -> (curriculumBinsBound _),
    "quality_pct_bound"         -> (qualityPctBound _),
    "snapshot_delta"            -> (snapshotDelta _),
    "mix_shift"                 -> (mixShift _),
    "vocab_oov_rate"            -> (vocabOovRate _),
    "bucket_balance"            -> (bucketBalance _),
    "length_zipf"               -> (lengthZipf _),
    "tfidf_top_terms_agg"       -> (tfidfTopTermsAgg _),
    "incremental_dedup"  -> (incrementalDedup _),
    "doc_chunks"         -> (docChunks _),
    "bigram_lift"        -> (bigramLift _),
    "quality_filter_pct" -> (qualityFilterPct _),
    "editdist_pairs"     -> (editdistPairs _),
    "length_outliers"   -> (lengthOutliers _),
    "seq_packing"       -> (seqPacking _),
    "stratified_sample" -> (stratifiedSample _),
    "tfidf_top_terms" -> (tfidfTopTerms _),
    "bm25_top_terms"  -> (bm25TopTerms _),
    "token_entropy"   -> (tokenEntropy _),
    "vocab_ttr"       -> (vocabTtr _),
    "pii_scan"         -> (piiScan _),
    "pii_redact"       -> (piiRedact _),
    "segment_dedup"    -> (segmentDedup _),
    "sample_split"     -> (sampleSplit _),
    "corpus_mix"       -> (corpusMix _),
    "text_repetition"  -> (textRepetition _),
    "sample_bottomk"   -> (sampleBottomK _),
    "dedup_stats"      -> (dedupStats _),
    "dedup_exact_keep" -> (dedupExactKeep _),
    "text_tokens"      -> (textTokens _),
    "word_freq"        -> (wordFreq _),
    "text_quality"     -> (textQuality _),
    "lang_id"          -> (langId _),
    "doc_fingerprint"  -> (fingerprint _),
    "token_count_bpe"  -> (tokenCountBpe _),
    "token_fertility"  -> (tokenFertility _),
    "lm_xent"          -> (lmXent _),
    "ccnet_buckets"    -> (ccnetBuckets _),
    "gopher_rules"     -> (gopherRules _),
    "rep_ngram_frac"   -> (repNgramFrac _),
    "bpe_merge_step"   -> (bpeMergeStep _),
    "bpe_merge_k"      -> ((s: SparkSession, d: String) => bpeMergeK(s, d)),
    "bpe_apply"        -> (bpeApply _),
    "token_budget"     -> (tokenBudget _),
    "bigram_xent"      -> (bigramXent _),
    "logreg_step"      -> (logregStep _),
    "logreg_infer"     -> (logregInfer _),
    "vocab_growth"     -> (vocabGrowth _))

  /** Unigram-LM cross-entropy scoring — the CCNet-style quality signal
    * (score each document by a language model trained on the corpus;
    * high cross-entropy = far from the corpus distribution = likely
    * noise). One pass trains the LM (token counts, a map-side-combinable
    * hash agg), one pass scores (explode → LM lookup join → per-doc
    * sum): p(w) = (c(w) + α) / (N + α(V+1)), add-α smoothing with
    * α = 0.5 — the +1 slot is the OOV mass, unclaimed here (self-scored
    * corpus ⇒ no OOV) but keeping the API's generalization to scoring a
    * NEW crawl against a reference LM honest.
    *
    * Scale shape: the vocabulary — the only frame with 2+ consumers (the
    * lookup join and the (N, V) totals) — is localCheckpointed, so
    * `documents` is scanned exactly once per consumer lineage (ONE
    * exploded pass + the count twice-over is gone; ScanBudget holds at
    * the committed entries). The lookup join shuffles on the token key
    * only if the LM outgrows broadcast — at testdata scale AQE
    * broadcasts it; at 100 TB a 10M-row vocab shuffle-joins, the
    * standard LM-scoring shape. lang/source ride the exploded frame, so
    * no join-back to documents is needed. Per-doc float sums are
    * rounded at 3 decimals AFTER the per-(lang, source) average — ~1e-14
    * relative FP noise against DuckDB, invisible at that precision. */
  def lmXent(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
              explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val stats = vocab.agg(sum(col("c")).as("n_total"), count(lit(1)).as("v"))
    toks.join(vocab, "tok")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tok"),
           sum(-log((col("c") + 0.5) /
             (col("n_total") + (col("v") + 1) * 0.5))).as("nll"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("nll") / col("n_tok") / log(lit(2.0))), 3)
             .as("avg_xent_bits"))
      .orderBy(col("lang"), col("source"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020: score every
    * document with an LM, split each source into head/middle/tail
    * PERPLEXITY TERCILES, and train preferentially on the head — the
    * curation cut CCNet used to mine Common Crawl): per-document
    * surprisal under the [[lmXent]] smoothed unigram LM, ranked within
    * source, tercile = exact integer arithmetic on the rank.
    *
    * Determinism discipline: per-token surprisal is quantized ONCE PER
    * DISTINCT WORD (`floor(-ln p · 10⁴)` — both engines floor the same
    * double, and the 1e-4 grid keeps any last-ulp `ln` disagreement ~8
    * orders of magnitude away from a grid edge), so the per-doc score
    * is an EXACT BIGINT sum — reduction order cannot perturb the
    * ranking — and the rank key is one integer division; the tercile is
    * `((rank−1)·3) div n`. The reported bits/token divides exact sums
    * once.
    *
    * Scale shape: one corpus scan tokenizes; the vocab frame is
    * checkpointed (scored twice: stats + surprisal); per-doc reduce is
    * a map-side-combinable integer agg; the rank window partitions by
    * source over the ≤|docs|-row doc frame, never token rows. */
  def ccnetBuckets(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
              explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val stats = vocab.agg(sum(col("c")).as("n_total"), count(lit(1)).as("v"))
    val vq = vocab.crossJoin(broadcast(stats))
      .select(col("tok"),
        floor(-log((col("c") + 0.5) /
          (col("n_total") + lit(0.5) * (col("v") + 1))) * 1e4).cast("long").as("sq"))
    val perDoc = toks.join(vq, "tok")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"), sum(col("sq")).as("nllq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("nllq").cast("double") / col("n_tok"), col("doc_id"))
    perDoc
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("bucket", expr("CAST(((rk - 1) * 3) DIV n AS BIGINT)"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
           sum(col("nllq")).as("sqsum"))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_tokens"),
        round(col("sqsum").cast("double") / 1e4 / col("n_tokens") /
          log(lit(2.0)), 4).as("bits_per_tok"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Distributed logistic-regression training step ×2 — the
    * quality-classifier shape (fastText-style linear scorer over cheap
    * document features) graded the way `kmeans_step` grades clustering:
    * two unrolled batch-gradient-descent iterations on the language
    * label (y = lang='en') with features (bias, clipped length,
    * stopword ratio), emitting the 3-row weight table after each step.
    * From w = 0 the first step is closed-form (σ ≡ 0.5); the second
    * evaluates the sigmoid per document — the part that makes this a
    * real distributed-training kernel, not algebra.
    *
    * Scale shape: ONE corpus scan builds the feature frame
    * (localCheckpointed — both steps consume it); each step is one
    * map-side-combinable agg to a single row, and step 1's weights
    * broadcast into step 2's sigmoid — weights never touch the driver,
    * the same discipline as [[bpeMergeK]]'s argmax. Cross-engine FP:
    * both engines compute 0.1·Σ/n in the same association; Σ over
    * ~1e-15-noise doubles is invisible at the 4-decimal rounding
    * ([[lmXent]] precedent). */
  /** Shared feature projection for [[logregStep]] and the streaming
    * twin `Streams.logregStream`: label (lang='en') plus (bias, clipped
    * length, stopword ratio), all map-side expressions. */
  private[graft] def lrFeatures(df: DataFrame, extra: Seq[Column] = Nil): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("ws", split(col("text"), " "))
      .select(extra ++ Seq(
        when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
        lit(1.0d).as("x0"),
        (least(size(col("ws")), lit(200)).cast("double") / 200.0d).as("x1"),
        (size(filter(col("ws"), w => array_contains(stopArr, w))).cast("double") /
          size(col("ws"))).as("x2")): _*)
  }

  def logregStep(s: SparkSession, d: String): DataFrame = {
    val f = lrFeatures(Tables.documents(s, d)).localCheckpoint()
    val s1 = f.agg(
      (lit(0.1d) * sum(col("x0") * (col("y") - 0.5d)) / count(lit(1))).as("w0"),
      (lit(0.1d) * sum(col("x1") * (col("y") - 0.5d)) / count(lit(1))).as("w1"),
      (lit(0.1d) * sum(col("x2") * (col("y") - 0.5d)) / count(lit(1))).as("w2"))
    f.crossJoin(broadcast(s1))
      .withColumn("sig", lit(1.0d) / (lit(1.0d) + exp(-(
        col("w0") * col("x0") + col("w1") * col("x1") + col("w2") * col("x2")))))
      .agg(
        max(col("w0")).as("w0"), max(col("w1")).as("w1"), max(col("w2")).as("w2"),
        (lit(0.1d) * sum(col("x0") * (col("sig") - col("y"))) / count(lit(1))).as("g0"),
        (lit(0.1d) * sum(col("x1") * (col("sig") - col("y"))) / count(lit(1))).as("g1"),
        (lit(0.1d) * sum(col("x2") * (col("sig") - col("y"))) / count(lit(1))).as("g2"))
      .select(expr(
        "stack(3, 'bias', round(w0, 4), round(w0 - g0, 4), " +
        "'len', round(w1, 4), round(w1 - g1, 4), " +
        "'stop_ratio', round(w2, 4), round(w2 - g2, 4)) " +
        "AS (feature, w_step1, w_step2)"))
      .orderBy(col("feature"))
  }

  /** Trained-classifier DEPLOYMENT — the step after [[logregStep]]'s
    * training kernel: quantize the 2-step weights to 4 decimals (the
    * shipped model — deliberately, because the ROUNDED weights are
    * bit-identical cross-engine, so every downstream margin comparison
    * is exact, the way a production filter pins a model artifact rather
    * than a training run's last-bit float state) and run the corpus
    * through the gate: keep when w·x > 0 (σ(w·x) > ½). Emits the
    * per-source curation report — docs, kept, mean classifier score —
    * the fastText-quality-filter audit every pretraining pipeline runs
    * before committing a mix.
    *
    * Scale shape: ONE corpus scan builds the feature frame
    * (localCheckpointed — training consumes it twice, scoring once);
    * both training steps are map-side-combinable aggs to a 1-row frame
    * that BROADCASTS into the scoring pass — weights never touch the
    * driver. The margin is a fixed-association dot product over
    * identical doubles, so n_keep is exact; only avg_score rounds. */
  def logregInfer(s: SparkSession, d: String): DataFrame = {
    val f = lrFeatures(Tables.documents(s, d), Seq(col("source")))
      .localCheckpoint()
    val s1 = f.agg(
      (lit(0.1d) * sum(col("x0") * (col("y") - 0.5d)) / count(lit(1))).as("w0"),
      (lit(0.1d) * sum(col("x1") * (col("y") - 0.5d)) / count(lit(1))).as("w1"),
      (lit(0.1d) * sum(col("x2") * (col("y") - 0.5d)) / count(lit(1))).as("w2"))
    val s2 = f.crossJoin(broadcast(s1))
      .withColumn("sig", lit(1.0d) / (lit(1.0d) + exp(-(
        col("w0") * col("x0") + col("w1") * col("x1") + col("w2") * col("x2")))))
      .agg(
        round(max(col("w0")) -
          lit(0.1d) * sum(col("x0") * (col("sig") - col("y"))) / count(lit(1)), 4).as("w0"),
        round(max(col("w1")) -
          lit(0.1d) * sum(col("x1") * (col("sig") - col("y"))) / count(lit(1)), 4).as("w1"),
        round(max(col("w2")) -
          lit(0.1d) * sum(col("x2") * (col("sig") - col("y"))) / count(lit(1)), 4).as("w2"))
    f.crossJoin(broadcast(s2))
      .withColumn("margin",
        col("w0") * col("x0") + col("w1") * col("x1") + col("w2") * col("x2"))
      .withColumn("score", lit(1.0d) / (lit(1.0d) + exp(-col("margin"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("margin") > 0d, 1L).otherwise(0L)).as("n_keep"),
           round(avg(col("score")), 4).as("avg_score"))
      .orderBy(col("source"))
  }

  /** Bigram-LM cross-entropy — the order-2 companion to [[lmXent]],
    * one step toward the 5-gram KenLM filter CCNet actually ships:
    * P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α(V+1)), α = 0.5, where
    * c(w₁·) is the CONTEXT count (bigrams starting with w₁, derived
    * from the bigram counts — not a third corpus pass) and V is the
    * context vocabulary |{w₁}| (+1 the unclaimed OOV slot, same
    * convention as [[lmXent]]). Captures word-ORDER surprise the
    * unigram score is blind to: a bag of frequent words in scrambled
    * order scores high here, identically to its unscrambled twin there.
    *
    * Scale shape: the exploded bigram frame has three consumers
    * (bigram counts, the scoring join, and nothing else — context
    * counts fold from bigram counts) so it is localCheckpointed; both
    * LM joins key on token text and shuffle only if the LM outgrows
    * AQE's broadcast threshold, the standard LM-scoring shape. Docs
    * with fewer than two tokens carry no bigram and are excluded up
    * front (mirrored in the twin). */
  def bigramXent(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
              split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val bi = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          j => struct(element_at(col("ws"), j).as("w1"),
                      element_at(col("ws"), j + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("lang"), col("source"),
              col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint()
    val c2 = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2")).localCheckpoint()
    val cctx = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val st = cctx.agg(count(lit(1)).as("v"))
    bi.join(c2, Seq("w1", "w2"))
      .join(cctx, Seq("w1"))
      .crossJoin(broadcast(st))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_bi"),
           sum(-log((col("c2") + 0.5) /
             (col("c1") + (col("v") + 1) * 0.5))).as("nll"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("nll") / col("n_bi") / log(lit(2.0))), 3)
             .as("avg_xent_bits"))
      .orderBy(col("lang"), col("source"))
  }

  /** Gopher-style heuristic quality rules (Rae et al. 2021, §A1.1) as a
    * single-pass audit: per-language pass counts for each rule plus the
    * conjunction. Rules kept to the exactly-mirrorable subset:
    * word count ∈ [50, 100k]; mean word length ∈ [3, 10] (computed as
    * non-space chars / words — no higher-order fold, stays in codegen);
    * symbol-to-word ratio < 0.1; ≥ 2 distinct stopwords present
    * (counted by filtering the CONSTANT stop list against the doc —
    * O(|stoplist|) per row, not O(n_tok)). All-integer output: no FP
    * comparison risk. One scan, one ≤|lang| hash agg. */
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("n_char_ns",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_sym", regexp_count(col("text"), lit("[#$%{}<>\\\\^~|]")))
      .withColumn("n_stop_distinct",
        size(filter(stopArr, w => array_contains(col("ws"), w))).cast("long"))
      .withColumn("r_wc", col("n_tok") >= 50 && col("n_tok") <= 100000L)
      // ratios compared in integer cross-multiplied form: exact
      .withColumn("r_mwl",
        col("n_char_ns") >= col("n_tok") * 3 && col("n_char_ns") <= col("n_tok") * 10)
      .withColumn("r_sym", col("n_sym") * 10 < col("n_tok"))
      .withColumn("r_stop", col("n_stop_distinct") >= 2)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("r_wc"), 1L).otherwise(0L)).as("n_wc"),
           sum(when(col("r_mwl"), 1L).otherwise(0L)).as("n_mwl"),
           sum(when(col("r_sym"), 1L).otherwise(0L)).as("n_sym_ok"),
           sum(when(col("r_stop"), 1L).otherwise(0L)).as("n_stop_ok"),
           sum(when(col("r_wc") && col("r_mwl") && col("r_sym") && col("r_stop"), 1L)
             .otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  /** Gopher-style repetition audit (Rae et al. 2021, §A1.1 "repetition
    * removal"): the fraction of sliding word-n-gram occurrences (n = 2,
    * 3) that belong to an n-gram appearing more than once WITHIN the
    * document, per (lang, n), plus the count of docs over the 20 % flag
    * line. Complements [[textRepetition]] (top single-word ratio) and
    * [[segmentDedup]] (CROSS-doc segments): this is the within-doc
    * phrase-loop signal that catches generator stutter.
    *
    * Shape: both gram sizes ride ONE scan (the per-row gram arrays are
    * concatenated before the single explode), then two hash aggs keyed
    * by (doc_id, gram_n, xxhash64(gram)) — the exchange carries 8-byte
    * fingerprints, never gram text, per the dedup-family discipline
    * (64 bits suffice here because counting is WITHIN doc: a collision
    * needs two distinct grams of ONE document to collide, ~1e-13 at
    * 10^3 grams/doc, vs the corpus-wide birthday bound that pushes the
    * cross-doc dedup family to md5).
    * The per-doc fold is NOT an expression-side higher-order fold on
    * purpose: a map-accumulator `aggregate(...)` is CodegenFallback
    * (the lm_xent lesson), while explode → hash agg is codegen'd,
    * map-side-combinable, and keyed fine-grained enough to never skew.
    * The flag line is integer cross-multiplied (dup_occ · 5 > tot);
    * the only FP op is the final audited ratio (one division + round). */
  def repNgramFrac(s: SparkSession, d: String): DataFrame =
    // r17: the per-doc repetition stats are ONE compiled call per row
    // ([[graft.functions.RepGramStatsExpr]]) — the previous form
    // exploded every sliding gram and paid two corpus-wide hash
    // aggregations keyed by (doc, gram_n, xxhash64(gram)); the counting
    // is WITHIN-doc, so nothing about it needs a shuffle at all. The
    // kernel counts EXACT gram strings — the DuckDB twin's form (the
    // xxhash64 grouping was value-identical only absent a within-doc
    // collision); only the ≤|langs|·2-group rollup exchanges.
    Tables.documents(s, d)
      .select(col("lang"),
        explode(org.apache.spark.sql.GraftBridge.column(
          graft.functions.RepGramStatsExpr(
            org.apache.spark.sql.GraftBridge.expression(col("text")))))
          .as("r"))
      .groupBy(col("lang"), col("r.gram_n").as("gram_n"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("r.dup_occ") * 5 > col("r.tot"), 1L).otherwise(0L))
             .as("n_flagged"),
           round(sum(col("r.dup_occ")).cast("double") /
             sum(col("r.tot")).cast("double"), 4).as("dup_frac"))
      .orderBy(col("lang"), col("gram_n"))

  private val TfidfTopSql =
    """WITH words AS (
      |  SELECT doc_id, source, unnest(str_split(text, ' ')) AS w FROM documents),
      |tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2),
      |dfc AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
      |nd AS (SELECT count(*) AS n_total FROM documents)
      |SELECT source, w, rnk, round(score, 3) AS score FROM (
      |  SELECT source, w, tf * (CAST(n_total AS DOUBLE) / df) AS score,
      |         CAST(row_number() OVER (PARTITION BY source
      |           ORDER BY tf * (CAST(n_total AS DOUBLE) / df) DESC, w) AS BIGINT) AS rnk
      |  FROM tf JOIN dfc USING (w) CROSS JOIN nd)
      |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin

  // `qualityFilterPctApprox` and `curriculumBinsApprox` are UNLISTED
  // diagnostics (r9): their GK cut points aren't bit-reproducible
  // against DuckDB's t-digest, so the graded surface is the
  // hash-checked `quality_pct_bound` / `curriculum_bins_bound` twins.
  // Parity with their exact windowed twins is pinned in SaltSpec
  // (dominant corpus) and QueriesSpec (graded tables).
  val oracle: Map[String, String] = Map(
    // per-word surprisal quantized ONCE (floor(-ln p * 1e4)) so the
    // per-doc score is an exact BIGINT sum; tercile = ((rk-1)*3) div n
    "ccnet_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, source, unnest(str_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        |stats AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
        |                 CAST(count(*) AS BIGINT) AS v FROM vocab),
        |vq AS (SELECT tok,
        |              CAST(floor(-ln((c + 0.5) / (n_total + 0.5 * (v + 1))) * 10000)
        |                AS BIGINT) AS sq
        |       FROM vocab CROSS JOIN stats),
        |perdoc AS (
        |  SELECT doc_id, source, count(*) AS n_tok,
        |         CAST(sum(sq) AS BIGINT) AS nllq
        |  FROM toks JOIN vq USING (tok) GROUP BY 1, 2),
        |ranked AS (
        |  SELECT source, n_tok, nllq,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY CAST(nllq AS DOUBLE) / n_tok, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM perdoc)
        |SELECT source, CAST(((rk - 1) * 3) // n AS BIGINT) AS bucket,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(nllq) AS DOUBLE) / 10000 / sum(n_tok) / ln(2), 4)
        |         AS bits_per_tok
        |FROM ranked GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "lm_xent" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source, unnest(str_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        |stats AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
        |                 CAST(count(*) AS BIGINT) AS v FROM vocab),
        |scored AS (
        |  SELECT t.doc_id, t.lang, t.source, count(*) AS n_tok,
        |         sum(-ln((v.c + 0.5) / (s.n_total + 0.5 * (s.v + 1)))) AS nll
        |  FROM toks t JOIN vocab v USING (tok) CROSS JOIN stats s
        |  GROUP BY 1, 2, 3)
        |SELECT lang, source, count(*) AS n_docs,
        |       round(avg(nll / n_tok / ln(2)), 3) AS avg_xent_bits
        |FROM scored GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    // Two unrolled GD steps; expressions kept in the same association
    // (0.1 * sum / count) as the Spark side so FP noise stays ~1e-15.
    // quantized deployment: s2's ROUNDED weights are bit-identical
    // cross-engine, so the margin gate (w·x > 0) is an exact comparison
    // of identical doubles — only avg_score carries summation noise,
    // absorbed at 4 decimals (the logreg_step precedent)
    "logreg_infer" ->
      """WITH f AS (
        |  SELECT source,
        |         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |         1.0 AS x0,
        |         CAST(least(len(ws), 200) AS DOUBLE) / 200.0 AS x1,
        |         CAST(len(list_filter(ws, w -> list_contains(
        |           ['the', 'a', 'of', 'and', 'to', 'in', 'is'], w))) AS DOUBLE)
        |           / len(ws) AS x2
        |  FROM (SELECT source, lang, str_split(text, ' ') AS ws FROM documents)),
        |s1 AS (
        |  SELECT 0.1 * sum(x0 * (y - 0.5)) / count(*) AS w0,
        |         0.1 * sum(x1 * (y - 0.5)) / count(*) AS w1,
        |         0.1 * sum(x2 * (y - 0.5)) / count(*) AS w2
        |  FROM f),
        |sc AS (
        |  SELECT f.*, s1.w0 AS w0, s1.w1 AS w1, s1.w2 AS w2,
        |         1.0 / (1.0 + exp(-(s1.w0 * x0 + s1.w1 * x1 + s1.w2 * x2))) AS sig
        |  FROM f CROSS JOIN s1),
        |s2 AS (
        |  SELECT round(max(w0) - 0.1 * sum(x0 * (sig - y)) / count(*), 4) AS w0,
        |         round(max(w1) - 0.1 * sum(x1 * (sig - y)) / count(*), 4) AS w1,
        |         round(max(w2) - 0.1 * sum(x2 * (sig - y)) / count(*), 4) AS w2
        |  FROM sc)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN s2.w0 * x0 + s2.w1 * x1 + s2.w2 * x2 > 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |       round(avg(1.0 / (1.0 + exp(-(s2.w0 * x0 + s2.w1 * x1 + s2.w2 * x2)))), 4)
        |         AS avg_score
        |FROM f CROSS JOIN s2 GROUP BY source ORDER BY source""".stripMargin,

    "logreg_step" ->
      """WITH f AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |         1.0 AS x0,
        |         CAST(least(len(ws), 200) AS DOUBLE) / 200.0 AS x1,
        |         CAST(len(list_filter(ws, w -> list_contains(
        |           ['the', 'a', 'of', 'and', 'to', 'in', 'is'], w))) AS DOUBLE)
        |           / len(ws) AS x2
        |  FROM (SELECT lang, str_split(text, ' ') AS ws FROM documents)),
        |s1 AS (
        |  SELECT 0.1 * sum(x0 * (y - 0.5)) / count(*) AS w0,
        |         0.1 * sum(x1 * (y - 0.5)) / count(*) AS w1,
        |         0.1 * sum(x2 * (y - 0.5)) / count(*) AS w2
        |  FROM f),
        |sc AS (
        |  SELECT f.*, s1.w0 AS w0, s1.w1 AS w1, s1.w2 AS w2,
        |         1.0 / (1.0 + exp(-(s1.w0 * x0 + s1.w1 * x1 + s1.w2 * x2))) AS sig
        |  FROM f CROSS JOIN s1),
        |s2 AS (
        |  SELECT max(w0) AS w0, max(w1) AS w1, max(w2) AS w2,
        |         0.1 * sum(x0 * (sig - y)) / count(*) AS g0,
        |         0.1 * sum(x1 * (sig - y)) / count(*) AS g1,
        |         0.1 * sum(x2 * (sig - y)) / count(*) AS g2
        |  FROM sc)
        |SELECT feature, w_step1, w_step2 FROM (
        |  SELECT 'bias' AS feature, round(w0, 4) AS w_step1,
        |         round(w0 - g0, 4) AS w_step2 FROM s2
        |  UNION ALL
        |  SELECT 'len', round(w1, 4), round(w1 - g1, 4) FROM s2
        |  UNION ALL
        |  SELECT 'stop_ratio', round(w2, 4), round(w2 - g2, 4) FROM s2)
        |ORDER BY feature""".stripMargin,

    // Order-2 twin of lm_xent. DuckDB zips the two equal-length unnests
    // in lockstep, pairing ws[i] with ws[i+1] positionally.
    "bigram_xent" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, source, str_split(text, ' ') AS ws
        |  FROM documents WHERE len(str_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, lang, source,
        |         unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i])) AS w1,
        |         unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i + 1])) AS w2
        |  FROM docs),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |       FROM bi GROUP BY w1, w2),
        |cctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cctx),
        |scored AS (
        |  SELECT b.doc_id, b.lang, b.source, count(*) AS n_bi,
        |         sum(-ln((c.c2 + 0.5) / (x.c1 + 0.5 * (s.v + 1)))) AS nll
        |  FROM bi b JOIN c2 c ON b.w1 = c.w1 AND b.w2 = c.w2
        |            JOIN cctx x ON b.w1 = x.w1
        |            CROSS JOIN st s
        |  GROUP BY 1, 2, 3)
        |SELECT lang, source, count(*) AS n_docs,
        |       round(avg(nll / n_bi / ln(2)), 3) AS avg_xent_bits
        |FROM scored GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    "gopher_rules" ->
      s"""SELECT lang, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
         |       CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
         |       CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_sym_ok,
         |       CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
         |       CAST(sum(CASE WHEN r_wc AND r_mwl AND r_sym AND r_stop
         |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM (
         |  SELECT lang,
         |         n_tok >= 50 AND n_tok <= 100000 AS r_wc,
         |         n_char_ns >= n_tok * 3 AND n_char_ns <= n_tok * 10 AS r_mwl,
         |         n_sym * 10 < n_tok AS r_sym,
         |         n_stop_distinct >= 2 AS r_stop
         |  FROM (
         |    SELECT lang, CAST(len(ws) AS BIGINT) AS n_tok,
         |           CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_char_ns,
         |           CAST(len(regexp_extract_all(text, '[#$$%{}<>\\\\^~|]')) AS BIGINT) AS n_sym,
         |           CAST(len(list_filter([$stopSqlList], w -> list_contains(ws, w))) AS BIGINT) AS n_stop_distinct
         |    FROM (SELECT lang, text, str_split(text, ' ') AS ws FROM documents)))
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "rep_ngram_frac" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, str_split(text, ' ') AS ws FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |grams AS (
        |  SELECT doc_id, lang, 2 AS gram_n,
        |         unnest(list_transform(generate_series(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1])) AS g
        |  FROM docs
        |  UNION ALL
        |  SELECT doc_id, lang, 3 AS gram_n,
        |         unnest(list_transform(generate_series(1, len(ws) - 2),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM docs),
        |cnts AS (
        |  SELECT doc_id, lang, gram_n, g, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grams GROUP BY doc_id, lang, gram_n, g),
        |per_doc AS (
        |  SELECT doc_id, lang, gram_n, CAST(sum(cnt) AS BIGINT) AS tot,
        |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occ
        |  FROM cnts GROUP BY doc_id, lang, gram_n)
        |SELECT lang, gram_n, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN dup_occ * 5 > tot THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_flagged,
        |       round(CAST(sum(dup_occ) AS DOUBLE) / CAST(sum(tot) AS DOUBLE), 4)
        |         AS dup_frac
        |FROM per_doc GROUP BY lang, gram_n ORDER BY lang, gram_n""".stripMargin,

    "bpe_merge_step" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |pairs AS (
        |  SELECT w, c,
        |         unnest(list_transform(generate_series(1, len(w) - 1),
        |           i -> substr(w, i, 2))) AS pair
        |  FROM wc WHERE len(w) >= 2)
        |SELECT pair, count(DISTINCT w) AS n_words, CAST(sum(c) AS BIGINT) AS total_occ
        |FROM pairs GROUP BY pair
        |ORDER BY total_occ DESC, pair LIMIT 20""".stripMargin,

    // Three unrolled greedy BPE stages. Symbol sequences live in the
    // same boundary-delimited string the Spark side uses (" a  b  c "),
    // so fusing the winning pair is the identical non-overlapping
    // left-to-right replace() on both engines.
    "bpe_merge_k" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |w0 AS (SELECT w, c, regexp_replace(w, '(.)', ' \1 ', 'g') AS s FROM wc),
        |p1 AS (
        |  SELECT pair, count(DISTINCT w) AS n_words, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w0)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t1 AS (SELECT 1 AS step, pair, n_words, total_occ FROM p1
        |       ORDER BY total_occ DESC, pair LIMIT 1),
        |w1 AS (SELECT w, c, replace(s, ' ' || replace(t.pair, ' ', '  ') || ' ',
        |                            ' ' || replace(t.pair, ' ', '') || ' ') AS s
        |       FROM w0 CROSS JOIN t1 t),
        |p2 AS (
        |  SELECT pair, count(DISTINCT w) AS n_words, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w1)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t2 AS (SELECT 2 AS step, pair, n_words, total_occ FROM p2
        |       ORDER BY total_occ DESC, pair LIMIT 1),
        |w2 AS (SELECT w, c, replace(s, ' ' || replace(t.pair, ' ', '  ') || ' ',
        |                            ' ' || replace(t.pair, ' ', '') || ' ') AS s
        |       FROM w1 CROSS JOIN t2 t),
        |p3 AS (
        |  SELECT pair, count(DISTINCT w) AS n_words, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w2)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t3 AS (SELECT 3 AS step, pair, n_words, total_occ FROM p3
        |       ORDER BY total_occ DESC, pair LIMIT 1)
        |SELECT step, pair, replace(pair, ' ', '') AS merged, n_words, total_occ
        |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3)
        |ORDER BY step""".stripMargin,

    // Same three learned merges as bpe_merge_k, then the application
    // path: segment each distinct word once, fan out to per-source
    // occurrence counts, report the compression the merges buy.
    "bpe_apply" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |w0 AS (SELECT w, c, regexp_replace(w, '(.)', ' \1 ', 'g') AS s FROM wc),
        |p1 AS (
        |  SELECT pair, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w0)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t1 AS (SELECT pair FROM p1 ORDER BY total_occ DESC, pair LIMIT 1),
        |w1 AS (SELECT w, c, replace(s, ' ' || replace(t.pair, ' ', '  ') || ' ',
        |                            ' ' || replace(t.pair, ' ', '') || ' ') AS s
        |       FROM w0 CROSS JOIN t1 t),
        |p2 AS (
        |  SELECT pair, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w1)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t2 AS (SELECT pair FROM p2 ORDER BY total_occ DESC, pair LIMIT 1),
        |w2 AS (SELECT w, c, replace(s, ' ' || replace(t.pair, ' ', '  ') || ' ',
        |                            ' ' || replace(t.pair, ' ', '') || ' ') AS s
        |       FROM w1 CROSS JOIN t2 t),
        |p3 AS (
        |  SELECT pair, CAST(sum(c) AS BIGINT) AS total_occ
        |  FROM (SELECT w, c, unnest(list_transform(generate_series(1, len(syms) - 1),
        |          i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |        FROM (SELECT w, c, str_split(trim(s), '  ') AS syms FROM w2)
        |        WHERE len(syms) >= 2)
        |  GROUP BY pair),
        |t3 AS (SELECT pair FROM p3 ORDER BY total_occ DESC, pair LIMIT 1),
        |w3 AS (SELECT w, c, replace(s, ' ' || replace(t.pair, ' ', '  ') || ' ',
        |                            ' ' || replace(t.pair, ' ', '') || ' ') AS s
        |       FROM w2 CROSS JOIN t3 t),
        |seg AS (SELECT w, CAST(len(str_split(trim(s), '  ')) AS BIGINT) AS n_syms
        |        FROM w3),
        |ws AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
        |  GROUP BY source, w)
        |SELECT ws.source, count(DISTINCT ws.w) AS n_words,
        |       CAST(sum(ws.c * len(ws.w)) AS BIGINT) AS n_tokens_char,
        |       CAST(sum(ws.c * seg.n_syms) AS BIGINT) AS n_tokens_bpe,
        |       round(CAST(sum(ws.c * len(ws.w)) AS DOUBLE) /
        |             CAST(sum(ws.c * seg.n_syms) AS DOUBLE), 4) AS compression
        |FROM ws JOIN seg ON ws.w = seg.w
        |GROUP BY ws.source ORDER BY ws.source""".stripMargin,

    // Integer waterfilling: saturation is a prefix of the (avail, source)
    // order; the first unsaturated row fixes the waterline and remainder.
    // power() is libm on both engines (the ln precedent); only rounded
    // shares ride the float — no selection
    "mix_temperature" ->
      """WITH av AS (
        |  SELECT source, CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS avail
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS tot,
        |               sum(pow(CAST(avail AS DOUBLE), 0.7)) AS ptot FROM av)
        |SELECT source, avail,
        |       round(CAST(avail AS DOUBLE) / tot, 6) AS raw_share,
        |       round(pow(CAST(avail AS DOUBLE), 0.7) / ptot, 6) AS temp_share,
        |       round((pow(CAST(avail AS DOUBLE), 0.7) / ptot) /
        |             (CAST(avail AS DOUBLE) / tot), 4) AS upsample
        |FROM av CROSS JOIN tot ORDER BY source""".stripMargin,

    // bucket hash = the repo's cross-engine md5-prefix arithmetic;
    // Laplace floor covers the full 64-bucket spine on both engines
    "dsir_weights" ->
      """WITH db AS (
        |  SELECT doc_id, source, lang,
        |         CAST(concat('0x', substr(md5(w), 1, 6)) AS BIGINT) % 64 AS b,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, source, lang, unnest(str_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2, 3, 4),
        |spine AS (SELECT unnest(range(0, 64)) AS b),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM db WHERE lang = 'en'),
        |tr AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM db),
        |pt AS (SELECT spine.b, CAST(coalesce(x.cb, 0) + 1 AS DOUBLE) / (tt.t + 64) AS p_t
        |       FROM spine LEFT JOIN (SELECT b, CAST(sum(c) AS BIGINT) AS cb
        |                             FROM db WHERE lang = 'en' GROUP BY 1) x USING (b)
        |       CROSS JOIN tt),
        |pr AS (SELECT spine.b, CAST(coalesce(x.cb, 0) + 1 AS DOUBLE) / (tr.t + 64) AS p_r
        |       FROM spine LEFT JOIN (SELECT b, CAST(sum(c) AS BIGINT) AS cb
        |                             FROM db GROUP BY 1) x USING (b)
        |       CROSS JOIN tr),
        |dw AS (SELECT doc_id, source,
        |              sum(CAST(c AS DOUBLE) * (ln(p_t) - ln(p_r))) AS logw
        |       FROM db JOIN pt USING (b) JOIN pr USING (b) GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs, round(avg(logw), 4) AS mean_logw
        |FROM dw GROUP BY 1 ORDER BY source""".stripMargin,

    "span_corruption_plan" ->
      """WITH d AS (
        |  SELECT source, CAST(len(str_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |p AS (SELECT source, n, (n * 15) // 100 AS budget,
        |             CASE WHEN (n * 15) // 100 = 0 THEN 0
        |                  ELSE ((n * 15) // 100 + 2) // 3 END AS n_spans
        |      FROM d)
        |SELECT source, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
        |       CAST(sum(budget) AS BIGINT) AS n_masked,
        |       CAST(sum(n_spans) AS BIGINT) AS n_spans,
        |       round(CAST(sum(budget) AS DOUBLE) / sum(n), 4) AS mask_rate
        |FROM p GROUP BY 1 ORDER BY source""".stripMargin,

    "token_budget" ->
      """WITH per AS (
        |  SELECT source, CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS avail
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS t,
        |               CAST(count(*) AS BIGINT) AS n FROM per),
        |rk AS (
        |  SELECT source, avail, t // 2 AS b, n,
        |         CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS j,
        |         CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
        |  FROM per CROSS JOIN tot),
        |st AS (
        |  SELECT *, n - j + 1 AS m, b - pre AS rem,
        |         avail * (n - j + 1) <= b - pre AS sat
        |  FROM rk),
        |gl AS (
        |  SELECT *, min(CASE WHEN NOT sat THEN j END) OVER () AS jstar FROM st),
        |g2 AS (
        |  SELECT *, max(CASE WHEN j = jstar THEN rem END) OVER () AS rem_star,
        |            max(CASE WHEN j = jstar THEN m END) OVER () AS m_star
        |  FROM gl),
        |fin AS (
        |  SELECT source, avail, sat,
        |         CASE WHEN sat THEN avail
        |              ELSE rem_star // m_star +
        |                   CASE WHEN j - jstar + 1 <= rem_star % m_star
        |                        THEN 1 ELSE 0 END
        |         END AS alloc
        |  FROM g2)
        |SELECT source, avail, CAST(alloc AS BIGINT) AS alloc, sat AS saturated,
        |       round(CAST(alloc AS DOUBLE) / avail, 4) AS take_rate
        |FROM fin ORDER BY source""".stripMargin,

    "vocab_growth" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
        |doc_toks AS (
        |  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_toks
        |  FROM toks GROUP BY source, doc_id),
        |mx AS (SELECT max(doc_id) AS mx FROM doc_toks),
        |tok_mass AS (
        |  SELECT source, CAST(doc_id * 10 // (mx + 1) AS INTEGER) + 1 AS bucket,
        |         CAST(sum(n_toks) AS BIGINT) AS b_toks
        |  FROM doc_toks CROSS JOIN mx GROUP BY 1, 2),
        |first_seen AS (
        |  SELECT source, tok, min(doc_id) AS doc_id FROM toks GROUP BY source, tok),
        |vocab_adds AS (
        |  SELECT source, CAST(doc_id * 10 // (mx + 1) AS INTEGER) + 1 AS bucket,
        |         CAST(count(*) AS BIGINT) AS b_vocab
        |  FROM first_seen CROSS JOIN mx GROUP BY 1, 2),
        |grid AS (
        |  SELECT source, unnest(generate_series(1, 10)) AS bucket
        |  FROM (SELECT DISTINCT source FROM documents))
        |SELECT g.source, CAST(g.bucket * 10 AS INTEGER) AS pct,
        |       CAST(sum(coalesce(t.b_toks, 0)) OVER (PARTITION BY g.source
        |         ORDER BY g.bucket) AS BIGINT) AS cum_tokens,
        |       CAST(sum(coalesce(v.b_vocab, 0)) OVER (PARTITION BY g.source
        |         ORDER BY g.bucket) AS BIGINT) AS cum_vocab
        |FROM grid g
        |LEFT JOIN tok_mass t ON t.source = g.source AND t.bucket = g.bucket
        |LEFT JOIN vocab_adds v ON v.source = g.source AND v.bucket = g.bucket
        |ORDER BY g.source, pct""".stripMargin,

    "bigram_novelty" ->
      """WITH bg AS (
        |  SELECT doc_id, source,
        |         unnest(list_transform(generate_series(1, len(ws)-1),
        |           i -> ws[i] || ' ' || ws[i+1])) AS bg
        |  FROM (SELECT doc_id, source, str_split(text, ' ') AS ws FROM documents
        |        WHERE len(str_split(text, ' ')) >= 2)),
        |counts AS (
        |  SELECT bg, cab, CAST(sum(cab) OVER (PARTITION BY str_split(bg, ' ')[1])
        |                   AS BIGINT) AS ca
        |  FROM (SELECT bg, count(*) AS cab FROM bg GROUP BY bg)),
        |f AS (
        |  SELECT doc_id, source, count(*) AS n_trans,
        |         sum(CASE WHEN cab * 8 < ca THEN 1 ELSE 0 END) AS n_novel
        |  FROM bg JOIN counts USING (bg) GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |       round(sum(n_novel) * 1.0 / sum(n_trans), 4) AS novel_frac,
        |       CAST(sum(CASE WHEN n_novel * 2 > n_trans THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_incoherent
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "mix_apply" ->
      """WITH docs AS (
        |  SELECT source, len(str_split(text, ' ')) AS n_tok,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 1048576 AS h20
        |  FROM documents),
        |per_src AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_s
        |            FROM docs GROUP BY source),
        |tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS t_total,
        |               count(*) AS n_src FROM per_src),
        |thr AS (
        |  SELECT source,
        |         CAST(floor(least(1.0, CAST(t_total AS DOUBLE) / (n_src * tok_s))
        |                    * 1048576.0) AS BIGINT) AS thr
        |  FROM per_src CROSS JOIN tot)
        |SELECT source, count(*) AS n_docs_kept,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept, max(thr) AS thr
        |FROM docs JOIN thr USING (source)
        |WHERE h20 < thr
        |GROUP BY source ORDER BY source""".stripMargin,

    "term_postings" ->
      """WITH td AS (
        |  SELECT DISTINCT term, doc_id FROM (
        |    SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)),
        |top AS (SELECT term, count(*) AS df FROM td
        |        GROUP BY term ORDER BY df DESC, term LIMIT 50),
        |r AS (
        |  SELECT term, doc_id,
        |         row_number() OVER (PARTITION BY term
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM td WHERE term IN (SELECT term FROM top))
        |SELECT term, df, CAST(rank AS BIGINT) AS rank, doc_id
        |FROM r JOIN top USING (term) WHERE rank <= 4
        |ORDER BY df DESC, term, rank""".stripMargin,

    "shard_assign" ->
      """SELECT shard, count(*) AS n_docs,
        |       CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       min(h) AS min_h
        |FROM (
        |  SELECT text, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) AS h,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 16 AS shard
        |  FROM documents)
        |GROUP BY shard ORDER BY shard""".stripMargin,
    "source_diversity" ->
      s"""SELECT lang, n_docs, n_sources,
         |       round(1 - CAST(ss AS DOUBLE) /
         |         (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6) AS gini
         |FROM (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
         |         CAST(sum(n) AS BIGINT) AS n_docs,
         |         CAST(sum(n * n) AS BIGINT) AS ss
         |  FROM (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2)
         |  GROUP BY lang)
         |ORDER BY lang""".stripMargin,

    "cms_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents),
         |sd AS (SELECT j FROM (VALUES (0), (1), (2), (3)) s(j)),
         |cms AS (
         |  SELECT seed, bucket, count(*) AS c FROM (
         |    SELECT j AS seed,
         |           CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 8)) AS BIGINT) % $CmsWidth AS bucket
         |    FROM toks CROSS JOIN sd)
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT word, count(*) AS exact_n FROM toks GROUP BY word
         |  ORDER BY exact_n DESC, word LIMIT 20),
         |wb AS (
         |  SELECT word, exact_n, j AS seed,
         |         CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 8)) AS BIGINT) % $CmsWidth AS bucket
         |  FROM top CROSS JOIN sd)
         |SELECT word, exact_n, min(c) AS est_n, min(c) - exact_n AS overcount
         |FROM wb JOIN cms USING (seed, bucket)
         |GROUP BY word, exact_n
         |ORDER BY exact_n DESC, word""".stripMargin,

    "curation_funnel" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
         |         row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1 AS ex
         |  FROM documents),
         |g AS (SELECT source, doc_id, ex, ex AND n_tok >= 30 AS q FROM t),
         |r AS (SELECT source, ex, q,
         |        sum(CASE WHEN q THEN 1 ELSE 0 END) OVER (
         |          PARTITION BY source
         |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS srank
         |      FROM g)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |       CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |       CAST(sum(CASE WHEN q AND srank <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    "snapshot_delta" ->
      """WITH f AS (
        |  SELECT source, md5(text) AS fp,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS bkt
        |  FROM documents),
        |y AS (SELECT * FROM f WHERE bkt <= 8),
        |t AS (SELECT * FROM f WHERE bkt >= 1),
        |add AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_today,
        |         CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM y WHERE y.fp = t.fp)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_added
        |  FROM t GROUP BY 1),
        |rem AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_yesterday,
        |         CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM t WHERE t.fp = y.fp)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |  FROM y GROUP BY 1)
        |SELECT source,
        |       CAST(COALESCE(rem.n_yesterday, 0) AS BIGINT) AS n_yesterday,
        |       CAST(COALESCE(add.n_today, 0) AS BIGINT) AS n_today,
        |       CAST(COALESCE(add.n_added, 0) AS BIGINT) AS n_added,
        |       CAST(COALESCE(rem.n_removed, 0) AS BIGINT) AS n_removed,
        |       CAST(COALESCE(add.n_today, 0) - COALESCE(add.n_added, 0) AS BIGINT) AS n_retained
        |FROM add FULL JOIN rem USING (source)
        |ORDER BY source""".stripMargin,

    "mix_shift" ->
      s"""WITH toks AS (
         |  SELECT source,
         |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS bkt,
         |         unnest(str_split(text, ' ')) AS tok
         |  FROM documents),
         |top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM toks GROUP BY 1)
         |        ORDER BY c DESC, tok LIMIT $MixShiftTerms),
         |counts AS (
         |  SELECT source, tok,
         |         CAST(sum(CASE WHEN bkt <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS cy,
         |         CAST(sum(CASE WHEN bkt >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |  FROM toks JOIN top USING (tok) GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(cy) AS BIGINT) AS ty,
         |               CAST(sum(ct) AS BIGINT) AS tt FROM counts GROUP BY 1)
         |SELECT source, ty AS n_y_occ, tt AS n_t_occ,
         |       CASE WHEN ty * tt = 0 THEN CAST(NULL AS DOUBLE)
         |            ELSE round(CAST(sum(abs(cy * tt - ct * ty)) AS DOUBLE)
         |                       / CAST(ty * tt * 2 AS DOUBLE), 4) END AS tv_dist
         |FROM counts JOIN tot USING (source)
         |GROUP BY source, ty, tt ORDER BY source""".stripMargin,

    "vocab_oov_rate" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
         |vocab AS (
         |  SELECT tok FROM (SELECT tok, count(*) AS c FROM toks GROUP BY 1)
         |  ORDER BY c DESC, tok LIMIT $OovVocabSize)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_occ,
         |       CAST(sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       round(sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS oov_rate
         |FROM toks LEFT JOIN vocab USING (tok)
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "bucket_balance" ->
      """WITH per AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1)
        |SELECT bucket, n_docs,
        |       n_docs * 32 > (SELECT sum(n_docs) FROM per) * 2 AS hot
        |FROM per ORDER BY bucket""".stripMargin,

    "length_zipf" ->
      """SELECT source, CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM (SELECT source, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |      FROM documents)
        |WHERE n_tok >= 1
        |GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "curriculum_bins_bound" ->
      """SELECT source, true AS q1_ok, true AS q2_ok, true AS q3_ok
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "quality_pct_bound" ->
      """SELECT source, true AS thr_ok
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "curation_funnel_chars" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, n_chars,
         |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
         |         row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1 AS ex
         |  FROM documents),
         |g AS (SELECT source, doc_id, n_chars, ex, ex AND n_tok >= 30 AS q FROM t),
         |stage AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(n_chars) AS BIGINT) AS raw_chars,
         |         CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |         CAST(sum(CASE WHEN ex THEN n_chars ELSE 0 END) AS BIGINT) AS exact_chars,
         |         CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |         CAST(sum(CASE WHEN q THEN n_chars ELSE 0 END) AS BIGINT) AS quality_chars
         |  FROM g GROUP BY 1),
         |fin AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS k_final,
         |         CAST(sum(n_chars) AS BIGINT) AS k_chars
         |  FROM (SELECT source, n_chars,
         |          row_number() OVER (PARTITION BY source
         |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |        FROM g WHERE q)
         |  WHERE rn <= $DomainCap GROUP BY 1)
         |SELECT s.source, s.n_docs, s.raw_chars, s.n_exact, s.exact_chars,
         |       s.n_quality, s.quality_chars,
         |       CAST(COALESCE(f.k_final, 0) AS BIGINT) AS n_final,
         |       CAST(COALESCE(f.k_chars, 0) AS BIGINT) AS final_chars
         |FROM stage s LEFT JOIN fin f USING (source)
         |ORDER BY source""".stripMargin,

    "domain_caps" ->
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN rn > $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       CAST(sum(CASE WHEN rn <= $DomainCap THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM (SELECT source, n_chars,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |      FROM documents)
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "curriculum_bins" ->
      """SELECT source, bin, count(*) AS n_docs,
        |       min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM (SELECT source,
        |        CAST(ntile(4) OVER (PARTITION BY source
        |          ORDER BY n_tok, doc_id) AS BIGINT) AS bin, n_tok
        |      FROM (SELECT source, doc_id,
        |              CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |            FROM documents))
        |GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    "incremental_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, source, md5(text) AS fp,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS bkt
        |  FROM documents),
        |b AS (SELECT * FROM f WHERE bkt = 9),
        |fresh AS (
        |  SELECT source, count(*) AS n_new FROM b
        |  WHERE NOT EXISTS (SELECT 1 FROM f s
        |                    WHERE s.bkt <> 9 AND s.fp = b.fp)
        |  GROUP BY 1)
        |SELECT b.source AS source, count(*) AS n_batch,
        |       coalesce(max(fresh.n_new), 0) AS n_new,
        |       count(*) - coalesce(max(fresh.n_new), 0) AS n_dup_vs_snapshot
        |FROM b LEFT JOIN fresh ON fresh.source = b.source
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // the salted two-phase execution must produce the SAME rows as the
    // windowed semantic spec — one oracle text, graded twice
    "domain_caps_salted" ->
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN rn > $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       CAST(sum(CASE WHEN rn <= $DomainCap THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM (SELECT source, n_chars,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |      FROM documents)
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "doc_chunks" ->
      s"""WITH d AS (SELECT source, str_split(text, ' ') AS ws FROM documents),
         |e AS (SELECT source, ws, len(ws) AS n FROM d),
         |c AS (SELECT source, ws, n, unnest(range(0, n, $ChunkStride)) AS start FROM e),
         |k AS (SELECT source,
         |        substr(md5(array_to_string(
         |          list_slice(ws, start + 1, start + $ChunkWords), ' ')), 1, 16) AS h,
         |        least($ChunkWords, n - start) AS cw
         |      FROM c)
         |SELECT source, count(*) AS n_chunks, count(DISTINCT h) AS n_uniq_chunks,
         |       CAST(sum(cw) AS BIGINT) AS sum_chunk_words
         |FROM k GROUP BY 1 ORDER BY source""".stripMargin,

    "bigram_lift" ->
      s"""WITH d AS (SELECT str_split(text, ' ') AS ws FROM documents),
         |wrd AS (SELECT unnest(ws) AS w FROM d),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wrd GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS w_tot FROM wrd),
         |bgp AS (SELECT unnest(list_slice(ws, 1, len(ws) - 1)) AS a,
         |               unnest(list_slice(ws, 2, len(ws))) AS b
         |        FROM d WHERE len(ws) >= 2),
         |bgc AS (SELECT a || ' ' || b AS bg, a, b, CAST(count(*) AS BIGINT) AS cab
         |        FROM bgp GROUP BY 1, 2, 3),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_tot FROM bgp)
         |SELECT bg, cab, ca, cb, lift FROM (
         |  SELECT bgc.bg, bgc.cab, wa.c AS ca, wb.c AS cb,
         |         round(CAST(bgc.cab AS DOUBLE) * w_tot * w_tot / t_tot / wa.c / wb.c, 3) AS lift
         |  FROM bgc JOIN wc wa ON bgc.a = wa.w JOIN wc wb ON bgc.b = wb.w
         |  CROSS JOIN tot CROSS JOIN tt
         |  WHERE bgc.cab >= $BigramMinCount)
         |ORDER BY cab DESC, bg LIMIT 15""".stripMargin,

    "editdist_pairs" ->
      s"""WITH n AS (SELECT doc_id, $NormSql AS norm FROM documents),
         |b AS (SELECT doc_id, substr(norm, 1, $EditPrefix) AS p,
         |        CAST(CAST(floor(len(norm) / 20) AS BIGINT) AS VARCHAR)
         |          || '|' || substr(norm, 1, 4) AS blk
         |      FROM n),
         |g AS (SELECT * FROM b QUALIFY count(*) OVER (PARTITION BY blk) <= $EditBlockCap)
         |SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
         |       CAST(levenshtein(a.p, bb.p) AS BIGINT) AS dist
         |FROM g a JOIN g bb ON a.blk = bb.blk AND a.doc_id < bb.doc_id
         |WHERE levenshtein(a.p, bb.p) <= $EditMaxDist
         |ORDER BY doc_a, doc_b""".stripMargin,

    "quality_filter_pct" ->
      """SELECT source, count(*) AS n_kept, min(n_tok) AS min_kept_tok,
        |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM (SELECT source, n_chars, n_tok,
        |        percent_rank() OVER (PARTITION BY source
        |          ORDER BY n_tok, doc_id) AS pr
        |      FROM (SELECT source, doc_id, n_chars,
        |              CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |            FROM documents))
        |WHERE pr >= 0.5 GROUP BY 1 ORDER BY source""".stripMargin,

    "length_outliers" ->
      """WITH t AS (
        |  SELECT source, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |st AS (SELECT *,
        |         sum(n_tok) OVER w AS sx,
        |         sum(n_tok * n_tok) OVER w AS sxx,
        |         count(*) OVER w AS n
        |       FROM t WINDOW w AS (PARTITION BY source)),
        |z AS (SELECT source, n_tok,
        |        CAST(sx AS DOUBLE) / n AS mean,
        |        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS variance
        |      FROM st)
        |SELECT source, count(*) AS n_outliers,
        |       min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM z
        |WHERE (CAST(n_tok AS DOUBLE) - mean) * (CAST(n_tok AS DOUBLE) - mean)
        |      > 2.25 * variance
        |GROUP BY 1 ORDER BY source""".stripMargin,

    "seq_packing" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |o AS (SELECT *, coalesce(sum(n_tok) OVER (PARTITION BY source
         |        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |        0) AS off
         |      FROM t)
         |SELECT source, CAST(floor(off / $PackBudget) AS BIGINT) AS bin,
         |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       min(doc_id) AS first_doc
         |FROM o GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    "stratified_sample" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
        |         count(*) OVER (PARTITION BY source) AS n_src
        |  FROM documents)
        |SELECT source, count(*) AS n_sampled, CAST(max(n_src) AS BIGINT) AS n_total,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS first_doc
        |FROM r WHERE rnk <= ceil(n_src * 0.1)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    "vocab_ttr" ->
      """WITH words AS (SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |       count(DISTINCT w) AS n_vocab,
        |       round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 4) AS ttr
        |FROM words GROUP BY 1 ORDER BY source""".stripMargin,

    "tfidf_top_terms" -> TfidfTopSql,

    // H = ln T − Σ(c·ln c)/T — the identical expression tree on both
    // engines; the inner sum runs over per-term counts, never tokens.
    "token_entropy" ->
      """SELECT source, n_tokens, vocab,
        |       round(ln(CAST(n_tokens AS DOUBLE)) - sclc / n_tokens, 4) AS entropy,
        |       round((ln(CAST(n_tokens AS DOUBLE)) - sclc / n_tokens)
        |             / ln(CAST(vocab AS DOUBLE)), 4) AS norm_entropy
        |FROM (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS vocab,
        |         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclc
        |  FROM (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
        |        GROUP BY source, w)
        |  GROUP BY source)
        |ORDER BY source""".stripMargin,

    // Constants spelled identically to the Spark expression tree so the
    // per-row FP math matches term-for-term before the rounded cut.
    "bm25_top_terms" ->
      """WITH tfd AS (
        |  SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, source, unnest(str_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2, 3),
        |tfdl AS (
        |  SELECT *, CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS dl FROM tfd),
        |dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfd GROUP BY w),
        |st AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |              CAST(sum(c) AS BIGINT) AS n_toks FROM tfd),
        |scored AS (
        |  SELECT source, w, round(sum(
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    (c * 2.2) / (c + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 9) AS score
        |  FROM (SELECT t.*, d.df, s.n_docs,
        |               CAST(s.n_toks AS DOUBLE) / s.n_docs AS avgdl
        |        FROM tfdl t JOIN dft d USING (w) CROSS JOIN st s)
        |  GROUP BY 1, 2)
        |SELECT source, w, rnk, round(score, 3) AS score FROM (
        |  SELECT source, w, score,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, w) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,
    // the aggregator form is row-identical by construction (same total
    // order) — it earns the SAME oracle, making the no-window rewrite
    // hash-checked rather than merely parity-spec'd
    "tfidf_top_terms_agg" -> TfidfTopSql,
    "pii_scan" ->
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
         |       CAST(sum(n_email) AS BIGINT) AS total_emails,
         |       CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
         |       CAST(sum(n_ip) AS BIGINT) AS total_ips
         |FROM (
         |  SELECT source,
         |         len(regexp_extract_all(lower(text), '$EmailRx')) AS n_email,
         |         len(regexp_extract_all(lower(text), '$Ipv4Rx')) AS n_ip
         |  FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin,

    // Same fixed two-pass redaction; content_fp sums 32-bit md5 prefixes
    // of the redacted text so the hash pins the transform output itself.
    "pii_redact" ->
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN red != lo THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
         |       CAST(sum(len(lo) - len(red)) AS BIGINT) AS chars_removed,
         |       CAST(sum(CAST(concat('0x', substr(md5(red), 1, 8)) AS BIGINT)) AS BIGINT)
         |         AS content_fp
         |FROM (
         |  SELECT source, lo,
         |         regexp_replace(regexp_replace(lo, '$EmailRx', '<email>', 'g'),
         |                        '$Ipv4Rx', '<ip>', 'g') AS red
         |  FROM (SELECT source, lower(text) AS lo FROM documents))
         |GROUP BY source ORDER BY source""".stripMargin,

    "segment_dedup" ->
      s"""SELECT source, count(*) AS n_dup_segments,
         |       CAST(sum(n_docs) AS BIGINT) AS n_doc_hits,
         |       max(n_docs) AS max_spread
         |FROM (
         |  SELECT source, seg, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM (SELECT DISTINCT source, doc_id, seg FROM (
         |          SELECT source, doc_id,
         |                 unnest(list_transform(
         |                   generate_series(0, CAST(floor(len(ws) / $SegWords) AS INT) - 1),
         |                   i -> array_to_string(ws[i*$SegWords+1 : i*$SegWords+$SegWords], ' '))) AS seg
         |          FROM (SELECT source, doc_id, str_split(text, ' ') AS ws FROM documents
         |                WHERE len(str_split(text, ' ')) >= $SegWords)))
         |  GROUP BY source, seg HAVING count(*) > 1)
         |GROUP BY source ORDER BY source""".stripMargin,

    "corpus_mix" ->
      s"""SELECT source, count(*) AS n_selected,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM (
         |  SELECT d.source, d.doc_id, d.n_chars,
         |         row_number() OVER (PARTITION BY d.source
         |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk,
         |         coalesce(q.quota, $mixDefault) AS quota
         |  FROM documents d
         |  LEFT JOIN (VALUES ${mixQuotas.map { case (s0, q) => s"('$s0', $q)" }.mkString(", ")}) q(source, quota)
         |    ON d.source = q.source)
         |WHERE rk <= quota
         |GROUP BY source ORDER BY source""".stripMargin,

    "text_repetition" -> """
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN maxc * 10 > ntok THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
             round(CAST(sum(maxc) AS DOUBLE) / sum(ntok), 4) AS mean_top_ratio
      FROM (
        SELECT doc_id, lang, max(cnt) AS maxc, CAST(sum(cnt) AS BIGINT) AS ntok
        FROM (
          SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS w FROM documents)
          GROUP BY doc_id, lang, w)
        GROUP BY doc_id, lang)
      GROUP BY lang ORDER BY lang""",

    "sample_bottomk" -> """
      SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      WHERE rn <= 3 ORDER BY lang, rank""",

    "sample_split" -> """
      SELECT lang, split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM (
        SELECT lang, n_chars,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
        FROM (
          SELECT lang, n_chars,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS bucket
          FROM documents))
      GROUP BY lang, split ORDER BY lang, split""",
    "dedup_stats" ->
      s"""SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_uniq,
         |       count(DISTINCT $NormSql) AS n_uniq_norm
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "dedup_exact_keep" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_id""",

    "text_tokens" -> """
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS sum_tok,
             max(n_tok) AS max_tok,
             round(CAST(sum(n_tok) AS DOUBLE) / count(*), 3) AS avg_tok
      FROM (SELECT lang, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
      GROUP BY lang ORDER BY lang""",

    "word_freq" -> """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 20""",

    "text_quality" ->
      s"""SELECT lang, bucket, count(*) AS n,
         |       round(CAST(sum(n_stop) AS DOUBLE) / sum(n_tok), 4) AS stop_ratio
         |FROM (
         |  SELECT lang, n_tok, n_stop,
         |         CASE WHEN n_tok >= 60 AND n_stop * 5 >= n_tok THEN 'high'
         |              WHEN n_tok >= 30 THEN 'mid' ELSE 'low' END AS bucket
         |  FROM (
         |    SELECT lang, CAST(len(ws) AS BIGINT) AS n_tok,
         |           CAST(len(list_filter(ws, w -> w IN ($stopSqlList))) AS BIGINT) AS n_stop
         |    FROM (SELECT lang, str_split(text, ' ') AS ws FROM documents)))
         |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "lang_id" ->
      s"""SELECT lang, guess, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         |         WHEN h_fr > h_en AND h_fr >= h_es AND h_fr >= h_de THEN 'fr'
         |         WHEN h_es > h_en AND h_es >= h_de THEN 'es'
         |         WHEN h_de > h_en THEN 'de'
         |         ELSE 'en' END AS guess
         |  FROM (
         |    SELECT lang, text,
         |${langMarkers.map { case (l, words) =>
            s"      len(regexp_extract_all(lower(text), '${markerRegex(words)}')) AS h_$l"
          }.mkString(",\n")}
         |    FROM documents))
         |GROUP BY lang, guess ORDER BY lang, guess""".stripMargin,

    "doc_fingerprint" ->
      s"""SELECT doc_id, md5($NormSql) AS fp FROM documents ORDER BY doc_id""",

    "token_count_bpe" -> """
      SELECT source, count(*) AS n_docs, CAST(sum(n_bpe) AS BIGINT) AS sum_bpe
      FROM (SELECT source,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
            FROM documents)
      GROUP BY source ORDER BY source""",

    "token_fertility" -> """
      SELECT lang, count(*) AS n_docs, CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
             CAST(sum(n_words) AS BIGINT) AS sum_words,
             round(sum(n_bpe) * 1.0 / sum(n_words), 4) AS fertility
      FROM (SELECT lang,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
                   CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
            FROM documents)
      GROUP BY lang ORDER BY lang""")
}
