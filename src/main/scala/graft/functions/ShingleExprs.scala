package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass compiled kernels for the shingle-hash lineages (MinHash
  * banding and winnowing fingerprint selection).
  *
  * These replace the built-in higher-order-function composition
  * (`transform(sequence(..), i -> array_min(slice(..)))` over
  * `md5`-hashed 3-gram shingles): semantically identical — the DuckDB
  * twins and the expression-vs-batch parity specs are unchanged and
  * prove it — but evaluated as ONE JVM function per row instead of
  * thousands of interpreted Catalyst nodes (nested HOFs are
  * CodegenFallback, and the per-element closure dispatch dominated the
  * streaming gates: measured 235 s → ~2 s for the winnowing projection
  * over 5 000 sf0.1 docs). The hash lineage is bit-identical:
  * `conv(substring(md5(shingle), 1, 8), 16, 10) % P` is the first four
  * md5 bytes read big-endian unsigned, mod P.
  */
final class ShingleKernel(p: Long, winnowW: Int,
                          mhA: Array[Long], mhB: Array[Long])
    extends Serializable {

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def first8HexAsLong(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  private val HexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** `conv(substring(md5(w[i] ' ' w[i+1] ' ' w[i+2]), 1, 8), 16, 10) % P`
    * per 3-gram — the shared shingle-hash stream. */
  private def shingleHashesOf(ws: Array[String]): Array[Long] = {
    val m = md.get()
    val out = new Array[Long](ws.length - 2)
    var i = 0
    while (i < out.length) {
      m.reset()
      val sh = ws(i) + " " + ws(i + 1) + " " + ws(i + 2)
      out(i) = first8HexAsLong(m.digest(sh.getBytes(StandardCharsets.UTF_8))) % p
      i += 1
    }
    out
  }

  /** Distinct w-window minima over the shingle-hash stream, first-
    * occurrence order (`array_distinct` semantics); null below w+2
    * tokens — the [[graft.llm.HashDedup.winnowFpExpr]] contract. */
  def winnowFps(text: UTF8String): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < winnowW + 2) return null
    val hs = shingleHashesOf(ws)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= hs.length - winnowW) {
      var mn = hs(i)
      var j = i + 1
      while (j < i + winnowW) {
        if (hs(j) < mn) mn = hs(j)
        j += 1
      }
      seen.add(mn)
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }

  /** The 4 LSH band keys: 16 universal-hash minima over the shingle
    * stream, 4 per band, `md5(m0 ',' m1 ',' m2 ',' m3)` hex — the
    * [[graft.llm.HashDedup.bandHashExpr]] contract; null below 3
    * tokens. */
  def bandHashes(text: UTF8String): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < 3) return null
    val hs = shingleHashesOf(ws)
    val k = mhA.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      var j = 0
      while (j < k) {
        val v = (mhA(j) * hs(i) + mhB(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val m = md.get()
    val bands = new Array[Any](k / 4)
    var b = 0
    while (b < bands.length) {
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < 4) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * 4 + r))
        r += 1
      }
      m.reset()
      bands(b) = UTF8String.fromString(
        toHex(m.digest(sb.toString.getBytes(StandardCharsets.UTF_8))))
      b += 1
    }
    new GenericArrayData(bands)
  }
}

/** Compiled distinct 3-gram shingle set: ARRAY<STRING> of the doc's
  * distinct word-trigram shingles in first-occurrence order, null below
  * 3 tokens — exactly `array_distinct(transform(sequence(0, n−3),
  * i -> concat_ws(' ', ws[i+1], ws[i+2], ws[i+3])))` over
  * `split(text, ' ')`, but one JVM call per row instead of the
  * interpreted per-element HOF dispatch (the [[ShingleKernel]] lesson;
  * the HOF form billed ~4 s for 5 000 sf0.1 docs in
  * jaccard_join_exact's shingle materialization). */
case class ShingleSetExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "shingle_set"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    ShingleSetExpr.shingleSet(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleSetExpr.shingleSet($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSetExpr {
  def shingleSet(text: UTF8String): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= ws.length - 3) {
      seen.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Compiled winnowing-fingerprint selection: ARRAY<LONG> of distinct
  * w-window shingle-hash minima (null below w+2 tokens). */
case class WinnowFpsExpr(child: Expression, kernel: ShingleKernel)
    extends UnaryExpression {

  override def prettyName: String = "winnow_fps"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    kernel.winnowFps(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel, classOf[ShingleKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.winnowFps($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled 60-bit simhash over whitespace tokens: per DISTINCT word,
  * `conv(substring(md5(w), 1, 15), 16, 10)` (the first 60 bits of the
  * md5, big-endian nibbles) weighted by the word's multiset count; bit j
  * of the output is set iff the signed bit-sum Σ±cnt is > 0 — exactly
  * the two-level aggregation form it replaces (word counts → 60 sums →
  * threshold), one JVM call per row instead of two exchanges. Never
  * null (an empty text hashes its single empty token). */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash60"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    SimhashExpr.simhash60(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SimhashExpr.simhash60($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpr {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits (60 bits) of the digest, read big-endian —
    * `conv(substring(hex, 1, 15), 16, 10)`. */
  private def first15HexAsLong(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def simhash60(text: UTF8String): Long = {
    val ws = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < ws.length) { counts.merge(ws(i), 1L, java.lang.Long.sum _); i += 1 }
    val m = md.get()
    val sums = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      m.reset()
      val h = first15HexAsLong(
        m.digest(e.getKey.getBytes(StandardCharsets.UTF_8)))
      val cnt = e.getValue.longValue
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) sums(j) += cnt else sums(j) -= cnt
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}

/** Compiled within-doc n-gram repetition stats (the Gopher repetition
  * audit's per-document kernel): for n ∈ {2, 3}, the total sliding-gram
  * count and the occurrences belonging to a gram appearing more than
  * once IN THIS DOCUMENT — ARRAY<STRUCT<gram_n, tot, dup_occ>> (two
  * elements), null below 3 tokens. Counts EXACT gram strings, like the
  * DuckDB twin (the aggregation form it replaces grouped by xxhash64
  * fingerprints — value-identical absent a within-doc 64-bit collision,
  * and the exact count is the more faithful form). */
case class RepGramStatsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "rep_gram_stats"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gram_n", IntegerType, nullable = false),
      StructField("tot", LongType, nullable = false),
      StructField("dup_occ", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_gram_stats requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    RepGramStatsExpr.stats(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RepGramStatsExpr.stats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepGramStatsExpr {
  def stats(text: UTF8String): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    if (ws.length < 3) return null
    val out = new Array[Any](2)
    var idx = 0
    var n = 2
    while (n <= 3) {
      val m = new java.util.HashMap[String, Integer]()
      val tot = ws.length - n + 1
      var i = 0
      while (i < tot) {
        val sb = new java.lang.StringBuilder(ws(i))
        var k = 1
        while (k < n) { sb.append(' ').append(ws(i + k)); k += 1 }
        m.merge(sb.toString, Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        i += 1
      }
      var dup = 0L
      val it = m.values().iterator()
      while (it.hasNext) { val c = it.next().intValue; if (c > 1) dup += c }
      out(idx) = org.apache.spark.sql.catalyst.InternalRow(n, tot.toLong, dup)
      idx += 1; n += 1
    }
    new GenericArrayData(out)
  }
}

/** Compiled MinHash band keys: ARRAY<STRING> of the 4 per-band md5 hex
  * keys (null below 3 tokens). */
case class BandHashesExpr(child: Expression, kernel: ShingleKernel)
    extends UnaryExpression {

  override def prettyName: String = "band_hashes"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"band_hashes requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    kernel.bandHashes(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandKernel", kernel, classOf[ShingleKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.bandHashes($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
