package graft

/** Shared staleness fingerprint of parquet table directories — the
  * single implementation behind every in-session memo and persisted
  * artifact contract (graph prep caches, bucketed tables, band
  * stores). md5 of the SORTED (path, size, mtime) listing, truncated
  * to 16 lowercase hex chars: the r14 helpers summed per-file
  * `hashCode()`s, an order-insensitive integer sum two distinct
  * listings can collide on (and whose unpadded hex rendering broke
  * ScanAudit's fixed-width suffix strip ~1 in 4096 dirs); r15 used 8
  * hex chars (32 bits), which as the staleness token gating
  * cross-JVM adoption of persisted artifacts left a ≈2⁻³² (birthday-
  * amplified) chance of silently serving stale data as correct — 64
  * bits puts an accidental collision out of reach (r15 ADVICE low
  * #2). The width is FIXED so catalog-table suffixes strip
  * deterministically (`_[0-9a-f]{16}$`). */
object Fingerprint {

  /** Fingerprint of the named table directories (or files) under
    * `d`. A missing table contributes nothing — the reader that then
    * fails to find data fails loudly on its own. */
  def ofTables(d: String, tables: String*): String = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).iterator.flatMap(_.iterator).flatMap(walk)
      else Iterator.single(f)
    val listing = tables
      .flatMap(t => walk(new java.io.File(d, t)))
      .map(f => s"${f.getAbsolutePath}|${f.length}|${f.lastModified}")
      .sorted.mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(listing.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }
}
