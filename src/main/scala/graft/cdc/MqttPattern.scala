package graft.cdc

/** MQTT topic-filter matching — the reference engine's core routing
  * primitive (reference `lib/nats.js:94`, via mqtt-pattern@1.1.3).
  *
  * Semantics (one implementation, two backends — the boolean matcher used by
  * the Catalyst expression, and the regex compiler used to build the DuckDB
  * oracle SQL; both derive from the same level-wise rules):
  *
  *   - pattern and topic are '/'-separated level paths;
  *   - a pattern level starting with '+' (bare or named, e.g. "+id")
  *     matches exactly one NON-EMPTY topic level (mqtt-pattern treats an
  *     empty topic level as absent: `!currentTopic` short-circuits, so
  *     "a/+" does NOT match "a/" — verified against the library source);
  *   - an empty/missing topic level matches only an empty pattern level
  *     (or a terminal '#');
  *   - a pattern level starting with '#' (bare or named, e.g. "#rest")
  *     matches the remaining topic levels and is only valid as the last
  *     pattern level (a '#' earlier is a non-match for any topic that
  *     reaches it with levels remaining). Bare-vs-named differ on a
  *     zero-level tail: mqtt-pattern's `currentPattern !== ALL` guard
  *     compares the FULL segment to "#", so only a BARE '#' matches the
  *     parent ("a/#" matches "a"; "a/#rest" does NOT — a named '#'
  *     requires at least one non-empty topic level at its position);
  *   - any other pattern level must equal the topic level literally;
  *   - both paths must be fully consumed (no trailing unmatched topic
  *     levels unless absorbed by a final '#').
  */
object MqttPattern {

  @inline private def isPlus(seg: String): Boolean =
    seg.nonEmpty && seg.charAt(0) == '+'
  @inline private def isHash(seg: String): Boolean =
    seg.nonEmpty && seg.charAt(0) == '#'

  /** True iff `topic` matches the MQTT filter `pattern`. */
  def matches(pattern: String, topic: String): Boolean = {
    val ps = pattern.split("/", -1)
    val ts = topic.split("/", -1)
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      val topicEmpty = i >= ts.length || ts(i).isEmpty
      if (isHash(p)) {
        // '#' must be last and eats the tail — but on an empty/missing
        // topic level only the BARE '#' matches (mqtt-pattern's
        // `!currentTopic && currentPattern !== ALL` guard compares the
        // whole segment to "#", so a named '#name' fails there)
        if (topicEmpty && p.length > 1) return false
        return i == ps.length - 1
      }
      if (topicEmpty) {
        // empty/missing topic level: only an empty pattern level matches
        // (mqtt-pattern's `!currentTopic` branch); exhaustion falls through
        // to the final length check
        if (p.nonEmpty) return false
      } else if (!isPlus(p) && p != ts(i)) return false
      i += 1
    }
    ps.length == ts.length
  }

  /** Bounded cache of compiled matchers for the dynamic-pattern path
    * (pattern arrives as a column — e.g. a subscription table joined
    * against the bus). Real workloads have few distinct patterns, so each
    * is compiled once per executor instead of split-and-walked per row.
    * Overflow policy: clear-all at the bound (cheap, cache rebuilds from
    * the live pattern set; correctness never depends on the cache). */
  private val cacheBound = 4096
  private val compiled = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Compile a pattern to a Java matcher with [[matches]] semantics —
    * including the edge that a '#' before the last segment can never
    * return true in the level-wise matcher, where toRegex alone would
    * wrongly treat the '#' as terminal. */
  def compileJava(pattern: String): java.util.regex.Pattern = {
    val rx = if (pattern.split("/", -1).dropRight(1).exists(isHash)) "(?!)"
             else toRegex(pattern)
    java.util.regex.Pattern.compile(rx)
  }

  /** Cached variant of [[matches]] — same semantics, compiled once per
    * distinct pattern. Used by the codegen'd expression's dynamic path. */
  def matchesCached(pattern: String, topic: String): Boolean = {
    var p = compiled.get(pattern)
    if (p == null) {
      if (compiled.size() >= cacheBound) compiled.clear()
      p = compileJava(pattern)
      compiled.put(pattern, p)
    }
    p.matcher(topic).matches()
  }

  /** Regex-escape restricted to the metacharacter set that Java regex and
    * DuckDB's RE2 treat identically (no \Q..\E — RE2 lacks it). */
  private def escape(s: String): String =
    s.flatMap { c =>
      if ("\\.[]{}()*+?^$|".indexOf(c.toInt) >= 0) "\\" + c else c.toString
    }

  /** Compile a pattern to an anchored regex with identical semantics in
    * Java (`java.util.regex`) and DuckDB (RE2). Used for the oracle-SQL
    * twin of every mqtt_matches query, and for the pre-compiled fast path
    * in the Catalyst expression's codegen. */
  def toRegex(pattern: String): String = {
    val ps = pattern.split("/", -1)
    val hashAt = ps.indexWhere(isHash)
    val head = if (hashAt >= 0) ps.take(hashAt) else ps
    def segRx(s: String) = if (isPlus(s)) "[^/]+" else escape(s) // '+' = one NON-empty level
    if (hashAt < 0) "^" + head.map(segRx).mkString("/") + "$"
    else if (ps(hashAt).length > 1) {
      // NAMED '#name' requires a NON-EMPTY topic level at its position
      // (mqtt-pattern's guard compares the full segment to "#", so the
      // zero-level-tail acceptance below applies to the bare '#' only):
      // every head level must be literally present, then one level
      // starting with a non-'/' char, then anything.
      val sep = if (head.isEmpty) "" else "/"
      "^" + head.map(segRx).mkString("/") + sep + "[^/].*$"
    } else {
      // BARE '#': trailing EMPTY head levels before it are optional:
      // mqtt-pattern skips an empty pattern level when the topic is
      // exhausted, then '#' accepts the zero-level tail — so "+//#"
      // matches "x9", "x9/", "x9//…" but not "x9/a". Nest one optional
      // group per trailing empty level, innermost being the '#' tail.
      val lastSolid = head.lastIndexWhere(_.nonEmpty)
      val solid = head.take(lastSolid + 1)
      val emptyTrail = head.length - solid.length
      if (solid.isEmpty && emptyTrail == 0) "^.*$"        // pattern is bare '#'
      else {
        // with no solid prefix the first empty level anchors the start,
        // consuming one nesting level
        val depth = if (solid.isEmpty) emptyTrail - 1 else emptyTrail
        val tail = (0 until depth).foldLeft("(/.*)?")((t, _) => "(/" + t + ")?")
        "^" + solid.map(segRx).mkString("/") + tail + "$"
      }
    }
  }

  /** Longest literal prefix of a pattern before the first wildcard
    * segment, as (prefix, firstWildcard): e.g. "cdc/error/#" →
    * ("cdc/error", '#'), "cdc/+/1" → ("cdc", '+'), "+/x" → ("", '+'),
    * "a/b" (no wildcard) → ("a/b", ' '). Used by the prefix-pushdown
    * optimizer rule: a topic matching the pattern necessarily starts with
    * the prefix ('#' may also END at it; '+' requires a following '/'). */
  def literalPrefix(pattern: String): (String, Char) = {
    val ps = pattern.split("/", -1)
    val k = ps.indexWhere(s => isPlus(s) || isHash(s))
    if (k < 0) (pattern, ' ')
    else (ps.take(k).mkString("/"), if (isHash(ps(k))) '#' else '+')
  }

  /** Compile a pattern to an anchored regex with one capture GROUP per
    * named wildcard, in order, returning (regex, group names). The regex
    * runs identically in Java and DuckDB RE2. A named '#name' tail group
    * is REQUIRED (a zero-level tail matches the bare '#' only, per
    * mqtt-pattern@1.1.3 — see [[matches]]), so a capture is never empty
    * on a matching topic. Domain: patterns with non-empty levels (the
    * extraction surface); unnamed wildcards compile to non-capturing
    * forms so group numbering follows named wildcards only. */
  def toExtractRegex(pattern: String): (String, Seq[String]) = {
    val ps = pattern.split("/", -1)
    val hashAt = ps.indexWhere(isHash)
    val head = if (hashAt >= 0) ps.take(hashAt) else ps
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def segRx(s: String): String =
      if (isPlus(s)) {
        if (s.length > 1) { names += s.substring(1); "([^/]+)" } else "[^/]+"
      } else escape(s)
    val body = head.map(segRx).mkString("/")
    if (hashAt < 0) ("^" + body + "$", names.toSeq)
    else {
      val hs = ps(hashAt)
      val named = hs.length > 1
      if (named) names += hs.substring(1)
      // a NAMED '#name' requires a non-empty topic level at its position
      // (zero-level tails match the bare '#' only — see [[matches]]), so
      // its capture group is required and never empty
      val tail =
        if (head.isEmpty) { if (named) "([^/].*)" else ".*" }
        else if (named) "/([^/].*)"
        else "(?:/.*)?"
      ("^" + body + tail + "$", names.toSeq)
    }
  }

  /** mqtt-pattern `clean`: strip wildcard names —
    * "a/+id/#rest" → "a/+/#". */
  def clean(pattern: String): String =
    pattern.split("/", -1).map { s =>
      if (isPlus(s)) "+" else if (isHash(s)) "#" else s
    }.mkString("/")

  /** mqtt-pattern `fill`: substitute named params into a pattern to
    * build a concrete topic — "cdc/+etype/#rest" + (etype→click,
    * rest→7/x) → "cdc/click/7/x". Adaptations from the JS original
    * (which renders a missing param as the string "undefined" — a JS
    * coercion artifact, not a semantic): a missing `+name`/bare `+` is
    * an error; a missing `#` tail is omitted, like the original. */
  def fill(pattern: String, params: Map[String, String]): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ps = pattern.split("/", -1)
    var i = 0
    var done = false
    while (i < ps.length && !done) {
      val p = ps(i)
      if (isHash(p)) {
        params.get(p.substring(1)).foreach(out += _)
        done = true // '#' is always last
      } else if (isPlus(p)) {
        out += params.getOrElse(p.substring(1), throw new IllegalArgumentException(
          s"fill: no value for wildcard '$p' in $pattern"))
      } else out += p
      i += 1
    }
    out.mkString("/")
  }

  /** Named-wildcard parameter extraction (mqtt-pattern `exec`): returns
    * (paramName -> matched level(s)) for "+name" / "#name" segments, or
    * None when the topic does not match. '#name' captures the joined tail. */
  def extract(pattern: String, topic: String): Option[Map[String, String]] = {
    if (!matches(pattern, topic)) return None
    val ps = pattern.split("/", -1)
    val ts = topic.split("/", -1)
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      if (isHash(p)) {
        if (p.length > 1) m += (p.substring(1) -> ts.drop(i).mkString("/"))
        i = ps.length
      } else {
        if (isPlus(p) && p.length > 1) m += (p.substring(1) -> ts(i))
        i += 1
      }
    }
    Some(m.toMap)
  }
}
