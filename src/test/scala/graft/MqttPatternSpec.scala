package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.MqttPattern

/** Table-driven + (seeded) randomized tests for the matcher and its regex
  * compiler (semantics of mqtt-pattern@1.1.3 as used at reference
  * lib/nats.js:94; case table per FIXTURES.md §B.2). */
class MqttPatternSpec extends AnyFunSuite {

  val cases: Seq[(String, String, Boolean)] = Seq(
    // literal
    ("a/b/c", "a/b/c", true),
    ("a/b/c", "a/b/d", false),
    ("a/b", "a/b/c", false),
    ("a/b/c", "a/b", false),
    ("a", "a", true),
    ("", "", true),
    // + single level
    ("a/+/c", "a/b/c", true),
    ("a/+/c", "a/x/c", true),
    ("a/+/c", "a/b/d", false),
    ("a/+/c", "a/b/x/c", false),
    ("+", "a", true),
    ("+", "a/b", false),
    ("a/+", "a", false),          // + needs exactly one level
    // mqtt-pattern@1.1.3: an empty topic level is treated as absent
    // (`!currentTopic`), so '+' does NOT match it
    ("a/+", "a/", false),
    ("+/+", "/", false),
    ("+", "", false),
    ("a/+/c", "a//c", false),
    ("a//c", "a//c", true),       // empty pattern level == empty topic level
    ("a//c", "a/x/c", false),
    ("a/#", "a/", true),          // '#' still eats empty tail levels
    // # tail (zero or more levels)
    ("#", "a/b/c", true),
    ("#", "", true),
    ("a/#", "a/b/c", true),
    ("a/#", "a", true),           // parent level matches
    ("a/#", "b/c", false),
    ("a/b/#", "a/b", true),
    ("a/b/#", "a", false),
    // named wildcards
    ("a/+id/c", "a/42/c", true),
    ("cdc/+etype/#rest", "cdc/click/7", true),
    // mqtt-pattern@1.1.3: a NAMED '#name' does NOT match a zero-level
    // tail (its `!currentTopic` guard compares the full segment to "#"),
    // unlike the bare '#' which matches the parent
    ("cdc/+etype/#rest", "cdc/click", false),
    ("cdc/+etype/#rest", "cdc", false),
    ("a/#rest", "a", false),
    ("a/#rest", "a/", false),       // empty tail level is absent → named '#' fails
    ("a/#rest", "a/b", true),
    ("a/#rest", "a/b/c", true),
    ("a/#rest", "a//b", false),     // tail's first level must be non-empty
    ("a/#", "a", true),             // bare '#' still matches the parent
    ("#all", "", false),
    ("#all", "a", true),
    ("#all", "a/b", true),
    ("#", "", true),
    // # not last → never matches once reached
    ("a/#/c", "a/b/c", false),
    ("a/#/c", "a/x/y", false),
    // mixed
    ("cdc/+/1", "cdc/error/1", true),
    ("cdc/+/1", "cdc/error/12", false),
    // regex metacharacters in literals stay literal
    ("a.b/+", "a.b/c", true),
    ("a.b/+", "axb/c", false))

  test("matcher agrees with case table") {
    cases.foreach { case (p, t, want) =>
      assert(MqttPattern.matches(p, t) === want, s"matches($p, $t)")
    }
  }

  test("compiled regex agrees with case table (oracle parity)") {
    cases.foreach { case (p, t, want) =>
      // '#' mid-pattern is outside the regex compiler's domain (we never
      // generate such patterns); everything else must agree.
      if (!p.split("/", -1).dropRight(1).exists(_.startsWith("#"))) {
        val got = java.util.regex.Pattern.compile(MqttPattern.toRegex(p))
          .matcher(t).matches()
        assert(got === want, s"regex($p) on $t (rx=${MqttPattern.toRegex(p)})")
      }
    }
  }

  test("toExtractRegex: capture groups agree with extract on the cross product") {
    val pats = Seq("cdc/+etype/#rest", "a/+id/c", "+x/+y", "#all", "cdc/+e/+u",
      "a/+/#tail", "cdc/+etype", "a/#")
    val topics = Seq("cdc/click/7", "cdc/click", "cdc/click/7/x", "a/42/c",
      "p/q", "a/b/c", "", "a/b", "a", "cdc")
    for (p <- pats; t <- topics) {
      val (erx, names) = MqttPattern.toExtractRegex(p)
      val m = java.util.regex.Pattern.compile(erx).matcher(t)
      MqttPattern.extract(p, t) match {
        case Some(params) =>
          assert(m.matches(), s"extract matched but regex didn't: $p vs $t (rx=$erx)")
          names.zipWithIndex.foreach { case (n, i) =>
            val g = Option(m.group(i + 1)).getOrElse("")
            assert(g === params.getOrElse(n, ""), s"group $n of $p vs $t")
          }
        case None =>
          assert(!m.matches(), s"regex matched but extract didn't: $p vs $t (rx=$erx)")
      }
    }
  }

  test("clean strips wildcard names; fill ∘ extract round-trips") {
    assert(MqttPattern.clean("a/+id/#rest") === "a/+/#")
    assert(MqttPattern.clean("cdc/click/7") === "cdc/click/7")
    assert(MqttPattern.fill("cdc/+etype/#rest",
      Map("etype" -> "click", "rest" -> "7/x")) === "cdc/click/7/x")
    assert(MqttPattern.fill("cdc/+etype/#rest",
      Map("etype" -> "click")) === "cdc/click") // missing '#' tail omitted
    intercept[IllegalArgumentException] {
      MqttPattern.fill("cdc/+etype", Map.empty)
    }
    // round-trip: extract(p, fill(p, params)) recovers params
    val p = "cdc/+etype/+uid"
    val params = Map("etype" -> "error", "uid" -> "42")
    assert(MqttPattern.extract(p, MqttPattern.fill(p, params)) === Some(params))
  }

  test("extract returns named params") {
    assert(MqttPattern.extract("cdc/+etype/+uid", "cdc/click/7")
      === Some(Map("etype" -> "click", "uid" -> "7")))
    assert(MqttPattern.extract("cdc/+etype/#rest", "cdc/click/7/x")
      === Some(Map("etype" -> "click", "rest" -> "7/x")))
    assert(MqttPattern.extract("cdc/+/x", "cdc/click/7") === None)
  }

  private val rnd = new scala.util.Random(42)
  private def seg(): String = {
    // includes the empty level to exercise the '+'-vs-empty edge
    val pool = Seq("a", "b", "cdc", "click", "x9", "Err", "42", "n.o", "")
    pool(rnd.nextInt(pool.length))
  }
  private def path(max: Int = 5): String =
    Seq.fill(rnd.nextInt(max + 1))(seg()).mkString("/")
  private def pat(): String = {
    val n = rnd.nextInt(5)
    val segs = Seq.fill(n)(if (rnd.nextInt(3) == 0) "+" else seg())
    val base = segs.mkString("/")
    rnd.nextInt(3) match {
      case 0 => base
      case 1 => if (base.isEmpty) "#" else base + "/#"
      case _ => base
    }
  }

  test("randomized: a topic matches itself; '#' matches everything") {
    (1 to 500).foreach { _ =>
      val t = path()
      assert(MqttPattern.matches(t, t), s"self-match $t")
      assert(MqttPattern.matches("#", t), s"# vs $t")
    }
  }

  test("randomized: regex compiler ≡ matcher on 5000 (pattern, topic) pairs") {
    (1 to 5000).foreach { _ =>
      val p = pat(); val t = path()
      val viaMatcher = MqttPattern.matches(p, t)
      val viaRegex = java.util.regex.Pattern.compile(MqttPattern.toRegex(p))
        .matcher(t).matches()
      assert(viaMatcher === viaRegex,
        s"divergence pattern=$p topic=$t rx=${MqttPattern.toRegex(p)}")
    }
  }

  test("matchesCached/compileJava agree with matches on ALL cases incl. mid-'#'") {
    cases.foreach { case (p, t, want) =>
      assert(MqttPattern.matchesCached(p, t) === want, s"matchesCached($p, $t)")
      assert(MqttPattern.compileJava(p).matcher(t).matches() === want,
        s"compileJava($p) on $t")
    }
    (1 to 2000).foreach { _ =>
      val p = pat(); val t = path()
      assert(MqttPattern.matchesCached(p, t) === MqttPattern.matches(p, t),
        s"cache divergence pattern=$p topic=$t")
    }
  }

  test("randomized: '+' never matches across '/'") {
    (1 to 200).foreach { _ =>
      val t = seg() + "/" + seg()
      assert(!MqttPattern.matches("+", t), s"+ vs $t")
    }
  }

  test("randomized: extract ∘ fill recovers the params on named patterns") {
    // mqtt-pattern's fill/exec contract under a generator: for any
    // pattern whose wildcards are all NAMED and any non-empty,
    // slash-free parameter values, filling then extracting is identity
    val vals = Seq("a", "b9", "click", "Err", "42", "n.o")
    def v(): String = vals(rnd.nextInt(vals.length))
    (1 to 1000).foreach { i =>
      val nPlus = rnd.nextInt(4)
      val names = (0 until nPlus).map(k => s"p$k")
      val withHash = rnd.nextBoolean()
      val segs = names.map("+" + _) ++ (if (withHash) Seq("#rest") else Nil)
      val littered = segs.flatMap(sg =>
        if (rnd.nextBoolean()) Seq(seg().replace("/", "_"), sg) else Seq(sg))
      val p = littered.mkString("/")
      if (p.nonEmpty) {
        val params = names.map(_ -> v()).toMap ++
          (if (withHash) Map("rest" -> (v() + "/" + v())) else Map.empty)
        val t = MqttPattern.fill(p, params)
        assert(MqttPattern.extract(p, t) === Some(params), s"round $i: p=$p t=$t")
      }
    }
  }
}
