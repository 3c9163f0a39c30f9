package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ConcatWs, Contains, EqualTo, Expression, IsNull, Literal, Or, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.MqttPattern
import graft.functions.MqttMatchesExpr

/** Optimizer rule: constant-pattern MQTT routing predicates over the
  * SYNTHESIZED channel become native predicates on the channel's SOURCE
  * column — which, on the partitioned bus layout
  * ([[graft.sources.BusLayout]], hive-partitioned by the first routing
  * level), is partition PRUNING: the scan never opens non-matching
  * directories. [[graft.sources.BusLayout.subscribe]] conjoins this
  * manually for callers that know the layout; this rule derives it for
  * ANY query the moment Catalyst substitutes the channel alias down to
  * `concat_ws('/', 'cdc', event_type, …)`.
  *
  * Soundness (this must hold for ARBITRARY data, not just the canonical
  * bus): for a pattern with literal levels `root/L2/…`, a channel
  * `concat_ws('/', root, et, rest…)` can only match when
  *
  *   - `et IS NULL` (concat_ws SKIPS null args, so the remaining args
  *     shift up a level and anything could follow), or
  *   - `et = 'L2'` (the aligned case), or
  *   - `et LIKE 'L2/%'` (an `et` containing '/' contributes several
  *     levels; the match pins only its first).
  *
  * The disjunction is IMPLIED by the match, so rewriting the predicate
  * node `m` to `And(implied, m)` is an equivalence — sound in any
  * boolean context (NOT/OR included), the [[MqttPrefixPushdown]]
  * argument. All three disjuncts are native expressions on the raw
  * column, so FileSourceStrategy evaluates them against partition
  * VALUES: `'error' = et` keeps `event_type=error` (and the null
  * partition), prunes every other directory — the difference between
  * listing 100 TB and listing one directory, before a single row is
  * read. Idempotent: an implied disjunction already present (from a
  * prior iteration or [[graft.sources.BusLayout.subscribe]]'s manual
  * equality) is not re-added.
  */
object BusPartitionPruning extends Rule[LogicalPlan] {

  /** The implied source-column conjunction, when the pattern pins
    * literal levels and the channel is a rooted concat_ws synthesis —
    * one conjunct per literal level with a matching concat arg, so a
    * TWO-level hive layout prunes on BOTH directory levels for a
    * `cdc/error/login/#`-shaped pattern.
    *
    * Per-level soundness: level k+2 of the channel aligns with concat
    * arg k+2 only when every earlier arg contributed exactly one level —
    * an earlier NULL (concat_ws skips it, later args shift up) or an
    * earlier value embedding '/' (one arg, several levels) breaks the
    * alignment, so each deeper conjunct admits those cases explicitly:
    *
    *   implied_k = (∨_{j<k} a_j IS NULL ∨ contains(a_j, '/'))
    *               ∨ a_k IS NULL ∨ a_k = 'L_k' ∨ a_k LIKE 'L_k/%'
    *
    * Every disjunct is weaker when an earlier arg is degenerate, so the
    * conjunction stays IMPLIED by the match for arbitrary data (the
    * MqttPushdownSpec adversarial sweep covers null/embedded-'/'/
    * near-miss values on both levels). Only scalar-STRING, deterministic
    * args participate: concat_ws also accepts ARRAY<STRING> args (each
    * element its own level), and a non-deterministic arg can't be
    * duplicated into a second predicate (independent re-evaluation
    * breaks the implication). */
  private def impliedOnSource(pattern: String, ch: Expression): Option[Expression] = {
    val prefix = MqttPattern.literalPrefix(pattern)._1.split("/", -1)
    if (prefix.length < 2) return None
    ch match {
      case ConcatWs(Literal(sep: UTF8String, _) +: Literal(root: UTF8String, _) +: rest)
          if sep != null && root != null &&
            sep.toString == "/" && root.toString == prefix(0) && rest.nonEmpty =>
        // args stay usable only up to the first non-string/non-det one:
        // a later arg's level alignment depends on every earlier arg
        val usable = rest.takeWhile(a =>
          a.dataType == StringType && a.deterministic)
        val n = math.min(prefix.length - 1, usable.length)
        if (n < 1) return None
        val conjuncts = (0 until n).map { k =>
          val a = usable(k)
          val lk = prefix(k + 1)
          val aligned = Or(IsNull(a),
            Or(EqualTo(a, Literal(UTF8String.fromString(lk), StringType)),
               StartsWith(a, Literal(UTF8String.fromString(lk + "/"), StringType))))
          (0 until k).foldRight(aligned) { (j, acc) =>
            Or(Or(IsNull(usable(j)),
                  Contains(usable(j),
                    Literal(UTF8String.fromString("/"), StringType))), acc)
          }
        }
        Some(conjuncts.reduce(And))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if cond.exists(_.isInstanceOf[MqttMatchesExpr]) =>
      val newCond = cond.transformUp {
        case m @ MqttMatchesExpr(Literal(pat: UTF8String, _), ch) if pat != null =>
          impliedOnSource(pat.toString, ch) match {
            case Some(p) if !cond.exists(_.semanticEquals(p)) => And(p, m)
            case _ => m
          }
      }
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}
