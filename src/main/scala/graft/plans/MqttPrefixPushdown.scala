package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.MqttPattern
import graft.functions.MqttMatchesExpr

/** Optimizer rule: make constant-pattern MQTT routing predicates
  * pushdown-able.
  *
  * `mqtt_matches('cdc/error/#', channel)` is opaque to the parquet source,
  * so a scan reads every row group even though the pattern constrains the
  * channel's prefix. This rule derives the implied native predicate and
  * conjoins it:
  *
  *   - no wildcard in the pattern → the match IS equality:
  *     `channel = 'a/b/c'` replaces the custom predicate entirely;
  *   - leading literal segments → a necessary `StartsWith` conjunct
  *     (`'cdc/error'` for `cdc/error/#`; `'cdc/'` for `cdc/+/1` since '+'
  *     requires one more level), which Spark's parquet source translates
  *     to StringStartsWith and uses for row-group/page skipping via
  *     column statistics — the difference between scanning 100 TB and
  *     scanning the matching slice.
  *
  * The original predicate is kept (the prefix is only necessary, not
  * sufficient), and the rule is idempotent: a conjunct already present
  * (semantically) is not re-added.
  */
object MqttPrefixPushdown extends Rule[LogicalPlan] {

  private def impliedPredicate(pattern: String, channel: Expression): Option[Expression] = {
    val (prefix, wildcard) = MqttPattern.literalPrefix(pattern)
    wildcard match {
      case ' ' => Some(EqualTo(channel, Literal(UTF8String.fromString(prefix), channel.dataType)))
      case _ if prefix.isEmpty => None
      case '#' => Some(StartsWith(channel, Literal(UTF8String.fromString(prefix), channel.dataType)))
      case _   => Some(StartsWith(channel, Literal(UTF8String.fromString(prefix + "/"), channel.dataType)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if cond.exists(_.isInstanceOf[MqttMatchesExpr]) =>
      val newCond = cond.transformUp {
        case m @ MqttMatchesExpr(Literal(pat: UTF8String, _), ch) if pat != null =>
          impliedPredicate(pat.toString, ch) match {
            case Some(eq: EqualTo) => eq // exact pattern: equality is the whole match
            case Some(pred) if !cond.exists(_.semanticEquals(pred)) => And(pred, m)
            case _ => m
          }
      }
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}
