package graft.ops

import org.apache.spark.sql.{DataFrame, GraftRelationalBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import graft.plans.{AsOfJoin, AsOfJoinStrategy}

/** DataFrame-level API over the native [[graft.plans.AsOfJoin]]
  * operator: for each left row, attach the payload of the LATEST right
  * row with the same key and `rightTime <= leftTime` (null if none) —
  * the market-data/event-enrichment join, executed as a co-partitioned
  * two-pointer merge instead of an inequality join or a padded
  * union+window (see the operator scaladoc for the scale argument).
  */
object AsOf {

  /** Left as-of join on equal `keyCols`, time-ordered by the named time
    * columns (LongType or TimestampType, non-null), attaching
    * `payloadCols` from the right side. Payload column names must not
    * collide with left output names.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    // idempotent runtime registration; GraftExtensions also injects the
    // strategy for extension-configured sessions
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val rules = Seq(graft.plans.AsOfJoinRules.PushFilterThroughAsOfJoin,
      graft.plans.AsOfJoinRules.PruneAsOfJoinRight)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    }
    val lPlan = left.queryExecution.analyzed
    // Self-join hygiene: a hand-built node skips the analyzer's
    // DeduplicateRelations (it only rewrites KNOWN node types), so when
    // both inputs derive from the same scan their attributes share
    // exprIds and downstream rules mis-attribute them. Re-alias the
    // whole right side with fresh exprIds — exactly what
    // DeduplicateRelations would have done.
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"as-of column '$name' not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoin(lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), keyCols.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      payloadCols.map(attr(rPlan, _)))
    GraftRelationalBridge.ofRows(spark, node)
  }
}
