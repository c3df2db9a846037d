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
    * columns (LongType or TimestampType), attaching `payloadCols` from
    * the right side. Payload column names must not collide with left
    * output names (rejected fast with a `require`, instead of surfacing
    * as an ambiguous-reference error at some later select).
    *
    * Null contract (null-UNSAFE, like an ordinary equi-join): right
    * rows with a null key or null time never match; left rows with a
    * null key or null time pass through unmatched with null payload.
    *
    * Determinism: among right rows sharing the same (key, time), the
    * winner is unspecified unless `tiebreakCols` is given, in which
    * case the max row under the tiebreak columns' ascending order wins.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String],
               tiebreakCols: Seq[String] = Nil): DataFrame = {
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
    payloadCols.foreach { p =>
      require(!lPlan.output.exists(a => spark.sessionState.conf.resolver(a.name, p)),
        s"as-of payload column '$p' collides with a left-side column; " +
          "rename it on the right before joining")
    }
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
      payloadCols.map(attr(rPlan, _)),
      tiebreakCols.map(attr(rPlan, _)))
    GraftRelationalBridge.ofRows(spark, node)
  }

  /** Hot-key mitigation for the as-of join — the salting composition
    * the exec's scaladoc names (AQE's skew-JOIN splitting recognizes
    * only the built-in join execs, so a pathologically hot key in
    * [[graft.plans.AsOfJoinExec]] lands in one task). The left (fact)
    * side salts deterministically from `saltSource` into `salts`
    * sub-keys; the right side replicates once per salt, so EVERY salted
    * left partition still sees the key's full right history and the
    * result equals the unsalted join row-for-row. Cost: the right side
    * shuffles `salts`× — apply when the left side is the big one (the
    * usual as-of shape: events ⋈ reference states), keeping `salts`
    * near the hot key's task-count excess, not in the hundreds.
    * `saltSource` must be deterministic per left row (e.g. a row id),
    * never `rand()` — retried tasks must re-salt identically.
    */
  def joinAsOfSalted(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTimeCol: String, rightTimeCol: String,
                     payloadCols: Seq[String], saltSource: org.apache.spark.sql.Column,
                     salts: Int, tiebreakCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, explode, lit, pmod, sequence}
    require(salts > 0, s"salts must be positive, got $salts")
    val saltCol = "_asof_salt"
    // A null saltSource would make pmod null, null-unmatching the row's
    // REAL keys (a silent semantics divergence from the unsalted join) —
    // default nulls to salt 0 so they join like any other left row.
    val sl = left.withColumn(saltCol,
      coalesce(pmod(saltSource, lit(salts)), lit(0)).cast("int"))
    val sr = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    joinAsOf(sl, sr, keyCols :+ saltCol, leftTimeCol, rightTimeCol,
      payloadCols, tiebreakCols).drop(saltCol)
  }
}
