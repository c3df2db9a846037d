package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, ResolvedHint}

/** Plan guardrail: reject accidental cartesian products at analysis
  * time.
  *
  * At 100 TB an unintended cross join is not a slow query, it is an
  * outage — |a|×|b| rows materialize before anyone notices. Spark's own
  * `spark.sql.crossJoin.enabled` guard was retired (defaulted on) in
  * 3.0, so production clusters run with no structural defense. This
  * check rule restores it as an opt-in extension: with
  * `spark.graft.guard.noCartesian=true`, any join that is explicitly
  * CROSS or carries NO condition at all fails analysis with a clear
  * message naming the offending join, BEFORE any task launches.
  * Condition-bearing joins — including the engine's theta joins, which
  * are deliberate and bounded — pass untouched; a deliberate cross join
  * re-enables by flipping the conf for that session.
  *
  * Injected via [[graft.GraftExtensions]]' `injectCheckRule` — the
  * analysis-phase extension point (expressions and the DSv2 source
  * cover the other two); PlanSpec drives both the rejection and the
  * conf-off pass-through.
  */
object CartesianGuard {
  val Conf = "spark.graft.guard.noCartesian"

  def rule(session: SparkSession): LogicalPlan => Unit = plan =>
    if (session.conf.getOption(Conf).exists(_.equalsIgnoreCase("true")))
      // subqueriesAll: scalar/IN/EXISTS subquery plans hang off
      // EXPRESSIONS, which LogicalPlan.foreach does not descend into —
      // a cartesian inside `WHERE x > (SELECT ... FROM a, b)` must not
      // slip past the guard
      (plan +: plan.subqueriesAll).foreach(_.foreach {
        case j @ Join(left, right, Cross, _, _)
            if !boundedSide(left) && !boundedSide(right) =>
          fail("explicit CROSS JOIN", j)
        case j @ Join(left, right, _, None, _)
            if !boundedSide(left) && !boundedSide(right) =>
          fail("join with no condition (implicit cartesian product)", j)
        case _ => ()
      })

  /** A side that cannot exceed one row (a global aggregate, a LIMIT 1):
    * crossing with it is |other|×1 — the scalar-stats broadcast pattern
    * the engine itself uses (BM25 corpus stats, sampling totals), not
    * an outage risk. Such joins pass even with the guard on.
    */
  @scala.annotation.tailrec
  private def boundedSide(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1L) || (p match {
      // broadcast()/hint() wrap in ResolvedHint, which does not forward
      // maxRows — look through it (it never changes row counts)
      case h: ResolvedHint => boundedSide(h.child)
      case _ => false
    })

  private def fail(what: String, j: Join): Nothing =
    throw new org.apache.spark.SparkException(
      s"graft cartesian guard: $what would materialize |left|x|right| rows " +
        s"at scale; set ${CartesianGuard.Conf}=false for this session if " +
        s"deliberate. Offending join: ${j.simpleString(2)}")
}
