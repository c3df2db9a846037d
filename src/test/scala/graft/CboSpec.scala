package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer integration: collected catalog statistics must
  * actually reach the optimizer and change the join tree. The fixture
  * is the TPC-H Q8 join shape (the suite's widest tree) written in a
  * DELIBERATELY bad syntactic order — facts first, the selective part
  * dimension last — so the stats-off optimizer, which keeps syntactic
  * order for already-pushed-down inner joins, produces a measurably
  * different tree than the CBO, which can see from rowCount/NDV stats
  * that filtered `part` is tiny and belongs at the bottom.
  */
class CboSpec extends AnyFunSuite {
  import TestSpark._

  private val db = "graft_cbo"

  private lazy val analyzed: Unit =
    graft.ops.Stats.registerAnalyzed(spark, sf, db)

  /** Q8's join tree, facts-first on purpose (see class doc). */
  private def q8BadOrder: String =
    s"""SELECT yr,
       |  CAST(sum(CASE WHEN nation = 'NATION_1' THEN vol_e4 ELSE 0 END)
       |    AS BIGINT) AS nation_volume_e4,
       |  CAST(sum(vol_e4) AS BIGINT) AS total_volume_e4
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n2.n_name AS nation,
       |    CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)
       |      AS vol_e4
       |  FROM $db.orders
       |  JOIN $db.lineitem  ON o_orderkey = l_orderkey
       |  JOIN $db.customer  ON c_custkey = o_custkey
       |  JOIN $db.supplier  ON s_suppkey = l_suppkey
       |  JOIN $db.nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN $db.region    ON n1.n_regionkey = r_regionkey
       |  JOIN $db.nation n2 ON s_nationkey = n2.n_nationkey
       |  JOIN $db.part      ON p_partkey = l_partkey
       |  WHERE r_name = 'AMERICA'
       |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |    AND p_type = 'ECONOMY'
       |) all_nations
       |GROUP BY yr
       |ORDER BY yr""".stripMargin

  /** Left-deep rendering of a plan's join tree: the sequence of leaf
    * relation names in join order (scan aliases collapse to the
    * catalog table name).
    */
  private def joinOrder(p: LogicalPlan): Seq[String] = p match {
    case j: Join => joinOrder(j.left) ++ joinOrder(j.right)
    case other if other.children.size == 1 => joinOrder(other.children.head)
    case leaf if leaf.children.isEmpty =>
      Seq(leaf.toString.linesIterator.next().replaceAll(".*`(\\w+)`.*", "$1"))
    case other => other.children.flatMap(joinOrder)
  }

  test("ANALYZE lands rowCount and column stats in the catalog") {
    analyzed
    graft.ops.Stats.tpchTables.foreach { t =>
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db)))
      val st = meta.stats
      assert(st.exists(_.rowCount.exists(_.toLong > 0)),
        s"$db.$t has no rowCount statistic: $st")
      assert(st.exists(_.colStats.nonEmpty),
        s"$db.$t has no column statistics")
    }
    // column-level stats present (NDV), at least on the join keys CBO costs
    val cols = spark.sql(s"DESC EXTENDED $db.lineitem l_orderkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cols.get("distinct_count").exists(_ != "NULL"),
      s"no NDV for l_orderkey: $cols")
  }

  test("CBO join reordering changes the Q8 join tree vs stats-off") {
    analyzed
    val off = graft.ops.Stats.withCbo(spark, on = false) {
      joinOrder(spark.sql(q8BadOrder).queryExecution.optimizedPlan)
    }
    val on = graft.ops.Stats.withCbo(spark, on = true) {
      joinOrder(spark.sql(q8BadOrder).queryExecution.optimizedPlan)
    }
    assert(on != off,
      s"CBO left the deliberately bad join order untouched: $on")
  }

  test("CBO and stats-off plans agree on the Q8 result") {
    analyzed
    val off = graft.ops.Stats.withCbo(spark, on = false) {
      spark.sql(q8BadOrder).collect().map(_.toSeq)
    }
    val on = graft.ops.Stats.withCbo(spark, on = true) {
      spark.sql(q8BadOrder).collect().map(_.toSeq)
    }
    assert(on.toSeq == off.toSeq)
  }
}
