package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-operator semantics and plan-shape guards.
  *
  * Triangle counting is checked against a brute-force adjacency-set
  * enumeration of the same co-purchase graph (the O(n·d²) definition,
  * fine at sf0.001); PageRank against its conservation/positivity
  * invariants (exactness vs DuckDB's unrolled integer iterations is the
  * oracled check). Plan guards pin the properties that make these scale:
  * keyed joins only — no cartesian/nested-loop fallback anywhere in
  * either plan.
  */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val edges: Array[(Long, Long)] = {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("q_triangles matches brute-force adjacency enumeration") {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    // enumerate each triangle once as an ordered triple u < v < w,
    // crediting all three vertices
    val expected = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val nodes = adj.keys.toArray.sorted
    nodes.foreach { u =>
      val nu = adj(u).filter(_ > u)
      nu.foreach { v =>
        (nu intersect adj(v)).filter(_ > v).foreach { w =>
          expected(u) += 1; expected(v) += 1; expected(w) += 1
        }
      }
    }
    val got = SparkEntry.queries("q_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap, s"sizes got=${got.size} want=${expected.size}")
  }

  test("q_pagerank conserves bounded mass and keeps every node") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    val n = rows.length
    assert(n == edges.flatMap(e => Seq(e._1, e._2)).distinct.length)
    val total = rows.map(_.getLong(1)).sum
    // floor-division losses only shrink mass; damping keeps ≥ 0.15·Scale
    assert(rows.forall(_.getLong(1) >= 150000000L))
    assert(total <= n.toLong * 1000000000L)
    assert(total >= n.toLong * 150000000L)
  }

  test("graph plans never fall back to cartesian or nested-loop joins") {
    Seq("q_triangles", "q_pagerank").foreach { k =>
      val p = SparkEntry.queries(k)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$k:\n${p.take(2000)}")
    }
  }

  test("edge-table derivation runs at most once across graph queries") {
    // All graph analytics read the durable co-purchase edge table; only
    // the FIRST one over a (dir) may pay the lineitem self-join — the
    // rest must read the written snapshot. (≤ 1, not == 1: an earlier
    // suite in this JVM may already have landed the table.)
    val before = graft.queries.GraphOps.derivations.get()
    SparkEntry.queries("q_pagerank")(spark, sf).count()
    SparkEntry.queries("q_graph_bfs")(spark, sf).count()
    SparkEntry.queries("q_triangles")(spark, sf).count()
    val after = graft.queries.GraphOps.derivations.get()
    assert(after - before <= 1, s"derivations ran ${after - before}×")
  }

  test("triangle array and wedge paths agree on dense degree-tied fixtures") {
    import spark.implicits._
    // Degenerate corners where orientation cannot spread degrees: a
    // complete graph K9 (every degree tied at 8, every adjacency row at
    // its √(2E) bound) and complete bipartite K5,5 (tied degrees, zero
    // triangles). The guard must flip to the row-based wedge join when
    // the measured out-degree exceeds the cap and still return the
    // exact same counts as the array path.
    val k9 = (for { u <- 0L until 9L; v <- (u + 1) until 9L } yield (u, v))
    val k55 = (for { u <- 0L until 5L; v <- 10L until 15L } yield (u, v))
    for ((name, es, perNode) <- Seq(
        ("K9", k9, Some(28L)), // each node in C(8,2) = 28 triangles
        ("K5,5", k55, Some(0L)))) {
      val e = es.toDF("u", "v")
      val oriented = graft.queries.GraphOps.orient(e)
      val arrayPath = graft.queries.GraphOps
        .triangleParticipation(oriented)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wedgePath = graft.queries.GraphOps
        .triangleParticipation(oriented, maxAdjEntries = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(arrayPath == wedgePath, s"$name: paths disagree")
      perNode.foreach { n =>
        if (n == 0L) assert(arrayPath.isEmpty, s"$name: want no triangles")
        else {
          assert(arrayPath.size == 9 && arrayPath.values.forall(_ == n),
            s"$name: want $n per node, got $arrayPath")
        }
      }
    }
  }

  test("q_kcore: 3 peeling rounds reach the 2-core fixpoint at test scale") {
    val rows = SparkEntry.queries("q_kcore")(TestSpark.spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "2-core empty — fixture graph degenerated")
    // every surviving degree >= 2 proves a 4th round would drop nothing,
    // i.e. the bounded peel IS the 2-core here
    assert(rows.forall(_._2 >= 2L),
      s"degree<2 survivors: ${rows.filter(_._2 < 2L).take(5).mkString(",")}")
    // 2-core is a subgraph: core degree never exceeds the full-graph degree
    val full = SparkEntry.queries("q_degree_dist")(TestSpark.spark, TestSpark.sf)
    assert(full.collect().map(r => r.getLong(0) * r.getLong(1)).sum >=
      rows.map(_._2).sum, "core degree mass exceeds the full graph's")
  }

  test("q_hits: scores max-normalized to 1e6; iteration 1 matches a brute recompute") {
    val rows = SparkEntry.queries("q_hits")(TestSpark.spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(a => a >= 0L && a <= 1000000L))
    assert(rows.values.max == 1000000L, "no part attains the max-normalized score")
    // brute-force the same 2-iteration max-normalized HITS on collected arcs
    val arcs = graft.model.Tables.orders(TestSpark.spark, TestSpark.sf)
      .join(graft.model.Tables.lineitem(TestSpark.spark, TestSpark.sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = arcs.map(_._1).distinct.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val araw = arcs.groupBy(_._2).map { case (p, as) =>
        p -> as.map(a => hub(a._1)).sum }
      val amx = araw.values.max
      auth = araw.map { case (p, v) => p -> 1000000L * v / amx }
      val hraw = arcs.groupBy(_._1).map { case (c, as) =>
        c -> as.map(a => auth(a._2)).sum }
      val hmx = hraw.values.max
      hub = hraw.map { case (c, v) => c -> 1000000L * v / hmx }
    }
    assert(rows == auth, "distributed HITS disagrees with brute recompute")
  }

  test("q_label_prop: trajectory is monotone and ends at the true component count lower bound") {
    val rows = SparkEntry.queries("q_label_prop")(TestSpark.spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // label count never increases; biggest community never shrinks
    assert(rows.sliding(2).forall(p => p(1)._2 <= p(0)._2))
    assert(rows.sliding(2).forall(p => p(1)._3 >= p(0)._3))
    // min-propagation can only MERGE toward components: the final label
    // count is >= the true connected-component count
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (u, v) => val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(ru) = rv }
    val ccs = nodes.map(find).distinct.length.toLong
    assert(rows.last._2 >= ccs)
    assert(rows.last._3 <= nodes.length.toLong)
  }
}
