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
}
