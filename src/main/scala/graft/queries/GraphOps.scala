package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model.Tables

/** Graph analytics over the order co-purchase graph: parts are nodes,
  * and two parts are linked when some order contains both. The graph is
  * derived, not stored — `lineitem` self-joined on the order key, a
  * bounded fan-out (C(lines-per-order, 2) pairs per order, ≤21 for
  * TPC-H-shaped data) that shuffles by order key and never materializes
  * a cross product.
  *
  * Both operators use the canonical distributed formulations:
  *
  *  - Triangle counting orients every edge from its lower-(degree, id)
  *    endpoint to the higher one, so each triangle is generated exactly
  *    once from its unique lowest-order apex and — the 100 TB point —
  *    wedge fan-out per node is C(out-degree, 2) with out-degrees
  *    capped near sqrt(|E|) by the orientation, not C(degree, 2) on raw
  *    hub degrees. The skew a power-law hub would inject into the wedge
  *    join is bounded by construction.
  *  - PageRank runs entirely in scaled integer arithmetic (rank units
  *    of 1e-9): contributions are integer divisions and the damping mix
  *    is integer, so every iteration is bit-identical under ANY
  *    partitioning or aggregation order — no float-summation-order
  *    divergence between runs, executors, or engines. Each iteration is
  *    one keyed join + one partial-aggregated shuffle; plans stay
  *    bounded via per-iteration localCheckpoint exactly like
  *    [[graft.ops.Dedup.connectedComponents]].
  *
  * Reference scope: the reference has no graph operators; this extends
  * the generalized analytics surface (SURVEY.md §2.B) the same way the
  * dedup clustering path already needs connected components.
  */
object GraphOps {
  private type Q = (SparkSession, String) => DataFrame

  /** PageRank fixed-point scale: ranks are integers in units of 1e-9. */
  private val Scale = 1000000000L

  /** Distinct undirected co-purchase edges, emitted once as (u < v).
    *
    * Landed as a DURABLE versioned table ([[graft.ops.Sinks
    * .writeVersioned]]) the first time a graph analytic needs it, then
    * read back from Parquet: the "materialize the graph once, run many
    * analytics" step a production pipeline owns as its own table. The
    * durable form is what survives a 100 TB posture — localCheckpoint
    * blocks (the previous implementation) are executor-pinned, so one
    * lost executor forces a full re-derivation mid-query; a Parquet
    * snapshot re-reads from storage like any other table, and any
    * later session in this JVM's scratch namespace (the namespace is
    * per-JVM and cleaned on exit — see [[graft.model.Scratch]]) reuses
    * the written table without re-running the lineitem self-join; a
    * production deployment would point this at a permanent table
    * location instead. Memoization/concurrency discipline lives in
    * [[graft.ops.DurableTable]] (shared with the dedup cluster map).
    */
  private val edgeTable = new graft.ops.DurableTable("graph_edges")

  /** Edge-table derivation counter, pinned run-once by GraphOpsSpec. */
  private[graft] val derivations = edgeTable.derivations

  /** Force the durable co-purchase edge-table build (and return its
    * row count). Bench times this as its own `_derive_copurchase`
    * entry so the graph keys report steady-state read-through cost
    * instead of whichever runs first absorbing the derivation.
    */
  private[graft] def materializeEdges(s: SparkSession, d: String): Long =
    coPurchaseEdges(s, d).count()

  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    edgeTable(s, d) {
      // one groupBy + row-local pair expansion (r16; was an o-keyed
      // self-join): the per-order part set is bounded (C(lines-per-
      // order, 2) ≤ 21 pairs on TPC-H-shaped data — the same fan-out
      // bound the join form relied on), so collecting it per order and
      // exploding the ordered pairs row-locally yields the identical
      // pair set with ONE exchange (the groupBy) where the join paid
      // the distinct exchange PLUS a re-exchange of both sides by o.
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.groupBy(col("o")).agg(collect_list(col("p")).as("ps"))
        .select(explode(col("ps")).as("u"), col("ps"))
        .select(col("u"), explode(col("ps")).as("v"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v"))
        .distinct()
    }

  /** Undirected degree per node (each edge counts at both endpoints). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))

  /** Degree-orient an undirected (u, v) edge list: each edge points
    * low→high in the total order (degree, id), so a triangle's unique
    * orientation-minimum apex generates it exactly once and out-degrees
    * are capped at √(2E) — a node with out-degree k has k out-neighbors
    * of degree ≥ k, so E ≥ k²/2 (the Chiba–Nishizeki bound behind every
    * distributed triangle formulation).
    */
  private[graft] def orient(e: DataFrame): DataFrame = {
    val dg = degrees(e)
    val du = dg.select(col("n").as("u"), col("dg").as("du"))
    val dv = dg.select(col("n").as("v"), col("dg").as("dv"))
    e.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Per-node triangle participation counts from an oriented edge list
    * — adaptive between the two exact formulations:
    *
    *  - Array path (default): join each oriented edge with both
    *    endpoints' out-adjacency arrays and explode the intersection.
    *    Never materializes the wedge expansion (C(out-degree, 2)-fold
    *    larger than the edges; 33M wedge rows vs 0.9M edges at sf0.1,
    *    measured ~2× faster than the wedge join here). Row-size bound:
    *    an adjacency row holds one out-neighborhood, ≤ √(2E) longs —
    *    ~8 KB rows at E≈1e8, ~11 MB rows at E≈1e12. Large but finite;
    *    what the cap below actually defends against is a row OVER the
    *    √(2E) regime's comfort zone, e.g. the near-uniform-degree
    *    corner (complete / complete-bipartite blocks, where EVERY row
    *    is √E-sized at once) blowing task memory.
    *  - Wedge path (fallback when the measured max out-degree exceeds
    *    `maxAdjEntries`): self-join the oriented edges on the apex to
    *    enumerate wedges row-wise and close them with an id-canonical
    *    equi semi join. Same exact result, no wide rows — work streams
    *    through the shuffle instead of sitting in per-row arrays.
    *
    * The probe is one count-aggregate over the (persisted) oriented
    * edges — cheap insurance that the plan never builds rows it can't
    * hold. Both paths emit each triangle exactly once; GraphSpec's
    * dense-fixture property test pins their agreement.
    */
  private[graft] def triangleParticipation(oriented: DataFrame,
      maxAdjEntries: Long = 4L << 20): DataFrame = {
    // two-tier probe (r16): orientation caps out-degree at √(2E)
    // (Chiba–Nishizeki, see [[orient]]), so while 2E ≤ maxAdjEntries²
    // NO row can exceed the cap and the exact max-out-degree probe — a
    // full groupBy shuffle of the edge table — is provably redundant;
    // a plain count (a column-less scan, parquet-footer cheap on the
    // durable oriented table) decides that. Only past the bound does
    // the exact probe run and choose between the paths as before.
    val edgeCount = oriented.count()
    val wide = 2.0 * edgeCount.toDouble >
        maxAdjEntries.toDouble * maxAdjEntries.toDouble && {
      val maxOut = oriented.groupBy(col("src"))
        .agg(count(lit(1)).as("k")).agg(max(col("k")).as("m"))
        .first().get(0)
      maxOut != null && maxOut.asInstanceOf[Long] > maxAdjEntries
    }
    val tris =
      if (!wide) {
        // a triangle with apex u is an out-neighbor w shared by both
        // endpoints of an oriented edge u→v: w ∈ N⁺(u) ∩ N⁺(v);
        // adjacency arrays stay unsorted — ArrayIntersect hashes one
        // side, so sorting would be wasted work
        val adj = oriented.groupBy(col("src"))
          .agg(collect_list(col("dst")).as("nbrs"))
        oriented
          .join(adj.select(col("src"), col("nbrs").as("nbrs_u")), "src")
          .join(adj.select(col("src").as("dst"), col("nbrs").as("nbrs_v")), "dst")
          .select(col("src").as("apex"), col("dst").as("a"),
            explode(array_intersect(col("nbrs_u"), col("nbrs_v"))).as("b"))
      } else {
        // wedges (apex, a, b) with a < b by id; the closing edge
        // between a and b carries SOME orientation, so canonicalize
        // oriented edges to id-ordered pairs for the equi semi join
        val w = oriented.as("x").join(oriented.as("y"),
            col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
          .select(col("x.src").as("apex"), col("x.dst").as("a"),
            col("y.dst").as("b"))
        val closing = oriented.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        w.join(closing, Seq("a", "b"), "left_semi")
          .select(col("apex"), col("a"), col("b"))
      }
    tris.select(explode(array(col("apex"), col("a"), col("b"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
  }

  /** Durable oriented-edge snapshot alongside the raw edge table: the
    * orientation (degree compute + two joins over the full edge list)
    * used to live in a session-scoped MEMORY_AND_DISK persist, which
    * any cache eviction — Bench's between-key block drop, an executor
    * loss at scale — silently downgraded to a full recompute per query
    * (measured: q_triangles 40.9 s first run vs 8.6 s "warm" at sf0.1,
    * both re-deriving orientation). As a versioned Parquet table the
    * orientation is derived ONCE per dir and every triangle/cohesion
    * query starts from a plain scan — the same survivability argument
    * as the co-purchase edges themselves ([[edgeTable]]).
    */
  private val orientedTable = new graft.ops.DurableTable("graph_oriented")

  /** Force the durable oriented-edge build (Bench's
    * `_derive_oriented_edges` entry — see [[materializeEdges]]).
    */
  private[graft] def materializeOriented(s: SparkSession, d: String): Long =
    orientedEdges(s, d).count()

  private def orientedEdges(s: SparkSession, d: String): DataFrame =
    orientedTable(s, d) { orient(coPurchaseEdges(s, d)) }

  private val qTriangles: Q = (s, d) =>
    triangleParticipation(orientedEdges(s, d)).orderBy("part")

  /** Degree distribution of the co-purchase graph — the first graph
    * health-check (a power-law tail vs a degenerate hub says whether
    * the downstream triangle/pagerank costs are safe). Output is
    * max-degree sized; one aggregate over the node-degree table.
    */
  private val qDegreeDist: Q = (s, d) =>
    degrees(coPurchaseEdges(s, d))
      .groupBy("dg").agg(count(lit(1)).as("n_nodes"))
      .orderBy("dg")

  /** 2-core of the co-purchase graph via 3 peeling rounds: iteratively
    * drop nodes of degree < 2 and the edges touching them, then report
    * the surviving nodes with their core degrees — the graph-pruning
    * pass run before any expensive cohesion mining (triangles, dense
    * subgraphs) to shed the tree-like fringe. Each round is one degree
    * aggregate + two semi-join filters, `localCheckpoint`-bounded like
    * the pagerank iterations; the round count is FIXED so the oracle
    * unrolls the same three rounds — GraphOpsSpec proves a 4th round is
    * a fixpoint no-op at test scale, so the bounded peel IS the 2-core
    * there (deeper corpora raise the constant, same plan per round).
    */
  private val qKcore: Q = (s, d) => {
    val k = 2
    var e = coPurchaseEdges(s, d)
    for (_ <- 1 to 3) {
      // peel by ANTI-joining the DROPPED set (deg < k) instead of
      // semi-joining the keep set (r16, guide §3.1): every edge
      // endpoint appears in degrees(e), so keep/dropped partition the
      // nodes and anti(dropped) ≡ semi(keep) row-for-row — but the
      // dropped side is the FRINGE (shrinking per round, empty at the
      // fixpoint) where keep is ~all nodes (data-sized at 100 TB, can
      // never broadcast); AQE turns the anti-join into a broadcast
      // whenever the round's peel is small, leaving the surviving edge
      // table un-exchanged
      val dropped = degrees(e).filter(col("dg") < k).select(col("n"))
      e = e.join(dropped.withColumnRenamed("n", "u"), Seq("u"), "left_anti")
        .join(dropped.withColumnRenamed("n", "v"), Seq("v"), "left_anti")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    degrees(e).select(col("n").as("node"), col("dg")).orderBy("node")
  }

  /** Degree assortativity — the one-number homophily readout (do
    * high-degree parts co-purchase with high-degree parts?). Pearson
    * correlation of endpoint degrees over the 2E ordered pairs, from
    * EXACT integer moments: S1 = 2E, Sx = Σ(du+dv), Sxx = Σ(du²+dv²),
    * Sxy = 2Σ du·dv (symmetry makes the x and y moments equal, so one
    * pass over the undirected edge list suffices); then
    * r = (S1·Sxy − Sx²)/(S1·Sxx − Sx²). The cross products reach
    * E·deg²·E ≈ 10²⁰ at bench scale — past BIGINT — so they promote to
    * DECIMAL(38,0) (HUGEINT in the oracle) with ONE float division at
    * the end (the q_gini discipline). A degree-regular graph has a 0
    * denominator (assortativity undefined) → reported as 0, same both
    * engines. Cost: edges ⋈ degrees twice + a scalar agg — nothing
    * beyond the degree join every graph metric pays.
    */
  private val qAssortativity: Q = (s, d) => {
    val e = coPurchaseEdges(s, d)
    val dg = degrees(e)
    val j = e.join(dg.select(col("n").as("u"), col("dg").as("du")), "u")
      .join(dg.select(col("n").as("v"), col("dg").as("dv")), "v")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    j.agg((count(lit(1)) * 2L).as("s1"),
        sum(col("du") + col("dv")).as("sx"),
        sum(col("du") * col("du") + col("dv") * col("dv")).as("sxx"),
        (sum(col("du") * col("dv")) * 2L).as("sxy"))
      .select(col("s1"),
        when(dec(col("s1")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
            === lit(0).cast("decimal(38,0)"), lit(0L))
          .otherwise(floor(lit(1000000.0) *
            (dec(col("s1")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sx")))
              .cast("double") /
            (dec(col("s1")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
              .cast("double")).cast("long"))
          .as("r_e6"))
      .orderBy(col("s1"))
  }

  /** Global clustering coefficient 3·triangles / wedges — how clique-like
    * the co-purchase graph is. The triangle total rides the SAME oriented
    * participation plan as `q_triangles` (Σ participation = 3T exactly,
    * each triangle counted once per corner); wedges are Σ dg·(dg−1)/2
    * over the degree table (per-term integer division is exact —
    * dg·(dg−1) is even). coeff_ppm = 10⁶·3T DIV W in BIGINT — the
    * binding headroom is the NUMERATOR 10⁶·3T, safe while the graph has
    * under ~9.2·10¹² triangle corners (3T); past that the ratio moves
    * to DECIMAL(38,0), same single-row plan. Degenerate graphs stay
    * engine-portable: a triangle-free corpus reports 0 (not NULL), and
    * a wedge-free one reports 0 instead of dividing by zero.
    */
  private val qClusteringCoeff: Q = (s, d) => {
    val e = coPurchaseEdges(s, d)
    val tri3 = triangleParticipation(orientedEdges(s, d))
      .agg(coalesce(sum("n_tri"), lit(0L)).as("tri3"))
    val wedges = degrees(e)
      .agg(coalesce(sum(expr("dg * (dg - 1) DIV 2")), lit(0L)).as("n_wedges"))
    tri3.crossJoin(broadcast(wedges))
      .select(expr("tri3 DIV 3").as("n_tri"), col("n_wedges"),
        when(col("n_wedges") > 0L, expr("1000000 * tri3 DIV n_wedges"))
          .otherwise(lit(0L)).as("coeff_ppm"))
      .orderBy("n_tri")
  }

  /** Hub cap for `q_common_neighbors`: wedge apexes with degree above
    * this are skipped — standard link-prediction practice (a super-hub
    * connecting everything carries no signal) AND the scale guard: the
    * wedge fan-out is Σ_z C(deg(z), 2), which orientation cannot cap
    * here because common neighbors need apexes on BOTH sides. No-op on
    * this corpus (max degree ≈ 600 at sf0.1); the oracle applies the
    * same cap.
    */
  private val HubCap = 10000L

  /** Common-neighbor link prediction for a FOCUS set: for each part
    * with key < 100 (the query-subset convention `q_cosine_topk` uses),
    * the top-5 non-adjacent candidates by shared co-purchase neighbors
    * — "customers who bought this also bought..." for pairs never yet
    * bought together. The focus set is the scale decision: the global
    * all-pairs common-neighbor table is inherently Σ_z deg(z)²
    * (measured 41 s at sf0.1 before this reshape — the wedge fan-out,
    * not a fixable plan detail), while the per-focus expansion is
    * Σ_{z∈N(focus)} deg(z), bounded by |focus|·maxdeg² — the shape a
    * recommendation service actually runs. Two keyed joins (focus
    * arcs → neighbor arcs, hub-capped), one pair count, one canonical
    * anti join against the edge table, and a per-focus top-5 window
    * (WindowGroupLimit pushes the rank filter below the exchange).
    */
  private val qCommonNeighbors: Q = (s, d) => {
    val e = coPurchaseEdges(s, d)
    val arcs = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
    val dg = degrees(e).select(col("n").as("z"), col("dg"))
    val wedge = arcs.filter(col("src") < 100L)
      .select(col("src").as("f"), col("dst").as("z"))
      .join(dg, "z").filter(col("dg") <= HubCap)
      .join(arcs.select(col("src").as("z"), col("dst").as("cand")), "z")
      .filter(col("cand") =!= col("f"))
    val cn = wedge.groupBy("f", "cand").agg(count(lit(1)).as("n_common"))
    val nonadj = cn.join(e,
        least(cn("f"), cn("cand")) === e("u") &&
          greatest(cn("f"), cn("cand")) === e("v"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("f")).orderBy(col("n_common").desc, col("cand").asc)
    nonadj.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("f"), col("cand"), col("n_common"), col("rnk"))
      .orderBy(col("f"), col("rnk"))
  }

  /** Jaccard-similarity link prediction over the co-purchase graph:
    * for the same focus set as `q_common_neighbors`, score each
    * non-adjacent candidate by |N(f)∩N(c)| / |N(f)∪N(c)| in exact ppm
    * (union via deg(f)+deg(c)−common — no second neighborhood
    * expansion) — the normalized variant that stops high-degree
    * candidates from dominating raw common-neighbor counts. Same
    * hub-capped wedge expansion and scale argument as
    * `q_common_neighbors`; two extra broadcast-sized degree joins; the
    * top-5 window ranks by the normalized score.
    */
  private val qJaccardNeighbors: Q = (s, d) => {
    val e = coPurchaseEdges(s, d)
    val arcs = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
    val dg = degrees(e)
    val wedge = arcs.filter(col("src") < 100L)
      .select(col("src").as("f"), col("dst").as("z"))
      .join(dg.select(col("n").as("z"), col("dg")), "z")
      .filter(col("dg") <= HubCap)
      .join(arcs.select(col("src").as("z"), col("dst").as("cand")), "z")
      .filter(col("cand") =!= col("f"))
    val cn = wedge.groupBy("f", "cand").agg(count(lit(1)).as("n_common"))
    val nonadj = cn.join(e,
        least(cn("f"), cn("cand")) === e("u") &&
          greatest(cn("f"), cn("cand")) === e("v"), "left_anti")
    val scoredJ = nonadj
      .join(dg.select(col("n").as("f"), col("dg").as("deg_f")), "f")
      .join(dg.select(col("n").as("cand"), col("dg").as("deg_cand")), "cand")
      .withColumn("jaccard_ppm",
        expr("1000000 * n_common DIV (deg_f + deg_cand - n_common)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("f")).orderBy(col("jaccard_ppm").desc, col("cand").asc)
    scoredJ.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("f"), col("cand"), col("n_common"), col("deg_f"),
        col("deg_cand"), col("jaccard_ppm"), col("rnk"))
      .orderBy(col("f"), col("rnk"))
  }

  /** Adamic–Adar link prediction over the same focus-set wedges: each
    * common neighbor z contributes 1/ln(deg z) — rare shared neighbors
    * count more than hubs. Every z's weight is floored to e6 BEFORE the
    * per-pair sum (floor(10⁶/ln(deg z)) — the `q_mutual_info` per-term-
    * floor discipline, so the cross-row integer sum is order-
    * independent; ln is the one float op, mirrored token-for-token; a
    * common neighbor has deg ≥ 2 by construction so ln never hits 0).
    * Same hub-capped expansion, non-adjacency anti join, and top-5
    * ranking as `q_common_neighbors`.
    */
  private val qAdamicAdar: Q = (s, d) => {
    val e = coPurchaseEdges(s, d)
    val arcs = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
    val dg = degrees(e)
    val wedge = arcs.filter(col("src") < 100L)
      .select(col("src").as("f"), col("dst").as("z"))
      .join(dg.select(col("n").as("z"), col("dg")), "z")
      .filter(col("dg") <= HubCap)
      .join(arcs.select(col("src").as("z"), col("dst").as("cand")), "z")
      .filter(col("cand") =!= col("f"))
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .withColumn("w_e6",
        floor(lit(1000000.0) / log(col("dg").cast("double"))).cast("long"))
    val aa = wedge.groupBy("f", "cand")
      .agg(count(lit(1)).as("n_common"), sum("w_e6").as("aa_e6"))
    val nonadj = aa.join(e,
        least(aa("f"), aa("cand")) === e("u") &&
          greatest(aa("f"), aa("cand")) === e("v"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("f")).orderBy(col("aa_e6").desc, col("cand").asc)
    nonadj.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("f"), col("cand"), col("n_common"), col("aa_e6"), col("rnk"))
      .orderBy(col("f"), col("rnk"))
  }

  /** Damped PageRank (d=0.85, 3 iterations) in exact integer arithmetic.
    *
    * rank' = floor(0.15·Scale) + floor(85 · Σ floor(rank_u / deg_u) / 100)
    * over in-neighbors u. Every term is a BIGINT, so the distributed sum
    * is order-independent and the result is bit-deterministic — the
    * discipline [[graft.ops.Similarity]] uses for centroid means,
    * applied to an iterative fixpoint. The undirected co-purchase graph
    * has no dangling nodes (every node has degree ≥ 1) so no mass
    * redistribution term is needed.
    */
  private val qPagerank: Q = (s, d) => {
    // the memoized edge table is already materialized, so arcs, degrees,
    // and every iteration's node spine read checkpointed data — no
    // re-derivation inside the loop (un-materialized, each pass re-ran
    // the lineitem⋈lineitem self-join: measured 3× slower at sf0.1)
    val und = coPurchaseEdges(s, d)
    // Both directions: an undirected edge contributes along each arc.
    val arcs = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    val dg = degrees(und).select(col("n").as("src"), col("dg"))
    // Partitioning established ONCE (guide §2.4, r16): the arc table is
    // hash-laid-out by src before the persist, and every structure the
    // loop joins it with arrives partitioned the same way (rank renames
    // n→src off a groupBy(n) output; aliases preserve partitioning), so
    // each iteration's arcs⋈rank join is exchange-free — the arc table,
    // the only data-sized structure here, is shuffled once per QUERY
    // instead of once per ITERATION.
    val outArcs = arcs.join(dg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // nodes partitioned by n for the same reason: the per-iteration
    // nodes⋈contrib join aligns with contrib's groupBy(n) partitioning
    val nodes = dg.select(col("src").as("n"), col("dg"))
      .repartition(col("n")).localCheckpoint(true)
    var rank = nodes.select(col("n"), lit(Scale).as("r")).localCheckpoint(true)
    for (_ <- 1 to 3) {
      val contrib = outArcs
        .join(rank.select(col("n").as("src"), col("r")), "src")
        .select(col("dst").as("n"), expr("r DIV dg").as("c"))
        .groupBy("n").agg(sum(col("c")).as("sc"))
      // The damping term is the quotient/remainder split of
      // `85·sc DIV 100`: exactly equal for sc ≥ 0 (85·sc = 8500·q +
      // 85·rem with q = sc DIV 100 divisible through), but the largest
      // intermediate is 85·q ≤ 0.85·sc — so no Long overflow even when
      // a hub's in-neighbor rank mass approaches ~1e8 nodes · 1e9 rank
      // units, where the naive `85 * sc` product would wrap at ~1.1e17
      // mass. The oracle floors in the same split.
      rank = nodes
        .join(contrib, Seq("n"), "left")
        .select(col("n"),
          (lit(15L * Scale / 100L) +
            expr("85 * (coalesce(sc, 0L) DIV 100) " +
              "+ 85 * (coalesce(sc, 0L) % 100) DIV 100")).as("r"))
        .localCheckpoint(true)
    }
    outArcs.unpersist()
    rank.select(col("n").as("part"), col("r").as("rank_e9")).orderBy("part")
  }

  /** Personalized PageRank from the deterministic seed set (parts ≡ 0
    * mod 97 — the BFS seed convention): teleport mass returns to the
    * SEEDS, not the whole graph, so rank measures proximity-weighted
    * relevance to the focus — the "related items for THIS catalog
    * slice" serving query, versus `q_pagerank`'s global importance.
    * Same exact-integer damping (85·sc quotient/remainder split, no
    * overflow near hub mass) and per-iteration localCheckpoint; the
    * one structural difference is pro-scale: rank is SPARSE (nonzero
    * only within 3 hops of a seed), and each iteration joins arcs
    * against the nonzero frontier only — work tracks the personalized
    * neighborhood, not the node count. Top-25 by (rank, part) rides
    * TakeOrderedAndProject; the oracle unrolls the same 3 iterations.
    */
  private val qPpr: Q = (s, d) => {
    val und = coPurchaseEdges(s, d)
    val arcs = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    val dg = degrees(und).select(col("n").as("src"), col("dg"))
    // partitioning established once — see qPagerank (r16)
    val outArcs = arcs.join(dg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = dg.select(col("src").as("n"), col("dg"))
      .withColumn("base",
        when(col("n") % 97L === 0L, lit(15L * Scale / 100L)).otherwise(0L))
      .repartition(col("n")).localCheckpoint(true)
    var rank = nodes
      .select(col("n"),
        when(col("n") % 97L === 0L, lit(Scale)).otherwise(0L).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      val contrib = outArcs
        .join(rank.filter(col("r") > 0L)
          .select(col("n").as("src"), col("r")), "src")
        .select(col("dst").as("n"), expr("r DIV dg").as("c"))
        .groupBy("n").agg(sum(col("c")).as("sc"))
      rank = nodes
        .join(contrib, Seq("n"), "left")
        .select(col("n"),
          (col("base") +
            expr("85 * (coalesce(sc, 0L) DIV 100) " +
              "+ 85 * (coalesce(sc, 0L) % 100) DIV 100")).as("r"))
        .localCheckpoint(true)
    }
    outArcs.unpersist()
    rank.filter(col("r") > 0L)
      .orderBy(col("r").desc, col("n").asc)
      .limit(25)
      .select(col("n").as("part"), col("r").as("rank_e9"))
  }

  /** Conductance of the mod-97 seed set on the co-purchase graph: cut
    * edges over the smaller side's volume — the cut-quality score that
    * says whether the `q_ppr`/`q_graph_bfs` seed slice is a real
    * community (low conductance) or an arbitrary slice of a hub mesh
    * (high). Pure integer: one conditional aggregate over the edge
    * list for the cut, one over the degree table for the volumes, a
    * scalar broadcast — no per-pair work at any scale.
    */
  private val qConductance: Q = (s, d) => {
    val und = coPurchaseEdges(s, d)
    val vol = degrees(und).agg(
      sum(when(col("n") % 97L === 0L, col("dg")).otherwise(0L)).as("vol_s"),
      sum(col("dg")).as("vol_all"))
    val cut = und.agg(
      sum(((col("u") % 97L === 0L) =!= (col("v") % 97L === 0L)).cast("long"))
        .as("cut_edges"),
      count(lit(1)).as("n_edges"))
    cut.crossJoin(broadcast(vol))
      .filter(col("vol_s") > 0L && col("vol_all") - col("vol_s") > 0L)
      .select(col("n_edges"), col("cut_edges"), col("vol_s"),
        (col("vol_all") - col("vol_s")).as("vol_rest"),
        expr("1000000 * cut_edges DIV least(vol_s, vol_all - vol_s)")
          .as("conductance_ppm"))
      .orderBy("n_edges")
  }

  /** Level-synchronous BFS: exact shortest-hop distances (≤ 4 hops)
    * from a deterministic seed set (parts ≡ 0 mod 97) over the
    * co-purchase graph. Each level is one keyed join (frontier ⋈ arcs)
    * plus one min-aggregate — the canonical distributed BFS, NOT the
    * recursive UNION ALL expansion (which multiplies by average degree
    * per hop and melts down on dense graphs); per-level
    * localCheckpoint keeps plans bounded like the PageRank loop. All
    * distances are integers — bit-exact on both engines; the oracle
    * unrolls the same four min-aggregated levels.
    */
  private val qGraphBfs: Q = (s, d) => {
    val und = coPurchaseEdges(s, d)
    // hash-laid-out by src once (guide §2.4, r16): each level's
    // arcs⋈frontier join then exchanges only the (small) frontier,
    // never the arc table
    val arcs = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = degrees(und).select(col("n"))
    var dist = nodes.filter(col("n") % 97L === 0L)
      .select(col("n"), lit(0L).as("d")).localCheckpoint(true)
    // frontier propagation — the textbook level-synchronous refinement:
    // each level expands only the nodes REACHED AT THE PREVIOUS level
    // (one arcs⋈frontier join + an anti join against settled nodes),
    // so per-level work tracks the frontier size, not the whole settled
    // set; settled distances grow by disjoint union, no re-aggregation.
    var frontier = dist
    for (_ <- 1 to 4) {
      val next = arcs
        .join(frontier.select(col("n").as("src"), col("d")), "src")
        .select(col("dst").as("n"), (col("d") + 1L).as("d"))
        .groupBy("n").agg(min("d").as("d"))
        .join(dist.select("n"), Seq("n"), "left_anti")
        .localCheckpoint(true)
      // no checkpoint on the union: both inputs are already
      // materialized, so the lineage is a bounded 4-deep union of
      // checkpointed nodes — re-materializing the whole settled set
      // every level would copy O(levels·|settled|) for nothing
      dist = dist.unionAll(next)
      frontier = next
    }
    arcs.unpersist()
    dist.select(col("n").as("part"), col("d").as("hops")).orderBy("part")
  }

  /** Association rules over order baskets (market-basket mining, the
    * co-occurrence half of FP-growth): support counts for item pairs,
    * confidence and lift as exact integer-scaled ratios. Shape: the
    * same bounded per-order pair fan-out as the graph ops, one keyed
    * aggregate per level — counts are re-aggregatable, so the rule
    * table refreshes incrementally like `q_incr_agg`. The support
    * floor bounds the output (and at 100 TB it is also what keeps the
    * pair table sparse — rare pairs die in the partial aggregate).
    * Ratios are floored millionths computed in integer arithmetic —
    * both engines agree exactly, no float division anywhere.
    */
  private val qAssocRules: Q = (s, d) => {
    // materialized once (r16): the basket-count scalar, the item
    // counts, and BOTH pair-join sides previously each re-ran the
    // lineitem scan + distinct — four evaluations of the same
    // one-shuffle aggregate for one query
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    val baskets = li.select(col("o")).distinct().count()
    val items = li.groupBy(col("p")).agg(count(lit(1)).as("item_n"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p_a"), col("b.p").as("p_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 3L)
    pairs
      .join(items.select(col("p").as("p_a"), col("item_n").as("n_a")), "p_a")
      .join(items.select(col("p").as("p_b"), col("item_n").as("n_b")), "p_b")
      .select(col("p_a"), col("p_b"), col("pair_n"), col("n_a"), col("n_b"),
        expr("1000000L * pair_n DIV n_a").as("conf_ab_e6"),
        expr("1000000L * pair_n DIV n_b").as("conf_ba_e6"),
        // two-step association keeps every intermediate ≤ 1e6·baskets —
        // Long-safe at any corpus size, where the single-expression
        // 1e6·pair_n·baskets would overflow around 1e12 pair
        // observations; the oracle floors in the same two steps
        expr(s"(1000000L * pair_n DIV n_a) * ${baskets}L DIV n_b")
          .as("lift_e6"))
      .orderBy(col("p_a"), col("p_b"))
  }

  /** HITS authority scores (2 iterations) on the bipartite
    * customer→part purchase graph — hubs are customers, authorities
    * parts; a part is authoritative when bought by customers who buy
    * authoritative parts. Kleinberg's normalization is L2 (needs a
    * sqrt), so this uses max-normalization instead: after every
    * half-step each side rescales to 10⁶·score DIV max(score) — a
    * monotone transform of the same fixpoint, and exact BIGINT, so the
    * distributed sums stay order-independent (the [[qPagerank]]
    * discipline). Headroom: a node's raw score is ≤ 10⁶·degree, so the
    * 10⁶·score rescale numerator stays under 2⁶³ through ~9·10⁶
    * neighbors per node; past that the rescale moves to DECIMAL(38,0),
    * same plan. Per iteration: one arcs⋈scores shuffle + a scalar
    * max broadcast per side — no all-pairs anything. Unlike the
    * many-round pagerank/ppr loops, the 2 fixed iterations keep
    * lineage shallow, so the half-steps are NOT eagerly
    * localCheckpointed — the 4 extra materialization jobs cost more
    * than the recomputation they avoid (measured ~20% of the key's
    * warm time at sf0.1). The arcs subtree is deliberately NOT
    * persisted either: with no eager action inside the loop a persist
    * here never materializes before the single final action, and the
    * four identical `distinct` subtrees end in identical Exchanges
    * that Spark's ReuseExchange rule dedupes inside the one plan — the
    * shuffle is paid once without any storage-block bookkeeping.
    */
  private val qHits: Q = (s, d) => {
    val arcs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    var hub = arcs.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to 2) {
      val araw = arcs.join(hub, "c")
        .groupBy("p").agg(sum("h").as("raw"))
      val amax = araw.agg(max("raw").as("mx"))
      auth = araw.crossJoin(broadcast(amax))
        .select(col("p"), expr("1000000 * raw DIV mx").as("a"))
        
      val hraw = arcs.join(auth, "p")
        .groupBy("c").agg(sum("a").as("raw"))
      val hmax = hraw.agg(max("raw").as("mx"))
      hub = hraw.crossJoin(broadcast(hmax))
        .select(col("c"), expr("1000000 * raw DIV mx").as("h"))
        
    }
    auth.select(col("p").as("part"), col("a").as("auth_e6"))
      .orderBy("part")
  }

  /** Min-label propagation (3 synchronous iterations) over the
    * co-purchase graph — the cheap community/component sketch: every
    * node starts labeled with its own id and each round adopts the
    * minimum label in its closed neighborhood. Synchronous min-updates
    * are confluent (min is idempotent/commutative/associative), so the
    * state after a FIXED number of rounds is bit-deterministic
    * regardless of partitioning — what makes a 3-round prefix of the
    * components fixpoint a legal oracled key, and exactly the
    * hash-to-min exchange step inside the dedup star-contraction CC
    * ([[graft.ops.Dedup]]), exposed as its own operator. Per round:
    * one arcs⋈labels shuffle + a min-agg; the label table is
    * localCheckpointed so lineage stays flat. Output is the
    * CONVERGENCE TRAJECTORY — per round, the surviving label count and
    * the largest community — because the co-purchase graph's hub
    * structure collapses to one component by round 2 (measured: 95
    * labels after round 1 at sf0.01, 1 after round 2): the trajectory
    * pins every round's full label state in the hash where the final
    * histogram alone would freeze a single degenerate row.
    */
  private val qLabelProp: Q = (s, d) => {
    val und = coPurchaseEdges(s, d)
    // hash-laid-out by src once — see qGraphBfs (r16); the label table
    // arrives at each round's join already partitioned the same way
    // (distinct on src ≡ hash by src, alias-preserved through n)
    val arcs = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = arcs.select(col("src").as("n")).distinct()
      .select(col("n"), col("n").as("l")).localCheckpoint(true)
    var out: DataFrame = null
    for (r <- 1 to 3) {
      val nbrMin = arcs
        .join(lab.select(col("n").as("src"), col("l")), "src")
        .groupBy(col("dst").as("n")).agg(min("l").as("nl"))
      lab = lab.join(nbrMin, Seq("n"), "left")
        .select(col("n"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"))
        .localCheckpoint(true)
      val stats = lab.groupBy("l").agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("n_labels"), max("m").as("max_members"))
        .select(lit(r.toLong).as("round"), col("n_labels"),
          col("max_members"))
      out = if (out == null) stats else out.unionAll(stats)
    }
    arcs.unpersist()
    out.orderBy("round")
  }

  val registry: Map[String, Q] = Map(
    "q_hits" -> qHits,
    "q_label_prop" -> qLabelProp,
    "q_triangles" -> qTriangles,
    "q_degree_dist" -> qDegreeDist,
    "q_kcore" -> qKcore,
    "q_assortativity" -> qAssortativity,
    "q_clustering_coeff" -> qClusteringCoeff,
    "q_common_neighbors" -> qCommonNeighbors,
    "q_jaccard_neighbors" -> qJaccardNeighbors,
    "q_adamic_adar" -> qAdamicAdar,
    "q_pagerank" -> qPagerank,
    "q_ppr" -> qPpr,
    "q_conductance" -> qConductance,
    "q_assoc_rules" -> qAssocRules,
    "q_graph_bfs" -> qGraphBfs,
  )

  val oracle: Map[String, String] = Map(
    "q_hits" ->
      """WITH arcs AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM arcs),
        |a1r AS (SELECT p, CAST(sum(h) AS BIGINT) AS raw
        |  FROM arcs JOIN h0 USING (c) GROUP BY p),
        |a1m AS (SELECT CAST(max(raw) AS BIGINT) AS mx FROM a1r),
        |a1 AS (SELECT p, CAST(1000000 * raw // mx AS BIGINT) AS a
        |  FROM a1r CROSS JOIN a1m),
        |h1r AS (SELECT c, CAST(sum(a) AS BIGINT) AS raw
        |  FROM arcs JOIN a1 USING (p) GROUP BY c),
        |h1m AS (SELECT CAST(max(raw) AS BIGINT) AS mx FROM h1r),
        |h1 AS (SELECT c, CAST(1000000 * raw // mx AS BIGINT) AS h
        |  FROM h1r CROSS JOIN h1m),
        |a2r AS (SELECT p, CAST(sum(h) AS BIGINT) AS raw
        |  FROM arcs JOIN h1 USING (c) GROUP BY p),
        |a2m AS (SELECT CAST(max(raw) AS BIGINT) AS mx FROM a2r),
        |a2 AS (SELECT p, CAST(1000000 * raw // mx AS BIGINT) AS a
        |  FROM a2r CROSS JOIN a2m)
        |SELECT p AS part, a AS auth_e6 FROM a2 ORDER BY part""".stripMargin,
    "q_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS u, b.p AS v
        |        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM und
        |         UNION ALL SELECT v, u FROM und),
        |nd AS (SELECT DISTINCT src AS n FROM arcs),
        |l0 AS (SELECT n, n AS l FROM nd),
        |m1 AS (SELECT a.dst AS n, min(l0.l) AS nl
        |  FROM arcs a JOIN l0 ON a.src = l0.n GROUP BY 1),
        |l1 AS (SELECT l0.n, least(l0.l, coalesce(m1.nl, l0.l)) AS l
        |  FROM l0 LEFT JOIN m1 ON m1.n = l0.n),
        |m2 AS (SELECT a.dst AS n, min(l1.l) AS nl
        |  FROM arcs a JOIN l1 ON a.src = l1.n GROUP BY 1),
        |l2 AS (SELECT l1.n, least(l1.l, coalesce(m2.nl, l1.l)) AS l
        |  FROM l1 LEFT JOIN m2 ON m2.n = l1.n),
        |m3 AS (SELECT a.dst AS n, min(l2.l) AS nl
        |  FROM arcs a JOIN l2 ON a.src = l2.n GROUP BY 1),
        |l3 AS (SELECT l2.n, least(l2.l, coalesce(m3.nl, l2.l)) AS l
        |  FROM l2 LEFT JOIN m3 ON m3.n = l2.n),
        |h1 AS (SELECT l, count(*) AS m FROM l1 GROUP BY 1),
        |h2 AS (SELECT l, count(*) AS m FROM l2 GROUP BY 1),
        |h3 AS (SELECT l, count(*) AS m FROM l3 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS round,
        |  CAST(count(*) AS BIGINT) AS n_labels,
        |  CAST(max(m) AS BIGINT) AS max_members FROM h1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(max(m) AS BIGINT) FROM h2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(max(m) AS BIGINT) FROM h3
        |ORDER BY round""".stripMargin,
    "q_graph_bfs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS u, b.p AS v
        |        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM und
        |         UNION ALL SELECT v, u FROM und),
        |nd AS (SELECT DISTINCT src AS n FROM arcs),
        |d0 AS (SELECT n, CAST(0 AS BIGINT) AS d FROM nd WHERE n % 97 = 0),
        |d1 AS (SELECT n, min(d) AS d FROM (
        |         SELECT n, d FROM d0
        |         UNION ALL
        |         SELECT a.dst, d0.d + 1 FROM arcs a JOIN d0 ON a.src = d0.n) x
        |       GROUP BY n),
        |d2 AS (SELECT n, min(d) AS d FROM (
        |         SELECT n, d FROM d1
        |         UNION ALL
        |         SELECT a.dst, d1.d + 1 FROM arcs a JOIN d1 ON a.src = d1.n) x
        |       GROUP BY n),
        |d3 AS (SELECT n, min(d) AS d FROM (
        |         SELECT n, d FROM d2
        |         UNION ALL
        |         SELECT a.dst, d2.d + 1 FROM arcs a JOIN d2 ON a.src = d2.n) x
        |       GROUP BY n),
        |d4 AS (SELECT n, min(d) AS d FROM (
        |         SELECT n, d FROM d3
        |         UNION ALL
        |         SELECT a.dst, d3.d + 1 FROM arcs a JOIN d3 ON a.src = d3.n) x
        |       GROUP BY n)
        |SELECT n AS part, CAST(d AS BIGINT) AS hops FROM d4 ORDER BY part""".stripMargin,
    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |bk AS (SELECT count(DISTINCT o) AS baskets FROM li),
        |it AS (SELECT p, count(*) AS item_n FROM li GROUP BY p),
        |pr AS (SELECT a.p AS p_a, b.p AS p_b, count(*) AS pair_n
        |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |       GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p_a, p_b, CAST(pair_n AS BIGINT) AS pair_n,
        |  CAST(ia.item_n AS BIGINT) AS n_a, CAST(ib.item_n AS BIGINT) AS n_b,
        |  CAST(1000000 * pair_n // ia.item_n AS BIGINT) AS conf_ab_e6,
        |  CAST(1000000 * pair_n // ib.item_n AS BIGINT) AS conf_ba_e6,
        |  CAST((1000000 * pair_n // ia.item_n) * baskets // ib.item_n AS BIGINT)
        |    AS lift_e6
        |FROM pr
        |JOIN it ia ON ia.p = pr.p_a
        |JOIN it ib ON ib.p = pr.p_b
        |CROSS JOIN bk
        |ORDER BY p_a, p_b""".stripMargin,
    // Id-ordered enumeration: same triangle set as the degree-oriented
    // Spark plan (orientation changes the join shape, not the result).
    "q_common_neighbors" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM e
        |         UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1),
        |mid AS (SELECT a1.src AS f, a2.dst AS cand
        |        FROM arcs a1 JOIN deg ON deg.src = a1.dst
        |        JOIN arcs a2 ON a2.src = a1.dst
        |        WHERE a1.src < 100 AND dg <= 10000 AND a2.dst <> a1.src),
        |cn AS (SELECT f, cand, count(*) AS n_common FROM mid GROUP BY 1, 2),
        |nonadj AS (SELECT f, cand, n_common FROM cn
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE u = least(f, cand) AND v = greatest(f, cand))),
        |r AS (SELECT f, cand, CAST(n_common AS BIGINT) AS n_common,
        |    CAST(row_number() OVER (PARTITION BY f
        |      ORDER BY n_common DESC, cand ASC) AS INTEGER) AS rnk
        |  FROM nonadj)
        |SELECT f, cand, n_common, rnk FROM r WHERE rnk <= 5
        |ORDER BY f, rnk""".stripMargin,
    "q_jaccard_neighbors" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM e
        |         UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1),
        |mid AS (SELECT a1.src AS f, a2.dst AS cand
        |        FROM arcs a1 JOIN deg ON deg.src = a1.dst
        |        JOIN arcs a2 ON a2.src = a1.dst
        |        WHERE a1.src < 100 AND dg <= 10000 AND a2.dst <> a1.src),
        |cn AS (SELECT f, cand, count(*) AS n_common FROM mid GROUP BY 1, 2),
        |nonadj AS (SELECT f, cand, n_common FROM cn
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE u = least(f, cand) AND v = greatest(f, cand))),
        |j AS (SELECT f, cand, CAST(n_common AS BIGINT) AS n_common,
        |    CAST(df.dg AS BIGINT) AS deg_f, CAST(dc.dg AS BIGINT) AS deg_cand,
        |    CAST(1000000 * n_common // (df.dg + dc.dg - n_common) AS BIGINT)
        |      AS jaccard_ppm
        |  FROM nonadj JOIN deg df ON df.src = f
        |    JOIN deg dc ON dc.src = cand),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY f
        |      ORDER BY jaccard_ppm DESC, cand ASC) AS INTEGER) AS rnk
        |  FROM j)
        |SELECT f, cand, n_common, deg_f, deg_cand, jaccard_ppm, rnk
        |FROM r WHERE rnk <= 5 ORDER BY f, rnk""".stripMargin,
    "q_adamic_adar" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM e
        |         UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1),
        |mid AS (SELECT a1.src AS f, a2.dst AS cand,
        |        CAST(floor(1000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)
        |          AS w_e6
        |        FROM arcs a1 JOIN deg ON deg.src = a1.dst
        |        JOIN arcs a2 ON a2.src = a1.dst
        |        WHERE a1.src < 100 AND dg <= 10000 AND a2.dst <> a1.src),
        |aa AS (SELECT f, cand, CAST(count(*) AS BIGINT) AS n_common,
        |    CAST(sum(w_e6) AS BIGINT) AS aa_e6
        |  FROM mid GROUP BY 1, 2),
        |nonadj AS (SELECT f, cand, n_common, aa_e6 FROM aa
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE u = least(f, cand) AND v = greatest(f, cand))),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY f
        |      ORDER BY aa_e6 DESC, cand ASC) AS INTEGER) AS rnk
        |  FROM nonadj)
        |SELECT f, cand, n_common, aa_e6, rnk
        |FROM r WHERE rnk <= 5 ORDER BY f, rnk""".stripMargin,
    "q_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src FROM e UNION ALL SELECT v FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1),
        |j AS (SELECT du.dg AS du, dv.dg AS dv FROM e
        |  JOIN deg du ON du.src = e.u JOIN deg dv ON dv.src = e.v),
        |m AS (SELECT CAST(2 * count(*) AS BIGINT) AS s1,
        |    CAST(sum(du + dv) AS BIGINT) AS sx,
        |    CAST(sum(du * du + dv * dv) AS BIGINT) AS sxx,
        |    CAST(2 * sum(du * dv) AS BIGINT) AS sxy FROM j)
        |SELECT s1,
        |  CASE WHEN CAST(s1 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
        |    THEN 0
        |    ELSE CAST(floor(1000000.0 *
        |      CAST(CAST(s1 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx
        |        AS DOUBLE) /
        |      CAST(CAST(s1 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |        AS DOUBLE)) AS BIGINT) END AS r_e6
        |FROM m ORDER BY s1""".stripMargin,
    "q_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |d0 AS (SELECT src, count(*) AS dg FROM
        |    (SELECT u AS src FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |k0 AS (SELECT src FROM d0 WHERE dg >= 2),
        |e1 AS (SELECT u, v FROM e0
        |  WHERE u IN (SELECT src FROM k0) AND v IN (SELECT src FROM k0)),
        |d1 AS (SELECT src, count(*) AS dg FROM
        |    (SELECT u AS src FROM e1 UNION ALL SELECT v FROM e1)
        |  GROUP BY 1),
        |k1 AS (SELECT src FROM d1 WHERE dg >= 2),
        |e2 AS (SELECT u, v FROM e1
        |  WHERE u IN (SELECT src FROM k1) AND v IN (SELECT src FROM k1)),
        |d2 AS (SELECT src, count(*) AS dg FROM
        |    (SELECT u AS src FROM e2 UNION ALL SELECT v FROM e2)
        |  GROUP BY 1),
        |k2 AS (SELECT src FROM d2 WHERE dg >= 2),
        |e3 AS (SELECT u, v FROM e2
        |  WHERE u IN (SELECT src FROM k2) AND v IN (SELECT src FROM k2))
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS dg FROM
        |  (SELECT u AS src FROM e3 UNION ALL SELECT v FROM e3)
        |GROUP BY 1 ORDER BY node""".stripMargin,
    "q_degree_dist" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src FROM e UNION ALL SELECT v FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1)
        |SELECT CAST(dg AS BIGINT) AS dg, count(*) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY dg""".stripMargin,
    "q_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |      FROM e e1
        |      JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |tc AS (SELECT count(*) AS tri FROM t),
        |arcs AS (SELECT u AS src FROM e UNION ALL SELECT v FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY 1),
        |wd AS (SELECT CAST(coalesce(sum(dg * (dg - 1) // 2), 0) AS BIGINT)
        |         AS n_wedges
        |       FROM deg)
        |SELECT CAST(tri AS BIGINT) AS n_tri, n_wedges,
        |  CAST(CASE WHEN n_wedges > 0 THEN 1000000 * 3 * tri // n_wedges
        |       ELSE 0 END AS BIGINT) AS coeff_ppm
        |FROM tc CROSS JOIN wd ORDER BY n_tri""".stripMargin,
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |      FROM e e1
        |      JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS part FROM t
        |  UNION ALL SELECT y FROM t
        |  UNION ALL SELECT z FROM t)
        |GROUP BY part ORDER BY part""".stripMargin,
    "q_pagerank" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS u, b.p AS v
        |        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM und
        |         UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY src),
        |r0 AS (SELECT src AS n, CAST(1000000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r0 ON r0.n = arcs.src
        |       GROUP BY dst),
        |r1 AS (SELECT deg.src AS n,
        |         CAST(150000000 + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c1 ON c1.n = deg.src),
        |c2 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r1 ON r1.n = arcs.src
        |       GROUP BY dst),
        |r2 AS (SELECT deg.src AS n,
        |         CAST(150000000 + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c2 ON c2.n = deg.src),
        |c3 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r2 ON r2.n = arcs.src
        |       GROUP BY dst),
        |r3 AS (SELECT deg.src AS n,
        |         CAST(150000000 + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c3 ON c3.n = deg.src)
        |SELECT n AS part, r AS rank_e9 FROM r3 ORDER BY part""".stripMargin,
    "q_ppr" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS u, b.p AS v
        |        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM und
        |         UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY src),
        |r0 AS (SELECT src AS n,
        |         CAST(CASE WHEN src % 97 = 0 THEN 1000000000 ELSE 0 END
        |           AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r0 ON r0.n = arcs.src
        |       GROUP BY dst),
        |r1 AS (SELECT deg.src AS n,
        |         CAST(CASE WHEN deg.src % 97 = 0 THEN 150000000 ELSE 0 END
        |           + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c1 ON c1.n = deg.src),
        |c2 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r1 ON r1.n = arcs.src
        |       GROUP BY dst),
        |r2 AS (SELECT deg.src AS n,
        |         CAST(CASE WHEN deg.src % 97 = 0 THEN 150000000 ELSE 0 END
        |           + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c2 ON c2.n = deg.src),
        |c3 AS (SELECT dst AS n, sum(r // dg) AS sc
        |       FROM arcs JOIN deg USING (src) JOIN r2 ON r2.n = arcs.src
        |       GROUP BY dst),
        |r3 AS (SELECT deg.src AS n,
        |         CAST(CASE WHEN deg.src % 97 = 0 THEN 150000000 ELSE 0 END
        |           + 85 * (coalesce(sc, 0) // 100)
        |           + 85 * (coalesce(sc, 0) % 100) // 100 AS BIGINT) AS r
        |       FROM deg LEFT JOIN c3 ON c3.n = deg.src)
        |SELECT n AS part, r AS rank_e9 FROM r3 WHERE r > 0
        |ORDER BY r DESC, n ASC LIMIT 25""".stripMargin,
    "q_conductance" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS u, b.p AS v
        |        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |arcs AS (SELECT u AS src, v AS dst FROM und
        |         UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT src, count(*) AS dg FROM arcs GROUP BY src),
        |vol AS (SELECT CAST(sum(CASE WHEN src % 97 = 0 THEN dg ELSE 0 END)
        |          AS BIGINT) AS vol_s,
        |        CAST(sum(dg) AS BIGINT) AS vol_all FROM deg),
        |cut AS (SELECT CAST(sum(CASE WHEN (u % 97 = 0) <> (v % 97 = 0)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges,
        |        CAST(count(*) AS BIGINT) AS n_edges FROM und),
        |j AS (SELECT * FROM cut CROSS JOIN vol
        |      WHERE vol_s > 0 AND vol_all - vol_s > 0)
        |SELECT n_edges, cut_edges, vol_s,
        |  CAST(vol_all - vol_s AS BIGINT) AS vol_rest,
        |  CAST(1000000 * cut_edges // least(vol_s, vol_all - vol_s)
        |    AS BIGINT) AS conductance_ppm
        |FROM j ORDER BY n_edges""".stripMargin,
  )
}
