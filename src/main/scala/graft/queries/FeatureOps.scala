package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Feature-engineering surface for ML training pipelines: deterministic
  * train/test splits and fold assignment, categorical one-hot encoding,
  * per-group min-max scaling, global quantile normalization, and the
  * hashing trick — the transforms between a curated corpus and a model
  * trainer.
  *
  * Determinism posture: every assignment is a content-derived md5-bucket
  * draw (the `q_sample_split`/`q_ab_srm` discipline — no RNG state, no
  * row order dependence, reproducible cross-engine); every scale/share
  * is exact integer arithmetic (ppm via `DIV`). Scale posture: all keys
  * are one partial-agg shuffle or a map-side transform; the only global
  * rank rides [[graft.ops.Ranks.globalRowNumber]] (range-partitioned,
  * never a single-partition window).
  */
object FeatureOps {
  private type Q = (SparkSession, String) => DataFrame

  /** md5-bucket of the customer key into [0, m) — content-derived,
    * engine-portable assignment (first 8 hex chars → BIGINT → mod).
    */
  private def bucket(m: Int) =
    pmod(conv(substring(md5(col("c_custkey").cast("string")), 1, 8),
      16, 10).cast("long"), lit(m.toLong))

  /** Stratified 80/20 train/test split audit: per (segment, split)
    * member counts plus each split's share of its segment in exact ppm
    * — the balance sheet a training job logs before fitting (a skewed
    * stratum means the hash, not the data, needs investigating).
    * Assignment is the md5 decile rule (buckets 0-7 → train). One
    * partial-agg shuffle into 10 groups + a 5-row broadcast back.
    */
  private val qStratifiedSplit: Q = (s, d) => {
    val g = Tables.customer(s, d)
      .select(col("c_mktsegment").as("seg"),
        when(bucket(10) < 8L, "train").otherwise("test").as("split"))
      .groupBy("seg", "split").agg(count(lit(1)).as("n"))
    val tot = g.groupBy("seg").agg(sum("n").as("seg_n"))
    g.join(broadcast(tot), "seg")
      .select(col("seg"), col("split"), col("n"), col("seg_n"),
        expr("1000000 * n DIV seg_n").as("share_ppm"))
      .orderBy("seg", "split")
  }

  /** 5-fold cross-validation assignment audit: per (fold, segment)
    * counts and the fold's within-segment share in ppm — the class-
    * balance check that catches a bad hash before 5 models train on it.
    * Same md5 discipline, mod 5. One shuffle into 25 groups.
    */
  private val qKfoldAssign: Q = (s, d) => {
    val g = Tables.customer(s, d)
      .select(col("c_mktsegment").as("seg"), bucket(5).as("fold"))
      .groupBy("fold", "seg").agg(count(lit(1)).as("n"))
    val tot = g.groupBy("seg").agg(sum("n").as("seg_n"))
    g.join(broadcast(tot), "seg")
      .select(col("fold"), col("seg"), col("n"), col("seg_n"),
        expr("1000000 * n DIV seg_n").as("share_ppm"))
      .orderBy("fold", "seg")
  }

  /** One-hot encoding of the customer market segment: five 0/1
    * indicator columns per customer — the dense categorical encoding a
    * linear model consumes (the learned-vocabulary form is
    * `q_string_index`; this is the fixed-vocabulary one). Pure map-side
    * column expressions, no shuffle at all beyond the output sort.
    */
  private val qOnehot: Q = (s, d) => {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    Tables.customer(s, d)
      .select(col("c_custkey") +: segs.map(g =>
        (col("c_mktsegment") === g).cast("int")
          .as("is_" + g.toLowerCase)): _*)
      .orderBy("c_custkey")
  }

  /** Per-segment min-max scaling of the account balance to [0, 10⁶]:
    * scaled = 10⁶·(x−min) DIV (max−min) over exact cents — PURE integer
    * end-to-end (the float (x−min)/(max−min) form would need the
    * mirrored-sequence treatment; the integer form needs nothing).
    * Degenerate constant segments emit 0 on both engines. One 5-row
    * aggregate broadcast back over the map-side scan.
    */
  private val qMinmaxScale: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100.0).cast("long").as("cents"))
    val mm = c.groupBy("seg")
      .agg(min("cents").as("mn"), max("cents").as("mx"))
    c.join(broadcast(mm), "seg")
      .select(col("c_custkey"), col("seg"), col("cents"),
        when(col("mx") > col("mn"),
          expr("1000000 * (cents - mn) DIV (mx - mn)"))
          .otherwise(0L).as("scaled_e6"))
      .orderBy("c_custkey")
  }

  /** Global quantile normalization of account balance: each customer's
    * balance replaced by its empirical quantile 10⁶·(rank−1) DIV (n−1)
    * — the rank-transform that makes any two features comparable
    * regardless of their marginal distributions. The total order rides
    * the distributed range-partitioned rank (ties broken on the key —
    * the `q_spearman` documented deviation from average-rank ties);
    * n arrives as a scalar broadcast.
    */
  private val qQuantileNormalize: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100.0).cast("long").as("cents"))
    val ranked = graft.ops.Ranks.globalRowNumber(c,
      Seq(col("cents").asc, col("c_custkey").asc), "rnk")
    val tot = c.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("n") > 1L)
      .select(col("c_custkey"), col("cents"),
        expr("1000000 * (CAST(rnk AS BIGINT) - 1) DIV (n - 1)")
          .as("qnorm_ppm"))
      .orderBy("c_custkey")
  }

  /** Hashing-trick audit over the document corpus: every whitespace
    * token md5-hashed into 64 feature buckets; per bucket the token
    * mass, the distinct-term count (collision pressure), and the load
    * relative to the uniform expectation in ppm — the table that tells
    * you whether D=64 is too small before a model trains on crossed
    * features. One explode + one partial-agg shuffle into 64 groups;
    * the distinct-term count is the only two-phase aggregate.
    */
  private val qFeatureHash: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val g = toks
      .select(pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10)
        .cast("long"), lit(64L)).as("bucket"), col("tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_terms"))
    val tot = g.agg(sum("n_tokens").as("total"))
    g.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_tokens"), col("n_terms"),
        expr("1000000 * n_tokens * 64 DIV total").as("load_ppm"))
      .orderBy("bucket")
  }

  /** Rare-category collapse: part brands below a 2% corpus share fold
    * into OTHER — the cardinality-control transform applied before
    * one-hot/target encoding (a long category tail becomes one bucket
    * instead of thousands of near-empty columns). Emits the encoding
    * table: original brand → encoded label with counts and exact ppm
    * share; the share threshold is integer arithmetic (n·50 < total ⟺
    * share < 2%). One partial-agg shuffle + a scalar broadcast.
    */
  private val qRareCollapse: Q = (s, d) => {
    val g = Tables.part(s, d).groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"))
    val tot = g.agg(sum("n").as("total"))
    g.crossJoin(broadcast(tot))
      .select(col("brand"),
        when(col("n") * 50L < col("total"), "OTHER").otherwise(col("brand"))
          .as("encoded"),
        col("n"), expr("1000000 * n DIV total").as("share_ppm"))
      .orderBy("brand")
  }

  /** Neyman optimal sampling allocation: split a 10,000-row labeling/
    * eval budget across customer segments ∝ N_h·σ_h — the design that
    * minimizes the stratified estimator's variance (big AND noisy
    * strata get the samples; `q_stratified_split` allocates
    * proportionally, ignoring σ). With full-population strata,
    * N_h·σ_h = √(N_h·Σx² − (Σx)²) from exact moments (DECIMAL(38,0)
    * cross products — n·Σx² overflows BIGINT at this price range); the
    * weight is floored to an INTEGER per stratum BEFORE the cross-
    * stratum sum, so the allocation denominator is order-independent
    * (the per-term-floor discipline), and the allocation itself is
    * pure integer DIV. Σalloc ≤ budget by construction.
    */
  private val qNeymanAlloc: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"), round(col("o_totalprice")).cast("long").as("x"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_h"), sum("x").as("sx"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"))
      .select(col("seg"), col("n_h"),
        (dec(col("n_h")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
          .as("v"))
      .filter(col("v") > 0)
      .select(col("seg"), col("n_h"),
        floor(sqrt(col("v").cast("double"))).cast("long").as("neyman_w"))
    val tot = m.agg(sum("neyman_w").as("wtot"))
    m.crossJoin(broadcast(tot))
      .select(col("seg"), col("n_h"), col("neyman_w"),
        expr("10000 * neyman_w DIV wtot").as("alloc"))
      .orderBy("seg")
  }

  val registry: Map[String, Q] = Map(
    "q_neyman_alloc" -> qNeymanAlloc,
    "q_rare_collapse" -> qRareCollapse,
    "q_stratified_split" -> qStratifiedSplit,
    "q_kfold_assign" -> qKfoldAssign,
    "q_onehot" -> qOnehot,
    "q_minmax_scale" -> qMinmaxScale,
    "q_quantile_normalize" -> qQuantileNormalize,
    "q_feature_hash" -> qFeatureHash,
  )

  val oracle: Map[String, String] = Map(
    "q_neyman_alloc" ->
      """WITH m AS (SELECT c_mktsegment AS seg, count(*) AS n_h,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM (SELECT c_mktsegment,
        |      CAST(round(o_totalprice) AS BIGINT) AS x
        |    FROM orders JOIN customer ON o_custkey = c_custkey)
        |  GROUP BY 1),
        |v AS (SELECT seg, n_h,
        |    CAST(n_h AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS v
        |  FROM m),
        |w AS (SELECT seg, CAST(n_h AS BIGINT) AS n_h,
        |    CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS neyman_w
        |  FROM v WHERE v > 0),
        |t AS (SELECT CAST(sum(neyman_w) AS BIGINT) AS wtot FROM w)
        |SELECT seg, n_h, neyman_w,
        |  CAST(10000 * neyman_w // wtot AS BIGINT) AS alloc
        |FROM w CROSS JOIN t ORDER BY seg""".stripMargin,
    "q_rare_collapse" ->
      """WITH g AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT brand,
        |  CASE WHEN n * 50 < total THEN 'OTHER' ELSE brand END AS encoded,
        |  n, CAST(1000000 * n // total AS BIGINT) AS share_ppm
        |FROM g CROSS JOIN t ORDER BY brand""".stripMargin,
    "q_stratified_split" ->
      """WITH a AS (SELECT c_mktsegment AS seg,
        |    CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
        |      ::BIGINT % 10 < 8 THEN 'train' ELSE 'test' END AS split
        |  FROM customer),
        |g AS (SELECT seg, split, CAST(count(*) AS BIGINT) AS n
        |  FROM a GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(sum(n) AS BIGINT) AS seg_n FROM g GROUP BY 1)
        |SELECT seg, split, n, seg_n,
        |  CAST(1000000 * n // seg_n AS BIGINT) AS share_ppm
        |FROM g JOIN t USING (seg) ORDER BY seg, split""".stripMargin,
    "q_kfold_assign" ->
      """WITH a AS (SELECT c_mktsegment AS seg,
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |      % 5 AS fold
        |  FROM customer),
        |g AS (SELECT fold, seg, CAST(count(*) AS BIGINT) AS n
        |  FROM a GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(sum(n) AS BIGINT) AS seg_n FROM g GROUP BY 1)
        |SELECT fold, seg, n, seg_n,
        |  CAST(1000000 * n // seg_n AS BIGINT) AS share_ppm
        |FROM g JOIN t USING (seg) ORDER BY fold, seg""".stripMargin,
    "q_onehot" ->
      """SELECT c_custkey,
        |  CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS is_automobile,
        |  CAST(c_mktsegment = 'BUILDING' AS INT) AS is_building,
        |  CAST(c_mktsegment = 'FURNITURE' AS INT) AS is_furniture,
        |  CAST(c_mktsegment = 'HOUSEHOLD' AS INT) AS is_household,
        |  CAST(c_mktsegment = 'MACHINERY' AS INT) AS is_machinery
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_minmax_scale" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
        |  FROM customer),
        |mm AS (SELECT seg, CAST(min(cents) AS BIGINT) AS mn,
        |    CAST(max(cents) AS BIGINT) AS mx
        |  FROM c GROUP BY 1)
        |SELECT c_custkey, seg, cents,
        |  CAST(CASE WHEN mx > mn THEN 1000000 * (cents - mn) // (mx - mn)
        |    ELSE 0 END AS BIGINT) AS scaled_e6
        |FROM c JOIN mm USING (seg) ORDER BY c_custkey""".stripMargin,
    "q_quantile_normalize" ->
      """WITH c AS (SELECT c_custkey,
        |    CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
        |  FROM customer),
        |r AS (SELECT c_custkey, cents,
        |    CAST(row_number() OVER (ORDER BY cents ASC, c_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM c),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
        |SELECT c_custkey, cents,
        |  CAST(1000000 * (rnk - 1) // (n - 1) AS BIGINT) AS qnorm_ppm
        |FROM r CROSS JOIN t WHERE n > 1 ORDER BY c_custkey""".stripMargin,
    "q_feature_hash" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT tok,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM toks WHERE tok <> ''),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
        |  FROM f GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM g)
        |SELECT bucket, n_tokens, n_terms,
        |  CAST(1000000 * n_tokens * 64 // total AS BIGINT) AS load_ppm
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
  )
}
