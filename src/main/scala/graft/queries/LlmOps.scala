package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.{Dedup, Similarity, TextStats}

/** LLM-training-data pipeline operators (brief: dedup, similarity search,
  * text analysis) as oracled queries over `documents`/`embeddings`.
  *
  * Oracle-parity notes: every float exported as integer millionths
  * (`floor(x*1e6)`); md5 is the only hash used where DuckDB must mirror
  * the computation (simhash oracle SQL is generated from the same loop
  * as the Spark plan); thresholds are calibrated against the corpus so
  * LSH recall is exact at sf0.01/sf0.1 (near-dup pairs sit at J≥0.85,
  * far from the 0.5 threshold: collision prob 1-(1-J²)^32 > 1-1e-18,
  * and ≈0.9999 even for a borderline pair at exactly J=0.5).
  */
object LlmOps {
  private type Q = (SparkSession, String) => DataFrame

  private val qDedupExact: Q = (s, d) =>
    Dedup.exactDedup(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** 32 hashes × 2 rows/band = 16 bands: candidate-recall at the J=0.5
    * threshold is 1-(1-0.25)^16 ≈ 0.99 and ≈1 at the J ≥ 0.8 the corpus
    * actually contains; TimeStages' recall audit shows 0 pairs missed vs
    * the exact PPJoin ground truth. 64 hashes doubled the banded explode
    * + candidate shuffle for no recall gain.
    */
  private val qDedupMinhash: Q = (s, d) =>
    Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 32, rowsPerBand = 2, shingleSize = 3, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Near-dup pairs → duplicate clusters: every document mapped to the
    * canonical (minimum) doc_id of its connected component; docs in no
    * pair are their own canonical. This is the keep/drop decision a
    * dedup pipeline actually executes.
    */
  /** Cluster assignment shared by q_dedup_clusters and
    * q_dedup_representatives: doc_id → canonical component id.
    *
    * The minhash-LSH + connected-components derivation is the expensive
    * part (the representative pick after it is one aggregate), so it
    * lands as a [[graft.ops.DurableTable]] — derive ONCE per (data
    * dir), write a versioned snapshot, serve every later cluster
    * consumer the read-back table. At 100 TB this is how a dedup
    * pipeline actually ships: the cluster map is a materialized asset
    * downstream keep/drop jobs join against, not something recomputed
    * per consumer; the scratch table stands in for that permanent
    * location.
    */
  private val clusterTable = new graft.ops.DurableTable("dedup_clusters")

  /** Cluster-table derivation counter, pinned run-once by LlmOpsSpec. */
  private[graft] val clusterDerivations = clusterTable.derivations

  /** Force the durable cluster-table build (and return its row count).
    * Bench times this as its own `_derive_dedup_clusters` entry so the
    * cluster consumers report steady-state read-through cost.
    */
  private[graft] def materializeClusters(s: SparkSession, d: String): Long =
    clusterAssign(s, d).count()

  private def clusterAssign(s: SparkSession, d: String): DataFrame =
    clusterTable(s, d) {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 32, rowsPerBand = 2, shingleSize = 3, threshold = 0.5)
      val comp = Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
    }

  private val qDedupClusters: Q = (s, d) =>
    clusterAssign(s, d).orderBy(col("doc_id"))

  /** The KEEP decision a dedup pipeline executes after clustering:
    * one representative per duplicate cluster — the longest member
    * (quality proxy; swap in any scored column), ties to the lowest
    * doc_id. One `max(struct(len, -doc_id))` aggregate per cluster —
    * max_by with a deterministic tie-break in a single shuffle, no
    * window, no per-cluster buffering; singleton docs are their own
    * representative, so `Σ n_members = corpus size` (the invariant a
    * keep-list must satisfy before the drop side ships).
    */
  private val qDedupRepresentatives: Q = (s, d) => {
    clusterAssign(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"),
        length(col("text")).cast("long").as("ln")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("ln"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), (-col("m.nid")).as("kept_doc_id"),
        col("m.ln").as("kept_len"), col("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** Duplicate-cluster size histogram — the dedup health readout (a
    * heavy tail means boilerplate floods; all-singletons means the
    * thresholds are dead). Rides the memoized durable cluster table,
    * so its cost is two tiny aggregates.
    */
  private val qClusterSizes: Q = (s, d) =>
    clusterAssign(s, d).groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("sz"))

  /** Near-duplicate rate per source — the per-feed dedup health
    * readout (one crawler feeding boilerplate shows up as a dup_ppm
    * outlier long before it floods the corpus). Docs count as
    * duplicates when their durable-cluster size exceeds 1, so the key
    * rides the memoized cluster table twice (assignment + size) plus
    * one doc_id-keyed join for the source column — steady-state cost
    * is two reads and two aggregates, no re-clustering.
    */
  private val qDupRateBySource: Q = (s, d) => {
    val sz = clusterAssign(s, d).groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"))
    clusterAssign(s, d)
      .join(sz, "cluster_id")
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("sz") > 1L).cast("long")).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        expr("1000000 * n_dup DIV n_docs").as("dup_ppm"))
      .orderBy("source")
  }

  /** Cross-source shingle overlap: for every source pair, the count of
    * shared distinct 3-shingles and the Jaccard of their shingle
    * vocabularies — the "are two feeds scraping the same sites"
    * contamination matrix. Shape is the inverted index: distinct
    * (source, shingle) postings self-joined on the shingle, so a
    * shingle in k sources fans to k(k−1)/2 pairs — bounded by
    * |sources|², NEVER document-pairs. At petabyte scale swap the
    * shingle strings for [[graft.ops.Dedup.shingleHashes]] 64-bit
    * postings (8 bytes/posting through the shuffle); strings here keep
    * the oracle exact. Per-source vocabulary sizes re-join as
    * broadcasts (one row per source).
    */
  private val qCrossSourceOverlap: Q = (s, d) => {
    val sh = Dedup.explodeShingles(
        Tables.documents(s, d).select(col("source"), col("text")),
        "source", "text", 3)
      .distinct()
    val per = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val a = sh.toDF("src_a", "shingle")
    val b = sh.toDF("src_b", "shingle_b")
    a.join(b, col("shingle") === col("shingle_b") &&
        col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
      .join(broadcast(per.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(per.toDF("src_b", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"),
        col("n_a"), col("n_b"),
        expr("1000000 * shared DIV (n_a + n_b - shared)").as("jaccard_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** Tokenizer fertility by language: whitespace tokens per UTF-8 byte
    * (ppm) and mean bytes per token — the compression-rate table that
    * decides how a token budget translates to storage per language
    * (CJK and agglutinative languages sit far from English). Map-side
    * arithmetic + one partial-agg shuffle into |languages| groups.
    * Headroom: 10⁶·Σtokens stays under 2⁶³ through ~9·10¹² corpus
    * tokens; past that promote to DECIMAL(38,0).
    */
  private val qTokenizerFertility: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        octet_length(col("text")).cast("long").as("bytes"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"),
        sum("bytes").as("bytes"))
      .select(col("lang"), col("n_docs"), col("tokens"), col("bytes"),
        expr("1000000 * tokens DIV bytes").as("fert_ppm"),
        expr("1000 * bytes DIV tokens").as("bytes_per_tok_e3"))
      .orderBy("lang")

  private val qDedupSimhash: Q = (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))

  private val qDedupNgram: Q = (s, d) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Detector-quality evaluation: the hamming≤3 SimHash pair set scored
    * against exact Jaccard≥0.5 ground truth — TP/FP/FN with precision/
    * recall in exact ppm. This is the readout a curation team checks
    * before swapping a cheap detector in for an expensive one (SimHash
    * is one map-side pass + a 64-bit key join; the exact PPJoin truth
    * costs an inverted index). Both operands are the registry's own
    * `q_dedup_simhash`/`q_dedup_ngram` pipelines, already mirrored
    * bit-for-bit in DuckDB, so even the confusion counts hash-match.
    * The pair-level full join is bounded by the two pair sets, never
    * the corpus².
    */
  private val qDedupEval: Q = (s, d) => {
    val truth = Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
        "text", shingleSize = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val pred = Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("p"))
    truth.join(pred, Seq("doc_a", "doc_b"), "full")
      .agg(
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("p"), lit(0L))).as("tp"),
        sum((lit(1L) - coalesce(col("t"), lit(0L))) *
          coalesce(col("p"), lit(0L))).as("fp"),
        sum(coalesce(col("t"), lit(0L)) *
          (lit(1L) - coalesce(col("p"), lit(0L)))).as("fn"))
      .filter(col("tp") + col("fp") > 0L && col("tp") + col("fn") > 0L)
      .select(col("tp"), col("fp"), col("fn"),
        expr("1000000 * tp DIV (tp + fp)").as("precision_ppm"),
        expr("1000000 * tp DIV (tp + fn)").as("recall_ppm"))
      .orderBy("tp")
  }

  /** Dataset card: the one-row corpus datasheet every data release
    * ships — size, language/source breadth, token mass, the exact
    * median document length, and the exact-duplicate rate. Composes the
    * registry's own primitives (digest groupBy for dups, distributed
    * rank for the median) into the summary a consumer reads FIRST;
    * every figure is exact integer so the card is reproducible
    * bit-for-bit. Three partial-agg shuffles + one rank pass,
    * broadcast-joined into a single row.
    */
  private val qDatasetCard: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        md5(col("text")).as("dg"))
    val base = t.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum("n_chars").as("total_chars"),
      sum("toks").as("total_tokens"))
    val ranked = graft.ops.Ranks.globalRowNumber(
      t.select(col("doc_id"), col("toks")),
      Seq(col("toks").asc, col("doc_id").asc), "rnk")
    val med = ranked.crossJoin(broadcast(base.select(col("n_docs"))))
      .filter(col("rnk") === expr("(n_docs + 1) DIV 2"))
      .select(col("toks").as("med_tokens"))
    val dups = t.groupBy("dg").agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") - 1L).as("dup_docs"))
    base.crossJoin(broadcast(med)).crossJoin(broadcast(dups))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"), col("total_tokens"), col("med_tokens"),
        col("dup_docs"),
        expr("1000000 * dup_docs DIV n_docs").as("dup_ppm"))
      .orderBy("n_docs")
  }

  /** Boilerplate-prefix clusters: documents sharing an identical leading
    * 64 characters — the cheap screen for templated/mirrored content
    * (headers, licence blocks, scraper chrome) that full-document
    * near-dup misses when bodies diverge. One digest groupBy; emits
    * only groups with >1 member, smallest doc as the exemplar.
    */
  private val qDedupPrefix: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("pfx"))
      .groupBy("pfx")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("exemplar_doc"))
      .filter(col("n_docs") > 1L)
      .select(col("pfx"), col("n_docs"), col("exemplar_doc"))
      .orderBy("pfx")

  /** Embedding near-dup via LSH blocking + exact cosine verify — the
    * corpus×corpus scale shape (banded equi join, never a theta join).
    * The oracle mirrors the banding bit-for-bit (same splitmix
    * hyperplanes, same left-fold dot order — the `q_dedup_simhash`
    * discipline), so the contract is "exact cosine over LSH candidates".
    * Measured against the exact all-pairs ideal on this corpus: recall
    * 0.94–0.97 at sf0.001–0.1 with ~34% candidate pairs. That is the
    * hardest possible regime — the synthetic generator plants pairs at
    * cos ∈ [0.4, 0.6] with background up to 0.3999, i.e. zero margin at
    * the 0.4 threshold, where NO complete sub-quadratic filter exists
    * (a blocking scheme admitting every pair at 0.4001 must admit
    * essentially every pair at 0.3999 too). See
    * [[Similarity.cosinePairsBlocked]].
    */
  private val qDedupEmbedding: Q = (s, d) =>
    Similarity.cosinePairsBlocked(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.4, bands = EmbBands, bitsPerBand = EmbBits)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Embedding-blocking quality evaluation: the SRP band candidate set
    * scored against exact all-pairs cosine ≥ 0.4 ground truth —
    * TP/FP/FN with precision/recall in exact ppm, the embedding-side
    * sibling of `q_dedup_eval`. Evaluates the BLOCKING stage itself
    * (the verified `q_dedup_embedding` output is trivially
    * precision-1), i.e. the number every ANN/blocking parameter sweep
    * actually optimizes. Candidates ride the bit-mirrored SRP bands;
    * truth is the all-pairs join the oracle also runs — quadratic by
    * definition, which is exactly why this is an EVAL key over the
    * corpus sample, not a production path.
    */
  private val qEmbDedupEval: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val truth = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4)
      .select(col("vec_a"), col("vec_b"), lit(1L).as("t"))
    val pred = Similarity.srpCandidatePairs(emb, "vec_id", "embedding",
        EmbBands, EmbBits)
      .select(col("vec_a"), col("vec_b"), lit(1L).as("p"))
    truth.join(pred, Seq("vec_a", "vec_b"), "full")
      .agg(
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("p"), lit(0L))).as("tp"),
        sum((lit(1L) - coalesce(col("t"), lit(0L))) *
          coalesce(col("p"), lit(0L))).as("fp"),
        sum(coalesce(col("t"), lit(0L)) *
          (lit(1L) - coalesce(col("p"), lit(0L)))).as("fn"))
      .filter(col("tp") + col("fp") > 0L && col("tp") + col("fn") > 0L)
      .select(col("tp"), col("fp"), col("fn"),
        expr("1000000 * tp DIV (tp + fp)").as("precision_ppm"),
        expr("1000000 * tp DIV (tp + fn)").as("recall_ppm"))
      .orderBy("tp")
  }

  /** LSH parameters for `q_dedup_embedding`, shared with its oracle. */
  private val EmbBands = 96
  private val EmbBits = 8

  private val qCosineTopk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** kNN majority-vote classification: each held-out query vector
    * (vec_id < 20) takes the majority label of its 5 exact-cosine
    * nearest neighbors in the labeled remainder — the
    * label-propagation / eval-probe query of an embedding pipeline.
    * Neighbor selection rides [[Similarity.bruteForceTopK]] (broadcast
    * queries, map-side dot products); the vote is a keyed aggregate
    * with the `q_mode` composite-key tie-break (most votes, then
    * smallest label — labels < 1000 by the composite's construction).
    */
  /** Contrastive hard negatives: top-3 nearest different-label corpus
    * vectors per held-out query — see [[Similarity.hardNegatives]] for
    * why the label filter precedes the rank.
    */
  private val qHardNegatives: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb.filter(col("vec_id") >= 20),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", "label", k = 3)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Per-label L2-norm² profile of the embedding table — the
    * broken-embedding detector (zero vectors, un-normalized batches,
    * and magnitude drift all surface as norm outliers before they
    * poison cosine math downstream). Each vector's norm² is ONE
    * map-side left fold floored to e6 (the same sequential-fold parity
    * `dot_arr`/`list_dot_product` rely on); everything after is exact
    * integer per-label aggregation.
    */
  private val qEmbNormProfile: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"),
        floor(expr("aggregate(CAST(embedding AS ARRAY<DOUBLE>), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)") * 1e6)
          .cast("long").as("n2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), min("n2").as("min_n2_e6"),
        max("n2").as("max_n2_e6"),
        expr("sum(n2) DIV count(1)").as("mean_n2_e6"))
      .orderBy(col("label"))

  /** Per-dimension min-max int8 quantization audit: the storage-
    * compression dry run (PQ-lite) — each dimension's range and the
    * worst-case reconstruction error of snapping values to a 256-level
    * grid. Quantization uses floor(u + 0.5), NOT round(): Spark rounds
    * doubles HALF_UP while DuckDB rounds HALF_EVEN, and the .5 edges
    * land exactly on grid midpoints here, so round() is the one
    * function that would silently diverge cross-engine. Per-element
    * errors floor to e6 BEFORE the max, keeping the aggregate
    * order-independent; constant dimensions (mx = mn) define error 0.
    */
  private val qEmbQuantize: Q = (s, d) => {
    val el = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
    val rng = el.groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
    el.join(broadcast(rng), "pos")
      .withColumn("err_e6", when(col("mx") === col("mn"), lit(0L))
        .otherwise(floor(lit(1e6) * abs(col("x") -
          (col("mn") + floor((col("x") - col("mn")) /
            ((col("mx") - col("mn")) / 255.0) + 0.5) *
            ((col("mx") - col("mn")) / 255.0)))).cast("long")))
      .groupBy("pos")
      .agg(floor(min("x") * 1e6).cast("long").as("mn_e6"),
        floor(max("x") * 1e6).cast("long").as("mx_e6"),
        max("err_e6").as("max_abs_err_e6"))
      .orderBy(col("pos"))
  }

  private val qKnnLabel: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val labels = emb.select(col("vec_id"), col("label"))
    val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") >= 20),
      emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
    top.join(broadcast(labels.withColumnRenamed("vec_id", "n_id")
        .withColumnRenamed("label", "n_label")), "n_id")
      .groupBy("q_id", "n_label").agg(count(lit(1)).as("votes"))
      .groupBy("q_id")
      .agg(max_by(col("n_label"), col("votes") * 1000L - col("n_label"))
        .as("pred_label"), max("votes").as("top_votes"))
      .join(broadcast(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "true_label")), "q_id")
      .select(col("q_id"), col("true_label"), col("pred_label"),
        col("top_votes"))
      .orderBy("q_id")
  }

  /** Pairwise cosine between per-label centroid embeddings — the
    * class-separation / cluster-quality matrix (label-count² rows).
    * Exactness: cosine is invariant to each vector's positive scaling,
    * so the centroid sums-of-scaled-integers stand in for the means —
    * no division before the final ratio. Dot products and squared
    * norms of those BIGINT sums accumulate as DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB): exact integers regardless of aggregation order,
    * with the single fixed float sequence at the very end. Everything
    * after the per-(label,dim) collapse is dimension×label sized.
    */
  private val qCentroidDist: Q = (s, d) => {
    val a = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(round(col("x").cast("double") * Similarity.MeanScale)
        .cast("long")).as("sx"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val n2 = a.groupBy("label").agg(sum(dec(col("sx")) * dec(col("sx"))).as("nn"))
    val dp = a.select(col("label").as("label_a"), col("pos"), col("sx").as("sxa"))
      .join(a.select(col("label").as("label_b"), col("pos"), col("sx").as("sxb")),
        "pos")
      .filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(dec(col("sxa")) * dec(col("sxb"))).as("dot"))
    dp.join(broadcast(n2.select(col("label").as("label_a"), col("nn").as("nna"))),
        "label_a")
      .join(broadcast(n2.select(col("label").as("label_b"), col("nn").as("nnb"))),
        "label_b")
      .select(col("label_a"), col("label_b"),
        floor(lit(1000000.0) * (col("dot").cast("double") /
          (sqrt(col("nna").cast("double")) * sqrt(col("nnb").cast("double")))))
          .cast("long").as("cos_e6"))
      .orderBy("label_a", "label_b")
  }

  /** Per-(label, dimension) embedding variance — the dimension-collapse
    * detector (a dimension whose variance pins near zero inside a class
    * carries no signal; one that explodes flags a normalization bug).
    * Moments are exact scaled-integer BIGINTs (Σx̂², at the 2²⁴ scale,
    * holds ~3·10⁴ vectors per (label,dim) before needing the
    * DECIMAL(38,0) upgrade); the variance itself is one mirrored float
    * sequence. Output is label×dimension sized.
    */
  private val qEmbVariance: Q = (s, d) => {
    val sc2 = Similarity.MeanScale * Similarity.MeanScale
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xe", round(col("x").cast("double") * Similarity.MeanScale)
        .cast("long"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("xe").as("sx"),
        sum(col("xe") * col("xe")).as("sxx"))
      .select(col("label"), col("pos"), col("n"),
        floor(lit(1000000000.0) *
          ((col("sxx").cast("double") / col("n") -
            (col("sx").cast("double") / col("n")) *
              (col("sx").cast("double") / col("n"))) / lit(sc2)))
          .cast("long").as("var_e9"))
      .orderBy("label", "pos")
  }

  /** Approximate ANN (IVF) — no SQL oracle (approximate by design). */
  private val qAnnIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cells = 16, nprobe = 4)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** IVF exhaustive gate: `nprobe = cells` probes every cell, so the
    * index degenerates to exact brute force — this key is oracled
    * (rows+schema+hash against the same SQL as `q_cosine_topk`), turning
    * the approximate ANN path's correctness from spec-only into a
    * hash-checked row: the cell assignment must partition the corpus and
    * the probe/rank plumbing must lose nothing.
    */
  private val qAnnIvfExhaustive: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cells = 16, nprobe = 16)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Approximate ANN (hyperplane LSH) — no SQL oracle (approximate by
    * design); recall vs brute force is spec-asserted (LlmOpsSpec).
    */
  private val qAnnLsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, bands = 16, bitsPerBand = 4)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Blocked fuzzy match — the entity-resolution shape: a cheap blocking
    * key (brand) bounds the candidate space, an edit-distance verify
    * runs only within blocks. Never run levenshtein across the full
    * cross product; the blocking key IS the scale strategy. Threshold
    * is calibrated to the corpus: names are two-word phrases of 7–12
    * chars, so dist ≤ 2 is typo-level variance (a ≤ 10 cut measured
    * near-vacuous — 7.93M of 8.0M block pairs "matched", turning the
    * downstream match graph nearly complete). The |Δlen| ≤ 2 guard is
    * a provably-safe prefilter (length difference lower-bounds edit
    * distance) that skips the O(m·n) DP on pairs that cannot match.
    */
  /** Blocked-match pair table shared by q_fuzzy_match and
    * q_entity_clusters: (part_a, part_b, dist) with dist ≤ 2, derived
    * ONCE per (data dir) as a [[graft.ops.DurableTable]] — the verify
    * join (the banded levenshtein over the length-blocked candidates)
    * dominates both keys' cost, and at 100 TB a match-pair table is a
    * materialized asset the golden-record and review-queue jobs scan,
    * not a per-consumer recompute (the dedup cluster-map discipline).
    */
  private val matchPairTable = new graft.ops.DurableTable("match_pairs")

  /** Match-pair derivation counter, pinned run-once by LlmOpsSpec. */
  private[graft] val matchPairDerivations = matchPairTable.derivations

  /** Force the durable match-pair build (and return its row count).
    * Bench times this as its own `_derive_match_pairs` entry so both
    * consumers report steady-state read-through cost.
    */
  private[graft] def materializeMatchPairs(s: SparkSession, d: String): Long =
    matchPairs(s, d).count()

  private def matchPairs(s: SparkSession, d: String): DataFrame =
    matchPairTable(s, d) {
      val p = Tables.part(s, d)
      val a = p.select(col("p_brand"), col("p_partkey").as("part_a"),
        col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("p_partkey").as("part_b"),
        col("p_name").as("name_b"))
      // length-blocking as an EQUI key: side A explodes to its 5 candidate
      // lengths len±2, so the join itself enforces |Δlen| ≤ 2 — each block
      // is (brand, length)-sized instead of brand-sized, and levenshtein
      // runs on ~25× fewer pairs (edit distance ≥ |Δlen| makes this exact)
      val a2 = a.withColumn("lb",
        explode(sequence(length(col("name_a")) - 2, length(col("name_a")) + 2)))
      val b2 = b.withColumn("lb", length(col("name_b")))
      // threshold-bounded levenshtein: the 3-arg form runs the banded
      // O(n·k) DP and bails out at distance > 2 (returns -1) instead of
      // filling the full O(n·m) matrix — the verify stage dominates this
      // pipeline (measured 8.0 s → 4.1 s at sf0.1 on the 6.9M block pairs)
      a2.join(b2, Seq("p_brand", "lb"))
        .filter(col("part_a") < col("part_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
        .select(col("part_a"), col("part_b"), col("dist"))
    }

  private val qFuzzyMatch: Q = (s, d) =>
    matchPairs(s, d).orderBy(col("part_a"), col("part_b"))

  /** Entity resolution end-to-end: the blocked fuzzy-match pairs
    * (`q_fuzzy_match`'s brand-blocked levenshtein ≤ 2 with the
    * length-band prefilter) closed into connected components, every
    * part mapped to its canonical entity id (minimum reachable key;
    * unmatched parts canonicalize to themselves) — the master-data
    * "golden record" assignment built from the same star-contraction
    * CC the dedup pipeline uses. The blocking key bounds the verify
    * join; CC is O(log n) rounds over the match edges only — and the
    * calibrated threshold is what KEEPS that edge set sparse (the old
    * ≤ 10 cut matched 99% of block pairs, so CC ran over a
    * near-complete 8M-edge graph: 24 s at sf0.1; ≤ 2 leaves ~220k
    * true near-duplicate edges).
    */
  private val qEntityClusters: Q = (s, d) => {
    // rides the durable match-pair table — see matchPairs; CC runs over
    // the ~220k true near-duplicate edges only
    val pairs = matchPairs(s, d).select(col("part_a"), col("part_b"))
    val comp = Dedup.connectedComponentsStar(pairs, "part_a", "part_b")
      .withColumnRenamed("node", "p_partkey")
    Tables.part(s, d).select(col("p_partkey"))
      .join(comp, Seq("p_partkey"), "left")
      .select(col("p_partkey"),
        coalesce(col("component"), col("p_partkey")).as("entity_id"))
      .orderBy("p_partkey")
  }

  private val qTextStats: Q = (s, d) =>
    TextStats.textStats(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val qLangAgg: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        floor(sum(col("n_tokens")).cast("double") / count(lit(1)) * 1e6)
          .cast("long").as("avg_tokens_e6"))
      .orderBy(col("lang"))

  private val qLangId: Q = (s, d) =>
    TextStats.langId(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Count–Min sketch over the token stream (d=4 rows × w=256
    * counters, md5 row-hashes) queried for the top-10 exact tokens:
    * exact count vs CMS estimate and the overestimate — the mergeable
    * frequency sketch whose counters re-aggregate across corpus shards
    * without rescanning raw text (the approx_top_k sibling, built from
    * first principles so the counter table itself is inspectable).
    * Everything is integer: the sketch build is one 4× explode +
    * 1024-cell aggregate; the probe joins 40 (token, row) pairs
    * against the cells and takes the row-wise min. CMS law estimate ≥
    * exact is spec-pinned.
    */
  private val qCountmin: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val rows = s.range(0, 4).select(col("id").as("r"))
    def bucket(tok: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(tok, lit("#"), r.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(256L))
    val cells = toks.crossJoin(broadcast(rows))
      .select(col("r"), bucket(col("tok"), col("r")).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok").asc).limit(10)
    exact.crossJoin(broadcast(rows))
      .select(col("tok"), col("exact"), col("r"),
        bucket(col("tok"), col("r")).as("bucket"))
      .join(cells, Seq("r", "bucket"))
      .groupBy("tok", "exact").agg(min("c").as("cms_estimate"))
      .select(col("tok"), col("exact"), col("cms_estimate"),
        (col("cms_estimate") - col("exact")).as("overestimate"))
      .orderBy(col("exact").desc, col("tok").asc)
  }

  /** Deterministic token-dropout augmentation: each document re-emitted
    * with ~10% of tokens dropped by an md5 draw on (doc, position) —
    * the data-augmentation transform a training pipeline applies for
    * robustness, WITHOUT RNG state (the `q_sample_split` discipline:
    * same corpus in, same augmented corpus out, on any cluster). The
    * rebuild is order-exact: sort_array over (pos, tok) structs then
    * join — the distributed equivalent of an ORDER BY string_agg.
    * Map-side explode + one per-doc aggregate.
    */
  private val qTokenDropout: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("pos", col("p").cast("long") + 1L)
    val kept = toks.withColumn("keep",
      pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"))), 1, 8), 16, 10).cast("long"),
        lit(10L)) < 9L)
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_orig"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("tok"))))),
          x => x.getField("tok")), " ").as("aug_text"))
      .orderBy("doc_id")
  }

  /** T5-style span corruption: ~10% of token positions open a 3-token
    * mask span (overlaps merge), each merged span replaced by a
    * numbered `<extra_id_k>` sentinel — the denoising-objective
    * augmentation next to `q_token_dropout`'s i.i.d. deletion. Spans
    * are md5 position draws (RNG-free, identical both engines);
    * membership is a DIRECT recompute of the ≤2 predecessor draws (no
    * self-join); sentinel numbering is one doc-partitioned running
    * count; the rebuild is the dropout key's order-exact sort_array +
    * ordered join. Everything shards by document.
    */
  private val qSpanMask: Q = (s, d) => {
    def hppm(p: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit("#"),
        p.cast("string"))), 1, 8), 16, 10).cast("long"), lit(100L))
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("pos", col("p").cast("long") + 1L)
    val flagged = toks
      .withColumn("st", hppm(col("pos")) < 10L)
      .withColumn("st1", col("pos") >= 2L && hppm(col("pos") - 1L) < 10L)
      .withColumn("st2", col("pos") >= 3L && hppm(col("pos") - 2L) < 10L)
      .withColumn("masked", col("st") || col("st1") || col("st2"))
      .withColumn("sentinel", col("st") && !col("st1") && !col("st2"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("sent_idx", sum(col("sentinel").cast("long")).over(w))
      .withColumn("out",
        when(col("sentinel"), concat(lit("<extra_id_"),
          (col("sent_idx") - 1L).cast("string"), lit(">")))
          .when(!col("masked"), col("tok")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("masked").cast("long")).as("n_masked"),
        sum(col("sentinel").cast("long")).as("n_spans"),
        array_join(transform(array_sort(collect_list(
          when(col("out").isNotNull, struct(col("pos"), col("out"))))),
          x => x.getField("out")), " ").as("masked_text"))
      .orderBy("doc_id")
  }

  /** Curriculum ordering: the full corpus ranked highest-quality-first
    * (the `q_quality_score` heuristic) with a 3-phase bucket — the
    * schedule a curriculum-learning trainer consumes (clean text
    * first, tail later). The rank rides the distributed total-order
    * rank; the phase is integer arithmetic on it.
    */
  private val qCurriculumOrder: Q = (s, d) => {
    val qs = TextStats.qualityScore(Tables.documents(s, d), "doc_id", "text")
    val ranked = graft.ops.Ranks.globalRowNumber(qs,
      Seq(col("quality_e6").desc, col("doc_id").asc), "curriculum_rank")
    val tot = qs.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("quality_e6"),
        col("curriculum_rank").cast("long").as("curriculum_rank"),
        expr("(CAST(curriculum_rank AS BIGINT) - 1) * 3 DIV n").as("phase"))
      .orderBy("doc_id")
  }

  /** Keyphrase extraction: each focus doc's top-3 terms by tf·idf with
    * the same >10%-df prune as `q_tfidf_cosine` — the summary-tag
    * generator a corpus browser shows per document. Integer weights,
    * WindowGroupLimit top-3 per doc.
    */
  private val qKeyphrases: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok")).filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val weights = tf.join(dft, "tok").crossJoin(broadcast(nDocs))
      .filter(col("df") * 10L <= col("nd") && col("doc_id") < 50L)
      .select(col("doc_id"), col("tok"),
        (col("tf") * floor(lit(1000000.0) * log(col("nd").cast("double") /
          col("df").cast("double"))).cast("long")).as("w"))
    val win = Window.partitionBy("doc_id")
      .orderBy(col("w").desc, col("tok").asc)
    weights.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("tok"), col("w").as("tfidf_e6"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** k-means (k=8, 2 fixed Lloyd rounds) over the embedding corpus in
    * EXACT integer arithmetic: centroids are integer mean vectors
    * (Σxe DIV n — the Similarity centroid discipline), assignment
    * minimizes ‖c‖²−2·x·c (the ‖x‖² term is constant per vector, so
    * argmin needs no subtraction of it), ties break to the lowest
    * cluster id — every round is bit-deterministic under any
    * partitioning, so a FIXED round count is cross-engine exact (the
    * `q_pagerank` fixpoint discipline applied to clustering).
    * Deterministic init: the 8 lowest vec_ids. Each round is one
    * broadcast join against the 512-cell centroid table + one
    * partial-agg shuffle; per-round localCheckpoint bounds lineage.
    * Output: the final 512-cell centroid table with cluster sizes.
    */
  /** The 2-round Lloyd fit shared by q_kmeans and q_cluster_topics:
    * returns (final centroid table, final assignment).
    */
  private def kmeansFit(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val xe = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xe",
        round(col("x").cast("double") * Similarity.MeanScale).cast("long"))
      .select(col("vec_id"), col("pos"), col("xe"))
      .localCheckpoint()
    val init = xe.filter(col("vec_id") < 8L)
      .select(col("vec_id").cast("long").as("k"), col("pos"),
        col("xe").as("ce"))
    def assignStep(cent: DataFrame): DataFrame = {
      val cn = cent.groupBy("k").agg(sum(col("ce") * col("ce")).as("cn2"))
      val dots = xe.join(broadcast(cent), "pos")
        .groupBy("vec_id", "k").agg(sum(col("xe") * col("ce")).as("dot"))
      val scoredK = dots.join(broadcast(cn), "k")
        .select(col("vec_id"), col("k"),
          (col("cn2") - col("dot") * 2L).as("d2"))
      scoredK.groupBy("vec_id")
        .agg(min(struct(col("d2"), col("k"))).as("m"))
        .select(col("vec_id"), col("m.k").as("k"))
    }
    def update(assign: DataFrame): DataFrame =
      xe.join(assign, "vec_id")
        .groupBy("k", "pos")
        // sign-split: component sums go negative, where Spark DIV
        // (truncate) and DuckDB // (floor) disagree — divide magnitudes
        .agg(expr("CAST(sign(sum(xe)) AS BIGINT) * " +
          "(abs(sum(xe)) DIV count(1))").as("ce"))
        .localCheckpoint()
    val c1 = update(assignStep(init))
    val c2 = update(assignStep(c1))
    (c2, assignStep(c2))
  }

  private val qKmeans: Q = (s, d) => {
    val (c2, assign) = kmeansFit(s, d)
    val sizes = assign.groupBy("k").agg(count(lit(1)).as("cluster_size"))
    c2.join(broadcast(sizes), "k")
      .select(col("k"), col("pos"), col("ce"), col("cluster_size"))
      .orderBy("k", "pos")
  }

  /** Topic terms per embedding cluster (the BERTopic shape): k-means
    * clusters over the embedding corpus, then each cluster's top-5
    * DISTINCTIVE terms by class-based lift — 10⁶·c_tk·N DIV (N_k·c_t),
    * the same integer PMI-without-the-log score as `q_pmi_cooccur`
    * (monotone in c-TF-IDF's log at fixed support) — with a c_tk ≥ 5
    * support floor. This is the "name the clusters" step every
    * embedding-space corpus browser ships: the doc↔vector identity
    * (doc_id = vec_id, the corpus convention) joins text onto the
    * geometry. Lift headroom: 10⁶·c_tk·N < 2⁶³ to ~10⁸ corpus tokens
    * per count pair; past that promote to DECIMAL(38,0) (the
    * q_pmi_cooccur point). The only window ranks within 8 clusters.
    */
  private val qClusterTopics: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val (_, assign) = kmeansFit(s, d)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val ck = toks.join(assign.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .groupBy(col("k"), col("tok")).agg(count(lit(1)).as("ctk"))
    val nk = ck.groupBy("k").agg(sum("ctk").as("nk"))
    val tt = ck.groupBy("tok").agg(sum("ctk").as("c_t"))
    val nn = tt.agg(sum("c_t").as("nn"))
    val lift = ck.join(broadcast(nk), "k").join(tt, "tok")
      .crossJoin(broadcast(nn))
      .filter(col("ctk") >= 5L)
      .select(col("k"), col("tok"), col("ctk"),
        expr("1000000 * ctk * nn DIV (nk * c_t)").as("lift_ppm"))
    val w = Window.partitionBy("k")
      .orderBy(col("lift_ppm").desc, col("ctk").desc, col("tok").asc)
    lift.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("k"), col("rnk"), col("tok"), col("ctk"), col("lift_ppm"))
      .orderBy("k", "rnk")
  }

  /** TF-IDF cosine similarity, focus-set top-3: sparse dot products
    * via the inverted index (postings join on shared terms — never a
    * dense all-pairs), with the classic idf prune (terms in >10% of
    * docs dropped) bounding the per-term fan-out exactly the way the
    * minhash band join bounds candidate pairs. Weights are integer
    * tf·idf_e6 (idf floored per term — one mirrored ln each); norms
    * and dots ride DECIMAL(38,0)/HUGEINT (w² can pass 2⁶³ for heavy
    * terms); the cosine is one mirrored float sequence per pair. The
    * score-based sibling of `q_dedup_minhash`'s hash-based near-dup.
    */
  private val qTfidfCosine: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok")).filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val weights = tf.join(dft, "tok").crossJoin(broadcast(nDocs))
      .filter(col("df") * 10L <= col("nd"))
      .select(col("doc_id"), col("tok"),
        (col("tf") * floor(lit(1000000.0) * log(col("nd").cast("double") /
          col("df").cast("double"))).cast("long")).as("w"))
    val norms = weights.groupBy("doc_id")
      .agg(sum(dec(col("w")) * dec(col("w"))).as("n2"))
    val pairs = weights.filter(col("doc_id") < 50L)
      .select(col("doc_id").as("a"), col("tok"), col("w").as("wa"))
      .join(weights.select(col("doc_id").as("b"), col("tok"),
        col("w").as("wb")), "tok")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(sum(dec(col("wa")) * dec(col("wb"))).as("dot"))
    val scored = pairs
      .join(norms.select(col("doc_id").as("a"), col("n2").as("na2")), "a")
      .join(norms.select(col("doc_id").as("b"), col("n2").as("nb2")), "b")
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .select(col("a"), col("b"),
        floor(lit(1000000.0) * col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .cast("long").as("cos_e6"))
    val w = Window.partitionBy("a").orderBy(col("cos_e6").desc, col("b").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("a"), col("b"), col("cos_e6"), col("rnk"))
      .orderBy("a", "rnk")
  }

  /** Multinomial Naive Bayes language classifier, trained AND applied
    * in one plan: per-(lang, token) Laplace-smoothed log-likelihoods
    * ln((c+1)/(tot+V)) and log-priors, each floored to e6 PER TERM
    * before any cross-row sum (the `q_mutual_info` order-independence
    * discipline — the only floats are one mirrored ln sequence per
    * vocabulary cell), then every doc scored against all 5 classes by
    * an integer sum over its token stream and argmaxed (per-doc
    * 5-row window). Output is the train-set confusion matrix — the
    * richer learned-model sibling of `q_langid_eval`'s marker
    * heuristic. Scale shape: the model is |V|·L rows (a broadcastable
    * side at small V, a plain hash join past that — no all-pairs
    * anything); scoring is one join over the exploded token stream.
    */
  private val qNaiveBayes: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok")).filter(col("tok") =!= "")
    val labeled = toks.join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val counts = labeled.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("lang").agg(sum("cnt").as("tot"))
    val vocab = toks.select("tok").distinct().agg(count(lit(1)).as("v"))
    // Fixed float sequences, mirrored token-for-token by the oracle.
    val scores = counts.join(broadcast(totals), "lang")
      .crossJoin(broadcast(vocab))
      .select(col("lang").as("cand_lang"), col("tok"),
        floor(lit(1000000.0) * log((col("cnt") + lit(1L)).cast("double") /
          (col("tot") + col("v")).cast("double"))).cast("long")
          .as("score_e6"))
    val defaults = totals.crossJoin(broadcast(vocab))
      .select(col("lang").as("cand_lang"),
        floor(lit(1000000.0) * log(lit(1.0) /
          (col("tot") + col("v")).cast("double"))).cast("long").as("def_e6"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val priors = docs.groupBy(col("lang").as("cand_lang"))
      .agg(count(lit(1)).as("ndl"))
      .crossJoin(broadcast(nDocs))
      .select(col("cand_lang"),
        floor(lit(1000000.0) * log(col("ndl").cast("double") /
          col("nd").cast("double"))).cast("long").as("prior_e6"))
    val perDoc = toks.crossJoin(broadcast(defaults))
      .join(scores, Seq("cand_lang", "tok"), "left")
      .select(col("doc_id"), col("cand_lang"),
        coalesce(col("score_e6"), col("def_e6")).as("term_score"))
      .groupBy("doc_id", "cand_lang").agg(sum("term_score").as("ll_e6"))
      .join(broadcast(priors), "cand_lang")
      .withColumn("post_e6", col("ll_e6") + col("prior_e6"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("post_e6").desc, col("cand_lang").asc)
    perDoc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(docs.select(col("doc_id"), col("lang").as("actual")), "doc_id")
      .groupBy(col("actual"), col("cand_lang").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** Language-ID confusion matrix: the marker-heuristic's predictions
    * crossed with the labeled language, each cell with its within-label
    * share in exact ppm — the evaluation table that decides whether the
    * classifier is good enough to route a crawl by (per-label recall is
    * the diagonal's share_ppm). Rides the same `TextStats.langId`
    * column expressions as `q_lang_id`; one partial-agg shuffle into a
    * |langs|²-bounded cell table + a 5-row broadcast back.
    */
  private val qLangidEval: Q = (s, d) => {
    val pred = TextStats.langId(Tables.documents(s, d), "doc_id", "text")
    val cm = pred.groupBy(col("actual_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = cm.groupBy("actual_lang").agg(sum("n").as("n_actual"))
    cm.join(broadcast(tot), "actual_lang")
      .select(col("actual_lang"), col("predicted_lang"), col("n"),
        col("n_actual"),
        expr("1000000 * n DIV n_actual").as("share_ppm"),
        (col("actual_lang") === col("predicted_lang")).cast("int")
          .as("correct"))
      .orderBy("actual_lang", "predicted_lang")
  }

  private val qQualityScore: Q = (s, d) =>
    TextStats.qualityScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val qTokenCount: Q = (s, d) =>
    TextStats.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val qFingerprint: Q = (s, d) =>
    TextStats.fingerprints(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Karp-Rabin winnowing fingerprint: min rolling hash over 16-byte
    * windows (graft.functions.RollingHashMin, O(n) per doc).
    */
  private val qFingerprintRolling: Q = (s, d) => {
    graft.functions.Udfs.registerAll(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("rolling_hash_min(text, 16)").as("min_window_hash"))
      .orderBy(col("doc_id"))
  }

  private val qTopNgrams: Q = (s, d) =>
    TextStats.topNgrams(Tables.documents(s, d), "text", n = 3, k = 20)

  /** Containment near-dup pairs (doc embedded in doc) — the asymmetric
    * complement of `q_dedup_ngram`'s Jaccard; see
    * [[Dedup.containmentPairs]] for why the relation and the plan differ.
    */
  private val qDedupContainment: Q = (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** BPE merge-candidate table: corpus frequency of every adjacent
    * character pair inside words — iteration 0 of byte-pair-encoding
    * tokenizer training (the most frequent pair is the first merge).
    * Scale shape: pair extraction runs over the VOCABULARY (distinct
    * words weighted by their corpus counts), not the corpus — the word
    * collapse is one partial-agg shuffle, the per-word pair explode
    * fans out ≤ len(word) rows per DISTINCT word. Output is bounded by
    * alphabet², independent of corpus size.
    */
  private val qBpePairs: Q = (s, d) => {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    wc.select(col("w"), col("cnt"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("pair"))
  }

  /** One full BPE training step applied: pick the argmax merge pair
    * from the `q_bpe_pairs` table (ties to the lexicographically
    * smallest pair — a total order) and apply the greedy left-to-right
    * merge to the entire weighted vocabulary, reporting the corpus
    * token-count compression that merge buys — the quantity a
    * tokenizer-training loop maximizes each round. Non-overlapping
    * occurrence counting rides `length(w) − length(replace(w, pair,
    * '#'))` — both engines' replace scans left-to-right and continues
    * AFTER the match, which IS the BPE greedy application order (the
    * 'aaa' with pair 'aa' case yields one merge on both). All counts
    * exact integers; the argmax is TakeOrderedAndProject; the apply is
    * map-side over the vocabulary (never the token stream).
    */
  private val qBpeMerge: Q = (s, d) => {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val pairs = wc.select(col("w"), col("cnt"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("n"))
    val top = pairs.orderBy(col("n").desc, col("pair").asc).limit(1)
      .select(col("pair"), col("n").as("pair_n"))
    wc.crossJoin(broadcast(top))
      .select(col("cnt"), col("pair"), col("pair_n"),
        (length(col("w")).cast("long") -
          length(expr("replace(w, pair, '#')")).cast("long")).as("occ"),
        length(col("w")).cast("long").as("len"))
      .groupBy("pair", "pair_n")
      .agg(sum(when(col("occ") > 0L, col("cnt")).otherwise(0L)).as("n_words"),
        sum(col("cnt") * col("occ")).as("occ_total"),
        sum(col("cnt") * col("len")).as("tokens_before"),
        sum(col("cnt") * (col("len") - col("occ"))).as("tokens_after"))
      .select(col("pair"), col("pair_n"), col("n_words"), col("occ_total"),
        col("tokens_before"), col("tokens_after"),
        expr("1000000 * (tokens_before - tokens_after) DIV tokens_before")
          .as("savings_ppm"))
      .orderBy("pair")
  }

  /** Document-level co-occurrence lift of word pairs: how much more
    * often two words share a document than independence predicts —
    * lift = N·c_xy / (c_x·c_y) as exact integer ppm (the PMI
    * association score without the log, so it stays in integer
    * arithmetic; PMI = ln(lift) is monotone in it). Shape: distinct
    * (doc, word) pairs → doc-keyed self-join (fan-out bounded by
    * per-doc DISTINCT vocabulary, not doc length) → pair counts;
    * document frequencies broadcast back (vocabulary-sized). The
    * support floor keeps the output dense-pair only. BIGINT headroom:
    * 10⁶·N·c_xy needs N·c_xy < 9.2·10¹² — past that the ratio moves
    * to DECIMAL(38,0), same plan.
    */
  private val qPmiCooccur: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dw = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .filter(col("w") =!= "")
    val dfreq = dw.groupBy("w").agg(count(lit(1)).as("df"))
    val pairs = dw.select(col("doc_id"), col("w").as("w1"))
      .join(dw.select(col("doc_id"), col("w").as("w2")), "doc_id")
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("nxy"))
      .filter(col("nxy") >= 5L)
    pairs
      .join(broadcast(dfreq.select(col("w").as("w1"), col("df").as("df1"))), "w1")
      .join(broadcast(dfreq.select(col("w").as("w2"), col("df").as("df2"))), "w2")
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .select(col("w1"), col("w2"), col("nxy"),
        expr("1000000 * n_docs * nxy DIV (df1 * df2)").as("lift_ppm"))
      .orderBy("w1", "w2")
  }

  /** Vocabulary frequency spectrum (frequency-of-frequencies): how many
    * distinct tokens occur exactly f times — the Zipf/Heaps corpus
    * health check (a missing singleton tail or a spike at one f is the
    * classic symptom of template text or a broken tokenizer). Two
    * keyed aggregates; the second runs over the vocabulary table.
    */
  private val qVocabSpectrum: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("n_tokens"))
      .orderBy("f")

  private val qStopwordFilter: Q = (s, d) =>
    TextStats.removeStopwords(Tables.documents(s, d), "doc_id", "text",
        Seq("the", "a", "value", "data"))
      .orderBy(col("doc_id"))

  private val qTfidf: Q = (s, d) =>
    TextStats.tfidf(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("tok"))

  private val qSampleSplit: Q = (s, d) =>
    TextStats.sampleSplit(Tables.documents(s, d), "doc_id")
      .orderBy(col("doc_id"))

  /** Deterministic FIXED-SIZE uniform sample: the k smallest
    * md5-of-key values (salted so this sample is independent of
    * `q_sample_split`'s bucketing). The rate-based split gives each row
    * an independent coin flip — sample SIZE varies; bottom-k-by-hash
    * gives exactly k rows, stable across runs/partitionings, and
    * distributed as TakeOrderedAndProject: per-partition top-k heaps,
    * k rows per partition to the driver stage, never a global sort.
    * The "give me exactly 10k eval docs, reproducibly" primitive.
    */
  private val qSampleBottomk: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("smpl:"), col("doc_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(100)

  /** Deterministic weighted Bernoulli sampling: each document keeps
    * with probability `w_ppm/10⁶` decided by comparing its OWN salted
    * md5 draw against its weight — the row-level form of temperature
    * sampling (here weight ∝ document length, capped at 1). Pure
    * map-side filter: no shuffle, no RNG state, reproducible across
    * runs/partitionings/engines, and upsampling-free (a row is in or
    * out). Complements `q_temperature_mix` (per-DOMAIN quota √n
    * reweighting) and `q_sample_split` (unweighted rate split).
    */
  private val qWeightedSample: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        pmod(conv(substring(
            md5(concat(lit("wsmp:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(1000000L)).as("u_ppm"),
        // cap at the FULL 10⁶ grid: draws live in [0, 10⁶), so a
        // max-weight doc satisfies u < w with certainty — capping at
        // 999999 would deterministically drop the ~1e-6 of large docs
        // whose draw is exactly 999999, forever
        least(lit(1000000L), col("n_chars") * 2000L).as("w_ppm"))
      .filter(col("u_ppm") < col("w_ppm"))
      .orderBy("doc_id")

  /** Bigram language model over the corpus: P(next word | word) as
    * exact floored millionths — the Markov-chain view of the token
    * stream (the n-gram LM builders' first aggregation, and the raw
    * material for perplexity-style quality scoring). Adjacent pairs
    * come from zipping the token array with its own tail INSIDE the row
    * (`zip_with` over two slices — no positional explode+self-join, no
    * shuffle until the count); counts and conditional ratios are the
    * `q_markov_transitions` integer discipline applied to text. Output
    * is vocabulary², corpus-size-independent.
    */
  private val qBigramLm: Q = (s, d) => {
    val pairs = Tables.documents(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val n = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val tot = n.groupBy("w1").agg(sum("n").as("out_n"))
    n.join(tot, "w1")
      .select(col("w1"), col("w2"), col("n"), col("out_n"),
        expr("1000000L * n DIV out_n").as("p_e6"))
      .orderBy("w1", "w2")
  }

  /** Model-based document quality score: each document's mean negative
    * log-likelihood under the corpus's OWN bigram LM — the perplexity
    * filter of an LLM curation pipeline (templated/corrupt text scores
    * abnormally low or high vs the corpus norm). Two-pass train/score
    * shape by design: pass 1 fits the vocabulary²-bounded probability
    * table (broadcast back), pass 2 scores every document's bigrams
    * against it. Determinism: probabilities are `q_bigram_lm`'s exact
    * floored millionths clamped to ≥1 (so an out-of-model rounding-to-0
    * tail can never reach ln(0) at any corpus size — the `q_psi_drift`
    * clamp); each bigram's log term floors to an integer BEFORE the
    * per-document sum, so the aggregate is order-independent; the mean
    * is sum DIV n.
    */
  /** Per-doc mean bigram negative log-likelihood under the corpus's own
    * bigram LM — shared by `q_perplexity_lm` (the raw score table) and
    * `q_ppl_filter` (the threshold-retention curation report).
    */
  private def docNll(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val n = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val tot = n.groupBy("w1").agg(sum("n").as("out_n"))
    val model = n.join(tot, "w1")
      .select(col("w1"), col("w2"),
        greatest(expr("1000000L * n DIV out_n"), lit(1L)).as("p_e6"))
    pairs.join(broadcast(model), Seq("w1", "w2"))
      .withColumn("lp_e6",
        floor(lit(1000000.0) *
          log(col("p_e6").cast("double") / lit(1000000.0))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_e6").as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(-sum_lp) DIV n_bigrams").as("nll_e6"))
  }

  private val qPerplexityLm: Q = (s, d) =>
    docNll(s, d).orderBy("doc_id")

  /** Perplexity-threshold curation report: per language, how much of
    * the corpus survives dropping the worst-perplexity quartile — the
    * standard LM-based quality gate (docs the corpus LM finds
    * surprising are boilerplate, noise, or wrong-language). The cut is
    * the exact per-language NLL order statistic at inclusive rank
    * ceil(3n/4) (ties keep docs — deterministic both engines), ranks
    * ride a per-language window (partitioned — never a global sort),
    * and the report is language-sized. The score table is the
    * `q_perplexity_lm` pipeline reused verbatim.
    */
  private val qPplFilter: Q = (s, d) => {
    val nll = docNll(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("n_chars")), "doc_id")
    val w = Window.partitionBy("lang").orderBy(col("nll_e6").asc,
      col("doc_id").asc)
    val ranked = nll.withColumn("rnk", row_number().over(w))
    // cut = value at rank ceil(3n/4): compute per-lang n first, then
    // pick the row — two passes over the lang-partitioned rank table.
    val n = ranked.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val cut = ranked.join(n, "lang")
      .filter(col("rnk") === expr("(3 * n_docs + 3) DIV 4"))
      .select(col("lang"), col("nll_e6").as("cut_nll_e6"))
    ranked.join(n, "lang").join(cut, "lang")
      .groupBy(col("lang"), col("n_docs"), col("cut_nll_e6"))
      .agg(sum((col("nll_e6") <= col("cut_nll_e6")).cast("long")).as("n_kept"),
        sum(when(col("nll_e6") <= col("cut_nll_e6"), col("n_chars"))
          .otherwise(0L)).as("kept_chars"))
      .select(col("lang"), col("n_docs"), col("n_kept"), col("kept_chars"),
        col("cut_nll_e6"),
        expr("1000000 * n_kept DIV n_docs").as("retention_ppm"))
      .orderBy("lang")
  }

  /** Per-vector centroid-margin score (silhouette-style cluster
    * quality): cosine to the vector's OWN class centroid minus the best
    * cosine to any OTHER class centroid — negative margin = the vector
    * sits closer to a foreign class (a mislabeled or boundary example;
    * the embedding-space analogue of a label-noise detector). Centroids
    * include the vector itself (the centroid-based approximation, not
    * Rousseeuw's pairwise silhouette — O(n·L·dim), not O(n²)).
    * Exactness rides the `q_centroid_dist` machinery: scale-invariant
    * integer sums, DECIMAL(38,0)/HUGEINT dot products, one float
    * sequence per cosine, floored to e6 BEFORE the max/compare so the
    * argmax is an integer decision on both engines.
    */
  private val qSilhouette: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val xe = emb
      .select(col("vec_id"), col("label").as("own_label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xe",
        round(col("x").cast("double") * Similarity.MeanScale).cast("long"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cent = xe.groupBy(col("own_label").as("c_label"), col("pos"))
      .agg(sum("xe").as("sx"))
    val cn2 = cent.groupBy("c_label")
      .agg(sum(dec(col("sx")) * dec(col("sx"))).as("cn"))
    val vn2 = xe.groupBy("vec_id")
      .agg(sum(dec(col("xe")) * dec(col("xe"))).as("vn"))
    val dots = xe.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("own_label"), col("c_label"))
      .agg(sum(dec(col("xe")) * dec(col("sx"))).as("dot"))
    val cos = dots.join(broadcast(cn2), "c_label").join(vn2, "vec_id")
      .select(col("vec_id"), col("own_label"), col("c_label"),
        floor(lit(1000000.0) * (col("dot").cast("double") /
          (sqrt(col("vn").cast("double")) * sqrt(col("cn").cast("double")))))
          .cast("long").as("cos_e6"))
    // own_label IS the output label — carrying it through `own` avoids
    // a third scan of the embeddings table just to re-fetch it
    val own = cos.filter(col("c_label") === col("own_label"))
      .select(col("vec_id"), col("own_label").as("label"),
        col("cos_e6").as("own_cos_e6"))
    val other = cos.filter(col("c_label") =!= col("own_label"))
      .groupBy("vec_id")
      .agg(max(col("cos_e6")).as("best_other_cos_e6"),
        max_by(col("c_label"), col("cos_e6") * 1000L - col("c_label"))
          .as("best_other"))
    own.join(other, "vec_id")
      .select(col("vec_id"), col("label"), col("own_cos_e6"),
        col("best_other"), col("best_other_cos_e6"),
        (col("own_cos_e6") - col("best_other_cos_e6")).as("margin_e6"))
      .orderBy("vec_id")
  }

  /** Embedding dimension covariance matrix (upper triangle + diagonal)
    * — the PCA/whitening prep artifact and the redundant-dimension
    * detector (a high off-diagonal says two dimensions encode the same
    * signal). Exact moments end-to-end: Σx̂ₐ, Σx̂ₐx̂_b accumulate as
    * BIGINT / DECIMAL(38,0) scaled integers (order-independent), one
    * mirrored float sequence per cell at the end. Shape: the positional
    * self-join fans each vector to dims²/2 rows — cost n·dims², the
    * Gram-matrix lower bound — then collapses to a dims²-sized output;
    * per-dimension means broadcast back.
    */
  /** Pearson correlation per embedding dimension PAIR — the normalized
    * form of `q_covariance_matrix`'s redundancy detector (corr ≈ ±1
    * says a dimension is a linear copy; the pruning readout before
    * quantization). Same exact-moment shape: scaled-integer Σxₐ, Σxₐ²,
    * Σxₐx_b accumulate as BIGINT/DECIMAL(38,0) (order-independent),
    * then ONE mirrored float sequence per cell — num/√denₐ/√den_b, the
    * `q_autocorr` discipline. Zero-variance dimensions drop on BOTH
    * engines (the Welch guard). Cost n·dims² through the positional
    * self-join, output dims²-bounded; per-dimension moments broadcast.
    */
  private val qDimCorr: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val xe = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xe",
        round(col("x").cast("double") * Similarity.MeanScale).cast("long"))
    val p = xe.select(col("vec_id"), col("pos").as("pos_a"), col("xe").as("xa"))
      .join(xe.select(col("vec_id"), col("pos").as("pos_b"), col("xe").as("xb")),
        "vec_id")
      .filter(col("pos_a") < col("pos_b"))
      .groupBy("pos_a", "pos_b")
      .agg(sum(dec(col("xa")) * dec(col("xb"))).as("pab"))
    val m = xe.groupBy("pos")
      .agg(sum("xe").as("sx"), sum(dec(col("xe")) * dec(col("xe"))).as("sxx"),
        count(lit(1)).as("n"))
    p.join(broadcast(m.select(col("pos").as("pos_a"), col("sx").as("sa"),
        col("sxx").as("saa"), col("n"))), "pos_a")
      .join(broadcast(m.select(col("pos").as("pos_b"), col("sx").as("sb"),
        col("sxx").as("sbb"))), "pos_b")
      .filter(col("n").cast("double") * col("saa").cast("double") -
        col("sa").cast("double") * col("sa").cast("double") > lit(0.0) &&
        col("n").cast("double") * col("sbb").cast("double") -
        col("sb").cast("double") * col("sb").cast("double") > lit(0.0))
      .select(col("pos_a"), col("pos_b"),
        floor(lit(1000000.0) *
          (col("n").cast("double") * col("pab").cast("double") -
            col("sa").cast("double") * col("sb").cast("double")) /
          sqrt(col("n").cast("double") * col("saa").cast("double") -
            col("sa").cast("double") * col("sa").cast("double")) /
          sqrt(col("n").cast("double") * col("sbb").cast("double") -
            col("sb").cast("double") * col("sb").cast("double")))
          .cast("long").as("corr_e6"))
      .orderBy("pos_a", "pos_b")
  }

  /** Upper-triangle covariance cells (pos_a ≤ pos_b, cov_e9) — shared
    * by `q_covariance_matrix` and the power-iteration eigenvector.
    */
  private def covCells(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val xe = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xe",
        round(col("x").cast("double") * Similarity.MeanScale).cast("long"))
    val p = xe.select(col("vec_id"), col("pos").as("pos_a"), col("xe").as("xa"))
      .join(xe.select(col("vec_id"), col("pos").as("pos_b"), col("xe").as("xb")),
        "vec_id")
      .filter(col("pos_a") <= col("pos_b"))
      .groupBy("pos_a", "pos_b")
      .agg(sum(dec(col("xa")) * dec(col("xb"))).as("pab"))
    val m = xe.groupBy("pos")
      .agg(sum("xe").as("sx"), count(lit(1)).as("n"))
    val sc2 = Similarity.MeanScale * Similarity.MeanScale
    p.join(broadcast(m.select(col("pos").as("pos_a"), col("sx").as("sa"),
        col("n"))), "pos_a")
      .join(broadcast(m.select(col("pos").as("pos_b"), col("sx").as("sb"))),
        "pos_b")
      .select(col("pos_a"), col("pos_b"),
        floor(lit(1000000000.0) *
          ((col("pab").cast("double") / col("n") -
            (col("sa").cast("double") / col("n")) *
              (col("sb").cast("double") / col("n"))) / lit(sc2)))
          .cast("long").as("cov_e9"))
  }

  private val qCovarianceMatrix: Q = (s, d) =>
    covCells(s, d).orderBy("pos_a", "pos_b")

  /** Oracle for `q_top_eigenvector`: the EigenIters power rounds
    * unrolled as generated CTEs from the SAME constant, so the two
    * engines walk the identical trajectory (the HITS-oracle pattern).
    */
  private def topEigenvectorSql: String = {
    // MATERIALIZED: without it DuckDB may inline each round's CTE into
    // the next, re-expanding the whole iteration chain exponentially —
    // the oracle-side analogue of the localCheckpoint above.
    val iters = (1 to EigenIters).map { i =>
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      s"""w$i AS MATERIALIZED (SELECT a, CAST(sum(c * v) AS BIGINT) AS w
         |       FROM f JOIN $prev ON b = dim GROUP BY a),
         |mx$i AS MATERIALIZED (SELECT CAST(max(abs(w)) AS BIGINT) AS wmax
         |        FROM w$i HAVING max(abs(w)) > 0),
         |v$i AS MATERIALIZED (SELECT a AS dim, CAST(sign(w) AS BIGINT) *
         |    CAST(floor(1000000.0 * CAST(abs(w) AS DOUBLE) /
         |      CAST(wmax AS DOUBLE)) AS BIGINT) AS v
         |  FROM w$i CROSS JOIN mx$i)""".stripMargin
    }.mkString(",\n")
    val last = s"v$EigenIters"
    s"""WITH u AS (SELECT vec_id,
       |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
       |    CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 16777216.0)
       |      AS BIGINT) AS xe
       |  FROM embeddings),
       |p AS (SELECT a.pos AS pos_a, b.pos AS pos_b,
       |    sum(CAST(a.xe AS HUGEINT) * b.xe) AS pab
       |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos <= b.pos
       |  GROUP BY 1, 2),
       |m AS (SELECT pos, CAST(sum(xe) AS BIGINT) AS sx, count(*) AS n
       |      FROM u GROUP BY 1),
       |tri AS (SELECT pos_a, pos_b,
       |  CAST(floor(1000000000.0 *
       |    ((CAST(pab AS DOUBLE) / ma.n -
       |      (CAST(ma.sx AS DOUBLE) / ma.n) *
       |        (CAST(mb.sx AS DOUBLE) / ma.n)) /
       |     (16777216.0 * 16777216.0))) AS BIGINT) AS c
       |  FROM p JOIN m ma ON pos_a = ma.pos JOIN m mb ON pos_b = mb.pos),
       |f AS MATERIALIZED (SELECT pos_a AS a, pos_b AS b, c FROM tri
       |      UNION ALL
       |      SELECT pos_b, pos_a, c FROM tri WHERE pos_a <> pos_b),
       |v0 AS MATERIALIZED (SELECT DISTINCT a AS dim,
       |      CAST(1000000 AS BIGINT) AS v FROM f),
       |$iters,
       |sg AS (SELECT CAST(sign(v) AS BIGINT) AS sgn FROM $last
       |       ORDER BY abs(v) DESC, dim ASC LIMIT 1)
       |SELECT CAST(dim AS INT) AS dim, CAST(v * sgn AS BIGINT) AS v_e6
       |FROM $last CROSS JOIN sg ORDER BY dim""".stripMargin
  }

  /** Power-iteration rounds for the leading-eigenvector key — fixed so
    * both engines unroll the identical trajectory.
    */
  private val EigenIters = 8

  /** Leading eigenvector of the embedding covariance by EigenIters
    * fixed power iterations — the first PCA axis, the direction a
    * whitening or anisotropy diagnosis needs. The matrix is the
    * D²-cell integer cov_e9 table (64×64 here — broadcast-sized at any
    * corpus scale, since D is the embedding dim, not the row count);
    * each iteration is one matrix·vector join-aggregate in exact
    * BIGINT (|w| ≤ D·|cov|·10⁶ ≈ 10¹⁷ headroom) followed by max-|w|
    * normalization — sign split from magnitude so the integer division
    * never sees a negative operand (Spark div truncates toward zero,
    * DuckDB // floors: they disagree BELOW zero, agree above — the
    * same reason `q_pagerank` keeps its arithmetic non-negative). The
    * magnitude ratio is one mirrored float sequence per round. Output
    * canonicalized so the max-|v| component (tie lowest dim) is
    * positive; the spec pins cosine ≥ 0.98 against a double-precision
    * recompute of the same trajectory.
    */
  private val qTopEigenvector: Q = (s, d) => {
    import s.implicits._
    // The DISTRIBUTED stage is the corpus-sized covariance aggregation
    // (covCells — one pos-pair shuffle over the exploded embeddings);
    // the matrix itself is D² cells, data-independent and broadcast-
    // small BY CONSTRUCTION (D is the embedding dim, not the row
    // count), so the EigenIters power rounds run as driver arithmetic
    // over the collected cells — the Ranks per-partition-subtotal
    // exception: ≤ D² rows ever cross the driver, never corpus rows.
    // Every integer/float operation is the SAME sequence the former
    // join-based rounds (and the unchanged oracle) execute, so results
    // are bit-identical; the rewrite removes EigenIters scheduler
    // round-trips that dominated the key's bench cost (measured
    // 4–5 s → covariance-only, iterations ≪ 1 ms).
    val tri = covCells(s, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val full = tri.flatMap { case (a, b, c) =>
      if (a == b) Seq((a, b, c)) else Seq((a, b, c), (b, a, c)) }
    val byRow = full.groupBy(_._1)
    var v: Map[Int, Long] = full.map(_._1).distinct.map(_ -> 1000000L).toMap
    var it = 0
    while (it < EigenIters && v.nonEmpty) {
      val w = byRow.map { case (a, rows) =>
        a -> rows.iterator.map { case (_, b, c) => c * v(b) }.sum }
      val wmax = if (w.isEmpty) 0L else w.valuesIterator.map(math.abs).max
      // mirror the former plan (and the oracle): a zero matrix drains
      // the vector to the empty result rather than freezing it
      v =
        if (wmax == 0L) Map.empty
        else w.map { case (a, x) =>
          a -> math.signum(x) *
            math.floor(1000000.0 * math.abs(x).toDouble / wmax.toDouble)
              .toLong }
      it += 1
    }
    val out =
      if (v.isEmpty) Seq.empty[(Int, Long)]
      else {
        val winner = v.maxBy { case (dim, vv) => (math.abs(vv), -dim) }
        val sgn = math.signum(winner._2)
        v.toSeq.sortBy(_._1).map { case (dim, vv) => (dim, vv * sgn) }
      }
    out.toDF("dim", "v_e6").orderBy("dim")
  }

  /** Inverse-frequency class weights for the language column — the
    * balancing weight table a training loop multiplies into its loss
    * (rare classes weigh more; weights average ~1 across classes).
    * weight_e6 = 10⁶·N DIV (L·n_c), pure integer arithmetic; N and L
    * re-aggregate from the class-sized table (no second corpus scan —
    * the exchange-reuse pattern PlanSpec pins for target-encode).
    */
  private val qClassWeights: Q = (s, d) => {
    val per = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum("n_docs").as("n_total"),
      count(lit(1)).as("n_classes"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        expr("1000000 * n_total DIV (n_classes * n_docs)").as("weight_e6"))
      .orderBy("lang")
  }

  /** Column profiling: per-column count/nulls/distinct in one pass shape
    * (a union of per-column aggregates — the data-quality health check).
    */
  private val qProfile: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val cols = Seq("l_returnflag", "l_linestatus", "l_suppkey")
    cols.map { c =>
      li.agg(
        lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"))
    }.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  /** Incremental ingest dedup: new docs (doc_id ≥ 400) against the
    * accumulated corpus (doc_id < 400) — cross pairs only.
    */
  private val qDedupIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.incrementalNearDups(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text", threshold = 0.5)
      .orderBy(col("corpus_doc"), col("new_doc"))
  }

  /** Approximate percentile sketch — approximate by design, rows-only. */
  /** Scalar output columns (not the raw percentile array): the driver's
    * differential check loads results into pandas, which cannot sort or
    * hash array-typed cells.
    */
  private val qApproxPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)")
        .as("pp"))
      .select(col("l_returnflag"),
        element_at(col("pp"), 1).as("p50_price"),
        element_at(col("pp"), 2).as("p99_price"))
      .orderBy(col("l_returnflag"))

  /** Sequence packing (pretraining batch assembly): assign docs to fixed
    * token-budget packs. Streaming first-boundary packing in doc_id
    * order: a doc's pack is the exclusive cumulative token count divided
    * by the budget. The cumulative sum is the distributed
    * range-partitioned running total ([[graft.ops.Ranks]]): per-partition
    * windows (parallel) plus collected partition subtotals — no
    * single-partition window in the plan (PlanSpec pins this), so
    * packing scales with the corpus.
    */
  private val qPackSequences: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .select(col("doc_id"), col("n_tokens"))
    graft.ops.Ranks.globalRunningSum(toks, Seq(col("doc_id").asc),
        col("n_tokens"), "cum")
      .select(col("doc_id"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / 512.0).cast("long").as("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** Overlapping token-window chunking (context-window prep / RAG
    * indexing): 32-token chunks at stride 16, one row per (doc, offset).
    * Pure map-side generator — explode(sequence) + slice — no shuffle.
    */
  private val qChunkTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(16))).as("start"),
        col("toks"))
      .select(col("doc_id"),
        (col("start") / 16).cast("long").as("chunk_idx"),
        array_join(slice(col("toks"), col("start") + 1, lit(32)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Benchmark decontamination: the held-out eval set is the deterministic
    * `doc_id % 10 = 7` tenth of the corpus (standing in for a benchmark
    * suite); every other doc is training data. A train doc is
    * contaminated if it shares ≥1 distinct 3-shingle with any eval doc.
    */
  private val qDecontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.contaminationReport(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7),
        docs.filter(pmod(col("doc_id"), lit(10)) === 7),
        "doc_id", "text", shingleSize = 3)
      .orderBy(col("doc_id"))
  }

  private val qRepetitionFilter: Q = (s, d) =>
    TextStats.repetitionMetrics(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Domain mixing: rebalance the corpus to ≤40 docs per language,
    * selected in deterministic md5-of-key order.
    */
  private val qDomainMix: Q = (s, d) =>
    TextStats.stratifiedSample(Tables.documents(s, d), "doc_id", "lang", 40)
      .orderBy(col("lang"), col("rn"))

  /** Heaps'-law vocabulary growth curve: cumulative distinct-term count
    * vs cumulative token count at corpus deciles (docs in doc_id
    * order) — the "is the corpus still yielding new vocabulary?"
    * readout a data-curation loop watches to decide whether more
    * crawling pays. Each term is charged to the decile of its FIRST
    * document (min doc_id per term — one groupBy over the exploded
    * terms, one join back to the doc spine), so no per-checkpoint
    * rescan: the whole curve costs two shuffles regardless of how many
    * checkpoints it reports. The only windows scan the 10-row decile
    * table. Tokens/terms drop empties, matching `q_vocab_spectrum`'s
    * convention.
    */
  private val qHeapsLaw: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val ranked = graft.ops.Ranks.globalRowNumber(
      docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("toks")),
      Seq(col("doc_id").asc), "rn")
    val tot = ranked.agg(count(lit(1)).as("nd"))
    val withDec = ranked.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("toks"),
        expr("(CAST(rn AS BIGINT) - 1) * 10 DIV nd").as("decile"))
    val perDecTok = withDec.groupBy("decile")
      .agg(count(lit(1)).as("docs"), sum("toks").as("dtoks"))
    val firstSeen = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(min("doc_id").as("fd"))
    val vocabPerDec = firstSeen
      .join(withDec.select(col("doc_id").as("fd"), col("decile")), "fd")
      .groupBy("decile").agg(count(lit(1)).as("dvocab"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecTok.join(vocabPerDec, Seq("decile"), "left")
      .withColumn("dvocab", coalesce(col("dvocab"), lit(0L)))
      .select(col("decile"), col("docs"),
        sum("dtoks").over(w).as("cum_tokens"),
        sum("dvocab").over(w).as("cum_vocab"))
      .orderBy("decile")
  }

  /** Zipf rank–frequency slope: OLS fit of ln(freq) on ln(rank) over
    * the top-1000 terms — the one-number power-law conformance check
    * (natural text sits near −1; boilerplate-heavy or synthetic
    * corpora drift). The top-k is TakeOrderedAndProject (never a
    * global sort materialized); the only global window ranks the
    * 1,000 collected survivors. Determinism rides the per-row integer
    * floor: lx = ⌊10⁶·ln(rank)⌋ / ly = ⌊10⁶·ln(freq)⌋ are exact
    * BIGINTs (the `q_perplexity_lm` log discipline), their moments sum
    * order-independently (|Σlx·ly| ≤ 1000·1.5·10¹⁴, Long-safe), and
    * the final slope is ONE mirrored float sequence over those exact
    * moments. Ranks are all-distinct so the Var(lx) denominator is
    * positive whenever n ≥ 2 — the n ≥ 2 filter is the only degenerate
    * guard needed, mirrored oracle-side.
    */
  private val qZipfSlope: Q = (s, d) => {
    val tf = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val top = tf.orderBy(col("f").desc, col("w").asc).limit(1000)
    val rw = Window.orderBy(col("f").desc, col("w").asc)
    val pts = top.withColumn("rnk", row_number().over(rw).cast("long"))
      .select(
        floor(lit(1000000.0) * log(col("rnk").cast("double")))
          .cast("long").as("lx"),
        floor(lit(1000000.0) * log(col("f").cast("double")))
          .cast("long").as("ly"))
    pts.agg(count(lit(1)).as("n"), sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      .filter(col("n") >= 2L)
      .select(col("n"),
        floor(lit(1000000.0) *
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
          .cast("long").as("slope_e6"))
      .orderBy("n")
  }

  /** Jensen–Shannon divergence of each source's unigram distribution
    * from the corpus-wide one — the bounded, symmetric corpus-mix
    * monitor (JSD ∈ [0, ln 2]; `q_psi_drift` screens one scalar
    * feature, this compares whole token distributions, the quantity a
    * pretraining-mix dashboard tracks per source). Per-(source, token)
    * contributions ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2 floor to
    * e9 BEFORE the per-source sum (the q_mutual_info per-term
    * discipline — the integer sum is order-independent; each term is
    * ONE mirrored float sequence). The q-side term exists even where
    * the source never emits the token, so the term grid is sources ×
    * vocab — built from a broadcast of the vocab-sized totals table,
    * bounded by |vocab|·|sources|, never corpus-sized; the only
    * corpus-sized work is the one (source, token) count shuffle.
    */
  private val qJsDivergence: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.ops.TextStats.tokens(col("text"))).as("tok"))
    val cts = toks.groupBy("source", "tok").agg(count(lit(1)).as("cts"))
    val ct = cts.groupBy("tok").agg(sum("cts").as("ct"))
    val ns = cts.groupBy("source").agg(sum("cts").as("ns"))
    val nn = ct.agg(sum("ct").as("nn"))
    val grid = ns.crossJoin(broadcast(ct))
      .join(cts, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("cts"))
      .crossJoin(broadcast(nn))
    val p = col("cts").cast("double") / col("ns").cast("double")
    val q = col("ct").cast("double") / col("nn").cast("double")
    val m = (p + q) / lit(2.0)
    val terms = grid.select(col("source"), col("ns"),
      floor(lit(500000000.0) * (
        when(col("cts") > 0L, p * log(p / m)).otherwise(lit(0.0)) +
          q * log(q / m)
      )).cast("long").as("term_e9"))
    terms.groupBy("source", "ns")
      .agg(count(lit(1)).as("vocab"), sum("term_e9").as("jsd_e9"))
      .select(col("source"), col("ns").as("n_tokens"), col("vocab"),
        col("jsd_e9"))
      .orderBy("source")
  }

  /** Simpson diversity of each source's token distribution: the
    * probability two tokens drawn without replacement coincide,
    * Σc(c−1) / (N(N−1)) in exact ppm, plus the inverse-Simpson
    * "effective vocabulary" — the pure-INTEGER diversity measure beside
    * `q_entropy`'s float bits (Simpson weights common types
    * quadratically, so template/boilerplate dominance moves it harder
    * than entropy). One (source, token) count shuffle, source-sized
    * output. Headroom: 10⁶·Σc(c−1) and N(N−1) stay in BIGINT to ~3·10⁹
    * tokens per source; past that promote to DECIMAL(38,0) (the
    * q_pmi_cooccur point).
    */
  private val qSimpsonDiversity: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"), sum("c").as("n"),
        sum(col("c") * (col("c") - 1L)).as("coll"))
      .filter(col("n") >= 2L)
      .select(col("source"), col("vocab"), col("n"),
        expr("1000000 * coll DIV (n * (n - 1))").as("simpson_ppm"),
        expr("CASE WHEN coll > 0 THEN 1000 * n * (n - 1) DIV coll " +
          "ELSE 0 END").as("inv_simpson_e3"))
      .orderBy("source")
  }

  val registry: Map[String, Q] = Map(
    "q_simpson_diversity" -> qSimpsonDiversity,
    "q_js_divergence" -> qJsDivergence,
    "q_heaps_law" -> qHeapsLaw,
    "q_zipf_slope" -> qZipfSlope,
    "q_decontaminate" -> qDecontaminate,
    "q_repetition_filter" -> qRepetitionFilter,
    "q_domain_mix" -> qDomainMix,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_approx_percentile" -> qApproxPercentile,
    "q_sample_split" -> qSampleSplit,
    "q_sample_bottomk" -> qSampleBottomk,
    "q_weighted_sample" -> qWeightedSample,
    "q_bigram_lm" -> qBigramLm,
    "q_perplexity_lm" -> qPerplexityLm,
    "q_ppl_filter" -> qPplFilter,
    "q_silhouette" -> qSilhouette,
    "q_covariance_matrix" -> qCovarianceMatrix,
    "q_top_eigenvector" -> qTopEigenvector,
    "q_dim_corr" -> qDimCorr,
    "q_class_weights" -> qClassWeights,
    "q_profile" -> qProfile,
    "q_top_ngrams" -> qTopNgrams,
    "q_bpe_pairs" -> qBpePairs,
    "q_bpe_merge" -> qBpeMerge,
    "q_pmi_cooccur" -> qPmiCooccur,
    "q_vocab_spectrum" -> qVocabSpectrum,
    "q_dedup_containment" -> qDedupContainment,
    "q_stopword_filter" -> qStopwordFilter,
    "q_tfidf" -> qTfidf,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_clusters" -> qDedupClusters,
    "q_dedup_representatives" -> qDedupRepresentatives,
    "q_cluster_sizes" -> qClusterSizes,
    "q_dup_rate_by_source" -> qDupRateBySource,
    "q_cross_source_overlap" -> qCrossSourceOverlap,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_eval" -> qDedupEval,
    "q_dedup_prefix" -> qDedupPrefix,
    "q_dataset_card" -> qDatasetCard,
    "q_dedup_ngram" -> qDedupNgram,
    "q_dedup_embedding" -> qDedupEmbedding,
    "q_emb_dedup_eval" -> qEmbDedupEval,
    "q_cosine_topk" -> qCosineTopk,
    "q_knn_label" -> qKnnLabel,
    "q_hard_negatives" -> qHardNegatives,
    "q_emb_norm_profile" -> qEmbNormProfile,
    "q_emb_quantize" -> qEmbQuantize,
    "q_centroid_dist" -> qCentroidDist,
    "q_emb_variance" -> qEmbVariance,
    "q_ann_ivf" -> qAnnIvf,
    "q_ann_ivf_exhaustive" -> qAnnIvfExhaustive,
    "q_ann_lsh" -> qAnnLsh,
    "q_fuzzy_match" -> qFuzzyMatch,
    "q_entity_clusters" -> qEntityClusters,
    "q_text_stats" -> qTextStats,
    "q_lang_agg" -> qLangAgg,
    "q_lang_id" -> qLangId,
    "q_langid_eval" -> qLangidEval,
    "q_naive_bayes" -> qNaiveBayes,
    "q_countmin" -> qCountmin,
    "q_tfidf_cosine" -> qTfidfCosine,
    "q_kmeans" -> qKmeans,
    "q_cluster_topics" -> qClusterTopics,
    "q_keyphrases" -> qKeyphrases,
    "q_token_dropout" -> qTokenDropout,
    "q_span_mask" -> qSpanMask,
    "q_curriculum_order" -> qCurriculumOrder,
    "q_quality_score" -> qQualityScore,
    "q_token_count" -> qTokenCount,
    "q_fingerprint" -> qFingerprint,
    "q_fingerprint_rolling" -> qFingerprintRolling,
    "q_pack_sequences" -> qPackSequences,
    "q_chunk_tokens" -> qChunkTokens,
  )

  /** Shared DuckDB CTE: per-doc distinct 3-shingle list. */
  private val shingleCte =
    """WITH s AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                for i in range(1, len(t) - 1)]) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin

  /** Components oracle: exact-Jaccard pairs (same predicate as the Spark
    * LSH+verify pipeline) closed transitively with a recursive CTE; the
    * canonical id is the minimum reachable doc_id. Docs outside every
    * pair canonicalize to themselves.
    */
  private def clustersSql(threshold: Double): String =
    s"""${shingleCte.replace("WITH s AS", "WITH RECURSIVE s AS")},
       |p AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id
       |      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
       |            len(list_distinct(list_concat(a.sh, b.sh))) >= $threshold),
       |e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p
       |      UNION SELECT doc_b, doc_a FROM p),
       |r(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
       |  UNION
       |  SELECT e.a, r.b FROM e JOIN r ON r.a = e.b),
       |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM r GROUP BY a)
       |SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
       |ORDER BY d.doc_id""".stripMargin

  private def jaccardPairsSql(threshold: Double): String =
    s"""$shingleCte,
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        len(list_intersect(a.sh, b.sh)) * 1.0 /
       |        len(list_distinct(list_concat(a.sh, b.sh))) AS jac
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(floor(jac * 1000000) AS BIGINT) AS jaccard_e6
       |FROM p WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash oracle generated with the same chunk/bit loops as the Spark
    * plan in [[Dedup.simhashChunks]] — md5 makes the two engines agree
    * bit-for-bit.
    */
  private def simhashOracleSql(maxHamming: Int): String = {
    val chunkDefs = (0 until Dedup.SimhashChunks)
      .map(c => s"('0x' || substr(md5(tok), ${1 + 4 * c}, 4))::INT AS c$c")
      .mkString(", ")
    val bitSums = (0 until 64).map { b =>
      val c = b / 16; val k = b % 16
      s"sum(CASE WHEN ((c$c >> $k) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val chunkAsm = (0 until Dedup.SimhashChunks).map { c =>
      (0 until 16).map(k => s"(CASE WHEN s${c * 16 + k} > 0 THEN ${1 << k} ELSE 0 END)")
        .mkString(" + ") + s" AS sh$c"
    }.mkString(", ")
    val ham = (0 until Dedup.SimhashChunks)
      .map(c => s"bit_count(xor(a.sh$c, b.sh$c))").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |h AS (SELECT doc_id, $chunkDefs FROM tok),
       |s AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $chunkAsm FROM s),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $ham AS hamming
       |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM p
       |WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Merged truth⋈prediction oracle for `q_dedup_eval`: the exact-Jaccard
    * pair CTE and the SimHash pair CTE (same generator loops as
    * [[simhashOracleSql]]) scored with INTERSECT/EXCEPT counts — both
    * operand pipelines are the ones the standalone dedup oracles already
    * pin, so the confusion counts are exact on both engines.
    */
  private def dedupEvalSql(maxHamming: Int, threshold: Double): String = {
    val chunkDefs = (0 until Dedup.SimhashChunks)
      .map(c => s"('0x' || substr(md5(tok), ${1 + 4 * c}, 4))::INT AS c$c")
      .mkString(", ")
    val bitSums = (0 until 64).map { b =>
      val c = b / 16; val k = b % 16
      s"sum(CASE WHEN ((c$c >> $k) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val chunkAsm = (0 until Dedup.SimhashChunks).map { c =>
      (0 until 16).map(k => s"(CASE WHEN s${c * 16 + k} > 0 THEN ${1 << k} ELSE 0 END)")
        .mkString(" + ") + s" AS sh$c"
    }.mkString(", ")
    val ham = (0 until Dedup.SimhashChunks)
      .map(c => s"bit_count(xor(a.sh$c, b.sh$c))").mkString(" + ")
    s"""$shingleCte,
       |truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id
       |      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
       |            len(list_distinct(list_concat(a.sh, b.sh))) >= $threshold),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hh AS (SELECT doc_id, $chunkDefs FROM tok),
       |bs AS (SELECT doc_id, $bitSums FROM hh GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, $chunkAsm FROM bs),
       |pred AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
       |      WHERE $ham <= $maxHamming),
       |cnt AS (SELECT
       |  (SELECT count(*) FROM (SELECT * FROM truth
       |     INTERSECT SELECT * FROM pred)) AS tp,
       |  (SELECT count(*) FROM (SELECT * FROM pred
       |     EXCEPT SELECT * FROM truth)) AS fp,
       |  (SELECT count(*) FROM (SELECT * FROM truth
       |     EXCEPT SELECT * FROM pred)) AS fn)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn,
       |  CAST(1000000 * tp // (tp + fp) AS BIGINT) AS precision_ppm,
       |  CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm
       |FROM cnt WHERE tp + fp > 0 AND tp + fn > 0 ORDER BY tp""".stripMargin
  }

  /** Oracle for the Karp-Rabin winnowing fingerprint: per-window
    * polynomial sum with mod-powers precomputed here (31^p overflows
    * BIGINT beyond p=12, so the reduced powers are inlined as literals).
    * Congruent mod M to the Spark side's O(n) rolling accumulation.
    */
  private def rollingFingerprintSql(k: Int): String = {
    val M = graft.functions.RollingHashMin.Mod
    val B = graft.functions.RollingHashMin.Base
    val pows = (0 until k).map { j =>
      var p = 1L
      (0 until (k - 1 - j)).foreach(_ => p = p * B % M)
      p
    }
    val terms = (0 until k).map { j =>
      s"CAST(ord(substr(text, CAST(i + ${j + 1} AS INT), 1)) AS BIGINT) * ${pows(j)} % $M"
    }.mkString("[", ", ", "]")
    s"""WITH w AS (
       |  SELECT doc_id, unnest(range(0, greatest(length(text) - ${k - 1}, 0))) AS i, text
       |  FROM documents),
       |h AS (SELECT doc_id, list_sum($terms) % $M AS wh FROM w)
       |SELECT d.doc_id, CAST(hh.mh AS BIGINT) AS min_window_hash
       |FROM documents d LEFT JOIN
       |  (SELECT doc_id, min(wh) AS mh FROM h GROUP BY doc_id) hh USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private val cosineCte =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin

  private def cosExpr(a: String, b: String): String =
    s"""list_dot_product($a.v, $b.v) /
       |(sqrt(list_dot_product($a.v, $a.v)) * sqrt(list_dot_product($b.v, $b.v)))""".stripMargin

  /** Oracle for the LSH-blocked embedding near-dup: mirrors
    * [[graft.functions.SrpBands]] bit-for-bit. Each hyperplane appears as
    * a literal ±1 vector fed to native `list_dot_product` (sequential
    * fold, same accumulation order as `dot_arr`; ±1 multiplies are
    * exact), so the sign decisions — hence the candidate sets — agree
    * with Spark exactly. Band codes are band-tagged like SrpBands'
    * output and a pair is a candidate iff the tagged code lists
    * intersect (`list_has_any` ≡ the banded equi join). Literal vectors
    * rather than a lambda over sign masks: DuckDB executes the native
    * dot ~100× faster than interpreted nested lambdas (3.5 s vs >6 min
    * at sf0.01). `dims` is the corpus's embedding width (the oracle is
    * data-calibrated, like the LSH thresholds above).
    */
  private def embeddingBlockedSql(threshold: Double, bands: Int, bits: Int,
                                  dims: Int): String = {
    def planeLit(p: Int): String =
      (0 until dims).map(j =>
        if (graft.functions.SrpBands.positive(p, j)) "1" else "-1")
        .mkString("CAST([", ",", "] AS DOUBLE[])")
    val ct = (0 until bands).map { b =>
      val terms = (0 until bits).map { i =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(b * bits + i)}) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"${b * (1L << bits)} + $terms"
    }.mkString("[", ",\n", "]")
    s"""$cosineCte,
       |c AS (SELECT vec_id, v, $ct AS ct FROM e),
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |        ${cosExpr("a", "b")} AS cos
       |      FROM c a JOIN c b ON a.vec_id < b.vec_id AND list_has_any(a.ct, b.ct))
       |SELECT vec_a, vec_b, CAST(floor(cos * 1000000) AS BIGINT) AS cos_e6
       |FROM p WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Merged truth⋈candidate oracle for `q_emb_dedup_eval`: the exact
    * all-pairs cosine truth and the bit-mirrored SRP band candidates
    * (same planeLit loops as [[embeddingBlockedSql]]) scored with
    * INTERSECT/EXCEPT counts.
    */
  private def embDedupEvalSql(threshold: Double, bands: Int, bits: Int,
                              dims: Int): String = {
    def planeLit(p: Int): String =
      (0 until dims).map(j =>
        if (graft.functions.SrpBands.positive(p, j)) "1" else "-1")
        .mkString("CAST([", ",", "] AS DOUBLE[])")
    val ct = (0 until bands).map { b =>
      val terms = (0 until bits).map { i =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(b * bits + i)}) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"${b * (1L << bits)} + $terms"
    }.mkString("[", ",\n", "]")
    s"""$cosineCte,
       |truth AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |      FROM e a JOIN e b ON a.vec_id < b.vec_id
       |      WHERE ${cosExpr("a", "b")} >= $threshold),
       |c AS (SELECT vec_id, $ct AS ct FROM e),
       |pred AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |      FROM c a JOIN c b ON a.vec_id < b.vec_id
       |        AND list_has_any(a.ct, b.ct)),
       |cnt AS (SELECT
       |  (SELECT count(*) FROM (SELECT * FROM truth
       |     INTERSECT SELECT * FROM pred)) AS tp,
       |  (SELECT count(*) FROM (SELECT * FROM pred
       |     EXCEPT SELECT * FROM truth)) AS fp,
       |  (SELECT count(*) FROM (SELECT * FROM truth
       |     EXCEPT SELECT * FROM pred)) AS fn)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn,
       |  CAST(1000000 * tp // (tp + fp) AS BIGINT) AS precision_ppm,
       |  CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm
       |FROM cnt WHERE tp + fp > 0 AND tp + fn > 0 ORDER BY tp""".stripMargin
  }

  /** Exact top-5 cosine neighbors of the query subset — the oracle for
    * both the brute-force baseline and the exhaustive IVF gate.
    */
  private val cosineTopkSql: String =
    s"""$cosineCte,
       |p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |        ${cosExpr("q", "c")} AS cos
       |      FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |r AS (SELECT q_id, n_id, cos,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
       |      FROM p)
       |SELECT q_id, n_id, rnk, CAST(floor(cos * 1000000) AS BIGINT) AS cos_e6
       |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  private val langIdSql: String = {
    val scores = TextStats.LangMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_intersect(tset, [$lst])) AS score_$lang"
    }.mkString(", ")
    val langs = TextStats.LangMarkers.map(_._1)
    val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN score_$l = best THEN '$l'").mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS tset
       |           FROM documents),
       |sc AS (SELECT doc_id, lang, $scores FROM t),
       |b AS (SELECT *, $best AS best FROM sc)
       |SELECT doc_id, lang AS actual_lang, CASE $cases END AS predicted_lang,
       |       best AS best_score
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Shared oracle CTE chain for the 2-round Lloyd fit (u → … → c2,
    * a3): q_kmeans reads the centroids, q_cluster_topics the
    * assignment. Must be defined before the oracle map (object-init
    * order).
    */
  private val kmeansFitCtes: String =
    """u AS MATERIALIZED (SELECT vec_id,
      |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
      |    CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 16777216.0)
      |      AS BIGINT) AS xe
      |  FROM embeddings),
      |c0 AS MATERIALIZED (SELECT vec_id AS k, pos, xe AS ce FROM u
      |  WHERE vec_id < 8),
      |cn0 AS MATERIALIZED (SELECT k, CAST(sum(ce * ce) AS BIGINT) AS cn2
      |  FROM c0 GROUP BY 1),
      |d1 AS MATERIALIZED (SELECT u.vec_id, c0.k,
      |    CAST(sum(u.xe * c0.ce) AS BIGINT) AS dot
      |  FROM u JOIN c0 ON u.pos = c0.pos GROUP BY 1, 2),
      |a1 AS MATERIALIZED (SELECT vec_id, k FROM
      |    (SELECT d1.vec_id, d1.k,
      |       row_number() OVER (PARTITION BY d1.vec_id
      |         ORDER BY cn2 - 2 * dot ASC, d1.k ASC) AS rn
      |     FROM d1 JOIN cn0 ON d1.k = cn0.k)
      |  WHERE rn = 1),
      |c1 AS MATERIALIZED (SELECT k, pos,
      |    CAST(sign(sum(xe)) AS BIGINT) *
      |      (abs(CAST(sum(xe) AS BIGINT)) // count(*)) AS ce
      |  FROM u JOIN a1 USING (vec_id) GROUP BY 1, 2),
      |cn1 AS MATERIALIZED (SELECT k, CAST(sum(ce * ce) AS BIGINT) AS cn2
      |  FROM c1 GROUP BY 1),
      |d2 AS MATERIALIZED (SELECT u.vec_id, c1.k,
      |    CAST(sum(u.xe * c1.ce) AS BIGINT) AS dot
      |  FROM u JOIN c1 ON u.pos = c1.pos GROUP BY 1, 2),
      |a2 AS MATERIALIZED (SELECT vec_id, k FROM
      |    (SELECT d2.vec_id, d2.k,
      |       row_number() OVER (PARTITION BY d2.vec_id
      |         ORDER BY cn2 - 2 * dot ASC, d2.k ASC) AS rn
      |     FROM d2 JOIN cn1 ON d2.k = cn1.k)
      |  WHERE rn = 1),
      |c2 AS MATERIALIZED (SELECT k, pos,
      |    CAST(sign(sum(xe)) AS BIGINT) *
      |      (abs(CAST(sum(xe) AS BIGINT)) // count(*)) AS ce
      |  FROM u JOIN a2 USING (vec_id) GROUP BY 1, 2),
      |cn2_ AS MATERIALIZED (SELECT k, CAST(sum(ce * ce) AS BIGINT) AS cn2
      |  FROM c2 GROUP BY 1),
      |d3 AS MATERIALIZED (SELECT u.vec_id, c2.k,
      |    CAST(sum(u.xe * c2.ce) AS BIGINT) AS dot
      |  FROM u JOIN c2 ON u.pos = c2.pos GROUP BY 1, 2),
      |a3 AS MATERIALIZED (SELECT vec_id, k FROM
      |    (SELECT d3.vec_id, d3.k,
      |       row_number() OVER (PARTITION BY d3.vec_id
      |         ORDER BY cn2 - 2 * dot ASC, d3.k ASC) AS rn
      |     FROM d3 JOIN cn2_ ON d3.k = cn2_.k)
      |  WHERE rn = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_simpson_diversity" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks WHERE tok <> '' GROUP BY 1, 2),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS coll
        |  FROM c GROUP BY 1)
        |SELECT source, vocab, n,
        |  CAST(1000000 * coll // (n * (n - 1)) AS BIGINT) AS simpson_ppm,
        |  CAST(CASE WHEN coll > 0 THEN 1000 * n * (n - 1) // coll
        |    ELSE 0 END AS BIGINT) AS inv_simpson_e3
        |FROM a WHERE n >= 2 ORDER BY source""".stripMargin,
    "q_js_divergence" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cts
        |  FROM toks GROUP BY 1, 2),
        |ct AS (SELECT tok, CAST(sum(cts) AS BIGINT) AS ct
        |  FROM cts GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(cts) AS BIGINT) AS ns
        |  FROM cts GROUP BY 1),
        |nn AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM ct),
        |grid AS (SELECT ns.source, ns.ns, ct.tok, ct.ct,
        |    coalesce(cts.cts, 0) AS cts
        |  FROM ns CROSS JOIN ct
        |  LEFT JOIN cts ON cts.source = ns.source AND cts.tok = ct.tok),
        |t AS (SELECT source, ns,
        |    CAST(floor(500000000.0 * (
        |      CASE WHEN cts > 0 THEN
        |        (CAST(cts AS DOUBLE) / CAST(ns AS DOUBLE)) *
        |          ln((CAST(cts AS DOUBLE) / CAST(ns AS DOUBLE)) /
        |            (((CAST(cts AS DOUBLE) / CAST(ns AS DOUBLE)) +
        |              (CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))) / 2.0))
        |      ELSE 0.0 END +
        |      (CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |        ln((CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE)) /
        |          (((CAST(cts AS DOUBLE) / CAST(ns AS DOUBLE)) +
        |            (CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))) / 2.0))
        |    )) AS BIGINT) AS term_e9
        |  FROM grid CROSS JOIN nn)
        |SELECT source, ns AS n_tokens, CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(term_e9) AS BIGINT) AS jsd_e9
        |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin,
    "q_heaps_law" ->
      """WITH dr AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS toks,
        |    row_number() OVER (ORDER BY doc_id) AS rn
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM dr),
        |wd AS (SELECT doc_id, toks,
        |    (CAST(rn AS BIGINT) - 1) * 10 // nd AS decile
        |  FROM dr CROSS JOIN tot),
        |pt AS (SELECT decile, CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(toks) AS BIGINT) AS dtoks FROM wd GROUP BY 1),
        |fs AS (SELECT w, min(doc_id) AS fd
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |vd AS (SELECT wd.decile, CAST(count(*) AS BIGINT) AS dvocab
        |  FROM fs JOIN wd ON fs.fd = wd.doc_id GROUP BY 1)
        |SELECT CAST(pt.decile AS BIGINT) AS decile, docs,
        |  CAST(sum(dtoks) OVER (ORDER BY pt.decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(coalesce(dvocab, 0)) OVER (ORDER BY pt.decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM pt LEFT JOIN vd ON vd.decile = pt.decile
        |ORDER BY decile""".stripMargin,
    "q_zipf_slope" ->
      """WITH tf AS (SELECT w, count(*) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |top AS (SELECT * FROM tf ORDER BY f DESC, w ASC LIMIT 1000),
        |pts AS (SELECT
        |    CAST(floor(1000000.0 * ln(CAST(row_number()
        |      OVER (ORDER BY f DESC, w ASC) AS DOUBLE))) AS BIGINT) AS lx,
        |    CAST(floor(1000000.0 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS ly
        |  FROM top),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
        |    CAST(sum(lx * ly) AS BIGINT) AS sxy,
        |    CAST(sum(lx * lx) AS BIGINT) AS sxx
        |  FROM pts)
        |SELECT n,
        |  CAST(floor(1000000.0 *
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
        |    AS slope_e6
        |FROM m WHERE n >= 2 ORDER BY n""".stripMargin,
    "q_decontaminate" ->
      s"""$shingleCte,
         |ev AS (SELECT doc_id AS eval_id, unnest(sh) AS g FROM s WHERE doc_id % 10 = 7),
         |tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 10 <> 7)
         |SELECT tr.doc_id, count(DISTINCT ev.eval_id) AS n_eval_docs,
         |       count(DISTINCT tr.g) AS n_shared_shingles
         |FROM tr JOIN ev ON tr.g = ev.g
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    "q_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n_tok, len(list_distinct(toks)) AS n_uniq
        |      FROM t WHERE len(toks) >= 2),
        |g AS (SELECT doc_id,
        |        unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
        |      FROM t WHERE len(toks) >= 2),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |gt AS (SELECT doc_id, max(c) AS max_bigram, sum(c) AS n_bigrams FROM gc GROUP BY 1),
        |m AS (SELECT b.doc_id,
        |        CAST(floor((1.0 - n_uniq * 1.0 / n_tok) * 1000000) AS BIGINT) AS dup_token_frac_e6,
        |        CAST(floor(max_bigram * 1.0 / n_bigrams * 1000000) AS BIGINT) AS top_bigram_frac_e6
        |      FROM b JOIN gt ON b.doc_id = gt.doc_id)
        |SELECT doc_id, dup_token_frac_e6, top_bigram_frac_e6,
        |       (dup_token_frac_e6 <= 300000 AND top_bigram_frac_e6 <= 180000) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_domain_mix" ->
      """WITH r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, rn FROM r WHERE rn <= 40
        |ORDER BY lang, rn""".stripMargin,
    "q_dedup_incremental" ->
      s"""$shingleCte,
         |p AS (SELECT a.doc_id AS corpus_doc, b.doc_id AS new_doc,
         |        len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))) AS jac
         |      FROM s a JOIN s b ON a.doc_id < 400 AND b.doc_id >= 400)
         |SELECT corpus_doc, new_doc,
         |       CAST(floor(jac * 1000000) AS BIGINT) AS jaccard_e6
         |FROM p WHERE jac >= 0.5 ORDER BY corpus_doc, new_doc""".stripMargin,
    "q_sample_bottomk" ->
      """SELECT doc_id, md5('smpl:' || CAST(doc_id AS VARCHAR)) AS h
        |FROM documents
        |ORDER BY h, doc_id
        |LIMIT 100""".stripMargin,
    "q_weighted_sample" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('wsmp:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 1000000 AS u_ppm,
        |    CAST(least(1000000, n_chars * 2000) AS BIGINT) AS w_ppm
        |  FROM documents)
        |SELECT doc_id, n_chars, u_ppm, w_ppm FROM b
        |WHERE u_ppm < w_ppm ORDER BY doc_id""".stripMargin,
    "q_bigram_lm" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT unnest(list_slice(w, 1, len(w) - 1)) AS w1,
        |             unnest(list_slice(w, 2, len(w))) AS w2
        |      FROM w WHERE len(w) >= 2),
        |n AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT w1, CAST(sum(n) AS BIGINT) AS out_n FROM n GROUP BY 1)
        |SELECT n.w1, w2, CAST(n AS BIGINT) AS n, out_n,
        |  CAST(1000000 * n // out_n AS BIGINT) AS p_e6
        |FROM n JOIN t ON n.w1 = t.w1
        |ORDER BY n.w1, w2""".stripMargin,
    "q_sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_profile" ->
      """SELECT 'l_linestatus' AS column_name, count(*) AS n_rows,
        |       count(l_linestatus) AS n_nonnull,
        |       count(DISTINCT l_linestatus) AS n_distinct FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(*), count(l_returnflag),
        |       count(DISTINCT l_returnflag) FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey', count(*), count(l_suppkey),
        |       count(DISTINCT l_suppkey) FROM lineitem
        |ORDER BY column_name""".stripMargin,
    "q_top_ngrams" ->
      """WITH g AS (
        |  SELECT unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                 for i in range(1, len(t) - 1)])) AS ngram
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3)
        |SELECT ngram, count(*) AS n_docs FROM g GROUP BY ngram
        |ORDER BY n_docs DESC, ngram ASC LIMIT 20""".stripMargin,
    "q_stopword_filter" ->
      """SELECT doc_id,
        |  list_aggregate([x for x in string_split(text, ' ')
        |                  if NOT list_contains(['the','a','value','data'], x)],
        |                 'string_agg', ' ') AS clean_text,
        |  len([x for x in string_split(text, ' ')
        |       if list_contains(['the','a','value','data'], x)]) AS n_removed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |  CAST(floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) * 10000)
        |       AS BIGINT) AS tfidf_e4
        |FROM tf JOIN df USING (tok) CROSS JOIN n
        |ORDER BY doc_id, tok""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q_entity_clusters" ->
      """WITH RECURSIVE p AS MATERIALIZED (
        |  SELECT a.p_partkey AS pa, b.p_partkey AS pb
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
        |    AND levenshtein(a.p_name, b.p_name) <= 2),
        |e AS MATERIALIZED (SELECT pa AS a, pb AS b FROM p
        |  UNION SELECT pb, pa FROM p),
        |r(a, b) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.a, r.b FROM e JOIN r ON r.a = e.b),
        |comp AS (SELECT a AS p_partkey, min(b) AS entity_id
        |  FROM r GROUP BY a)
        |SELECT pt.p_partkey, coalesce(c.entity_id, pt.p_partkey)
        |  AS entity_id
        |FROM part pt LEFT JOIN comp c ON pt.p_partkey = c.p_partkey
        |ORDER BY pt.p_partkey""".stripMargin,
    "q_fuzzy_match" ->
      """SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
        |  levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY part_a, part_b""".stripMargin,
    "q_dedup_minhash" -> jaccardPairsSql(0.5),
    "q_dedup_clusters" -> clustersSql(0.5),
    // the clusters query wrapped as a derived table (DuckDB allows a
    // nested WITH RECURSIVE there), then one rank per cluster by
    // (length DESC, doc_id) — the same (len, -doc_id) max_by order
    "q_dup_rate_by_source" ->
      s"""WITH cl AS (SELECT * FROM (${clustersSql(0.5)})),
         |sz AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1),
         |j AS (SELECT d.source, sz.sz
         |      FROM cl JOIN sz USING (cluster_id)
         |      JOIN documents d ON cl.doc_id = d.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(1000000 * CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) // count(*) AS BIGINT) AS dup_ppm
         |FROM j GROUP BY 1 ORDER BY source""".stripMargin,
    "q_cross_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS t
        |  FROM documents),
        |e AS (SELECT DISTINCT source,
        |    unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |            for i in range(1, len(t) - 1)]) AS sh
        |  FROM t WHERE len(t) >= 3),
        |per AS (SELECT source, count(*) AS n_sh FROM e GROUP BY 1),
        |ov AS (SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS shared
        |  FROM e a JOIN e b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, shared,
        |  CAST(pa.n_sh AS BIGINT) AS n_a, CAST(pb.n_sh AS BIGINT) AS n_b,
        |  CAST(1000000 * shared // (pa.n_sh + pb.n_sh - shared) AS BIGINT)
        |    AS jaccard_ppm
        |FROM ov JOIN per pa ON ov.src_a = pa.source
        |  JOIN per pb ON ov.src_b = pb.source
        |ORDER BY src_a, src_b""".stripMargin,
    "q_tokenizer_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
        |  CAST(sum(strlen(text)) AS BIGINT) AS bytes,
        |  CAST(1000000 * CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |    // CAST(sum(strlen(text)) AS BIGINT) AS BIGINT) AS fert_ppm,
        |  CAST(1000 * CAST(sum(strlen(text)) AS BIGINT)
        |    // CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS BIGINT)
        |    AS bytes_per_tok_e3
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,
    "q_cluster_sizes" ->
      s"""WITH cl AS (SELECT * FROM (${clustersSql(0.5)}))
         |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM cl GROUP BY 1)
         |GROUP BY sz ORDER BY sz""".stripMargin,
    "q_dedup_representatives" ->
      s"""WITH cl AS (SELECT * FROM (${clustersSql(0.5)})),
         |j AS (SELECT cl.cluster_id, cl.doc_id, len(d.text) AS ln
         |      FROM cl JOIN documents d USING (doc_id)),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY ln DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cluster_id) AS n_members
         |  FROM j)
         |SELECT cluster_id, doc_id AS kept_doc_id,
         |  CAST(ln AS BIGINT) AS kept_len, CAST(n_members AS BIGINT) AS n_members
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q_dedup_ngram" -> jaccardPairsSql(0.5),
    "q_dedup_containment" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(1000000 * len(list_intersect(a.sh, b.sh)) // len(a.sh)
         |    AS BIGINT) AS cont_ppm
         |FROM s a JOIN s b ON a.doc_id <> b.doc_id
         |WHERE 1000000 * len(list_intersect(a.sh, b.sh)) // len(a.sh)
         |  >= 500000
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_bpe_pairs" ->
      """WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM w0
        |       WHERE length(w) >= 2 GROUP BY 1),
        |p AS (SELECT substr(w, i, 2) AS pair, cnt
        |      FROM (SELECT w, cnt,
        |              unnest(generate_series(1, length(w) - 1)) AS i
        |            FROM wc))
        |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, pair""".stripMargin,
    "q_bpe_merge" ->
      """WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM w0
        |       WHERE length(w) >= 2 GROUP BY 1),
        |p AS (SELECT substr(w, i, 2) AS pair, cnt
        |      FROM (SELECT w, cnt,
        |              unnest(generate_series(1, length(w) - 1)) AS i
        |            FROM wc)),
        |pc AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
        |       FROM p GROUP BY 1),
        |top AS (SELECT pair, n AS pair_n FROM pc
        |        ORDER BY n DESC, pair ASC LIMIT 1),
        |ap AS (SELECT cnt, pair, pair_n,
        |    CAST(length(w) AS BIGINT)
        |      - CAST(length(replace(w, pair, '#')) AS BIGINT) AS occ,
        |    CAST(length(w) AS BIGINT) AS len
        |  FROM wc CROSS JOIN top),
        |agg AS (SELECT pair, pair_n,
        |    CAST(sum(CASE WHEN occ > 0 THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n_words,
        |    CAST(sum(cnt * occ) AS BIGINT) AS occ_total,
        |    CAST(sum(cnt * len) AS BIGINT) AS tokens_before,
        |    CAST(sum(cnt * (len - occ)) AS BIGINT) AS tokens_after
        |  FROM ap GROUP BY 1, 2)
        |SELECT pair, pair_n, n_words, occ_total, tokens_before,
        |  tokens_after,
        |  CAST(1000000 * (tokens_before - tokens_after) // tokens_before
        |    AS BIGINT) AS savings_ppm
        |FROM agg ORDER BY pair""".stripMargin,
    "q_pmi_cooccur" ->
      """WITH dw AS (SELECT DISTINCT doc_id, w
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) WHERE w <> ''),
        |dfreq AS (SELECT w, count(*) AS df FROM dw GROUP BY 1),
        |pairs AS (SELECT a.w AS w1, b.w AS w2, count(*) AS nxy
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |nd AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT w1, w2, CAST(nxy AS BIGINT) AS nxy,
        |  CAST(1000000 * n_docs * nxy // (f1.df * f2.df) AS BIGINT)
        |    AS lift_ppm
        |FROM pairs JOIN dfreq f1 ON w1 = f1.w
        |  JOIN dfreq f2 ON w2 = f2.w CROSS JOIN nd
        |ORDER BY w1, w2""".stripMargin,
    "q_vocab_spectrum" ->
      """WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |tf AS (SELECT w, count(*) AS f FROM w0 WHERE w <> '' GROUP BY 1)
        |SELECT CAST(f AS BIGINT) AS f, count(*) AS n_tokens
        |FROM tf GROUP BY f ORDER BY f""".stripMargin,
    "q_perplexity_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |b AS (SELECT doc_id, unnest(list_slice(w, 1, len(w) - 1)) AS w1,
        |             unnest(list_slice(w, 2, len(w))) AS w2
        |      FROM w WHERE len(w) >= 2),
        |n AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT w1, CAST(sum(n) AS BIGINT) AS out_n FROM n GROUP BY 1),
        |m AS (SELECT n.w1, w2, greatest(1000000 * n // out_n, 1) AS p_e6
        |      FROM n JOIN t ON n.w1 = t.w1),
        |sc AS (SELECT doc_id,
        |    CAST(floor(1000000.0 * ln(CAST(p_e6 AS DOUBLE) / 1000000.0))
        |      AS BIGINT) AS lp_e6
        |  FROM b JOIN m ON b.w1 = m.w1 AND b.w2 = m.w2)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST((-CAST(sum(lp_e6) AS BIGINT)) // count(*) AS BIGINT)
        |    AS nll_e6
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ppl_filter" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |b AS (SELECT doc_id, unnest(list_slice(w, 1, len(w) - 1)) AS w1,
        |             unnest(list_slice(w, 2, len(w))) AS w2
        |      FROM w WHERE len(w) >= 2),
        |n AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT w1, CAST(sum(n) AS BIGINT) AS out_n FROM n GROUP BY 1),
        |m AS (SELECT n.w1, w2, greatest(1000000 * n // out_n, 1) AS p_e6
        |      FROM n JOIN t ON n.w1 = t.w1),
        |sc AS (SELECT doc_id,
        |    CAST(floor(1000000.0 * ln(CAST(p_e6 AS DOUBLE) / 1000000.0))
        |      AS BIGINT) AS lp_e6
        |  FROM b JOIN m ON b.w1 = m.w1 AND b.w2 = m.w2),
        |nll AS (SELECT doc_id,
        |    CAST((-CAST(sum(lp_e6) AS BIGINT)) // count(*) AS BIGINT)
        |      AS nll_e6
        |  FROM sc GROUP BY doc_id),
        |j AS (SELECT nll.doc_id, nll_e6, lang, n_chars
        |  FROM nll JOIN documents USING (doc_id)),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY nll_e6 ASC, doc_id ASC) AS BIGINT) AS rnk FROM j),
        |nn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM r GROUP BY 1),
        |cut AS (SELECT r.lang, nll_e6 AS cut_nll_e6
        |  FROM r JOIN nn ON r.lang = nn.lang
        |  WHERE rnk = (3 * n_docs + 3) // 4)
        |SELECT r.lang AS lang, n_docs,
        |  CAST(sum(CASE WHEN nll_e6 <= cut_nll_e6 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN nll_e6 <= cut_nll_e6 THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS kept_chars,
        |  cut_nll_e6,
        |  CAST(1000000 * sum(CASE WHEN nll_e6 <= cut_nll_e6 THEN 1 ELSE 0
        |    END) // n_docs AS BIGINT) AS retention_ppm
        |FROM r JOIN nn ON r.lang = nn.lang JOIN cut ON r.lang = cut.lang
        |GROUP BY 1, 2, 5 ORDER BY 1""".stripMargin,
    "q_class_weights" ->
      """WITH per AS (SELECT lang, count(*) AS n_docs
        |             FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |        count(*) AS n_classes FROM per)
        |SELECT lang, n_docs,
        |  CAST(1000000 * n_total // (n_classes * n_docs) AS BIGINT)
        |    AS weight_e6
        |FROM per CROSS JOIN tot ORDER BY lang""".stripMargin,
    "q_dim_corr" ->
      """WITH u AS (SELECT vec_id,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 16777216.0)
        |      AS BIGINT) AS xe
        |  FROM embeddings),
        |p AS (SELECT a.pos AS pos_a, b.pos AS pos_b,
        |    sum(CAST(a.xe AS HUGEINT) * b.xe) AS pab
        |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos < b.pos
        |  GROUP BY 1, 2),
        |m AS (SELECT pos, CAST(sum(xe) AS BIGINT) AS sx,
        |    sum(CAST(xe AS HUGEINT) * xe) AS sxx, count(*) AS n
        |  FROM u GROUP BY 1),
        |j AS (SELECT pos_a, pos_b, pab,
        |    ma.sx AS sa, ma.sxx AS saa, ma.n AS n,
        |    mb.sx AS sb, mb.sxx AS sbb
        |  FROM p JOIN m ma ON pos_a = ma.pos JOIN m mb ON pos_b = mb.pos)
        |SELECT pos_a, pos_b,
        |  CAST(floor(1000000.0 *
        |    (CAST(n AS DOUBLE) * CAST(pab AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
        |    sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) -
        |      CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) /
        |    sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) -
        |      CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS BIGINT)
        |  AS corr_e6
        |FROM j
        |WHERE CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) -
        |    CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0.0
        |  AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) -
        |    CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0.0
        |ORDER BY pos_a, pos_b""".stripMargin,
    "q_covariance_matrix" ->
      """WITH u AS (SELECT vec_id,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 16777216.0)
        |      AS BIGINT) AS xe
        |  FROM embeddings),
        |p AS (SELECT a.pos AS pos_a, b.pos AS pos_b,
        |    sum(CAST(a.xe AS HUGEINT) * b.xe) AS pab
        |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |  GROUP BY 1, 2),
        |m AS (SELECT pos, CAST(sum(xe) AS BIGINT) AS sx, count(*) AS n
        |      FROM u GROUP BY 1)
        |SELECT pos_a, pos_b,
        |  CAST(floor(1000000000.0 *
        |    ((CAST(pab AS DOUBLE) / ma.n -
        |      (CAST(ma.sx AS DOUBLE) / ma.n) *
        |        (CAST(mb.sx AS DOUBLE) / ma.n)) /
        |     (16777216.0 * 16777216.0))) AS BIGINT) AS cov_e9
        |FROM p JOIN m ma ON pos_a = ma.pos JOIN m mb ON pos_b = mb.pos
        |ORDER BY pos_a, pos_b""".stripMargin,
    "q_top_eigenvector" -> topEigenvectorSql,
    "q_silhouette" ->
      """WITH u AS (SELECT vec_id, label AS own_label,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 16777216.0)
        |      AS BIGINT) AS xe
        |  FROM embeddings),
        |cent AS (SELECT own_label AS c_label, pos,
        |    CAST(sum(xe) AS BIGINT) AS sx FROM u GROUP BY 1, 2),
        |cn2 AS (SELECT c_label, sum(CAST(sx AS HUGEINT) * sx) AS cn
        |        FROM cent GROUP BY 1),
        |vn2 AS (SELECT vec_id, sum(CAST(xe AS HUGEINT) * xe) AS vn
        |        FROM u GROUP BY 1),
        |dots AS (SELECT vec_id, own_label, c_label,
        |    sum(CAST(xe AS HUGEINT) * sx) AS dot
        |  FROM u JOIN cent ON u.pos = cent.pos GROUP BY 1, 2, 3),
        |coss AS (SELECT vec_id, own_label, c_label,
        |    CAST(floor(1000000.0 * (CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(vn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE)))))
        |      AS BIGINT) AS cos_e6
        |  FROM dots JOIN cn2 USING (c_label) JOIN vn2 USING (vec_id)),
        |own AS (SELECT vec_id, own_label AS label, cos_e6 AS own_cos_e6
        |        FROM coss WHERE c_label = own_label),
        |oth AS (SELECT vec_id, max(cos_e6) AS best_other_cos_e6,
        |    CAST(max_by(c_label, cos_e6 * 1000 - c_label) AS INTEGER)
        |      AS best_other
        |  FROM coss WHERE c_label <> own_label GROUP BY 1)
        |SELECT own.vec_id, label, own_cos_e6, best_other,
        |  best_other_cos_e6,
        |  own_cos_e6 - best_other_cos_e6 AS margin_e6
        |FROM own JOIN oth USING (vec_id)
        |ORDER BY own.vec_id""".stripMargin,
    "q_dedup_simhash" -> simhashOracleSql(3),
    "q_dedup_eval" -> dedupEvalSql(3, 0.5),
    "q_dataset_card" ->
      """WITH t AS (SELECT doc_id, lang, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    md5(text) AS dg
        |  FROM documents),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(toks) AS BIGINT) AS total_tokens
        |  FROM t),
        |ranked AS (SELECT toks, CAST(row_number() OVER (ORDER BY toks ASC,
        |    doc_id ASC) AS BIGINT) AS rnk FROM t),
        |med AS (SELECT toks AS med_tokens FROM ranked CROSS JOIN base
        |  WHERE rnk = (n_docs + 1) // 2),
        |dups AS (SELECT CAST(sum(cnt - 1) AS BIGINT) AS dup_docs
        |  FROM (SELECT count(*) AS cnt FROM t GROUP BY dg))
        |SELECT n_docs, n_langs, n_sources, total_chars, total_tokens,
        |  CAST(med_tokens AS BIGINT) AS med_tokens, dup_docs,
        |  CAST(1000000 * dup_docs // n_docs AS BIGINT) AS dup_ppm
        |FROM base CROSS JOIN med CROSS JOIN dups
        |ORDER BY n_docs""".stripMargin,
    "q_dedup_prefix" ->
      """SELECT md5(substr(text, 1, 64)) AS pfx,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS exemplar_doc
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY pfx""".stripMargin,
    "q_dedup_embedding" -> embeddingBlockedSql(0.4, EmbBands, EmbBits, dims = 64),
    "q_emb_dedup_eval" -> embDedupEvalSql(0.4, EmbBands, EmbBits, dims = 64),
    "q_cosine_topk" -> cosineTopkSql,
    "q_ann_ivf_exhaustive" -> cosineTopkSql,
    "q_emb_quantize" ->
      """WITH el AS (SELECT vec_id,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |rng AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM el GROUP BY 1),
        |e AS (SELECT el.pos, x, mn, mx,
        |    CASE WHEN mx = mn THEN 0
        |    ELSE CAST(floor(1000000 * abs(x - (mn +
        |      floor((x - mn) / ((mx - mn) / 255.0) + 0.5) *
        |      ((mx - mn) / 255.0)))) AS BIGINT) END AS err_e6
        |  FROM el JOIN rng ON el.pos = rng.pos)
        |SELECT CAST(pos AS INT) AS pos,
        |  CAST(floor(min(x) * 1000000) AS BIGINT) AS mn_e6,
        |  CAST(floor(max(x) * 1000000) AS BIGINT) AS mx_e6,
        |  CAST(max(err_e6) AS BIGINT) AS max_abs_err_e6
        |FROM e GROUP BY 1 ORDER BY pos""".stripMargin,
    "q_emb_norm_profile" ->
      """WITH v AS (SELECT label,
        |    CAST(floor(1000000 * list_dot_product(
        |      CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |      AS BIGINT) AS n2
        |  FROM embeddings)
        |SELECT CAST(label AS INTEGER) AS label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(n2) AS min_n2_e6, max(n2) AS max_n2_e6,
        |  CAST(sum(n2) // count(*) AS BIGINT) AS mean_n2_e6
        |FROM v GROUP BY 1 ORDER BY label""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, q.label AS q_label,
        |        c.vec_id AS n_id, c.label AS n_label,
        |        list_dot_product(q.v, c.v) /
        |        (sqrt(list_dot_product(q.v, q.v)) *
        |         sqrt(list_dot_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id >= 20
        |        AND q.label <> c.label),
        |r AS (SELECT q_id, q_label, n_id, n_label, cos,
        |        row_number() OVER (PARTITION BY q_id
        |                           ORDER BY cos DESC, n_id ASC) AS rnk
        |      FROM p)
        |SELECT q_id, CAST(q_label AS INTEGER) AS q_label, n_id,
        |  CAST(n_label AS INTEGER) AS n_label, CAST(rnk AS INTEGER) AS rnk,
        |  CAST(floor(cos * 1000000) AS BIGINT) AS cos_e6
        |FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    "q_knn_label" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, q.label AS true_label,
        |        c.vec_id AS n_id, c.label AS n_label,
        |        list_dot_product(q.v, c.v) /
        |        (sqrt(list_dot_product(q.v, q.v)) *
        |         sqrt(list_dot_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id >= 20),
        |r AS (SELECT q_id, true_label, n_label,
        |        row_number() OVER (PARTITION BY q_id
        |                           ORDER BY cos DESC, n_id ASC) AS rnk
        |      FROM p),
        |v AS (SELECT q_id, true_label, n_label, count(*) AS votes
        |      FROM r WHERE rnk <= 5 GROUP BY 1, 2, 3)
        |SELECT q_id, true_label,
        |  CAST(max_by(n_label, votes * 1000 - n_label) AS INTEGER)
        |    AS pred_label,
        |  CAST(max(votes) AS BIGINT) AS top_votes
        |FROM v GROUP BY q_id, true_label ORDER BY q_id""".stripMargin,
    "q_centroid_dist" ->
      """WITH u AS (SELECT label,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |a AS (SELECT label, pos,
        |    CAST(sum(CAST(round(x * 16777216.0) AS BIGINT)) AS BIGINT) AS sx
        |  FROM u GROUP BY 1, 2),
        |n2 AS (SELECT label, sum(CAST(sx AS HUGEINT) * sx) AS nn
        |  FROM a GROUP BY 1),
        |dp AS (SELECT a1.label AS label_a, a2.label AS label_b,
        |    sum(CAST(a1.sx AS HUGEINT) * a2.sx) AS dot
        |  FROM a a1 JOIN a a2 ON a1.pos = a2.pos AND a1.label < a2.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  CAST(floor(1000000.0 * (CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(x.nn AS DOUBLE)) * sqrt(CAST(y.nn AS DOUBLE)))))
        |    AS BIGINT) AS cos_e6
        |FROM dp JOIN n2 x ON label_a = x.label
        |  JOIN n2 y ON label_b = y.label
        |ORDER BY label_a, label_b""".stripMargin,
    "q_emb_variance" ->
      """WITH u AS (SELECT label,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |a AS (SELECT label, pos, count(*) AS n,
        |    CAST(sum(CAST(round(x * 16777216.0) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(round(x * 16777216.0) AS BIGINT) *
        |             CAST(round(x * 16777216.0) AS BIGINT)) AS BIGINT) AS sxx
        |  FROM u GROUP BY 1, 2)
        |SELECT label, pos, CAST(n AS BIGINT) AS n,
        |  CAST(floor(1000000000.0 *
        |    ((CAST(sxx AS DOUBLE) / n -
        |      (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) /
        |     (16777216.0 * 16777216.0))) AS BIGINT) AS var_e9
        |FROM a ORDER BY label, pos""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  length(text) AS n_chars_total,
        |  length(replace(text, ' ', '')) AS n_chars_nospace,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        |  CAST(floor(len(list_distinct(string_split(text, ' '))) * 1.0 /
        |       len(string_split(text, ' ')) * 1000000) AS BIGINT) AS ttr_e6
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(floor(sum(len(string_split(text, ' '))) * 1.0 / count(*) * 1000000)
        |       AS BIGINT) AS avg_tokens_e6
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_lang_id" -> langIdSql,
    "q_langid_eval" ->
      s"""WITH p AS (SELECT * FROM (${langIdSql})),
         |cm AS (SELECT actual_lang, predicted_lang,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2),
         |t AS (SELECT actual_lang, CAST(sum(n) AS BIGINT) AS n_actual
         |  FROM cm GROUP BY 1)
         |SELECT cm.actual_lang, predicted_lang, n, n_actual,
         |  CAST(1000000 * n // n_actual AS BIGINT) AS share_ppm,
         |  CAST(cm.actual_lang = predicted_lang AS INT) AS correct
         |FROM cm JOIN t ON cm.actual_lang = t.actual_lang
         |ORDER BY cm.actual_lang, predicted_lang""".stripMargin,
    "q_naive_bayes" ->
      """WITH toks AS (SELECT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) WHERE tok <> ''),
        |lab AS (SELECT t.doc_id, tok, lang
        |  FROM toks t JOIN documents d ON t.doc_id = d.doc_id),
        |counts AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lab GROUP BY 1, 2),
        |totals AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot
        |  FROM counts GROUP BY 1),
        |vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks),
        |scores AS (SELECT lang AS cand_lang, tok,
        |    CAST(floor(1000000.0 * ln(CAST(cnt + 1 AS DOUBLE) /
        |      CAST(tot + v AS DOUBLE))) AS BIGINT) AS score_e6
        |  FROM counts JOIN totals USING (lang) CROSS JOIN vocab),
        |defaults AS (SELECT lang AS cand_lang,
        |    CAST(floor(1000000.0 * ln(1.0 / CAST(tot + v AS DOUBLE)))
        |      AS BIGINT) AS def_e6
        |  FROM totals CROSS JOIN vocab),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |priors AS (SELECT lang AS cand_lang,
        |    CAST(floor(1000000.0 * ln(CAST(count(*) AS DOUBLE) /
        |      CAST(nd AS DOUBLE))) AS BIGINT) AS prior_e6
        |  FROM documents CROSS JOIN nd GROUP BY lang, nd),
        |per AS (SELECT t.doc_id, d.cand_lang,
        |    CAST(sum(coalesce(score_e6, def_e6)) AS BIGINT) AS ll_e6
        |  FROM toks t CROSS JOIN defaults d
        |  LEFT JOIN scores s ON s.cand_lang = d.cand_lang AND s.tok = t.tok
        |  GROUP BY 1, 2),
        |post AS (SELECT doc_id, cand_lang, ll_e6 + prior_e6 AS post_e6
        |  FROM per JOIN priors USING (cand_lang)),
        |pred AS (SELECT doc_id, cand_lang AS predicted FROM
        |    (SELECT *, row_number() OVER (PARTITION BY doc_id
        |       ORDER BY post_e6 DESC, cand_lang ASC) AS rn FROM post)
        |  WHERE rn = 1)
        |SELECT d.lang AS actual, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred JOIN documents d ON pred.doc_id = d.doc_id
        |GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,
    "q_countmin" ->
      """WITH toks AS (SELECT tok FROM
        |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> ''),
        |rows_ AS (SELECT unnest(range(4)) AS r),
        |cells AS (SELECT r,
        |    ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)), 1, 8))
        |      ::BIGINT % 256 AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
        |exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact
        |  FROM toks GROUP BY 1 ORDER BY exact DESC, tok ASC LIMIT 10),
        |probe AS (SELECT tok, exact, r,
        |    ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)), 1, 8))
        |      ::BIGINT % 256 AS bucket
        |  FROM exact CROSS JOIN rows_)
        |SELECT tok, exact, CAST(min(c) AS BIGINT) AS cms_estimate,
        |  CAST(min(c) - exact AS BIGINT) AS overestimate
        |FROM probe JOIN cells USING (r, bucket)
        |GROUP BY tok, exact ORDER BY exact DESC, tok ASC""".stripMargin,
    "q_tfidf_cosine" ->
      """WITH toks AS (SELECT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |w AS (SELECT doc_id, tok,
        |    tf * CAST(floor(1000000.0 * ln(CAST(nd AS DOUBLE) /
        |      CAST(df AS DOUBLE))) AS BIGINT) AS w
        |  FROM tf JOIN dft USING (tok) CROSS JOIN nd
        |  WHERE df * 10 <= nd),
        |norms AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2
        |  FROM w GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |    sum(CAST(a.w AS HUGEINT) * b.w) AS dot
        |  FROM w a JOIN w b ON a.tok = b.tok
        |  WHERE a.doc_id < 50 AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT a, b,
        |    CAST(floor(1000000.0 * CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))))
        |      AS BIGINT) AS cos_e6
        |  FROM pairs JOIN norms na ON na.doc_id = a
        |  JOIN norms nb ON nb.doc_id = b),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY a
        |      ORDER BY cos_e6 DESC, b ASC) AS INTEGER) AS rnk FROM sc)
        |SELECT a, b, cos_e6, rnk FROM r WHERE rnk <= 3
        |ORDER BY a, rnk""".stripMargin,
    "q_token_dropout" ->
      """WITH toks AS (SELECT doc_id, tok, pos FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |       CAST(generate_subscripts(string_split(text, ' '), 1)
        |         AS BIGINT) AS pos
        |     FROM documents) WHERE tok <> ''),
        |k AS (SELECT doc_id, tok, pos,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 10 < 9 AS keep
        |  FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_orig,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN tok END, ' '
        |    ORDER BY pos), '') AS aug_text
        |FROM k GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_span_mask" ->
      """WITH toks AS (SELECT doc_id, tok, pos FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |       CAST(generate_subscripts(string_split(text, ' '), 1)
        |         AS BIGINT) AS pos
        |     FROM documents) WHERE tok <> ''),
        |f AS (SELECT doc_id, tok, pos,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |      || CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 100 < 10 AS st,
        |    pos >= 2 AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |      || CAST(pos - 1 AS VARCHAR)), 1, 8))::BIGINT % 100 < 10 AS st1,
        |    pos >= 3 AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |      || CAST(pos - 2 AS VARCHAR)), 1, 8))::BIGINT % 100 < 10 AS st2
        |  FROM toks),
        |g AS (SELECT *, st OR st1 OR st2 AS masked,
        |    st AND NOT st1 AND NOT st2 AS sentinel FROM f),
        |h AS (SELECT *, sum(CASE WHEN sentinel THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS sent_idx FROM g),
        |o AS (SELECT doc_id, pos, masked, sentinel,
        |    CASE WHEN sentinel THEN '<extra_id_'
        |        || CAST(sent_idx - 1 AS VARCHAR) || '>'
        |      WHEN NOT masked THEN tok END AS out
        |  FROM h)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |  CAST(sum(CASE WHEN sentinel THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |  coalesce(string_agg(out, ' ' ORDER BY pos), '') AS masked_text
        |FROM o GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_curriculum_order" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |q AS (SELECT doc_id,
        |  least(1.0, len(toks) / 100.0) AS len_score,
        |  len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
        |  len([x for x in toks if length(x) >= 5]) * 1.0 / len(toks)
        |    AS long_share
        |FROM t),
        |s AS (SELECT doc_id,
        |  CAST(floor((len_score * 0.5 + ttr * 0.3 + long_share * 0.2)
        |    * 1000000) AS BIGINT) AS quality_e6
        |FROM q),
        |r AS (SELECT doc_id, quality_e6,
        |    CAST(row_number() OVER (ORDER BY quality_e6 DESC, doc_id ASC)
        |      AS BIGINT) AS curriculum_rank
        |  FROM s),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
        |SELECT doc_id, quality_e6, curriculum_rank,
        |  CAST((curriculum_rank - 1) * 3 // n AS BIGINT) AS phase
        |FROM r CROSS JOIN n ORDER BY doc_id""".stripMargin,
    "q_keyphrases" ->
      """WITH toks AS (SELECT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |w AS (SELECT doc_id, tok,
        |    tf * CAST(floor(1000000.0 * ln(CAST(nd AS DOUBLE) /
        |      CAST(df AS DOUBLE))) AS BIGINT) AS w
        |  FROM tf JOIN dft USING (tok) CROSS JOIN nd
        |  WHERE df * 10 <= nd AND doc_id < 50),
        |r AS (SELECT doc_id, tok, w,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY w DESC, tok ASC) AS INTEGER) AS rnk
        |  FROM w)
        |SELECT doc_id, tok, w AS tfidf_e6, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q_kmeans" ->
      s"""WITH $kmeansFitCtes,
        |sz AS (SELECT k, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM a3 GROUP BY 1)
        |SELECT CAST(c2.k AS BIGINT) AS k, CAST(pos AS INT) AS pos, ce,
        |  cluster_size
        |FROM c2 JOIN sz ON c2.k = sz.k ORDER BY k, pos""".stripMargin,
    "q_cluster_topics" ->
      s"""WITH $kmeansFitCtes,
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |ck AS (SELECT a3.k, tok, CAST(count(*) AS BIGINT) AS ctk
        |  FROM toks JOIN a3 ON toks.doc_id = a3.vec_id
        |  WHERE tok <> '' GROUP BY 1, 2),
        |nk AS (SELECT k, CAST(sum(ctk) AS BIGINT) AS nk FROM ck GROUP BY 1),
        |tt AS (SELECT tok, CAST(sum(ctk) AS BIGINT) AS c_t
        |  FROM ck GROUP BY 1),
        |nn AS (SELECT CAST(sum(c_t) AS BIGINT) AS nn FROM tt),
        |lift AS (SELECT ck.k, ck.tok, ctk,
        |    CAST(1000000 * ctk * nn // (nk * c_t) AS BIGINT) AS lift_ppm
        |  FROM ck JOIN nk USING (k) JOIN tt USING (tok) CROSS JOIN nn
        |  WHERE ctk >= 5),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k
        |    ORDER BY lift_ppm DESC, ctk DESC, tok ASC) AS rnk FROM lift)
        |SELECT CAST(k AS BIGINT) AS k, CAST(rnk AS INT) AS rnk, tok, ctk,
        |  lift_ppm
        |FROM r WHERE rnk <= 5 ORDER BY k, rnk""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |q AS (SELECT doc_id,
        |  least(1.0, len(toks) / 100.0) AS len_score,
        |  len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
        |  len([x for x in toks if length(x) >= 5]) * 1.0 / len(toks) AS long_share
        |FROM t)
        |SELECT doc_id,
        |  CAST(floor((len_score * 0.5 + ttr * 0.3 + long_share * 0.2) * 1000000)
        |       AS BIGINT) AS quality_e6
        |FROM q ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |          AS cum
        |      FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, len(toks), 16)) AS start, toks
        |      FROM t)
        |SELECT doc_id, CAST(start / 16 AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_fingerprint_rolling" -> rollingFingerprintSql(16),
    "q_fingerprint" ->
      """WITH s AS (SELECT doc_id, text,
        |  [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)] AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents))
        |SELECT doc_id, md5(text) AS text_md5,
        |  list_min([md5(x) for x in sh]) AS min_shingle_md5
        |FROM s ORDER BY doc_id""".stripMargin,
  )
}
