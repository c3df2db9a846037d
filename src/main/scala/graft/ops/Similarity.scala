package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Arithmetic is done in double precision with a fixed left-fold order
  * (`aggregate` over `zip_with`) so results are bit-reproducible and the
  * DuckDB oracle (`list_dot_product` on DOUBLE[] casts) matches exactly.
  *
  * Scale posture: brute-force top-k is the exact baseline — one broadcast
  * of the (small) query set, map-side cosine, per-query top-k via window.
  * For corpus×corpus at 100 TB, use `ivfTopK`: vectors are bucketed by
  * nearest coarse centroid (IVF-flat) and queries only scan `nprobe`
  * cells, trading recall for a ~#cells/nprobe scan reduction.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity with explicit sqrt(x)*sqrt(y) grouping (mirrors the
    * oracle formula exactly — sqrt(x*y) would differ in the last ulp).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force top-k cosine neighbors for a query subset.
    * The query side is broadcast; the corpus is scanned once; per-query
    * top-k runs as a rank-limited window (per-partition heaps at scale).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, key: String,
                     vec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(key).as("q_id"), asDouble(col(vec)).as("q_vec")))
    val c = corpus.select(col(key).as("n_id"), asDouble(col(vec)).as("n_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Exact cosine near-duplicate pairs (cos ≥ threshold) — O(n²) compare,
    * intended for dimension-sized inputs or per-LSH-bucket use at scale.
    */
  def cosinePairs(corpus: DataFrame, key: String, vec: String,
                  threshold: Double): DataFrame = {
    val a = corpus.select(col(key).as("vec_a"), asDouble(col(vec)).as("va"))
    val b = corpus.select(col(key).as("vec_b"), asDouble(col(vec)).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Approximate top-k via IVF-flat with deterministic coarse centroids:
    * the first `cells` corpus vectors (by key order) act as centroids —
    * deterministic and cheap versus k-means, adequate for bucketing.
    * Every vector is assigned to its nearest centroid (one broadcast
    * join); a query probes the `nprobe` nearest cells only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, key: String, vec: String,
              k: Int, cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cents = broadcast(
      corpus.orderBy(col(key)).limit(cells)
        .select(col(key).as("cell_id"), asDouble(col(vec)).as("cent")))
    val assign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_id")).orderBy(col("cdist").asc, col("cell_id").asc)
    val corpusCells = corpus
      .select(col(key).as("n_id"), asDouble(col(vec)).as("n_vec"))
      .join(cents)
      .withColumn("cdist", -cosine(col("n_vec"), col("cent")))
      .withColumn("crnk", row_number().over(assign))
      .filter(col("crnk") === 1)
      .select(col("cell_id"), col("n_id"), col("n_vec"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cdist").asc, col("cell_id").asc)
    val queryCells = queries
      .select(col(key).as("q_id"), asDouble(col(vec)).as("q_vec"))
      .join(cents)
      .withColumn("cdist", -cosine(col("q_vec"), col("cent")))
      .withColumn("crnk", row_number().over(probeW))
      .filter(col("crnk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell_id"))
    val topW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    broadcast(queryCells).join(corpusCells, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(topW))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }
}
