package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Dot products run through the native codegen'd
  * [[graft.functions.DotProduct]] expression (`dot_arr` — a primitive
  * loop; the composable `aggregate(zip_with(...))` form is interpreted
  * and was ~40× slower at sf0.1). Norms are computed once per row on
  * each join side, not once per pair. The arithmetic (sequential fold,
  * `dot/(sqrt(aa)*sqrt(bb))` grouping) is bit-identical to DuckDB's
  * `list_dot_product` oracle formula.
  *
  * Scale posture: brute-force top-k is the exact baseline — broadcast
  * the (small) query set, scan the corpus once, per-query top-k via a
  * rank-limited window. For corpus×corpus at 100 TB use `ivfTopK`:
  * vectors are bucketed by nearest coarse centroid (IVF-flat) and
  * queries only scan `nprobe` cells.
  */
object Similarity {

  /** Register `dot_arr` on the session owning `df` (idempotent). */
  private def ensureRegistered(df: DataFrame): Unit =
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_arr", exprs => graft.functions.DotProduct(exprs(0), exprs(1)), "built-in")

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Key + unit-normless vector + precomputed L2 norm, aliased for a join side. */
  private def side(df: DataFrame, key: String, vec: String,
                   keyAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(key).as(keyAs), asDouble(col(vec)).as(vecAs))
      .withColumn(normAs, sqrt(expr(s"dot_arr($vecAs, $vecAs)")))

  /** Exact brute-force top-k cosine neighbors for a query subset. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, key: String,
                     vec: String, k: Int): DataFrame = {
    ensureRegistered(corpus)
    val q = broadcast(side(queries, key, vec, "q_id", "q_vec", "q_norm"))
    // The q×corpus dot products run map-side on the corpus scan's own
    // partitioning — fan a narrow corpus out so they use every core.
    val c = side(Par.fanOut(corpus.select(col(key), col(vec))),
      key, vec, "n_id", "n_vec", "n_norm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos", expr("dot_arr(q_vec, n_vec)") / (col("q_norm") * col("n_norm")))
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
    ensureRegistered(corpus)
    // Pairwise compute runs on the streamed side's partitioning — fan a
    // narrow corpus out once; both join sides reuse the exchange.
    val wide = Par.fanOut(corpus.select(col(key), col(vec)))
    val a = side(wide, key, vec, "vec_a", "va", "na")
    val b = side(wide, key, vec, "vec_b", "vb", "nb")
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", expr("dot_arr(va, vb)") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Coarse centroids refined by Lloyd iterations (distributed k-means):
    * seeds are the first `k` corpus vectors in key order (deterministic
    * init); each iteration assigns every vector to its nearest centroid
    * (broadcast join + rank-1 window) and recomputes per-cell means via
    * positional explode + partial-agg average — the standard distributed
    * mean, one shuffle per iteration. Cells that lose all members drop
    * out (k can shrink). `iters = 0` returns the raw seeds.
    */
  def kmeansCentroids(corpus: DataFrame, key: String, vec: String,
                      k: Int, iters: Int): DataFrame = {
    ensureRegistered(corpus)
    var cents = side(corpus.orderBy(col(key)).limit(k),
      key, vec, "cell_id", "cent", "cent_norm")
    if (iters > 0) {
      val members = side(Par.fanOut(corpus.select(col(key), col(vec))),
        key, vec, "n_id", "n_vec", "n_norm")
      for (_ <- 0 until iters) {
        val assignW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("n_id")).orderBy(col("sim").desc, col("cell_id").asc)
        val assigned = members.join(broadcast(cents))
          .withColumn("sim",
            expr("dot_arr(n_vec, cent)") / (col("n_norm") * col("cent_norm")))
          .withColumn("crnk", row_number().over(assignW))
          .filter(col("crnk") === 1)
          .select(col("cell_id"), col("n_vec"))
        cents = assigned
          .select(col("cell_id"), posexplode(col("n_vec")).as(Seq("pos", "x")))
          .groupBy(col("cell_id"), col("pos")).agg(avg(col("x")).as("m"))
          .groupBy(col("cell_id"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("cent"))
          .withColumn("cent_norm", sqrt(expr("dot_arr(cent, cent)")))
          .localCheckpoint(true)
      }
    }
    cents
  }

  /** Approximate top-k via IVF-flat: coarse centroids are the first
    * `cells` corpus vectors (by key order) — deterministic and cheap,
    * adequate for bucketing — optionally tightened with `refineIters`
    * Lloyd rounds ([[kmeansCentroids]]). Every vector is assigned to its
    * nearest centroid (one broadcast join); a query probes the `nprobe`
    * nearest cells only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, key: String, vec: String,
              k: Int, cells: Int = 16, nprobe: Int = 4,
              refineIters: Int = 0): DataFrame = {
    ensureRegistered(corpus)
    val cents = broadcast(kmeansCentroids(corpus, key, vec, cells, refineIters))
    val assign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_id")).orderBy(col("sim").desc, col("cell_id").asc)
    val corpusCells = side(Par.fanOut(corpus.select(col(key), col(vec))),
        key, vec, "n_id", "n_vec", "n_norm")
      .join(cents)
      .withColumn("sim", expr("dot_arr(n_vec, cent)") / (col("n_norm") * col("cent_norm")))
      .withColumn("crnk", row_number().over(assign))
      .filter(col("crnk") === 1)
      .select(col("cell_id"), col("n_id"), col("n_vec"), col("n_norm"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("cell_id").asc)
    val queryCells = side(queries, key, vec, "q_id", "q_vec", "q_norm")
      .join(cents)
      .withColumn("sim", expr("dot_arr(q_vec, cent)") / (col("q_norm") * col("cent_norm")))
      .withColumn("crnk", row_number().over(probeW))
      .filter(col("crnk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cell_id"))
    val topW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    broadcast(queryCells).join(corpusCells, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", expr("dot_arr(q_vec, n_vec)") / (col("q_norm") * col("n_norm")))
      .withColumn("rnk", row_number().over(topW))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Deterministic Rademacher (±1) hyperplanes: component p,i from a
    * splitmix-style integer mix of (p, i) — no RNG state, identical
    * across runs and sessions.
    */
  private def hyperplane(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      var z = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z ^= (z >>> 31); z *= 0x94D049BB133111EBL; z ^= (z >>> 27)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Approximate top-k via sign-random-projection LSH (hyperplane
    * hashing): `bands × bitsPerBand` Rademacher hyperplanes give each
    * vector a sign bit per plane; vectors agreeing on ALL bits of a band
    * land in the same bucket (P[bit agree] = 1 − θ/π). Candidates come
    * from an equi join on (band, bucket) — never a cross product — and
    * are re-ranked by exact cosine. Recall tunes with `bands`;
    * `bitsPerBand` controls bucket selectivity. The complement of
    * [[ivfTopK]]: no centroid pass, fully data-independent, so inserts
    * never re-cluster — the right trade for append-heavy 100 TB corpora.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, key: String, vec: String,
              k: Int, bands: Int = 16, bitsPerBand: Int = 4,
              dims: Int = -1): DataFrame = {
    ensureRegistered(corpus)
    // The hyperplanes need the vector dimensionality; pass `dims` to skip
    // the one-row probe job (arrays carry no length in the schema). A
    // corpus with no non-null vector has no dimensionality and no
    // neighbors — return an empty frame with the output schema (q_id
    // typed from the QUERIES frame, n_id from the corpus: the two key
    // columns may have different types).
    val dimsResolved =
      if (dims > 0) dims
      else corpus.where(col(vec).isNotNull)
        .select(size(col(vec))).limit(1).collect().headOption match {
        case Some(r) => r.getInt(0)
        case None =>
          val outSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("q_id", queries.schema(key).dataType),
            org.apache.spark.sql.types.StructField("n_id", corpus.schema(key).dataType),
            org.apache.spark.sql.types.StructField("rnk", org.apache.spark.sql.types.IntegerType, nullable = false),
            org.apache.spark.sql.types.StructField("cos_e6", org.apache.spark.sql.types.LongType)))
          return corpus.sparkSession.createDataFrame(
            corpus.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      }
    // one codegen'd column per band: Σ (dot(v,h)>0) << bit
    def bucketCols(vecCol: String): Seq[Column] = (0 until bands).map { b =>
      (0 until bitsPerBand).map { i =>
        val h = hyperplane(b * bitsPerBand + i, dimsResolved)
          .mkString("cast(array(", ",", ") as array<double>)")
        (expr(s"dot_arr($vecCol, $h)") > 0).cast("long") * (1L << i)
      }.reduce(_ + _).as(s"bucket_$b")
    }
    def banded(df: DataFrame, idAs: String, vecAs: String, normAs: String) =
      df.select(Seq(col(idAs), col(vecAs), col(normAs)) ++ bucketCols(vecAs): _*)
        .select(col(idAs), col(vecAs), col(normAs),
          posexplode(array((0 until bands).map(b => col(s"bucket_$b")): _*))
            .as(Seq("band", "bucket")))
    val c = banded(side(Par.fanOut(corpus.select(col(key), col(vec))),
      key, vec, "n_id", "n_vec", "n_norm"), "n_id", "n_vec", "n_norm")
    val q = banded(side(queries, key, vec, "q_id", "q_vec", "q_norm"),
      "q_id", "q_vec", "q_norm")
    val topW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    broadcast(q).join(c, Seq("band", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        col("n_id"), col("n_vec"), col("n_norm"))
      // a pair can collide in several bands; duplicates are identical
      // rows, so key-only dedup is safe and avoids hashing the vectors
      .dropDuplicates(Seq("q_id", "n_id"))
      .withColumn("cos", expr("dot_arr(q_vec, n_vec)") / (col("q_norm") * col("n_norm")))
      .withColumn("rnk", row_number().over(topW))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }
}
