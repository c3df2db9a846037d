package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval scoring operators — the ranking half of a RAG/data-curation
  * stack: Okapi BM25 over a fixed query-term set and reciprocal-rank
  * fusion of independent rankings.
  *
  * Determinism: corpus statistics (N, Σdl, df) are integer sums — exact
  * under any partitioning/aggregation order — and every floating-point
  * expression is written in one fixed operation order that the DuckDB
  * oracle mirrors token-for-token, so scores are bit-identical across
  * engines.
  *
  * Scale shape: per-doc term frequencies are computed map-side from the
  * token array (no explode shuffle for a fixed small term set); the only
  * exchange is the single-row corpus-stats aggregate, which is broadcast
  * back. At 100 TB the scan stays embarrassingly parallel.
  */
object Retrieval {

  /** Okapi BM25 score of every matching document against `terms`.
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the standard non-negative
    * variant); per-term contributions are added in `terms` order.
    * Emits only docs with score > 0, as integer millionths.
    */
  def bm25(docs: DataFrame, key: String, text: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.size == terms.size, "bm25 terms must be distinct")
    require(k1 > 0.0 && b >= 0.0 && b <= 1.0, s"bm25 params out of range: k1=$k1 b=$b")
    val base = docs
      .withColumn("toks", split(col(text), " "))
      .withColumn("dl", size(col("toks")))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i", size(filter(col("toks"), x => x === lit(t))))
    }
    val aggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
      idf * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    scored.withColumn("score", score)
      .filter(col("score") > 0.0)
      .select(col(key), floor(col("score") * 1e6).cast("long").as("bm25_e6"))
  }

  /** Reciprocal-rank fusion of two complete rankings (each `(key, rnk)`
    * with every doc ranked): score = 1/(k+rnkA) + 1/(k+rnkB), fixed
    * order, integer ranks — bit-deterministic. Returns all fused rows;
    * callers apply their own top-k.
    */
  def rrf(a: DataFrame, b: DataFrame, key: String, k: Int = 60): DataFrame = {
    require(k >= 0, s"rrf smoothing constant must be non-negative, got $k")
    a.select(col(key), col("rnk").as("rnk_a"))
      .join(b.select(col(key), col("rnk").as("rnk_b")), key)
      .withColumn("rrf_e9",
        floor((lit(1.0) / (lit(k) + col("rnk_a")) +
          lit(1.0) / (lit(k) + col("rnk_b"))) * 1e9).cast("long"))
  }
}
