package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextStats}

/** End-to-end LLM training-data curation: quality-gate → exact dedup →
  * near-dedup (MinHash-LSH, keep lowest doc of each near-dup pair) →
  * deterministic split assignment. One lineage graph; every stage is a
  * pure transform, so the whole pipeline is reproducible and restartable
  * — the composition target the individual operators exist for.
  */
object CurationPipeline {

  /** @param minQualityE6 quality-score gate in millionths
    * @return surviving docs with `split` assignment
    */
  def curate(docs: DataFrame, key: String, text: String,
             minQualityE6: Long = 400000L,
             nearDupThreshold: Double = 0.5): DataFrame = {
    val quality = TextStats.qualityScore(docs, key, text)
      .filter(col("quality_e6") >= minQualityE6)
    val gated = docs.join(quality, Seq(key), "left_semi")

    val exactSurvivors = Dedup.exactDedup(gated, key, text).select(col(key))
    val afterExact = gated.join(exactSurvivors, Seq(key), "left_semi")

    // Near-dup: drop the higher-keyed doc of each pair above threshold.
    val nearPairs = Dedup.minhashLshPairs(afterExact, key, text,
      threshold = nearDupThreshold)
    val losers = nearPairs.select(col("doc_b").as(key)).distinct()
    val survivors = afterExact.join(losers, Seq(key), "left_anti")

    survivors.join(TextStats.sampleSplit(survivors, key), Seq(key))
      .select(col(key), col(text), col("split"))
  }
}
