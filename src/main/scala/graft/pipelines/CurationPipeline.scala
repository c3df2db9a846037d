package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextStats}

/** End-to-end LLM training-data curation: quality-gate → exact dedup →
  * near-dedup → deterministic split assignment. One lineage graph; every
  * stage is a pure transform, so the whole pipeline is reproducible and
  * restartable — the composition target the individual operators exist
  * for.
  */
object CurationPipeline {

  /** Near-dup keep strategies:
    *
    *  - [[Pairwise]]: drop the higher-keyed doc of each pair — keeps every
    *    LOCAL minimum, so two docs that are each near a dropped third but
    *    not near each other both survive. Cheapest (no iteration).
    *  - [[Cluster]]: connected-components over the pair graph, keep one
    *    canonical doc per component (the standard corpus-dedup semantic;
    *    transitively-linked chains collapse to one survivor).
    */
  sealed trait NearDupStrategy
  case object Pairwise extends NearDupStrategy
  case object Cluster extends NearDupStrategy

  /** @param minQualityE6 quality-score gate in millionths
    * @param maxRepetition optional Gopher-style repetition gate as
    *        (maxDupTokenFracE6, maxTopBigramFracE6); docs with fewer than
    *        two tokens have no bigram metrics and are dropped by the gate
    * @param minEntropyE6 optional unigram-entropy floor (nats, millionths)
    * @return surviving docs with `split` assignment
    */
  def curate(docs: DataFrame, key: String, text: String,
             minQualityE6: Long = 400000L,
             nearDupThreshold: Double = 0.5,
             strategy: NearDupStrategy = Pairwise,
             maxRepetition: Option[(Long, Long)] = None,
             minEntropyE6: Option[Long] = None): DataFrame = {
    val quality = TextStats.qualityScore(docs, key, text)
      .filter(col("quality_e6") >= minQualityE6)
    val qualityGated = docs.join(quality, Seq(key), "left_semi")

    val repGated = maxRepetition match {
      case Some((maxDup, maxBigram)) =>
        val keep = TextStats
          .repetitionMetrics(qualityGated, key, text, maxDup, maxBigram)
          .filter(col("keep")).select(col(key))
        qualityGated.join(keep, Seq(key), "left_semi")
      case None => qualityGated
    }
    val gated = minEntropyE6 match {
      case Some(minE) =>
        val keep = TextStats.tokenEntropy(repGated, key, text)
          .filter(col("entropy_e6") >= minE).select(col(key))
        repGated.join(keep, Seq(key), "left_semi")
      case None => repGated
    }

    val exactSurvivors = Dedup.exactDedup(gated, key, text).select(col(key))
    val afterExact = gated.join(exactSurvivors, Seq(key), "left_semi")

    val nearPairs = Dedup.minhashLshPairs(afterExact, key, text,
      threshold = nearDupThreshold)
    val losers = strategy match {
      case Pairwise =>
        nearPairs.select(col("doc_b").as(key)).distinct()
      case Cluster =>
        Dedup.connectedComponentsStar(nearPairs, "doc_a", "doc_b")
          .filter(col("node") =!= col("component"))
          .select(col("node").as(key))
    }
    val survivors = afterExact.join(losers, Seq(key), "left_anti")

    survivors.join(TextStats.sampleSplit(survivors, key), Seq(key))
      .select(col(key), col(text), col("split"))
  }

  /** Full curation run published as a versioned snapshot: the curated
    * corpus lands under `v=N/` with an atomic pointer flip, and health
    * metrics (docs kept, characters kept, split sizes) ride the SAME
    * write job via `Dataset.observe` — no second scan. Returns the
    * committed version and the observed metrics; consumers pin training
    * runs to a version while later curation runs publish new ones.
    */
  def curateAndPublish(docs: DataFrame, key: String, text: String,
                       path: String,
                       minQualityE6: Long = 400000L,
                       nearDupThreshold: Double = 0.5,
                       strategy: NearDupStrategy = Pairwise,
                       maxRepetition: Option[(Long, Long)] = None,
                       minEntropyE6: Option[Long] = None): (Long, Map[String, Any]) = {
    val obs = org.apache.spark.sql.Observation()
    val curated = curate(docs, key, text, minQualityE6, nearDupThreshold,
        strategy, maxRepetition, minEntropyE6)
      .observe(obs,
        count(lit(1)).as("docs_kept"),
        sum(length(col(text))).as("chars_kept"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val version = graft.ops.Sinks.writeVersioned(curated, path)
    (version, obs.get)
  }
}
