package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Similarity

/** The full streaming ANN INGEST pipeline — [[EmbGate]]'s near-dup
  * gate COMPOSED with the IVFADC index write path: embedding
  * micro-batches arrive, each batch (1) gates against the persistent
  * SRP band index + vector store (admit/reject with earliest matching
  * predecessor, exactly [[EmbGate.gateBatch]] — the SAME code), and
  * (2) PQ-encodes its ADMITTED vectors against the index geometry
  * FROZEN after the first batch (coarse cells from the first `cells`
  * vectors, residual codebooks trained on batch 0's residuals),
  * appending the postings rows to a durable inverted-list store,
  * Hive-partitioned by `cell_id` so index reads prune whole files per
  * probed cell. This is the write side of a production vector
  * database: dedup at the door, then frozen-geometry encode at cost
  * ∝ batch — no retrain, no re-read of the accumulated index;
  * staleness is what `q_pq_distortion` / `q_ivfpq_cell_stats` watch.
  *
  * Contract (stated identically by the committed DuckDB oracle):
  * every vector encodes against the geometry trained on the FIRST
  * slice (vec_id < max/[[Slices]] + 1 — the fixture's slice width, a
  * pure function of the corpus; the oracle interpolates the SAME
  * [[Slices]] constant); a vector's postings land iff the gate admits
  * it (no earlier banded candidate with cosine ≥ threshold). Batch
  * 0's own postings are exactly this statement too: pqTrain's final
  * encode assigns against the trained codebook, so "build then keep
  * admitted" ≡ "encode slice 0 against the frozen geometry, keep
  * admitted".
  *
  * Idempotence: the [[GateStores]] discipline — per-batch Overwrite
  * subdirectories, probes read strictly-earlier batches only;
  * StreamingSpec kills a run between batches and proves the resumed
  * run lands identical stores.
  */
object AnnIngest {
  private val fixtureLock = new Object

  /** Micro-batch count — see [[IngestGate.Slices]]. The committed
    * oracle ([[graft.queries.LlmSimOps]]) interpolates this constant
    * into its slice rule, so changing it re-states both sides at once.
    */
  val Slices = 3

  def replayAnnIngest(s: SparkSession, d: String, threshold: Double,
                      bands: Int, bitsPerBand: Int, dims: Int, cells: Int,
                      m: Int, ks: Int, refineIters: Int): DataFrame =
    replayInternal(s, d, threshold, bands, bitsPerBand, dims, cells, m, ks,
      refineIters,
      ckpt = graft.model.Scratch.dir("ann_ingest_ckpt", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8),
      wipeStores = true, crashAtBatch = None)

  /** Lifecycle-exposed form — see [[EmbGate.replayInternal]] for the
    * restart-spec contract of `ckpt` / `wipeStores` / `crashAtBatch`.
    */
  private[graft] def replayInternal(s: SparkSession, d: String,
      threshold: Double, bands: Int, bitsPerBand: Int, dims: Int,
      cells: Int, m: Int, ks: Int, refineIters: Int, ckpt: String,
      wipeStores: Boolean, crashAtBatch: Option[Long]): DataFrame = {
    val dsub = dims / m
    val embs = graft.model.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val srcDir = new java.io.File(graft.model.Scratch.dir("ann_ingest_src", d))
    GateStores.landSliceFixture(embs, "vec_id", srcDir, Slices, fixtureLock)
    val idxDir = graft.model.Scratch.dir("ann_ingest_idx", d)
    val vecDir = graft.model.Scratch.dir("ann_ingest_vec", d)
    val geoDir = graft.model.Scratch.dir("ann_ingest_geo", d)
    val postDir = graft.model.Scratch.dir("ann_ingest_post", d)
    if (wipeStores) GateStores.wipe(Seq(idxDir, vecDir, geoDir, postDir))
    val stream = s.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getPath + "/gate_*.parquet")
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        // ---- 1. the gate: EmbGate's exact rule, shared code ----
        val (vecs, buckets, dupSrc) =
          EmbGate.gateBatch(batch, batchId, idxDir, vecDir, threshold,
            bands, bitsPerBand)
        val rejected = dupSrc.select(col("vec_id"))
        val admitted = vecs.join(rejected, Seq("vec_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ---- 2. the encode: frozen after batch 0 ----
        val postings =
          if (batchId == 0L) {
            // build the geometry on the WHOLE first slice, land the
            // codebook, keep admitted vectors' postings ("build then
            // keep admitted" ≡ encode-vs-frozen: pqTrain's final
            // encode assigns against the trained codebook)
            val (p0, cb) = Similarity.ivfPqBuild(vecs, "vec_id", "embedding",
              dims, cells, m, ks, refineIters)
            GateStores.land(cb, s"$geoDir/b0")
            p0.join(admitted.select(col("vec_id").as("n_id")), Seq("n_id"))
          } else {
            val cb = ss.read.parquet(s"$geoDir/b0")
            val base = ss.read.parquet(s"$vecDir/b0") // slice 0
            Similarity.ivfPqEncode(admitted, Similarity.coarseFromBase(
                base, "vec_id", "embedding", dsub, cells), cb,
              "vec_id", "embedding", dsub)
          }
        // postings partitioned by cell: the inverted-list layout — a
        // reader probing nprobe cells opens nprobe/cells of the files
        GateStores.land(postings, s"$postDir/b$batchId",
          partitionCols = Seq("cell_id"))
        GateStores.land(GateStores.withBandGroup(buckets),
          s"$idxDir/b$batchId", partitionCols = Seq("bgrp"))
        GateStores.land(vecs, s"$vecDir/b$batchId")
        admitted.unpersist()
        buckets.unpersist()
        vecs.unpersist()
        if (crashAtBatch.contains(batchId))
          throw new RuntimeException(s"injected crash after batch $batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination()
    finally if (crashAtBatch.isEmpty) GateStores.rmTree(ckpt)
    GateStores.readBatches(s, GateStores.existing(postDir))
      .select(col("cell_id").cast("long").as("cell_id"), col("n_id"),
        col("sub"), col("cid"))
      .orderBy(col("n_id"), col("sub"))
  }
}
