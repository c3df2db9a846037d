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
  * 0's own postings are exactly this statement too: the build's final
  * encode assigns against the trained codebook, so "build then keep
  * admitted" ≡ "encode slice 0 against the frozen geometry, keep
  * admitted".
  *
  * DELETE path (r14, VERDICT r13 #3): [[replayAnnIngestDelete]] runs
  * the same replay with a takedown between batches — after batch
  * [[DeleteAfterBatch]] commits its stores, a tombstone batch (ids
  * ≡ 3 mod [[DeleteMod]] among everything that has arrived so far —
  * the batch lifecycle's `q_ann_ivfpq_delete` rule scoped to the
  * arrived prefix, a pure function of the corpus the oracle restates)
  * lands in its own per-batch store. Tombstoned ids are hidden from
  * every subsequent postings read by one `n_id` anti-join
  * ([[graft.ops.AnnIndexLifecycle.applyTombstones]] — the identical
  * rule), and the NEXT store compaction physically rewrites the
  * folded postings without the dead rows (erasure rides the rewrite
  * the store pays anyway).
  *
  * ERASURE BOUNDARY (r15, VERDICT r14 #2; quantified r16, VERDICT r15
  * #8): the takedown erases BOTH sensitive artifacts — the serving
  * postings AND the raw embedding in the gate's vector store (its
  * fold also anti-joins the tombstones, and the gate's verify fetch
  * hides tombstoned ids so decisions don't depend on fold timing).
  * What survives a takedown is only the band index, retained as the
  * audit trail of ingest history. What that retention actually keeps,
  * in bits: a vector's band rows carry bands × bitsPerBand sign bits
  * (the registry's gate: 96 × 8 = 768 bits) versus the dims × 32-bit
  * floats erased (64 × 32 = 2048 bits) — and the band-index SCHEMA
  * has no vector-valued column at all (`(vec_id, bucket)` + the
  * `bgrp` partition; spec-pinned in StreamingSpec), so no residual or
  * coordinate of the erased vector exists anywhere in the surviving
  * store. Each retained bit is the SIGN of the dot product against a
  * fixed public hyperplane ([[graft.functions.SrpBands]]): the exact
  * coordinates and the magnitude are information-theoretically gone
  * (768 one-bit constraints cannot pin 2048 bits), and the
  * best-possible adversary — one-bit compressed-sensing
  * reconstruction from all 768 known hyperplanes — recovers at most a
  * coarse DIRECTION estimate, never the stored values. A deployment
  * for which even a direction sketch is over the line simply extends
  * the tombstone anti-join to the band-index fold (one more
  * `tombstones =` argument below) and trades away the audit trail;
  * this pipeline keeps the codes because the gate's decisions are
  * otherwise unauditable after erasure. The documented consequence:
  * without the raw vector no candidate against a deleted id can
  * cosine-verify, so a re-upload of deleted content IS re-admitted —
  * a takedown genuinely forgets the content rather than keeping its
  * bytes to veto re-uploads (the GDPR-posture trade, spec-pinned in
  * StreamingSpec's erased-predecessor test).
  *
  * Idempotence: the [[GateStores]] discipline — per-batch Overwrite
  * subdirectories, probes read strictly-earlier batches only;
  * StreamingSpec kills a run between batches and proves the resumed
  * run lands identical stores (including a kill exactly between the
  * tombstone landing and its checkpoint commit).
  *
  * Degenerate batch-0 behavior (ADVICE r16): the geometry build fails
  * loud — not silently empty — if the first slice does not populate
  * the seed id ranges (ids < `cells` for the coarse lattice, ids in
  * `[cells, cells + ks)` for the residual codebooks) or a Lloyd round
  * empties a subspace; see [[graft.ops.Similarity.ivfPqBuild]]. A
  * deployment whose first micro-batch can be that small seeds from a
  * base snapshot instead.
  */
object AnnIngest {
  private val fixtureLock = new Object

  /** Micro-batch count — see [[IngestGate.Slices]]. The committed
    * oracle ([[graft.queries.LlmSimOps]]) interpolates this constant
    * into its slice rule, so changing it re-states both sides at once.
    */
  val Slices = 3

  /** Delete-variant constants, interpolated into the committed oracle:
    * the takedown arrives after batch [[DeleteAfterBatch]] commits, and
    * removes every arrived id ≡ [[DeleteResidue]] (mod [[DeleteMod]]) —
    * the `q_ann_ivfpq_delete` tombstone rule scoped to the first
    * `DeleteAfterBatch + 1` slices.
    */
  val DeleteAfterBatch = 1L
  val DeleteMod = 7L
  val DeleteResidue = 3L

  /** `ns` namespaces the scratch stores — the wide-band scale variant
    * (`q_stream_ann_ingest_wide`) replays with its own stores so the
    * two parameterizations never read each other's state.
    */
  def replayAnnIngest(s: SparkSession, d: String, threshold: Double,
                      bands: Int, bitsPerBand: Int, dims: Int, cells: Int,
                      m: Int, ks: Int, refineIters: Int,
                      ns: String = "ann_ingest"): DataFrame =
    replayInternal(s, d, threshold, bands, bitsPerBand, dims, cells, m, ks,
      refineIters, ns = ns,
      ckpt = graft.model.Scratch.dir(s"${ns}_ckpt", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8),
      wipeStores = true, crashAtBatch = None, delete = false)

  /** The ingest replay with a takedown injected after
    * [[DeleteAfterBatch]] — returns the SURVIVING postings (tombstoned
    * ids anti-joined out; the physically compacted store holds no dead
    * row either, which the restart spec checks file by file).
    */
  def replayAnnIngestDelete(s: SparkSession, d: String, threshold: Double,
                            bands: Int, bitsPerBand: Int, dims: Int,
                            cells: Int, m: Int, ks: Int,
                            refineIters: Int): DataFrame =
    replayInternal(s, d, threshold, bands, bitsPerBand, dims, cells, m, ks,
      refineIters, ns = "ann_ingest_del",
      ckpt = graft.model.Scratch.dir("ann_ingest_del_ckpt", d) + "/" +
        java.util.UUID.randomUUID().toString.take(8),
      wipeStores = true, crashAtBatch = None, delete = true)

  /** The delete-replay's frozen-geometry store — the residual codebook
    * a SERVING tier reads (the "index file"), landed once by batch 0 of
    * [[replayAnnIngestDelete]]. `q_stream_ann_query` composes it with
    * the surviving postings into the full read path.
    */
  def deleteGeometry(s: SparkSession, d: String): DataFrame =
    s.read.parquet(graft.model.Scratch.dir("ann_ingest_del_geo", d) + "/b0")

  /** Lifecycle-exposed form — see [[EmbGate.replayInternal]] for the
    * restart-spec contract of `ckpt` / `wipeStores` / `crashAtBatch`.
    * `ns` namespaces the scratch stores so the plain and delete
    * variants never read each other's state; `delete` arms the
    * [[DeleteAfterBatch]] takedown.
    */
  private[graft] def replayInternal(s: SparkSession, d: String,
      threshold: Double, bands: Int, bitsPerBand: Int, dims: Int,
      cells: Int, m: Int, ks: Int, refineIters: Int, ns: String,
      ckpt: String, wipeStores: Boolean, crashAtBatch: Option[Long],
      delete: Boolean): DataFrame = {
    val dsub = dims / m
    val embs = graft.model.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    // the arrival fixture is shared between the variants (read-only
    // after creation); the mutable stores are namespaced by `ns`
    val srcDir = new java.io.File(graft.model.Scratch.dir("ann_ingest_src", d))
    GateStores.landSliceFixture(embs, "vec_id", srcDir, Slices, fixtureLock)
    val idxDir = graft.model.Scratch.dir(s"${ns}_idx", d)
    val vecDir = graft.model.Scratch.dir(s"${ns}_vec", d)
    val geoDir = graft.model.Scratch.dir(s"${ns}_geo", d)
    val postDir = graft.model.Scratch.dir(s"${ns}_post", d)
    val tombDir = graft.model.Scratch.dir(s"${ns}_tomb", d)
    if (wipeStores)
      GateStores.wipe(Seq(idxDir, vecDir, geoDir, postDir, tombDir))
    def tombstones(before: Long): Option[DataFrame] =
      GateStores.readStoreOpt(s, tombDir, before)
    // the geometry froze at batch 0 and never changes, so batch-1+
    // encodes share ONE read plan per store instead of re-running
    // parquet footer inference twice per batch (r16); plain memo —
    // single foreachBatch thread, no synchronization needed
    var geoMemo: Option[(DataFrame, DataFrame)] = None
    val stream = s.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getPath + "/gate_*.parquet")
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        // section labels (guide §1.5): foreachBatch runs all jobs on one
        // thread, so the thread-local description attributes each job to
        // its pipeline stage in the UI / ProfileKey without any cost
        def label(sec: String): Unit =
          ss.sparkContext.setJobDescription(s"ann-ingest b$batchId: $sec")
        label("fold")
        // fold the settled tails before probing; the postings AND the
        // raw-vector folds anti-join the accumulated tombstones out —
        // physical erasure of a deleted vector's bytes (its serving
        // postings and its raw embedding, the most sensitive artifact)
        // rides the compaction rewrite. The band index deliberately
        // folds WITHOUT tombstones: band codes are non-invertible
        // (they cannot reconstruct content) and are retained as the
        // audit trail of ingest history.
        // the three stores fold concurrently (disjoint dirs; each task's
        // tombstone read of tombDir is read-only — GateStores.inParallel)
        GateStores.inParallel(Seq(
          () => GateStores.maybeCompact(ss, idxDir, upTo = batchId - 1,
            partitionCols = Seq("bgrp")): Unit,
          () => GateStores.maybeCompact(ss, vecDir, upTo = batchId - 1,
            tombstones = tombstones(batchId),
            tombstoneKey = "vec_id"): Unit,
          () => GateStores.maybeCompact(ss, postDir, upTo = batchId - 1,
            partitionCols = Seq("cell_id"),
            tombstones = tombstones(batchId)): Unit))
        // ---- 1. the gate: EmbGate's exact rule, shared code; erased
        // predecessors are invisible to verification (see gateBatch) ----
        label("gate")
        val (vecs, buckets, dupSrc) =
          EmbGate.gateBatch(batch, batchId, idxDir, vecDir, threshold,
            bands, bitsPerBand, tombstones = tombstones(batchId))
        // rejected ids are batch-bounded — broadcast the anti-join side
        val rejected = dupSrc.select(col("vec_id"))
        val admitted = vecs.join(broadcast(rejected), Seq("vec_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ---- 2. the encode: frozen after batch 0 ----
        label("encode")
        val postings =
          if (batchId == 0L) {
            // build the geometry on the WHOLE first slice, land the
            // residual codebook AND the coarse lattice, keep admitted
            // vectors' postings ("build then keep admitted" ≡
            // encode-vs-frozen: the build's final encode assigns against
            // the trained codebook)
            val (p0, cb) = Similarity.ivfPqBuild(vecs, "vec_id", "embedding",
              dims, cells, m, ks, refineIters)
            // the frozen coarse coordinates land once, so batch-1+
            // encodes read ~cells rows instead of re-deriving the
            // lattice from a pinned vector slice every batch (and the
            // vector store is free to compact its b0 away); the two
            // geometry landings are independent writes — overlap them
            GateStores.inParallel(Seq(
              () => GateStores.land(cb, s"$geoDir/b0"),
              () => GateStores.land(Similarity.coarseFromBase(vecs, "vec_id",
                "embedding", dsub, cells), s"$geoDir/cc")))
            p0.join(broadcast(admitted.select(col("vec_id").as("n_id"))),
              Seq("n_id"))
          } else {
            val (cb, cc) = geoMemo.getOrElse {
              val g = (ss.read.parquet(s"$geoDir/b0"),
                ss.read.parquet(s"$geoDir/cc"))
              geoMemo = Some(g)
              g
            }
            Similarity.ivfPqEncode(admitted, cc, cb,
              "vec_id", "embedding", dsub)
          }
        // postings partitioned by cell: the inverted-list layout — a
        // reader probing nprobe cells opens nprobe/cells of the files
        label("land")
        // three independent landing writes to disjoint stores — overlap
        // their fixed per-job latency (the takedown below reads the
        // vector store INCLUDING this batch, so it stays strictly after)
        GateStores.inParallel(Seq(
          () => GateStores.land(postings, s"$postDir/b$batchId",
            partitionCols = Seq("cell_id")),
          () => GateStores.land(GateStores.withBandGroup(buckets),
            s"$idxDir/b$batchId", partitionCols = Seq("bgrp")),
          () => GateStores.land(vecs, s"$vecDir/b$batchId")))
        if (delete && batchId == DeleteAfterBatch) {
          // the takedown: everything arrived so far (this batch
          // included — before = batchId+1) matching the id rule.
          // Overwrite per-batch landing = replay-idempotent like every
          // other store write.
          val tombs = GateStores.readStoreOpt(ss, vecDir, batchId + 1)
            .getOrElse(throw new IllegalStateException(
              s"takedown at batch $batchId found an empty vector store at $vecDir"))
            .filter(col("vec_id") % DeleteMod === DeleteResidue)
            .select(col("vec_id").as("n_id"))
          GateStores.land(tombs, s"$tombDir/b$batchId")
        }
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
    val landed = GateStores.readStoreOpt(s, postDir)
      .getOrElse(throw new IllegalStateException(
        s"replay landed no postings: empty store at $postDir"))
      .select(col("cell_id").cast("long").as("cell_id"), col("n_id"),
        col("sub"), col("cid"))
    // tombstoned postings are hidden even where compaction has not yet
    // physically dropped them (e.g. a run killed right after the
    // takedown landed) — the applyTombstones read form
    val visible = tombstones(Long.MaxValue) match {
      case Some(t) => graft.ops.AnnIndexLifecycle.applyTombstones(landed, t)
      case None => landed
    }
    visible.orderBy(col("n_id"), col("sub"))
  }
}
