package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Similarity

/** The full streaming ANN INGEST pipeline — [[EmbGate]]'s near-dup
  * gate COMPOSED with the IVFADC index write path: embedding
  * micro-batches arrive, each batch (1) gates against the persistent
  * SRP band index + vector store (admit/reject with earliest matching
  * predecessor, exactly [[EmbGate]]'s rule), and (2) PQ-encodes its
  * ADMITTED vectors against the index geometry FROZEN after the first
  * batch (coarse cells from the first `cells` vectors, residual
  * codebooks trained on batch 0's residuals), appending the postings
  * rows to a durable inverted-list store. This is the write side of a
  * production vector database: dedup at the door, then
  * frozen-geometry encode at cost ∝ batch — no retrain, no re-read of
  * the accumulated index; staleness is what `q_pq_distortion` /
  * `q_ivfpq_cell_stats` watch.
  *
  * Contract (stated identically by the committed DuckDB oracle):
  * every vector encodes against the geometry trained on the FIRST
  * slice (vec_id < max/3 + 1 — the fixture's slice width, a pure
  * function of the corpus); a vector's postings land iff the gate
  * admits it (no earlier banded candidate with cosine ≥ threshold).
  * Batch 0's own postings are exactly this statement too: pqTrain's
  * final encode assigns against the trained codebook, so "build then
  * keep admitted" ≡ "encode slice 0 against the frozen geometry,
  * keep admitted".
  *
  * Idempotence: the [[IngestGate]] discipline — per-batch Overwrite
  * subdirectories, probes read strictly-earlier batches only.
  */
object AnnIngest {
  private val fixtureLock = new Object

  /** Micro-batch count — see [[IngestGate.Slices]]. */
  val Slices = 3

  def replayAnnIngest(s: SparkSession, d: String, threshold: Double,
                      bands: Int, bitsPerBand: Int, dims: Int, cells: Int,
                      m: Int, ks: Int, refineIters: Int): DataFrame = {
    val dsub = dims / m
    val embs = graft.model.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val srcDir = new java.io.File(graft.model.Scratch.dir("ann_ingest_src", d))
    srcDir.mkdirs()
    val ready = new java.io.File(srcDir, "_GATE_READY")
    fixtureLock.synchronized { if (!ready.exists()) {
      val hi = embs.agg(max(col("vec_id"))).first().getLong(0)
      val width = hi / Slices + 1L
      val tmp = new java.io.File(srcDir, "_stage")
      (0 until Slices).foreach { i =>
        embs.filter(col("vec_id") >= i * width && col("vec_id") < (i + 1) * width)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(srcDir, f"gate_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified((i + 1) * 60000L): Unit
      }
      java.nio.file.Files.writeString(ready.toPath, "ok"): Unit
    } }
    val idxDir = graft.model.Scratch.dir("ann_ingest_idx", d)
    val vecDir = graft.model.Scratch.dir("ann_ingest_vec", d)
    val geoDir = graft.model.Scratch.dir("ann_ingest_geo", d)
    val postDir = graft.model.Scratch.dir("ann_ingest_post", d)
    def existing(dir: String, before: Long = Long.MaxValue): Seq[String] = {
      val f = new java.io.File(dir)
      if (!f.isDirectory) Nil
      else f.listFiles().filter(x => x.isDirectory && x.getName.startsWith("b")
          && x.getName.drop(1).toLong < before)
        .map(_.getPath).toSeq.sorted
    }
    Seq(idxDir, vecDir, geoDir, postDir).foreach { dir =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    val stream = s.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getPath + "/gate_*.parquet")
    val ckpt = graft.model.Scratch.dir("ann_ingest_ckpt", d) + "/" +
      java.util.UUID.randomUUID().toString.take(8)
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val vecs = batch.select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ---- 1. the gate (EmbGate's exact rule) ----
        val buckets = Similarity.srpBuckets(vecs, "vec_id", "embedding",
            bands, bitsPerBand)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idxDirs = existing(idxDir, before = batchId)
        val candPrev =
          if (idxDirs.isEmpty) ss.emptyDataFrame
            .select(lit(0L).as("key_a"), lit(0L).as("key_b")).limit(0)
          else ss.read.parquet(idxDirs: _*)
            .select(col("vec_id").as("key_a"), col("bucket"))
            .join(buckets.select(col("vec_id").as("key_b"), col("bucket")),
              Seq("bucket"))
            .select(col("key_a"), col("key_b"))
        val candSame = buckets.select(col("vec_id").as("key_a"), col("bucket"))
          .join(buckets.select(col("vec_id").as("key_b"), col("bucket")),
            Seq("bucket"))
          .filter(col("key_a") < col("key_b"))
          .select(col("key_a"), col("key_b"))
        val cands = candPrev.unionByName(candSame).distinct()
        val vecDirs = existing(vecDir, before = batchId)
        val allVecs =
          if (vecDirs.isEmpty) vecs
          else ss.read.parquet(vecDirs: _*).unionByName(vecs)
        val rejected = Similarity.verifyCosine(cands, allVecs, "vec_id",
            "embedding", threshold)
          .select(col("key_b").as("vec_id")).distinct()
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
            cb.coalesce(1).write.mode("overwrite").parquet(s"$geoDir/b0")
            p0.join(admitted.select(col("vec_id").as("n_id")), Seq("n_id"))
          } else {
            val cb = ss.read.parquet(s"$geoDir/b0")
            val base = ss.read.parquet(existing(vecDir).head) // slice 0
            Similarity.ivfPqEncode(admitted, Similarity.coarseFromBase(
                base, "vec_id", "embedding", dsub, cells), cb,
              "vec_id", "embedding", dsub)
          }
        postings.coalesce(1).write.mode("overwrite").parquet(s"$postDir/b$batchId")
        buckets.coalesce(1).write.mode("overwrite").parquet(s"$idxDir/b$batchId")
        vecs.coalesce(1).write.mode("overwrite").parquet(s"$vecDir/b$batchId")
        admitted.unpersist()
        buckets.unpersist()
        vecs.unpersist(): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    try query.awaitTermination()
    finally rm(new java.io.File(ckpt))
    s.read.parquet(existing(postDir): _*)
      .orderBy(col("n_id"), col("sub"))
  }
}
