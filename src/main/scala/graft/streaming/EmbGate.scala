package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Similarity

/** Streaming EMBEDDING near-duplicate ingestion gate — the vector-space
  * sibling of [[IngestGate]]: embedding rows arrive in micro-batches,
  * each batch's SRP band buckets probe a PERSISTENT band index of
  * everything seen before, candidates verify by exact cosine against a
  * persistent vector store, and every vector gets an admit/reject
  * decision with the earliest matching prior vector (`dup_src`). This
  * is the gate a continuously-trained embedding corpus runs in front of
  * its ANN index: dedup state is durable TABLES (band index + vector
  * store), not operator memory, so it survives restarts and grows
  * append-only; per batch the probe cost is (batch buckets) ⋈ index —
  * proportional to the BATCH — and raw vectors are fetched for
  * verification candidates only, never joined corpus×corpus.
  *
  * Contract (stated identically by the committed DuckDB oracle, which
  * bit-mirrors the SRP hyperplanes like `q_dedup_embedding`): vector
  * `d` is a duplicate iff some earlier vector `e` (e.vec_id < d.vec_id
  * — the replay lands contiguous vec_id ranges in ascending order, so
  * arrival order IS id order) shares at least one band code with `d`
  * AND has exact cosine ≥ threshold; `dup_src` is the minimum such
  * `e`. The candidate set is batch-structure-independent: a pair
  * (a, b), a < b, lands in the same-batch self-join if co-arriving and
  * in the index probe otherwise — exactly once either way — so the
  * decisions are a pure function of the corpus and the gate hash-gates
  * against the oracle's one-sentence restatement.
  *
  * Idempotence: the [[IngestGate]] discipline — each micro-batch
  * Overwrite-writes its own `b<id>` store subdirectories and probes
  * only STRICTLY EARLIER ones, so an at-least-once replay reproduces
  * byte-identical decisions.
  */
object EmbGate {
  private val fixtureLock = new Object

  /** Micro-batch count of the replay fixture — see
    * [[IngestGate.Slices]] for the 3-batch argument; exposed for the
    * spec's cross-batch assertion.
    */
  val Slices = 3

  def replayEmbNearDupGate(s: SparkSession, d: String, threshold: Double,
                           bands: Int, bitsPerBand: Int): DataFrame = {
    val embs = graft.model.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val srcDir = new java.io.File(graft.model.Scratch.dir("emb_gate_src", d))
    srcDir.mkdirs()
    val ready = new java.io.File(srcDir, "_GATE_READY")
    val slices = Slices
    // contiguous ascending vec_id ranges, mtime-pinned (FileStreamSource
    // consumes in modification-time order) — see IngestGate's fixture
    fixtureLock.synchronized { if (!ready.exists()) {
      val hi = embs.agg(max(col("vec_id"))).first().getLong(0)
      val width = hi / slices + 1L
      val tmp = new java.io.File(srcDir, "_stage")
      (0 until slices).foreach { i =>
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
    val decDir = graft.model.Scratch.dir("emb_gate_dec", d)
    val idxDir = graft.model.Scratch.dir("emb_gate_idx", d)
    val vecDir = graft.model.Scratch.dir("emb_gate_vec", d)
    def existing(dir: String, before: Long = Long.MaxValue): Seq[String] = {
      val f = new java.io.File(dir)
      if (!f.isDirectory) Nil
      else f.listFiles().filter(x => x.isDirectory && x.getName.startsWith("b")
          && x.getName.drop(1).toLong < before)
        .map(_.getPath).toSeq.sorted
    }
    // a rerun in the same session gates the replay afresh
    Seq(decDir, idxDir, vecDir).foreach { dir =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    val stream = s.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getPath + "/gate_*.parquet")
    val ckpt = graft.model.Scratch.dir("emb_gate_ckpt", d) + "/" +
      java.util.UUID.randomUUID().toString.take(8)
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val vecs = batch.select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val buckets = Similarity.srpBuckets(vecs, "vec_id", "embedding",
            bands, bitsPerBand)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idxDirs = existing(idxDir, before = batchId)
        // prior-batch candidates: probe the persistent band index with
        // THIS batch's buckets (cost ∝ batch); same-batch candidates:
        // the ordered self-join — together they cover every a<b pair
        // with a shared band exactly once
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
        val dupSrc = Similarity.verifyCosine(cands, allVecs, "vec_id",
            "embedding", threshold)
          .groupBy(col("key_b").as("vec_id"))
          .agg(min(col("key_a")).as("dup_src"))
        val decisions = batch.select(col("vec_id"))
          .join(dupSrc, Seq("vec_id"), "left")
          .select(col("vec_id"), col("dup_src").isNull.as("admitted"),
            col("dup_src"))
        // single-file store landings — the IngestGate trim argument:
        // micro-batches here are thousands of rows, where multi-file
        // task commits would dominate the measurement
        decisions.coalesce(1).write.mode("overwrite").parquet(s"$decDir/b$batchId")
        buckets.coalesce(1).write.mode("overwrite").parquet(s"$idxDir/b$batchId")
        vecs.coalesce(1).write.mode("overwrite").parquet(s"$vecDir/b$batchId")
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
    s.read.parquet(existing(decDir): _*)
      .orderBy(col("vec_id"))
  }
}
