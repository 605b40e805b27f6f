package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.api.FalApi

/** Streaming → A-layer ingest: sink a stream into a registered model
  * through `foreachBatch` + the metadata-only append chain. This is
  * the continual-ingest shape the reference's users run as externally
  * fed incremental models: each micro-batch lands as ONE new version
  * directory holding only the increment (O(batch) write cost no matter
  * how large the accumulated model gets), readers always see a
  * consistent pointer, and `compactModel` folds long chains on
  * maintenance windows.
  *
  * Exactly-once: `foreachBatch` replays the in-flight batch after a
  * restart, so the sink keeps its own commit log (the canonical
  * idempotent-foreachBatch recipe) — `_stream_commit` under the model
  * dir records the last applied batch id and replayed ids are no-ops.
  * The pointer swap is atomic, so a crash between append and commit
  * re-appends the same batch; the commit check runs FIRST, making the
  * window a duplicate-append risk only if the crash lands exactly
  * between swapPointer and the commit write — the same at-least-once
  * corner every file-sink + external-log pairing has without a
  * transactional catalog.
  */
object StreamIngest {

  /** Apply one micro-batch idempotently; returns true if appended,
    * false if `batchId` was already committed (a restart replay).
    */
  def applyBatch(api: FalApi, name: String, batch: DataFrame,
      batchId: Long): Boolean = {
    val commit = Paths.get(api.registry.root, name, "_stream_commit")
    val last =
      if (Files.exists(commit)) Files.readString(commit).trim.toLong
      else -1L
    if (batchId <= last) false
    else {
      api.writeToModel(batch, name, mode = "append")
      Files.createDirectories(commit.getParent)
      Files.writeString(commit, batchId.toString)
      true
    }
  }

  /** Start the ingest query: every micro-batch appends to `name`
    * through [[applyBatch]].
    */
  def toModel(stream: DataFrame, api: FalApi, name: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(api, name, batch, batchId); ()
      }
      .start()
}
