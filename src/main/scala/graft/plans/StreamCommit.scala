package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Exactly-once streaming ingestion into the Lineage snapshot layer: a
  * `foreachBatch` sink that commits each micro-batch as its own snapshot
  * whose manifest note records (query, batchId). Structured Streaming's
  * guarantee is at-least-once delivery to foreachBatch — after a crash
  * the last in-flight batch is REPLAYED — so the sink consults the
  * committed batch ids first and re-deliveries become no-ops: the same
  * idempotent-admission discipline as batch resume, at micro-batch
  * granularity. Combined with the manifest's atomic-rename commit point,
  * a crash at any moment leaves either the batch fully committed or
  * fully absent — never half-visible.
  *
  * The frame handed to the sink must satisfy the Lineage commit contract
  * (`tile_id`, `byte_len`) — tiles from the streaming pipeline or
  * curated docs keyed by content fp alike.
  */
object StreamCommit {
  private def noteOf(queryName: String, batchId: Long): String =
    s"stream=$queryName batch=$batchId"

  private val NoteRe = """"note": "stream=([^"]+) batch=(\d+)"""".r

  /** Batch ids already committed under `root` for `queryName` (read from
    * the ACTIVE manifests; compaction carries the replaced snapshots'
    * data forward, so their batches stay deduplicated via the compacted
    * snapshot's rows even though their notes vanish — re-delivery that
    * far back cannot happen: the streaming engine only replays the tail
    * batch).
    */
  def committedBatchIds(root: String, queryName: String): Set[Long] = {
    val dir = Paths.get(root, "manifests")
    if (!Files.isDirectory(dir)) return Set.empty
    Lineage.committedSnapshots(root).flatMap { id =>
      val txt = Files.readString(dir.resolve(s"snap-$id.json"))
      NoteRe.findFirstMatchIn(txt).collect {
        case m if m.group(1) == queryName => m.group(2).toLong
      }
    }.toSet
  }

  /** The foreachBatch handler:
    * {{{
    * stream.writeStream.foreachBatch(StreamCommit.handler(root, "tiles") _)
    * }}}
    * Returns the snapshot committed for this batch, or None when the
    * batch id was already committed (a re-delivery).
    */
  def commitBatch(root: String, queryName: String)
                 (df: DataFrame, batchId: Long): Option[Lineage.Snapshot] = {
    if (committedBatchIds(root, queryName).contains(batchId)) None
    else Some(Lineage.commit(df, root, noteOf(queryName, batchId)))
  }

  /** void-returning adapter with the exact foreachBatch signature. */
  def handler(root: String, queryName: String)(df: DataFrame, batchId: Long): Unit = {
    commitBatch(root, queryName)(df, batchId); ()
  }
}
