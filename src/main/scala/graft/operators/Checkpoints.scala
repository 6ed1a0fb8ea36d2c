package graft.operators

import org.apache.spark.storage.StorageLevel

/** Storage policy for the engine's eager `localCheckpoint` frames.
  *
  * Every iterative operator here (min-label propagation, PageRank, k-means,
  * BPE rounds) and every cache-releasing result materialization checkpoints
  * through `Dataset.localCheckpoint`, whose default storage level keeps the
  * materialized partitions as DESERIALIZED row objects (MEMORY_AND_DISK).
  * For the frames that matter at scale — the mirrored edge list of a
  * near-dup graph is ~2 rows per candidate pair, tens of millions of rows
  * at factor 100 and billions on a 100 TB corpus — the per-row object
  * overhead multiplies the footprint several-fold, and 32 concurrent tasks
  * unrolling deserialized partitions OOM'd a default-sized heap at factor
  * 100 (q_canonical_selection, stage 55: the CC edge checkpoint) while the
  * same run fits comfortably serialized.
  *
  * MEMORY_AND_DISK_SER stores each partition as one compact serialized
  * buffer: no per-row object headers, cheap eviction to disk under
  * pressure, and the deserialize-on-read CPU is noise next to the joins
  * these frames feed. The level is a STORAGE-format knob only — results
  * are bit-identical — so every eager checkpoint site uses this constant;
  * a site that measurably suffers from re-read deserialization (none so
  * far) can opt back out locally with a comment explaining the numbers.
  */
object Checkpoints {
  val Ser: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER
}
