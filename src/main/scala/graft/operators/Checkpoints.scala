package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle helper for `localCheckpoint(eager = true)` intermediates.
  *
  * An eager localCheckpoint pins its blocks in executor storage until the
  * backing RDD object is garbage-collected on the driver AND the context
  * cleaner runs — in a long-lived session with a large heap that is
  * effectively "never", so every corpus-scale checkpoint permanently
  * shrinks the storage pool for everyone else. Operators that checkpoint
  * corpus-scale intermediates must free them deterministically once the
  * consuming action has run: materialize the (output-sized) result, then
  * `free` each intermediate.
  */
object Checkpoints {

  /** Drops the storage blocks behind a checkpointed Dataset.
    *
    * A `localCheckpoint` result's plan is a [[LogicalRDD]] leaf wrapping
    * the persisted internal-row RDD; unpersisting that RDD releases the
    * blocks on every executor. Safe on any Dataset — non-checkpoint plans
    * contain no LogicalRDD leaf and are left untouched. After `free`, the
    * Dataset must not be recomputed (its lineage was truncated at the
    * checkpoint), so only call this once every consumer has materialized.
    */
  def free(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Consume-then-free: run `f` over a returned (checkpointed) frame and
    * deterministically release its storage blocks afterwards — the
    * closing bracket for operators whose RESULT is itself an eager
    * checkpoint (jaccardPairs, minhashLshPairs, simhashPairs,
    * connectedComponents). A caller looping over many corpora wraps each
    * call so executor storage stays flat instead of re-acquiring blocks
    * per corpus until GC. The frame must not be used after `consume`
    * returns (its lineage was truncated at the checkpoint).
    */
  def consume[T](ds: Dataset[_])(f: Dataset[_] => T): T =
    try f(ds) finally free(ds)
}
