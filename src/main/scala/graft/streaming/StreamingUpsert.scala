package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.SpaceCatalog

/** Streaming ingest landing directly in a catalog space: each micro-batch
  * MERGEs into the bucketed table via [[SpaceCatalog.upsert]], so a batch
  * rewrites only the id-hash buckets it touches — the reference's
  * streaming writes land in an LSM memtable with the same bounded
  * write-amplification property (SURVEY §2.9 + space.go slot routing).
  *
  * Use [[RealtimeTail]] instead when sub-interval search freshness
  * matters (tail union); use this when the catalog table IS the serving
  * copy and per-interval visibility is enough.
  */
object StreamingUpsert {

  def start(
      source: DataFrame, // streaming, schema must carry _id
      cat: SpaceCatalog,
      db: String,
      space: String,
      partitionNum: Int,
      checkpointPath: String,
      intervalMs: Long = 1000L): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) cat.upsert(db, space, batch, partitionNum)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()
}
