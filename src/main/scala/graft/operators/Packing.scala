package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: the "concatenate the corpus, chunk into
  * fixed-length sequences" assignment every LLM pretraining pipeline
  * performs before batching (GPT-style packing). Given a deterministic
  * total order over documents, each document occupies the half-open
  * token span [start_offset, start_offset + n_tokens) of the virtual
  * concatenated corpus, and sequence k is tokens [k·seqLen, (k+1)·seqLen).
  *
  * The hard part at scale is the GLOBAL prefix sum: a naive
  * `sum over (order by id)` window is a single-partition sort — the
  * canonical driver-shaped bottleneck. This implementation computes it
  * distributed:
  *
  *   1. range-partition by the order key (ordered, non-overlapping
  *      partition ranges — RangePartitioner's contract);
  *   2. local cumulative sums per partition (a mapPartitions running
  *      sum over the sorted range partitions — a partition-id-keyed
  *      window would re-shuffle the corpus, since RangePartitioning
  *      doesn't satisfy a hash ClusteredDistribution);
  *   3. per-partition totals (ONE row per partition) prefix-summed and
  *      broadcast-joined back.
  *
  * The only driver-side materialization is the per-partition total list —
  * bounded by the partition count, never by the data (the same bounded-
  * collect contract as PQ codebook training). Results are independent of
  * the sampled range boundaries: offsets derive from actual totals, so
  * any ordered partitioning yields the identical assignment.
  *
  * Output per doc: `doc_id`, `n_tokens`, `start_offset` (tokens before
  * this doc in corpus order), `seq_id` / `end_seq` (first / last packed
  * sequence this doc's tokens land in), `n_seqs` (sequences spanned —
  * > 1 means the doc is split across a sequence boundary). All BIGINT.
  *
  * Requires `idCol` values be unique (they define the corpus order) and
  * token counts be non-negative; an empty doc (n = 0) occupies no span
  * and reports seq_id = end_seq = the sequence its offset falls in,
  * n_seqs = 0.
  */
object Packing {

  def packAssignments(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Long,
      numParts: Int = 0): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(idCol).as("doc_id"), col(nTokensCol).cast("long").as("_n"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
    // running sum per RANGE partition via mapPartitions: a window keyed
    // on spark_partition_id would NOT satisfy its ClusteredDistribution
    // from RangePartitioning, so Catalyst would insert a second
    // corpus-wide hash Exchange — the iterator runs on the range
    // partitions directly, ONE shuffle total. Null token counts fold to
    // 0 (the contract requires non-negative counts).
    val cumSchema = org.apache.spark.sql.types.StructType(
      parted.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("_cum",
          org.apache.spark.sql.types.LongType, nullable = false)))
    // eager checkpoint: the local-cumsum frame feeds BOTH the totals
    // collect and the final join, and RangePartitioner samples boundaries
    // per execution — two independent recomputations could disagree on
    // partition membership and corrupt the offsets. One materialization
    // makes pid assignment a fixed fact. (Caller releases the blocks via
    // Checkpoints.free on the result — the dedup-family contract.)
    val local = parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      it.map { r =>
        val n = if (r.isNullAt(1)) 0L else r.getLong(1)
        acc += n
        org.apache.spark.sql.Row(r.get(0), n, pid, acc)
      }
    }(org.apache.spark.sql.Encoders.row(cumSchema))
      .localCheckpoint()
    // one row per partition — bounded by `parts`, not by the data
    val totals = local.groupBy("_pid").agg(sum("_n").as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefixes = totals.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, tot)) => pid -> (acc + tot)
    }.init.zip(totals).map { case ((_, before), (pid, _)) => (pid, before) }
    val prefixDf = spark.createDataFrame(prefixes.toSeq)
      .toDF("_pid", "_before")
    local.join(broadcast(prefixDf), "_pid")
      .select(col("doc_id"), col("_n").as("n_tokens"),
        (col("_before") + col("_cum") - col("_n")).as("start_offset"))
      .withColumn("seq_id", expr(s"start_offset div ${seqLen}L"))
      .withColumn("end_seq",
        when(col("n_tokens") === 0, col("seq_id"))
          .otherwise(expr(s"(start_offset + n_tokens - 1) div ${seqLen}L")))
      .withColumn("n_seqs",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("end_seq") - col("seq_id") + 1))
  }

  /** The loader-ready MANIFEST view of [[packAssignments]]: one row per
    * (sequence, document) slice, i.e. each document's token span cut at
    * sequence boundaries. A training loader reads a sequence's slices in
    * `seq_from` order and concatenates `doc[doc_from..doc_to]` spans —
    * no further arithmetic. Columns (1-based, inclusive):
    *
    *   `seq_id`; `doc_id`; `doc_from`/`doc_to` — the slice inside the
    *   document; `seq_from`/`seq_to` — where it lands inside the
    *   sequence; `slice_tokens` — span length.
    *
    * Empty docs occupy no span and emit no manifest rows. The explode
    * multiplies each doc by its n_seqs (≈ 1 + n_tokens/seqLen), so the
    * manifest is O(total_tokens/seqLen + docs) rows — the same order as
    * the assignment relation itself.
    */
  def packManifest(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Long,
      numParts: Int = 0): DataFrame = {
    val assign = packAssignments(df, idCol, nTokensCol, seqLen, numParts)
    assign
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        explode(sequence(col("seq_id"), col("end_seq"))).as("seq_id"))
      .withColumn("_sfrom", greatest(col("start_offset"), col("seq_id") * seqLen))
      .withColumn("_sto",
        least(col("start_offset") + col("n_tokens"), (col("seq_id") + 1) * seqLen))
      .select(
        col("seq_id"),
        col("doc_id"),
        (col("_sfrom") - col("start_offset") + 1).as("doc_from"),
        (col("_sto") - col("start_offset")).as("doc_to"),
        (col("_sfrom") - col("seq_id") * seqLen + 1).as("seq_from"),
        (col("_sto") - col("seq_id") * seqLen).as("seq_to"),
        (col("_sto") - col("_sfrom")).as("slice_tokens"))
  }
}
