package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft.F
import graft.functions.VecKernels

/** 1-bit quantization search — the RaBitQ/BINARYIVF capability class
  * (reference gamma_index_ivfrabitq.cc / gamma_index_binary_ivf.cc):
  * vectors compress to dim/8-byte sign codes, candidate generation is a
  * Hamming-distance shortlist over the codes (popcount of xor — 64×
  * smaller scan than raw floats), exact scoring reranks the shortlist.
  *
  * For angle-preserving data (normalized embeddings) the sign code keeps
  * enough signal that a shortlist of a few % of N recovers high recall;
  * the rerank makes the final top-k exact over the shortlist.
  */
object BinaryIndex {

  /** Add the packed sign-bit code column. */
  def encode(df: DataFrame, vecCol: String, codeCol: String = "bcode"): DataFrame =
    df.withColumn(codeCol, F.signBits(col(vecCol)))

  /** Hamming shortlist over CODES ONLY → id shortlist → semi-join rerank.
    *
    * Stage 1 projects (id, code) immediately so parquet column pruning
    * drops the raw float vectors from the shortlist scan — dim/8 bytes per
    * row instead of 4·dim (a 32× IO cut at dim=64). Only the `shortlist`
    * survivors' raw vectors are fetched by the stage-2 broadcast semi-join
    * for the exact rerank.
    */
  def search(
      corpus: DataFrame, // carries codeCol + the raw vector column
      vecCol: Column,
      q: Seq[Float],
      k: Int,
      shortlist: Int,
      idCol: Column,
      metric: String = "l2",
      codeCol: String = "bcode",
      roundTo: Option[Int] = None): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val qCode = VecKernels.signBits(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
      .asInstanceOf[Array[Byte]]
    val cand = corpus
      .select(idCol.as("_sid"), col(codeCol))
      .withColumn("_hamming", F.hamming(col(codeCol), lit(qCode)))
      .filter(col("_hamming").isNotNull) // null codes must not head the shortlist
      .orderBy(col("_hamming").asc, col("_sid").asc)
      .limit(shortlist)
      .select(col("_sid"))
    val rerank = corpus.join(broadcast(cand), idCol === col("_sid"), "left_semi")
    Knn.search(rerank, vecCol, q, k, metric, tieBreak = Some(idCol), roundTo = roundTo)
  }
}
