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

  /** Hamming shortlist → exact rerank. */
  def search(
      corpus: DataFrame, // carries codeCol + the raw vector column
      vecCol: Column,
      q: Seq[Float],
      k: Int,
      shortlist: Int,
      metric: String = "l2",
      codeCol: String = "bcode",
      tieBreak: Option[Column] = None,
      roundTo: Option[Int] = None): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val qCode = VecKernels.signBits(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray))
      .asInstanceOf[Array[Byte]]
    val order = col("_hamming").asc +: tieBreak.map(_.asc).toSeq
    val cand = corpus
      .withColumn("_hamming", F.hamming(col(codeCol), lit(qCode)))
      .filter(col("_hamming").isNotNull) // null codes must not head the shortlist
      .orderBy(order: _*)
      .limit(shortlist)
      .drop("_hamming")
    Knn.search(cand, vecCol, q, k, metric, tieBreak = tieBreak, roundTo = roundTo)
  }
}
