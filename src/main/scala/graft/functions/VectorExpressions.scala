package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd scalar distance expressions — the vearch "metric" surface
  * (InnerProduct / L2 / Cosine, reference internal/engine/index/index_model.h:21)
  * plus normalization (internal/router/client.go:603-665) and Hamming for
  * binary codes. Each generates a single static-kernel call so it stays
  * inside whole-stage codegen (no virtual eval dispatch, no boxing).
  */
abstract class BinaryVecExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String // method name on VecKernels

  override def nullSafeEval(a: Any, b: Any): Any = evalKernel(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.$kernel($a, $b)")
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_dot"
  override protected def kernel: String = "dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = VecKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class L2Sq(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def kernel: String = "l2sq"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = VecKernels.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class L2Dist(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_l2"
  override protected def kernel: String = "l2"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = VecKernels.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_cosine"
  override protected def kernel: String = "cosine"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = VecKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VecNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = VecKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class L2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_l2_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any = VecKernels.l2normalize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.l2normalize($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF coarse quantizer: nearest-centroid id for a vector against a fixed
  * (broadcast-literal) centroid table. The centroid array rides along as a
  * referenced object in generated code — one virtual call per row, loop
  * stays primitive.
  */
case class IvfAssign(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "ivf_assign"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any): Any =
    VecKernels.argminL2(a.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.argminL2($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF quantizer search as a row expression: top-`nprobe` centroid ids for
  * a vector (metric-aware). Lets a k-NN JOIN compute probe lists for a
  * DISTRIBUTED query side — no driver collect of the queries.
  */
case class IvfProbeLists(child: Expression, centroids: Array[Array[Float]],
    nprobe: Int, metric: String) extends UnaryExpression {
  override def prettyName: String = "ivf_probe_lists"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private val ip = metric == "ip"
  private val cos = metric == "cosine"
  override def nullSafeEval(a: Any): Any =
    VecKernels.probeLists(a.asInstanceOf[ArrayData], centroids, nprobe, ip, cos)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VecKernels.probeLists($a, $ref, $nprobe, $ip, $cos)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Common-element count of two ascending-sorted distinct long arrays (the
  * shingle-hash set representation) — `size(array_intersect(a, b))` on
  * such inputs as a single allocation-free merge scan. The dedup pair
  * verifies evaluate this once per candidate pair.
  */
case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "arr_common_count"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sortedCommonCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.sortedCommonCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct sorted xxhash64 shingle hashes of a token array. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "text_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.shingleHashes(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.shingleHashes($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL window hashes (no sort/dedup — element i belongs to the
  * window starting at token i; pairs with posexplode).
  */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "text_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.windowHashesData(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.windowHashesData($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass MinHash signature over a token array. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int) extends UnaryExpression {
  override def prettyName: String = "text_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.minhashSig(a.asInstanceOf[ArrayData], n, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.minhashSig($a, $n, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array (bit votes of per-token xxhash64). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_simhash"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecKernels.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.simhash64($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Portable 60-bit SimHash (md5 token hashes — SQL-oracle-reproducible). */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_simhash_md5"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecKernels.simhashMd5(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.simhashMd5($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode text normalization (NFC, optional accent strip, lowercase,
  * whitespace collapse) — the pre-tokenization cleanup pass of a text
  * pipeline, as one codegen'd kernel call per row. Spark has no built-in
  * unicode normalizer; the kernel mirrors DuckDB's
  * `nfc_normalize`/`strip_accents` composition so it oracle-checks.
  */
case class TextNormalize(child: Expression, stripAccents: Boolean)
    extends UnaryExpression {
  override def prettyName: String = "text_normalize"
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    VecKernels.normalizeText(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stripAccents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VecKernels.normalizeText($a, $stripAccents)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-bit binarization: float vector → packed binary code (dim/8 bytes). */
case class SignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_sign_bits"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any): Any =
    VecKernels.signBits(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.signBits($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ encode: vector → m sub-codebook code ids (array<int>). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.pqEncode(a.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.pqEncode($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ encode of the IVF residual v − centroid(listId) (reference IVFPQ
  * trains per-subvector codebooks on residuals, gamma_index_ivfpq.cc).
  */
case class PqEncodeResidual(vec: Expression, listId: Expression,
    centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = listId
  override def prettyName: String = "pq_encode_residual"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.pqEncodeResidual(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], centroids, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val bref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.pqEncodeResidual($a, $b, $cref, $bref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, listId = r)
}

/** [[PqEncodeResidual]] under the ScaNN anisotropic loss (η weights
  * parallel quantization error — see VecKernels.pqEncodeResidualAniso).
  */
case class PqEncodeResidualAniso(vec: Expression, listId: Expression,
    centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
    eta: Double)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = listId
  override def prettyName: String = "pq_encode_residual_aniso"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.pqEncodeResidualAniso(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], centroids, codebooks, eta)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val bref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.pqEncodeResidualAniso($a, $b, $cref, $bref, $eta)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, listId = r)
}

/** ADC score of a code array against a per-query lookup table. */
case class PqAdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VecKernels.pqAdc(a.asInstanceOf[ArrayData], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lut", lut, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.pqAdc($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** float vector → symmetric int8 code (dim signed bytes — the INT8 value
  * type, index_model.h:19).
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_quantize_i8"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any): Any =
    VecKernels.quantizeI8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.quantizeI8($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8 code → float vector on the b/127 grid (inverse of
  * [[QuantizeI8]]) — index builds over INT8 fields train their coarse
  * quantizer in this de-quantized domain.
  */
case class DequantI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_dequant_i8"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.dequantI8(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.dequantI8($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8 code → the raw code values as floats (×127 of [[DequantI8]]'s
  * grid). Graph index builds over INT8 fields store THIS domain: small
  * integers are exact in float, so walk distances (Double accumulator)
  * equal the integer kernels bit-for-bit.
  */
case class I8ToFloat(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_i8_to_float"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.i8ToFloat(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.i8ToFloat($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inner product over int8-encoded vectors (integer accumulate — the
  * reference's INT8 distance path).
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_i8_dot"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.i8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.i8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Int8L2(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_i8_l2"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.i8L2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.i8L2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Int8L2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_i8_l2sq"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.i8L2Sq(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.i8L2Sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric sign-code dot against a fixed (per-query) quantized query —
  * the RaBitQ qb>0 estimator (gamma_index_ivfrabitq.cc:214-223).
  */
case class SignAdot(child: Expression, q: Array[Float]) extends UnaryExpression {
  override def prettyName: String = "vec_sign_adot"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VecKernels.signAdot(a.asInstanceOf[Array[Byte]], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("q", q, "float[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.signAdot($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign bits of v − centroid(listId): the IVF+RaBitQ residual code. */
case class ResidualSignBits(vec: Expression, listId: Expression,
    centroids: Array[Array[Float]]) extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = listId
  override def prettyName: String = "vec_residual_sign_bits"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.residualSignBits(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.residualSignBits($a, $b, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, listId = r)
}

/** Asymmetric sign-dot with the query as row data (per-list residuals). */
case class SignAdotDyn(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_sign_adot"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.signAdotDyn(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.signAdotDyn($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_hamming"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
