package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Primitive float-vector kernels invoked from generated code.
  *
  * All accumulate in Double with strict left-to-right order so results are
  * bit-identical to a sequential oracle (DuckDB `list_dot_product` over
  * DOUBLE[]) regardless of Spark partitioning. Loops read elements via
  * `ArrayData.getFloat` (no boxing, no copy for UnsafeArrayData).
  *
  * Capability parity: vearch metric_type InnerProduct / L2
  * (reference: internal/engine/index/index_model.h:21, optional l2_sqrt
  * internal/router/document/doc_query.go:1404).
  */
object VecKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def l2(a: ArrayData, b: ArrayData): Double = math.sqrt(l2sq(a, b))

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  /** L2-normalize to unit length, Float output (vearch `format:
    * normalization` is applied on float vectors at ingest,
    * internal/router/client.go:359-380). Zero vector passes through.
    */
  def l2normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    val nm = norm(a)
    var i = 0
    if (nm == 0.0) {
      while (i < n) { out(i) = a.getFloat(i); i += 1 }
    } else {
      while (i < n) { out(i) = (a.getFloat(i).toDouble / nm).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Nearest-centroid assignment (squared L2): the IVF coarse quantizer
    * (reference gamma_index_ivfflat.cc uses a faiss L1 quantizer; here the
    * centroid table is a small broadcast literal and assignment is a tight
    * per-row loop inside codegen).
    */
  def argminL2(a: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(a.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - cent(i).toDouble
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Top-`nprobe` centroid ids for a vector — the quantizer search as a
    * PER-ROW kernel, so a k-NN JOIN can compute every query's probe lists
    * distributed (the driver-side Model.nearestCentroids formulation
    * requires collecting the query side). Metric-aware like the driver
    * version: ip/cosine rank by (normalized) inner product, l2 by squared
    * distance. Selection is a simple partial sort over ncentroids scores —
    * centroid tables are small (≤ a few thousand entries).
    */
  def probeLists(a: ArrayData, centroids: Array[Array[Float]],
      nprobe: Int, ip: Boolean, cos: Boolean): ArrayData = {
    val nc = centroids.length
    val scores = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cent = centroids(c)
      val n = math.min(a.numElements(), cent.length)
      var s = 0.0
      var i = 0
      if (ip || cos) {
        while (i < n) { s += a.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
        if (cos) {
          var cc = 0.0
          var j = 0
          while (j < cent.length) { cc += cent(j).toDouble * cent(j); j += 1 }
          val nrm = math.sqrt(cc)
          s = if (nrm == 0.0) 0.0 else s / nrm
        }
        scores(c) = -s // negate: best-first under ascending selection
      } else {
        while (i < n) {
          val d = a.getFloat(i).toDouble - cent(i).toDouble
          s += d * d
          i += 1
        }
        scores(c) = s
      }
      c += 1
    }
    val k = math.min(nprobe, nc)
    val idx = Array.range(0, nc)
    // selection sort of the first k positions (k ≪ nc in practice);
    // ties break on centroid id so the probe set is deterministic
    var out = 0
    while (out < k) {
      var best = out
      var p = out + 1
      while (p < nc) {
        if (scores(idx(p)) < scores(idx(best)) ||
          (scores(idx(p)) == scores(idx(best)) && idx(p) < idx(best))) best = p
        p += 1
      }
      val t = idx(out); idx(out) = idx(best); idx(best) = t
      out += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(idx, k))
  }

  /** 64-bit SimHash over a token array: per-token xxhash64 (same XXH64,
    * seed 42 as Spark's `xxhash64`), each bit votes ±1, sign forms the
    * fingerprint. One tight loop per row — the higher-order-function
    * formulation of the same computation cannot enter codegen and
    * allocates a 64-element array per token.
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      // empty tokens (split() artifacts on ragged whitespace) must not
      // vote — one "" flips every near-zero bit and breaks near-dup
      // pairing for otherwise-identical docs (simhashMd5 skips them too)
      if (s != null && s.numBytes > 0) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Distinct xxhash64 values of the n-word shingles of a token array,
    * sorted. The hash equals Spark's `xxhash64("w1 w2 … wn")` (same XXH64
    * seed 42 over the space-joined bytes), so joins built on these keys
    * match string-shingle semantics exactly (modulo 64-bit collisions).
    * Shorter-than-n docs hash their full token join — every doc yields
    * ≥ 1 shingle. One kernel call per row, no per-shingle string objects
    * surviving the loop.
    */
  /** POSITIONAL n-gram hashes: element i = XXH64 of the space-joined
    * window starting at token i (window i of the stride-1 sliding pass) —
    * no sort, no dedup, so `posexplode` recovers (start, hash). The
    * substring-dedup building block ([[graft.operators.Dedup.windowDupSignals]]).
    */
  def windowHashes(tokens: ArrayData, n: Int): Array[Long] = {
    val cnt = tokens.numElements()
    val toks = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      val s = tokens.getUTF8String(i)
      toks(i) = if (s == null) Array.emptyByteArray else s.getBytes
      i += 1
    }
    val nsh = math.max(cnt - n + 1, 1)
    val width = math.min(n, cnt)
    val out = new Array[Long](nsh)
    var buf = new Array[Byte](64)
    var si = 0
    while (si < nsh) {
      var len = 0
      var j = 0
      while (j < width) {
        val t = toks(si + j)
        val need = len + t.length + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(len) = ' '.toByte; len += 1 }
        System.arraycopy(t, 0, buf, len, t.length)
        len += t.length
        j += 1
      }
      out(si) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      si += 1
    }
    out
  }

  def windowHashesData(tokens: ArrayData, n: Int): ArrayData =
    new GenericArrayData(windowHashes(tokens, n))

  /** Count of common elements of two ascending-sorted distinct long
    * arrays (the [[shingleHashes]] set representation) — equivalent to
    * `size(array_intersect(a, b))` on such inputs, but one allocation-free
    * merge scan instead of a per-row hash-set build plus output array.
    * The dedup pair verifies run this over every candidate pair, so the
    * constant matters (measured: the jaccard verify stage spent ~26 µs of
    * executor time per pair in array_intersect at the 10× fixture).
    */
  def sortedCommonCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val out = windowHashes(tokens, n)
    val nsh = out.length
    java.util.Arrays.sort(out)
    // dedup in place (array_distinct semantics)
    var w = 0
    var r = 0
    while (r < nsh) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** MinHash signature from a token array: element j = min over distinct
    * shingle hashes h of XXH64(h, seed = base-hash chained with j) — the
    * whole signature in one pass.
    */
  def minhashSig(tokens: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val hashes = shingleHashes(tokens, n)
    val m = hashes.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(hashes.getLong(i), j.toLong)
        if (h < best) best = h
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Pack sign bits of a float vector into bytes (dim/8 bytes, MSB-first) —
    * produces the binary codes the BINARYIVF path searches with Hamming
    * distance (reference doc_query.go:296-301: binary vectors are uint8
    * arrays of dim/8 bytes).
    */
  def signBits(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) >= 0f) {
        out(i >> 3) = (out(i >> 3) | (0x80 >> (i & 7))).toByte
      }
      i += 1
    }
    out
  }

  /** Product-quantization encode: for each of the m subvectors, the id of
    * the nearest sub-codebook centroid (reference IVFPQ stores nbytes=m
    * codes per vector, gamma_index_ivfpq.cc).
    */
  def pqEncode(a: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val nElems = a.numElements()
    val out = new Array[Int](m)
    var sub = 0
    var offset = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val dsub = if (cb.length > 0) cb(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          // guard short vectors (wrong-dim rows that bypassed validation):
          // missing dims read as 0 instead of walking off the array —
          // UnsafeArrayData would otherwise return adjacent-row garbage
          val x = if (offset + i < nElems) a.getFloat(offset + i).toDouble else 0.0
          val d = x - cent(i).toDouble
          s += d * d
          i += 1
        }
        if (s < bestD) { bestD = s; best = k }
        k += 1
      }
      out(sub) = best
      offset += dsub
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** [[pqEncode]] over the IVF residual v − centroid(listId) — the
    * reference's IVFPQ trains and encodes residuals
    * (gamma_index_ivfpq.cc:221-273), which centers every list's codes
    * around the origin and lets the same ksub codes resolve finer detail.
    */
  def pqEncodeResidual(a: ArrayData, listId: Int,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val nElems = a.numElements()
    val c = centroids(listId)
    val out = new Array[Int](m)
    var sub = 0
    var offset = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val dsub = if (cb.length > 0) cb(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val j = offset + i
          val x =
            if (j < nElems)
              a.getFloat(j).toDouble - (if (j < c.length) c(j).toDouble else 0.0)
            else 0.0
          val d = x - cent(i).toDouble
          s += d * d
          i += 1
        }
        if (s < bestD) { bestD = s; best = k }
        k += 1
      }
      out(sub) = best
      offset += dsub
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** [[pqEncodeResidual]] under the ANISOTROPIC (score-aware) loss of the
    * ScaNN paper (Guo et al., ICML 2020, "Accelerating Large-Scale
    * Inference with Anisotropic Vector Quantization"): the codeword for
    * each subvector minimizes ‖r − c‖² + (η − 1)·⟨r − c, u⟩² with u the
    * sub-residual's own direction — quantization error PARALLEL to the
    * datapoint is weighted η ≥ 1 times the orthogonal error, because
    * parallel error perturbs the inner-product scores of high-scoring
    * points most. η = 1 degenerates to the plain L2 argmin.
    */
  def pqEncodeResidualAniso(a: ArrayData, listId: Int,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      eta: Double): ArrayData = {
    val m = codebooks.length
    val nElems = a.numElements()
    val c = centroids(listId)
    val out = new Array[Int](m)
    var sub = 0
    var offset = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val dsub = if (cb.length > 0) cb(0).length else 0
      // materialize the sub-residual and the ORIGINAL subvector: the
      // score-relevant direction u is the datapoint's own (a high-scoring
      // query points ≈ along x, and the IP error is ⟨q, r − r̂⟩), not the
      // residual's
      val r = new Array[Double](dsub)
      val xv = new Array[Double](dsub)
      var nrm2 = 0.0
      var i = 0
      while (i < dsub) {
        val j = offset + i
        val x = if (j < nElems) a.getFloat(j).toDouble else 0.0
        xv(i) = x
        r(i) = x - (if (j < c.length) c(j).toDouble else 0.0)
        nrm2 += x * x
        i += 1
      }
      val nrm = math.sqrt(nrm2)
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var l2 = 0.0
        var par = 0.0 // ⟨r − c, x⟩ (unnormalized)
        i = 0
        while (i < dsub) {
          val d = r(i) - cent(i).toDouble
          l2 += d * d
          par += d * xv(i)
          i += 1
        }
        val s =
          if (nrm == 0.0) l2
          else l2 + (eta - 1.0) * (par / nrm) * (par / nrm)
        if (s < bestD) { bestD = s; best = k }
        k += 1
      }
      out(sub) = best
      offset += dsub
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation): score = Σ_sub lut(sub)(code).
    * The lookup table is precomputed per query on the driver.
    */
  def pqAdc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    val m = math.min(codes.numElements(), lut.length)
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += lut(sub)(codes.getInt(sub))
      sub += 1
    }
    s
  }

  /** Hamming distance over packed binary codes (vearch BINARYIVF operates on
    * uint8 codes of dim/8 bytes, internal/engine/index/impl/gamma_index_binary_ivf.cc).
    */
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    // length mismatch counts remaining bits as differing
    val longer = if (a.length > n) a else b
    i = n
    while (i < longer.length) {
      s += java.lang.Integer.bitCount(longer(i) & 0xff)
      i += 1
    }
    s
  }

  /** Symmetric int8 quantization (value_type=INT8, index_model.h:19):
    * round(x·127) clamped to [-127,127], one signed byte per dim. The
    * round is floor(x·127 + 0.5) computed in DOUBLE so a pure-SQL oracle
    * (DuckDB floor over ::DOUBLE) reproduces it bit-for-bit — Math.round's
    * float path could disagree at exact .5 boundaries.
    */
  def quantizeI8(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = math.floor(a.getFloat(i).toDouble * 127.0 + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, v)).toByte
      i += 1
    }
    out
  }

  /** Inverse of [[quantizeI8]]: int8 code → float vector on the b/127
    * grid. Index BUILDS over int8 fields train/assign in this
    * de-quantized domain (the coarse quantizer stays float — the
    * reference trains its quantizers on de-quantized INT8 too); order is
    * preserved exactly since i8Dot(a,b) = 127²·dot(deq(a),deq(b)).
    */
  def dequantI8(a: Array[Byte]): ArrayData = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) / 127.0f; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** int8 code → the RAW code values widened to float (no 1/127 scale).
    * Every value is a small integer, so float dot/L2 accumulation in a
    * Double accumulator over these is EXACT — the graph walks built over
    * this domain rank and report bit-identically to the integer kernels
    * ([[i8Dot]]/[[i8L2]]), which is what makes the routed int8 graph
    * serving oracle-exact rather than merely order-approximate.
    */
  def i8ToFloat(a: Array[Byte]): ArrayData = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Inner product over int8-encoded vectors (integer accumulate). */
  def i8Dot(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i).toLong * b(i); i += 1 }
    s.toDouble
  }

  def i8L2Sq(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { val d = a(i) - b(i); s += d.toLong * d; i += 1 }
    s.toDouble
  }

  def i8L2(a: Array[Byte], b: Array[Byte]): Double = math.sqrt(i8L2Sq(a, b))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 60-bit SimHash over a token array: per-token hash = the
    * first 15 hex chars of md5 (== the first 60 bits of the digest),
    * exactly what a SQL oracle computes from `md5(token)` — unlike
    * xxhash64, which no other engine reproduces. Empty tokens are skipped
    * (split() artifacts). One kernel call per row: vote vector + pack, no
    * per-token array allocation.
    */
  def simhashMd5(toks: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = md5Local.get()
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t)
        if (s.numBytes() > 0) {
          md.reset()
          val h = md.digest(s.getBytes)
          // first 15 hex chars of the digest = bytes[0..7] >>> 4
          var v = 0L
          var i = 0
          while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
          v = v >>> 4
          var b = 0
          while (b < 60) {
            if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      t += 1
    }
    var sh = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }

  /** Sign bits of the RESIDUAL v − centroid(listId) — the IVF+RaBitQ
    * layout (gamma_index_ivfrabitq.cc: codes quantize residuals against
    * the coarse quantizer, not raw vectors): residual directions are far
    * less correlated within a list than raw directions, so 1 bit/dim
    * keeps more discriminating signal.
    */
  def residualSignBits(a: ArrayData, listId: Int, centroids: Array[Array[Float]]): Array[Byte] = {
    val n = a.numElements()
    val c = centroids(listId)
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val r = a.getFloat(i) - (if (i < c.length) c(i) else 0f)
      if (r >= 0f) out(i >> 3) = (out(i >> 3) | (0x80 >> (i & 7))).toByte
      i += 1
    }
    out
  }

  /** [[signAdot]] with the query side as row data (per-list residual
    * queries ride in a joined column).
    */
  def signAdotDyn(code: Array[Byte], q: ArrayData): Double = {
    val n = math.min(q.numElements(), code.length * 8)
    var s = 0.0
    var i = 0
    while (i < n) {
      val bit = (code(i >> 3) >> (7 - (i & 7))) & 1
      val v = q.getFloat(i)
      s += (if (bit == 1) v else -v)
      i += 1
    }
    s
  }

  /** Asymmetric sign-code dot (the RaBitQ qb>0 estimator shape,
    * gamma_index_ivfrabitq.cc:214-223): corpus side is 1-bit sign codes,
    * query side keeps qb-bit-quantized real values — Σᵢ bitᵢ ? +qᵢ : −qᵢ.
    * Recovers magnitude information the symmetric Hamming estimator
    * (both sides 1-bit) throws away.
    */
  def signAdot(code: Array[Byte], q: Array[Float]): Double = {
    val n = math.min(q.length, code.length * 8)
    var s = 0.0
    var i = 0
    while (i < n) {
      val bit = (code(i >> 3) >> (7 - (i & 7))) & 1
      s += (if (bit == 1) q(i) else -q(i))
      i += 1
    }
    s
  }

  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Unicode text normalization, composed to mirror the SQL oracle
    * exactly: NFC-compose → (optionally) strip combining marks via NFD →
    * lowercase (root locale) → trim + collapse whitespace runs. DuckDB
    * equivalent: `trim(regexp_replace(lower(strip_accents(
    * nfc_normalize(s))), '\s+', ' ', 'g'))`.
    */
  def normalizeText(
      s: org.apache.spark.unsafe.types.UTF8String,
      stripAccents: Boolean): org.apache.spark.unsafe.types.UTF8String = {
    import java.text.Normalizer
    var str = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    if (stripAccents)
      str = CombiningMarks.matcher(
        Normalizer.normalize(str, Normalizer.Form.NFD)).replaceAll("")
    str = str.toLowerCase(java.util.Locale.ROOT)
    str = WsRun.matcher(str).replaceAll(" ").trim
    org.apache.spark.unsafe.types.UTF8String.fromString(str)
  }
}
