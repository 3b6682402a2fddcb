package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.Graft.F
import graft.operators.Dedup

/** Property tests pinning the codegen'd kernels to their reference
  * formulations (the HOF/built-in versions they replaced for speed).
  * scalatestplus-scalacheck is not in the offline cache, so sampling is
  * hand-rolled with fixed seeds for reproducibility.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], count: Int): Seq[A] =
    (1 to count).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val doc = Gen.chooseNum(1, 30).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
  private val vec = Gen.chooseNum(1, 16).flatMap(d =>
    Gen.listOfN(d, Gen.chooseNum(-100, 100).map(_ / 10.0f)))

  test("shingleHashes == sorted distinct xxhash64 of string shingles") {
    samples(Gen.listOfN(8, doc), 8).foreach { docs =>
      {
        val df = docs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
        val viaKernel = df.select($"id",
          F.shingleHashes(Dedup.tokens($"text"), 3).as("h"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
        val viaStrings = df.select($"id",
          array_sort(transform(Dedup.shingles($"text", 3), s => xxhash64(s))).as("h"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
        assert(viaKernel == viaStrings)
      }
    }
  }

  test("sortedCommonCount == size(array_intersect) on sorted distinct arrays") {
    val setGen = Gen.chooseNum(0, 40).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)))
      .map(_.distinct.sorted)
    samples(Gen.zip(setGen, setGen), 40).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        F.commonCount($"a", $"b").as("k"),
        size(array_intersect($"a", $"b")).as("ref")).head()
      assert(r.getInt(0) == r.getInt(1), s"a=$a b=$b")
    }
    // overlapping sets too (the independent gen rarely collides)
    samples(Gen.zip(setGen, setGen), 40).foreach { case (a, b) =>
      val merged = (a ++ b.take(b.size / 2)).distinct.sorted
      val df = Seq((merged, b)).toDF("a", "b")
      val r = df.select(
        F.commonCount($"a", $"b").as("k"),
        size(array_intersect($"a", $"b")).as("ref")).head()
      assert(r.getInt(0) == r.getInt(1), s"a=$merged b=$b")
    }
  }

  test("simhash64 kernel == HOF bit-vote formulation") {
    samples(Gen.listOfN(6, doc), 6).foreach { docs =>
      {
        val df = docs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
        val toks = Dedup.tokens($"text")
        val hof = aggregate(
          zip_with(
            aggregate(toks, array_repeat(lit(0L), 64),
              (acc, t) => zip_with(acc,
                array((0 until 64).map(b =>
                  when(shiftright(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L)
                    .otherwise(-1L)): _*),
                (a, v) => a + v)),
            array((0 until 64).map(b => lit(1L << b)): _*),
            (v, p) => when(v > 0L, p).otherwise(0L)),
          lit(0L), (a, x) => a.bitwiseXOR(x))
        val rows = df.select($"id", Dedup.simhash($"text").as("k"), hof.as("h"))
          .collect()
        rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getInt(0)}"))
      }
    }
  }

  test("vec_dot/l2sq kernels match scala fold on random vectors") {
    samples(Gen.zip(vec, vec), 20).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
      val r = df.select(F.vecDot($"a", $"b"), F.vecL2Sq($"a", $"b")).head()
      val n = math.min(a.size, b.size)
      val dot = (0 until n).foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
      val l2 = (0 until n).foldLeft(0.0) { (s, i) =>
        val d = a(i).toDouble - b(i).toDouble; s + d * d
      }
      assert(r.getDouble(0) == dot)
      assert(r.getDouble(1) == l2)
    }
  }

  test("topk agg == sort-take on random groups") {
    samples(Gen.zip(Gen.chooseNum(1, 6), Gen.chooseNum(50, 200)), 5).foreach { case (k, n) =>
      val df = spark.range(0, n).repartition(5)
        .select(($"id" % 3).as("g"), $"id",
          (($"id" * 2654435761L) % 9973).cast("double").as("s"))
      val agg = df.groupBy($"g")
        .agg(F.topK($"s", struct($"id"), k, asc = true).as("tk"))
        .select($"g", explode($"tk.score").as("s"))
        .collect().groupBy(_.getLong(0))
        .map { case (g, rows) => g -> rows.map(_.getDouble(1)).toSeq }
      val expected = df.collect().groupBy(_.getLong(0)).map { case (g, rows) =>
        g -> rows.map(_.getDouble(2)).sorted.take(k).toSeq
      }
      assert(agg == expected)
    }
  }

  test("quantizeI8 / i8Dot kernels: bounds, symmetry, scala-fold parity") {
    import graft.functions.VecKernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    for (v <- samples(vec, 40)) {
      val q = VecKernels.quantizeI8(new GenericArrayData(v.toArray))
      // bounds: every code in [-127, 127]
      assert(q.forall(b => b >= -127 && b <= 127))
      // parity with the explicit double-floor formula
      val expect = v.map(x =>
        math.max(-127.0, math.min(127.0, math.floor(x.toDouble * 127.0 + 0.5))).toByte)
      assert(q.toSeq == expect)
    }
    for (Seq(a, b) <- samples(vec, 40).grouped(2) if a.length == b.length) {
      val qa = VecKernels.quantizeI8(new GenericArrayData(a.toArray))
      val qb = VecKernels.quantizeI8(new GenericArrayData(b.toArray))
      // symmetry + integer-fold parity
      assert(VecKernels.i8Dot(qa, qb) == VecKernels.i8Dot(qb, qa))
      val expect = qa.zip(qb).map { case (x, y) => x.toLong * y }.sum.toDouble
      assert(VecKernels.i8Dot(qa, qb) == expect)
      assert(VecKernels.i8L2Sq(qa, qb) ==
        qa.zip(qb).map { case (x, y) => val d = (x - y).toLong; d * d }.sum.toDouble)
    }
  }

  test("signAdot: fold parity, and residualSignBits(c=0) == signBits") {
    import graft.functions.VecKernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    for (v <- samples(vec, 40)) {
      val ad = new GenericArrayData(v.toArray)
      val code = VecKernels.signBits(ad)
      // signAdot against the raw query == Σ (xᵢ>=0 ? qᵢ : -qᵢ)
      val q = v.toArray
      val expect = v.zipWithIndex.map { case (x, i) =>
        if (x >= 0f) q(i).toDouble else -q(i).toDouble }.sum
      assert(math.abs(VecKernels.signAdot(code, q) - expect) < 1e-5)
      // residual encode against the zero centroid is plain sign bits
      val zeroCent = Array(Array.fill(v.length)(0f))
      assert(VecKernels.residualSignBits(ad, 0, zeroCent).toSeq == code.toSeq)
    }
  }

  test("quantizeQuery is idempotent and level-bounded") {
    for (v <- samples(vec, 30); qb <- Seq(1, 4, 8)) {
      val once = graft.operators.BinaryIndex.quantizeQuery(v, qb)
      val twice = graft.operators.BinaryIndex.quantizeQuery(once.toSeq, qb)
      // re-quantizing snapped values is a fixpoint
      assert(once.toSeq == twice.toSeq)
      // no value escapes the input range
      assert(once.forall(x => x >= v.min - 1e-4f && x <= v.max + 1e-4f))
    }
  }

  test("simhashMd5 kernel == independent MessageDigest formulation") {
    for (text <- samples(doc, 25)) {
      val kernel = Seq(text).toDF("text")
        .select(F.simhashMd5(split($"text", "\\s+")))
        .head().getLong(0)
      // independent: per-token md5 → first 60 bits → ±1 votes → pack
      val votes = new Array[Int](60)
      text.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8"))
        val v = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (h(i) & 0xffL)) >>> 4
        (0 until 60).foreach(b =>
          if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expect = (0 until 60).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(kernel == expect, s"text=$text")
    }
  }
}
