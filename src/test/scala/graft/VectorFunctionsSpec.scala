package graft

import org.apache.spark.sql.functions._
import graft.Graft.F

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df2 = Seq(
    (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (2L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))
  ).toDF("id", "a", "b")

  test("vec_dot") {
    val r = df2.select($"id", F.vecDot($"a", $"b").as("d")).orderBy($"id").collect()
    assert(r(0).getDouble(1) === 32.0)
    assert(r(1).getDouble(1) === 0.0)
  }

  test("vec_l2sq / vec_l2") {
    val r = df2.select(F.vecL2Sq($"a", $"b").as("sq"), F.vecL2($"a", $"b").as("d"))
      .orderBy($"sq").collect()
    assert(r(0).getDouble(0) === 3.0)
    assert(math.abs(r(0).getDouble(1) - math.sqrt(3.0)) < 1e-12)
    assert(r(1).getDouble(0) === 27.0)
  }

  test("vec_cosine and zero-vector guard") {
    val r = df2.select($"id", F.vecCosine($"a", $"b").as("c")).orderBy($"id").collect()
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r(0).getDouble(1) - expected) < 1e-12)
    assert(r(1).getDouble(1) === 0.0) // zero vector → 0, no NaN
  }

  test("vec_norm / vec_l2_normalize") {
    val r = df2.filter($"id" === 1)
      .select(F.vecNorm(F.l2Normalize($"a")).as("n")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    // zero vector normalizes to itself
    val z = df2.filter($"id" === 2).select(F.l2Normalize($"a")).head().getSeq[Float](0)
    assert(z == Seq(0f, 0f, 0f))
  }

  test("vec_hamming over binary codes") {
    val d = Seq((Array[Byte](0, 0), Array[Byte](-1, 0)), // 0x00 vs 0xff → 8 bits
      (Array[Byte](5), Array[Byte](3))) // 101 vs 011 → 2 bits
      .toDF("x", "y")
    val r = d.select(F.hamming($"x", $"y").as("h")).orderBy($"h").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 8L))
  }

  test("int8 quantize + integer-accumulate distances") {
    val d = Seq((0L, Seq(1.0f, -1.0f, 0.5f, 0.0f)), (1L, Seq(0.5f, 0.5f, -0.25f, 1.0f)))
      .toDF("id", "v")
      .withColumn("iv", F.quantizeI8($"v"))
    // quantize: round(x*127) clamped — 1.0→127, -1.0→-127, 0.5→64 (floor(63.5+0.5)), 0→0
    val codes = d.orderBy($"id").select($"iv").collect().map(_.getAs[Array[Byte]](0))
    assert(codes(0).toSeq == Seq[Byte](127, -127, 64, 0))
    assert(codes(1).toSeq == Seq[Byte](64, 64, -32, 127))
    // dot = 127*64 + (-127)*64 + 64*(-32) + 0*127 = -2048
    val dot = d.filter($"id" === 0).select(
      F.i8Dot($"iv", org.apache.spark.sql.functions.lit(codes(1))).as("s"))
      .head().getDouble(0)
    assert(dot == (127 * 64 + (-127) * 64 + 64 * (-32) + 0).toDouble)
    // l2sq = sum of squared int diffs
    val l2sq = d.filter($"id" === 0).select(
      F.i8L2Sq($"iv", org.apache.spark.sql.functions.lit(codes(1))).as("s"))
      .head().getDouble(0)
    val expect = Seq(127 - 64, -127 - 64, 64 + 32, 0 - 127).map(x => x.toLong * x).sum
    assert(l2sq == expect.toDouble)
  }

  test("functions are SQL-callable and null-safe") {
    val r = spark.sql(
      "SELECT vec_dot(CAST(array(1.0,2.0) AS array<float>), CAST(NULL AS array<float>))")
      .head()
    assert(r.isNullAt(0))
  }

  test("distance stays inside whole-stage codegen") {
    // must use a real source scan: local relations are folded at optimize time
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qe = emb.select(F.vecDot($"embedding", $"embedding").as("d")).queryExecution
    val hasWsc = qe.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, s"plan lost codegen:\n${qe.executedPlan}")
  }
}
