package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.Ingest
import graft.schema.Space

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val space = Space.fromJson(
    """{"name":"s","fields":[
        {"name":"n","type":"long"},
        {"name":"v","type":"vector","dimension":4,"format":"normalization"}]}""")

  test("conformSplit: id defaulting, normalization, per-item dim rejection") {
    val batch = Seq(
      (Some("doc1"), 1L, Seq(3f, 0f, 4f, 0f)),
      (None, 2L, Seq(1f, 1f, 1f, 1f)),
      (None, 3L, Seq(1f, 2f))) // wrong dim → rejected row, not nulled
      .toDF("_id", "n", "v")
      .select($"_id", $"n", $"v".cast("array<float>").as("v"))
    val (ok, bad) = Ingest.conformSplit(batch, space)
    val out = ok.orderBy("n").collect()
    assert(out.length == 2)
    assert(out.forall(!_.isNullAt(0)))                    // every row has an _id
    assert(out(0).getString(0) == "doc1")                 // provided id kept
    val v0 = out(0).getSeq[Float](2)
    assert(math.abs(v0.map(x => x * x).sum - 1f) < 1e-5)  // normalized
    assert(bad.select("n").as[Long].collect().toSeq == Seq(3L)) // per-item error
    // strict conform rejects the whole batch; clean batch passes
    assertThrows[IllegalArgumentException](Ingest.conform(batch, space))
    assert(Ingest.conform(batch.filter($"n" < 3), space).count() == 2)
    // unknown column rejects the batch (schema error)
    assertThrows[IllegalArgumentException] {
      Ingest.conformSplit(batch.withColumn("extra", lit(1)), space)
    }
  }

  test("fromJsonl: schema-driven parse, per-item rejects, corrupt lines survive") {
    val dir = Files.createTempDirectory("jsonl")
    val f = dir.resolve("batch.jsonl")
    Files.writeString(f,
      """{"_id":"a","n":1,"v":[3.0,0.0,4.0,0.0]}
        |{"n":2,"v":[1.0,1.0,1.0,1.0]}
        |{"_id":"short","n":3,"v":[1.0,2.0]}
        |{"_id":"notnum","n":4,"v":["a","b","c","d"]}
        |this line is not json at all
        |""".stripMargin)
    val (ok, bad) = Ingest.fromJsonl(spark, f.toString, space)
    val okRows = ok.orderBy("n").collect()
    assert(okRows.length == 2)
    assert(okRows(0).getString(0) == "a")          // explicit id kept
    assert(!okRows(1).isNullAt(0))                 // missing id defaulted
    val v0 = okRows(0).getSeq[Float](2)
    assert(math.abs(v0.map(x => x * x).sum - 1f) < 1e-5) // normalized
    // the wrong-dim row, the NON-NUMERIC payload row (doc_query.go's
    // unmarshal reject class) and the malformed line all land in
    // rejected — never a silently-nulled accepted row
    assert(bad.count() == 3)
    assert(bad.filter($"_id" === "short").count() == 1)
    assert(ok.filter($"_id" === "notnum").count() == 0)
  }

  test("fromJsonl: int8/binary vector fields arrive as WIRE number arrays and pack at ingest") {
    // the reference's wire carries every feature as a JSON number array
    // whatever the value_type (doc_parse.go:56-128); the engine converts
    // — int8 through the symmetric quantizer, binary through
    // sign-binarization, the same conversions the query side applies
    val isp = graft.schema.Space.fromJson(
      """{"name":"wire_i8","fields":[
          {"name":"n","type":"integer","index":{"type":"SCALAR"}},
          {"name":"iv","type":"vector","dimension":4,"value_type":"int8",
           "index":{"type":"FLAT","params":{"metric_type":"InnerProduct"}}},
          {"name":"bv","type":"vector","dimension":8,"value_type":"binary",
           "index":{"type":"FLAT"}}]}""")
    val dir = Files.createTempDirectory("jsonl_i8")
    val f = dir.resolve("batch.jsonl")
    Files.writeString(f,
      """{"_id":"a","n":1,"iv":[1.0,-1.0,0.5,0.0],"bv":[1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0]}
        |{"_id":"short","n":2,"iv":[1.0,2.0],"bv":[1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0]}
        |{"_id":"nullelem","n":3,"iv":[1.0,null,0.5,0.0],"bv":[1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0]}
        |""".stripMargin)
    val (ok, bad) = Ingest.fromJsonl(spark, f.toString, isp)
    val okRows = ok.collect()
    assert(okRows.length == 1)
    val iv = okRows(0).getAs[Array[Byte]]("iv")
    assert(iv.toSeq == Seq[Byte](127, -127, 64, 0)) // quantizeI8 grid
    val bv = okRows(0).getAs[Array[Byte]]("bv")
    assert(bv.length == 1) // 8 dims → 1 packed sign byte
    // wrong-size and null-element wire arrays reject per item, in the
    // STORAGE schema (vector columns nulled, id preserved)
    val badIds = bad.select($"_id").collect().map(_.getString(0)).toSet
    assert(badIds == Set("short", "nullelem"))
    assert(bad.schema("iv").dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("conform releases its cache pin (no CacheManager growth per batch)") {
    // ADVICE r3: repeated ingest batches must not accumulate pinned
    // entries for the session lifetime
    val batch = Seq((Some("a"), 1L, Seq(3f, 0f, 4f, 0f)))
      .toDF("_id", "n", "v")
      .select($"_id", $"n", $"v".cast("array<float>").as("v"))
    val out = Ingest.conform(batch, space)
    assert(out.count() == 1) // result stays readable after the pin is gone
    assert(batch.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("range rule: validation and first-bound-exceeding routing") {
    assertThrows[IllegalArgumentException] {
      Ingest.RangeRule("d", Seq(("p1", 100L), ("p0", 50L))) // not increasing
    }
    val rule = Ingest.RangeRule("d", Seq(("p1", 100L), ("p2", 200L), ("p3", 300L)))
    val batch = Seq((1L, 10L), (2L, 100L), (3L, 250L), (4L, 999L)).toDF("id", "d")
    val (ok, bad) = Ingest.routeByRange(batch, rule)
    val routed = ok.select("id", "_partition").as[(Long, String)].collect().toMap
    assert(routed == Map(1L -> "p1", 2L -> "p2", 3L -> "p3"))
    assert(bad.select("id").as[Long].collect().toSeq == Seq(4L)) // ≥ last bound
  }

  test("range-partitioned table prunes partitions on the date predicate") {
    val rule = Ingest.RangeRule("d", Seq(("p1", 100L), ("p2", 200L)))
    val dir = Files.createTempDirectory("rangetbl").toString + "/t"
    val batch = (0L until 100L).map(i => (i, i * 2)).toDF("id", "d")
    Ingest.writeRangePartitioned(batch, rule, dir)
    val read = spark.read.parquet(dir)
    val plan = read.filter($"_partition" === "p1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("_partition"),
      s"no partition pruning:\n$plan")
    assert(read.filter($"_partition" === "p1").count() == 50)
  }

  test("assignDocids: updates keep their docid, new ids mint unique docids above the base max") {
    val base = Seq(("a", 0L), ("b", 7L), ("c", 3L)).toDF("_id", "_docid")
    // batch updates b, inserts d/e (one with a stale client-sent _docid
    // that must be ignored — the sidecar is engine-owned)
    val batch = Seq(("b", -1L), ("d", -1L), ("e", -1L)).toDF("_id", "_docid")
    val out = Ingest.assignDocids(batch, Some(base))
      .select("_id", "_docid").as[(String, Long)].collect().toMap
    assert(out("b") == 7L)                    // update keeps the base docid
    assert(out("d") > 7L && out("e") > 7L)    // fresh ids mint above base max
    assert(out.values.toSet.size == out.size) // unique within the batch
    // no base: docids start from 0 and are unique
    val first = Ingest.assignDocids(Seq(("x", 0), ("y", 0)).toDF("_id", "n")
      .drop("n").withColumn("v", lit(1)))
      .select("_id", "_docid").as[(String, Long)].collect().toMap
    assert(first.values.toSet.size == 2)
  }

  test("docid stability under repeated catalog upserts: unique always, stable for survivors") {
    val root = java.nio.file.Files.createTempDirectory("docid_stress").toString
    val cat = new graft.schema.SpaceCatalog(spark, root)
    cat.createDb("d")
    val space = graft.schema.Space.fromJson(
      """{"name":"s","fields":[
          {"name":"v","type":"integer","index":{"type":"SCALAR"}},
          {"name":"vec","type":"vector","dimension":4,
           "index":{"type":"IVFFLAT","params":{"ncentroids":2,"nprobe":2}}}]}""")
    cat.createSpace("d", space)
    def vf(seed: Int): Seq[Float] = (0 until 4).map(i => (seed * 7 + i).toFloat)
    var seen = Map.empty[String, Long]
    // 5 rounds of overlapping batches: each updates half the previous
    // round's ids and inserts fresh ones
    (0 until 5).foreach { r =>
      val batch = ((r * 10) until (r * 10 + 20)).map(i =>
        (s"k-$i", r, vf(i)))
        .toDF("_id", "v", "vec")
        .select($"_id", $"v", $"vec".cast("array<float>").as("vec"))
      cat.upsert("d", "s", batch, partitionNum = 2)
      val now = cat.read("d", "s").select($"_id", $"_docid")
        .as[(String, Long)].collect().toMap
      assert(now.values.toSet.size == now.size, s"round $r: docids not unique")
      val survivors = seen.keySet.intersect(now.keySet)
      assert(survivors.forall(k => seen(k) == now(k)),
        s"round $r: a surviving id changed docid")
      seen = now
    }
    assert(seen.size == 60) // 5 rounds × 20, overlapping by 10
  }
}
