package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The vearch space (= table) schema model: JSON space definition ⇄ typed
  * ADT ⇄ Spark StructType, with the reference's validation rules
  * (internal/entity/space.go:389-559: name rules, reserved fields, vector
  * dimension > 0, index/type compatibility, partition/replica bounds).
  *
  * Storage mapping (SURVEY §1.3): a space is a columnar Parquet/Delta
  * table; `partition_num` → bucket/shuffle count; `replica_num` is a
  * storage-layer concern with no Spark equivalent; vector fields are
  * `array<float>` columns (binary vectors `binary`).
  */
object FieldKind extends Enumeration {
  val StringK, IntK, LongK, FloatK, DoubleK, BoolK, DateK, StringArrayK, VectorK = Value
}

final case class VectorOptions(
    dimension: Int,
    metric: String = "l2",          // InnerProduct | L2 (index_model.h:21)
    normalized: Boolean = false,    // format: normalization (space.go:496-499)
    valueType: String = "float",    // float | binary | int8 (index_model.h:19)
    indexType: String = "FLAT",     // space.go:55 index-type whitelist
    indexParams: Map[String, Int] = Map.empty) { // nlinks/efConstruction/… (space.go:60-63)
  // these invariants must hold for programmatically constructed Spaces
  // too, not only the JSON parse path: Ingest's length = dim/8 check uses
  // integer division, so a non-multiple-of-8 binary dim would silently
  // accept truncated codes
  require(dimension > 0, s"vector dimension must be > 0, got $dimension")
  require(valueType != "binary" || dimension % 8 == 0,
    s"binary value_type requires dimension % 8 == 0, got $dimension")
  require(!normalized || valueType == "float",
    s"format=normalization requires value_type=float, got $valueType")
  require(Space.IndexTypes.contains(indexType),
    s"unknown index type $indexType (allowed: ${Space.IndexTypes.mkString(", ")})")
}

final case class SpaceField(
    name: String,
    kind: FieldKind.Value,
    indexed: Boolean = false,
    vector: Option[VectorOptions] = None)

/** Per-space engine config (internal/entity/space.go:156-164):
  * `refresh_interval` drives the realtime-tail trigger cadence,
  * `cache_size` (MB) whether a space's table is pinned in executor cache,
  * `slow_search_time` (ms) the slow-pool classification threshold,
  * `enable_realtime` whether searches union the streaming buffer
  * (space.go:151, default false — space.go:73 DefalutEnableRealtime;
  * serving honors it by passing a [[graft.streaming.RealtimeTail]] to
  * `SearchApi.searchAuto` only for realtime-enabled spaces).
  */
final case class SpaceConfig(
    refreshIntervalMs: Long = 1000L,
    cacheSizeMb: Int = 0,
    slowSearchTimeMs: Long = 1000L,
    enableRealtime: Boolean = false)

final case class Space(
    name: String,
    fields: Seq[SpaceField],
    partitionNum: Int = 1,
    replicaNum: Int = 1,
    config: SpaceConfig = SpaceConfig()) {

  /** `_id` is implicit and reserved (entity/space.go:30-31). */
  def toStructType: StructType = {
    val idField = StructField("_id", StringType, nullable = false)
    val rest = fields.map { f =>
      val dt: DataType = f.kind match {
        case FieldKind.StringK      => StringType
        case FieldKind.IntK         => IntegerType
        case FieldKind.LongK        => LongType
        case FieldKind.FloatK       => FloatType
        case FieldKind.DoubleK      => DoubleType
        case FieldKind.BoolK        => BooleanType
        // vearch dates are int64 UnixNano (doc_query.go:1033-1045); Spark
        // timestamps are µs — store the ns long to preserve semantics.
        case FieldKind.DateK        => LongType
        case FieldKind.StringArrayK => ArrayType(StringType)
        case FieldKind.VectorK =>
          // binary = dim/8 packed sign bytes; int8 = dim signed bytes
          if (f.vector.exists(v => v.valueType == "binary" || v.valueType == "int8"))
            BinaryType
          else ArrayType(FloatType)
      }
      StructField(f.name, dt, nullable = true)
    }
    StructType(idField +: rest)
  }

  def vectorFields: Seq[SpaceField] = fields.filter(_.kind == FieldKind.VectorK)
}

object Space {

  private val Reserved = Set("_id", "_score") // entity/space.go:30-31
  private val NameRe = "^[a-zA-Z][a-zA-Z0-9_-]*$".r // space.go name rules

  /** Accepted vector index types (space.go:302-317 indexTypeMap). All are
    * VALID space declarations; which ones this engine executes natively is
    * a search-routing concern (SearchApi.searchAuto / IndexLifecycle —
    * FLAT/IVF family/HNSW native, the GPU/wrapped classes served by the
    * exact FLAT path).
    */
  val IndexTypes: Set[String] = Set("FLAT", "IVFPQ", "IVFFLAT", "BINARYIVF",
    "HNSW", "GPU_IVFPQ", "GPU_IVFFLAT", "SSG", "IVFPQ_RELAYOUT", "SCANN",
    "SCALAR", "IVFRABITQ", "DISKANN_STATIC")

  /** Index types the nprobe ≤ ncentroids bound applies to — exactly the
    * reference's validation list (space.go:352), which EXCLUDES
    * IVFPQ_RELAYOUT: a relayout space with nprobe > ncentroids is
    * accepted there, so it is accepted here. Serving still aliases
    * IVFPQ_RELAYOUT to the IVFPQ layout (SearchApi matches the literal
    * type names, not this validation set).
    */
  val IvfFamily: Set[String] = Set("IVFPQ", "IVFFLAT", "BINARYIVF",
    "GPU_IVFPQ", "GPU_IVFFLAT", "IVFRABITQ")

  /** Parse + validate a vearch space-definition JSON:
    * {"name": ..., "partition_num": N, "replica_num": N,
    *  "fields": [{"name","type","index":{...},"dimension",...}]}
    */
  def fromJson(json: String): Space = {
    val j = JsonMethods.parse(json)
    val name = (j \ "name") match {
      case JString(s) => s
      case _ => fail("space name is required")
    }
    if (NameRe.findFirstIn(name).isEmpty) fail(s"invalid space name: $name")
    val partitionNum = (j \ "partition_num") match {
      case JInt(n) => n.toInt; case _ => 1
    }
    val replicaNum = (j \ "replica_num") match {
      case JInt(n) => n.toInt; case _ => 1
    }
    if (partitionNum < 1) fail("partition_num must be >= 1")
    if (replicaNum < 1) fail("replica_num must be >= 1")
    val fields = (j \ "fields") match {
      case JArray(fs) if fs.nonEmpty => fs.map(parseField)
      case _ => fail("space needs at least one field")
    }
    val dupes = fields.groupBy(_.name).filter(_._2.size > 1).keys
    if (dupes.nonEmpty) fail(s"duplicate fields: ${dupes.mkString(",")}")
    // engine block (space.go:156-164); accepts both the nested
    // {"engine": {...}} form and top-level keys
    def longAt(paths: JValue*): Option[Long] = paths.collectFirst {
      case JInt(n) => n.toLong
      // JSON serializers commonly emit 1000.0 for integral config values;
      // accept integral doubles, fail loud on fractional ones (consistent
      // with the fail-loud stance for unknown operators)
      case JDouble(d) if d.isWhole => d.toLong
      case JDouble(d) => fail(s"engine config value must be integral, got $d")
      case JDecimal(d) if d.isWhole => d.toLong
      case JDecimal(d) => fail(s"engine config value must be integral, got $d")
      case JString(s) if s.matches("\\d+") => s.toLong
    }
    val cfg = SpaceConfig(
      refreshIntervalMs = longAt(j \ "engine" \ "refresh_interval",
        j \ "refresh_interval").getOrElse(1000L),
      cacheSizeMb = longAt(j \ "engine" \ "cache_size",
        j \ "cache_size").getOrElse(0L).toInt,
      slowSearchTimeMs = longAt(j \ "engine" \ "slow_search_time",
        j \ "slow_search_time").getOrElse(1000L),
      // space-level in the reference (space.go:151), engine-level
      // accepted too for symmetry with the other knobs
      enableRealtime = (j \ "enable_realtime", j \ "engine" \ "enable_realtime") match {
        case (JBool(b), _) => b
        case (_, JBool(b)) => b
        case _ => false // DefalutEnableRealtime, space.go:73
      })
    if (cfg.refreshIntervalMs < 0 || cfg.cacheSizeMb < 0 || cfg.slowSearchTimeMs < 0)
      fail("engine config values must be >= 0")
    Space(name, fields, partitionNum, replicaNum, cfg)
  }

  private def parseField(f: JValue): SpaceField = {
    val name = (f \ "name") match {
      case JString(s) => s; case _ => fail("field name required")
    }
    if (Reserved.contains(name)) fail(s"$name is reserved") // space.go:441-446
    val tpe = (f \ "type") match {
      case JString(s) => s; case _ => fail(s"field $name: type required")
    }
    val indexed = (f \ "index") != JNothing
    // type map mirrors entity/space.go:464-504
    tpe.toLowerCase match {
      case "string" | "keyword" | "text" =>
        SpaceField(name, FieldKind.StringK, indexed)
      case "integer" | "short" | "byte" => SpaceField(name, FieldKind.IntK, indexed)
      case "long"     => SpaceField(name, FieldKind.LongK, indexed)
      case "float"    => SpaceField(name, FieldKind.FloatK, indexed)
      case "double"   => SpaceField(name, FieldKind.DoubleK, indexed)
      case "boolean"  => SpaceField(name, FieldKind.BoolK, indexed)
      case "date"     => SpaceField(name, FieldKind.DateK, indexed)
      case "stringarray" => SpaceField(name, FieldKind.StringArrayK, indexed)
      case "vector" =>
        val dim = (f \ "dimension") match {
          case JInt(d) => d.toInt
          case _ => fail(s"vector field $name: dimension required") // space.go:485-488
        }
        if (dim <= 0) fail(s"vector field $name: dimension must be > 0")
        val metric = (f \ "index" \ "params" \ "metric_type") match {
          case JString(m) if m.equalsIgnoreCase("innerproduct") => "ip"
          case JString(m) if m.equalsIgnoreCase("l2") => "l2"
          case JNothing => "l2"
          case JString(other) => fail(s"unknown metric_type: $other")
          case _ => "l2"
        }
        val normalized = (f \ "format") match {
          case JString("normalization") => true; case _ => false
        }
        // index type + params (space.go:302-317 whitelist; param bounds
        // space.go:60-63,339-349 — 0/absent means engine default)
        val indexType = (f \ "index" \ "type") match {
          case JString(t) =>
            val up = t.toUpperCase
            if (!IndexTypes.contains(up))
              fail(s"vector field $name: unknown index type $t")
            up
          case _ => "FLAT"
        }
        val indexParams: Map[String, Int] = (f \ "index" \ "params") match {
          case JObject(kvs) => kvs.collect { case (k, JInt(v)) => k -> v.toInt }.toMap
          case _ => Map.empty
        }
        // param-bound checks are GATED BY INDEX TYPE, as the reference
        // gates them (space.go:339-375: nlinks/efConstruction only for
        // HNSW, nprobe≤ncentroids only for the IVF family) — a FLAT or
        // SCANN space carrying nlinks:4 is accepted there and must be
        // accepted here
        if (indexType == "HNSW") {
          indexParams.get("nlinks").filter(_ != 0).foreach { nl =>
            if (nl < 8 || nl > 96)
              fail(s"index params nlinks:$nl should in [8, 96]")
          }
          indexParams.get("efConstruction").filter(_ != 0).foreach { ec =>
            if (ec < 16 || ec > 1024)
              fail(s"index params efConstruction:$ec should in [16, 1024]")
          }
        }
        if (IvfFamily.contains(indexType))
          (indexParams.get("nprobe"), indexParams.get("ncentroids")) match {
            case (Some(np), Some(nc)) if np != 0 && np > nc => // space.go:371
              fail(s"$indexType nprobe:[$np] should less than ncentroids:[$nc]")
            case _ => ()
          }
        // value type: explicit `value_type`, or implied by index type
        // BINARYIVF (index_model.h:19 — FLOAT | BINARY | INT8)
        val valueType = (f \ "value_type") match {
          case JString(v) if Set("float", "binary", "int8")(v.toLowerCase) =>
            v.toLowerCase
          case JString(other) => fail(s"vector field $name: unknown value_type $other")
          case _ => if (indexType == "BINARYIVF") "binary" else "float"
        }
        // binary codes pack 8 dims/byte — a non-multiple-of-8 dimension
        // would make Ingest's length = dim/8 check accept truncated codes
        if (valueType == "binary" && dim % 8 != 0)
          fail(s"vector field $name: binary value_type requires dimension % 8 == 0, got $dim")
        // l2-normalization is a float-vector transform; on a packed
        // binary/int8 column it would fail at analysis time deep in Ingest
        if (normalized && valueType != "float")
          fail(s"vector field $name: format=normalization requires value_type=float, got $valueType")
        SpaceField(name, FieldKind.VectorK, indexed,
          Some(VectorOptions(dim, metric, normalized, valueType,
            indexType, indexParams)))
      case other => fail(s"field $name: unknown type $other")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid space: $msg")
}
