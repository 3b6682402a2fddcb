package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns + typed metadata structs, with decode / feature
  * extraction / resize / frame-sampling as batch-shaped partition-local
  * transforms.
  *
  * ── STUB NOTICE (feature inference + video only) ────────────────────
  * IMAGE decode is REAL: [[decodeImages]] runs `javax.imageio.ImageIO`
  * (ships in the JDK) and emits true dimensions/components plus a
  * checksum over the decoded sRGB pixels. AUDIO decode is REAL for the
  * JDK-readable containers: [[decodeAudio]] runs `javax.sound.sampled`
  * (WAV/AIFF/AU PCM) and emits true rate/channels/frames plus a PCM
  * checksum. In both, payloads no reader accepts degrade to a
  * content-fingerprint row with zeroed media fields. IMAGE features are
  * REAL too: [[extractFeatures]] computes color histograms + channel/
  * luminance means over the decoded pixels for any ImageIO-decodable
  * payload. What remains stubbed: compressed-codec audio (mp3/aac),
  * VIDEO demux/frame sampling, and LEARNED (CLIP-class) embeddings —
  * those need native codecs / an inference runtime NOT in this
  * container, so those kernels are clearly-marked DETERMINISTIC FAKES
  * (output derived from a hash of the bytes). The Spark-side plumbing —
  * schema, partitioning, batched mapPartitions shape, output contract —
  * is real and tested for all of them; swapping a remaining stub for a
  * real codec changes only the kernel body.
  * ────────────────────────────────────────────────────────────────────
  *
  * Scale shape: decode runs inside `mapPartitions`, i.e. one JVM-local
  * batch loop per partition — the Scala analog of `mapInPandas` batch
  * processing. No shuffle; media bytes never leave their partition until
  * reduced to small features.
  */
object Multimodal {

  /** Canonical media schema: id + payload + declared type + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType),
      StructField("mime", StringType))))))

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, pixel_checksum: Long)
  final case class DecodedAudio(media_id: Long, sample_rate: Int,
      channels: Int, n_frames: Long, pcm_checksum: Long)
  final case class MediaFeature(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Decode-parallelism guard: kB-scale payload files pack into very few
    * scan tasks (Spark bins files by byte size + open cost), which made
    * the whole-corpus decode SERIAL at 10× fixture scale (10.7× wall —
    * BENCH_SCALING r11) while 31 cores idled. Widen to the cluster's
    * parallelism when the scan produced fewer partitions — AFTER
    * scan-level pushdown (a query's media_id filter sits below this
    * exchange), and only the about-to-be-decoded payload bytes move, a
    * cost the decode itself dominates. At real media scale (GB-sized
    * objects) scans split naturally and this is a no-op.
    */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** JDK-decodable audio containers announce themselves in the first 4
    * bytes (RIFF = WAV, FORM = AIFF, ".snd" = AU). Rejecting everything
    * else up front skips `AudioSystem`'s throw-per-payload rejection path
    * — on a mixed-media corpus 2/3 of rows took the exception path and
    * it dominated the decode pass (5.5 s of 6 at 10× fixture scale).
    * Payloads with a matching magic but corrupt innards still fall
    * through the try/catch to the fingerprint row, so semantics are
    * unchanged.
    */
  private def looksLikeJdkAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  private def hashBytes(b: Array[Byte]): Long = {
    // FNV-1a 64 — deterministic, dependency-free
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP readers ship
    * in the JDK): true width/height/color components plus an FNV-1a
    * checksum over the decoded pixels in sRGB INT_ARGB order — a
    * colorspace-normalized fingerprint, stable across source pixel
    * layouts. Payloads no registered reader accepts (corrupt bytes,
    * unsupported containers) degrade to a content-fingerprint row with
    * width/height/channels = 0 instead of failing the partition — at
    * corpus scale a scattering of bad files must not kill the job, and
    * the 0-dims row is filterable downstream.
    */
  def decodeImages(df: DataFrame): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col("media_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => // partition-local batch loop = decode batch
        batch.map { case (id, bytes) =>
          val src = if (bytes == null) Array.emptyByteArray else bytes
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) DecodedImage(id, 0, 0, 0, hashBytes(src))
          else {
            var h = 0xcbf29ce484222325L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                var p = img.getRGB(x, y) // sRGB INT_ARGB, layout-independent
                var i = 0
                while (i < 4) { h ^= (p & 0xffL); h *= 0x100000001b3L; p >>>= 8; i += 1 }
                x += 1
              }
              y += 1
            }
            DecodedImage(id, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, h)
          }
        }
      }
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU PCM readers
    * ship in the JDK): true sample rate / channel count / frame count plus
    * an FNV-1a checksum over the decoded PCM byte stream. Compressed
    * codecs (mp3, aac, opus) have no JDK reader — those payloads, like any
    * corrupt bytes, degrade to a content-fingerprint row with zeroed
    * audio fields rather than failing the partition.
    */
  def decodeAudio(df: DataFrame): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col("media_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val src = if (bytes == null) Array.emptyByteArray else bytes
          val ais =
            if (!looksLikeJdkAudio(src)) null
            else try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(src))
            catch { case scala.util.control.NonFatal(_) => null }
          if (ais == null) DecodedAudio(id, 0, 0, 0L, hashBytes(src))
          else try {
            val fmt = ais.getFormat
            val buf = new Array[Byte](8192)
            var h = 0xcbf29ce484222325L
            var total = 0L
            var n = ais.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) { h ^= (buf(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
              total += n
              n = ais.read(buf)
            }
            val fs = math.max(fmt.getFrameSize, 1)
            DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels, total / fs, h)
          } finally ais.close()
        }
      }
  }

  /** Feature extraction. For payloads `ImageIO` decodes, the feature is
    * REAL: per-channel color histograms over the decoded sRGB pixels plus
    * channel/luminance means — the classic pre-embedding retrieval
    * feature, a genuine input to the Knn/Dedup operators downstream.
    * For everything else (audio, video, corrupt bytes) the CLIP-class
    * embedding this slot holds in production needs an inference runtime
    * not in this container, so the fallback remains a clearly-marked
    * deterministic pseudo-embedding derived from the payload hash.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    // the real color-histogram layout needs >= 8 slots (3 histograms +
    // 4 moments); smaller dims keep the pre-round-6 pseudo-embedding
    // behavior rather than breaking existing callers
    require(dim >= 1, s"feature dim must be positive: $dim")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col("media_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) => MediaFeature(id, featureOf(bytes, dim)) }
      }
  }

  /** Driver-side single-payload feature — the request path: a query
    * image arrives as bytes in the search request and its feature is
    * computed once before the distributed scan (exactly the kernel
    * [[extractFeatures]] runs per stored row). Falls back to the same
    * deterministic pseudo-embedding for non-image payloads.
    */
  def featureOf(bytes: Array[Byte], dim: Int): Array[Float] = {
    val src = if (bytes == null) Array.emptyByteArray else bytes
    val img =
      if (dim < 8) null
      else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img != null) imageColorFeature(img, dim)
    else {
      val f = new Array[Float](dim)
      var h = hashBytes(src)
      var i = 0
      while (i < dim) { h = h * 6364136223846793005L + 1442695040888963407L
        f(i) = ((h >>> 40).toInt / 16777216.0f) - 0.5f; i += 1 }
      f
    }
  }

  /** Real image feature: layout = R/G/B histograms of `(dim-4)/3` bins
    * each (mass-normalized), then mean R, mean G, mean B, mean luminance
    * (Rec.601 weights), all in [0,1]. Any `dim - 4 - 3·bins` remainder
    * slots stay zero.
    */
  private[operators] def imageColorFeature(
      img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val bins = (dim - 4) / 3
    val f = new Array[Float](dim)
    val w = img.getWidth
    val h = img.getHeight
    val n = (w.toLong * h).toFloat
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >>> 16) & 0xff; val g = (p >>> 8) & 0xff; val b = p & 0xff
        f(r * bins / 256) += 1f
        f(bins + g * bins / 256) += 1f
        f(2 * bins + b * bins / 256) += 1f
        sr += r; sg += g; sb += b
        sl += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < 3 * bins) { f(i) /= n; i += 1 }
    f(dim - 4) = (sr / n / 255.0).toFloat
    f(dim - 3) = (sg / n / 255.0).toFloat
    f(dim - 2) = (sb / n / 255.0).toFloat
    f(dim - 1) = (sl / n / 255.0).toFloat
    f
  }

  /** STUB resize: passthrough payload with rewritten metadata (real impl:
    * scale pixels). Shows the withColumn/struct-rewrite contract.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames"),
      col("meta.mime").as("mime")))

  /** STUB frame sampling: emits `n` pseudo-frames per video row (real
    * impl: demux keyframes). One row in → n small rows out, the flatMap
    * shape of real frame extraction.
    */
  def sampleFrames(df: DataFrame, n: Int): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("media_type") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val src = if (bytes == null) Array.emptyByteArray else bytes
        (0 until n).map { i =>
          // STUB: a "frame" is a deterministic slice of the payload.
          // The offset math multiplies in LONG — i * length overflows Int
          // beyond ~134 MB payloads and negative offsets crash copyOfRange
          val start = if (src.isEmpty) 0 else (i.toLong * src.length / n).toInt
          val end = if (src.isEmpty) 0 else math.min(src.length, start + 8)
          Frame(id, i, java.util.Arrays.copyOfRange(src, start, end))
        }
      }
  }

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int,
      n_frames: Int, mime: String)
  final case class MediaRow(media_id: Long, payload: Array[Byte],
      media_type: String, meta: MediaMeta)

  /** Synthesize a deterministic media table over any id column — lets the
    * multimodal plumbing be exercised against the standard fixtures.
    *
    * Image and audio payloads are GENUINELY DECODABLE: images are real
    * PNGs (16×12, id-seeded pixels) encoded with `ImageIO`, audio rows
    * are real 16-bit mono 16 kHz WAVs (400 id-seeded PCM frames) written
    * with `javax.sound.sampled` — so pipelines over this table exercise
    * the REAL decode + feature kernels, not just the fallback. Video
    * payloads remain hash-derived pseudo-bytes (the video demuxer is a
    * declared stub — no container codec ships in the JDK). Everything is
    * a pure function of the id: byte-identical across runs.
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (math.floorMod(id, 3): @unchecked) match {
            case 0 =>
              val w = 16; val h = 12
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val v = id * 1315423911L + x * 2654435761L + y * 97531L
                  img.setRGB(x, y, (v & 0xffffff).toInt)
                  x += 1
                }
                y += 1
              }
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", out)
              MediaRow(id, out.toByteArray, "image",
                MediaMeta(w, h, 16000, 1, "image/png"))
            case 1 =>
              val frames = 400
              val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
              val pcm = new Array[Byte](frames * fmt.getFrameSize)
              var i = 0
              while (i < pcm.length) {
                pcm(i) = (((id * 31 + i) * 2654435761L) >>> 16).toByte
                i += 1
              }
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
              val out = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(ais,
                javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
              MediaRow(id, out.toByteArray, "audio",
                MediaMeta(0, 0, 16000, frames, "audio/wav"))
            case 2 =>
              val md = java.security.MessageDigest.getInstance("SHA-256")
              MediaRow(id, md.digest(s"media$id".getBytes("UTF-8")), "video",
                MediaMeta(640, 480, 16000, 120, "application/octet-stream"))
          }
        }
      }.toDF()
  }
}
