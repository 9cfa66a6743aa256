package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: opaque binary payloads
  * with typed metadata, processed per-partition in batch.
  *
  * Image payloads in the codecs the JRE ships (PNG, JPEG, BMP, GIF,
  * WBMP) get a REAL pixel decode — `javax.imageio` raster ->
  * [[pixelFeatures]] — gated by the magic-byte [[headerDims]] parse so
  * non-image payloads never pay decoder probing. Codecs the JRE lacks
  * (PCM audio, video demux) keep a clearly-marked deterministic
  * byte-fold fallback ([[byteFeatures]]) — the documented boundary;
  * everything Spark-side (schema shape, the per-partition batch
  * iteration — the Scala analog of a vectorized python `mapInPandas`
  * decode — derived-feature columns, partitioning) is real and tested
  * either way.
  *
  * Scale notes: decode runs inside `mapPartitions` — embarrassingly
  * parallel, no shuffle, and the binary payload is column-pruned away
  * when downstream selects only features. Frame sampling emits rows via
  * an iterator (no per-partition materialization of all frames).
  */
object Multimodal {

  /** Canonical multimodal row: id, modality tag, opaque payload, typed
    * metadata struct (the blob-store pattern of the reference —
    * dbms/mongodb_dbms.py blobs + hash column in the SQL row,
    * json_to_sql/map_json_to_insert.py:240 apply_blob_storage). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("codec", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))), nullable = true)))

  /** Feature row produced by decode: per-item fixed-size feature vector
    * plus byte-level stats. */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Payload -> 8-dim feature vector. For image containers the JRE
    * ships decoders for (PNG, JPEG, BMP, GIF, WBMP — javax.imageio),
    * this is a REAL pixel decode: [[pixelFeatures]] over the decoded
    * raster. Anything else (text blobs, audio/video containers, codecs
    * the JRE lacks) takes the deterministic byte-fold fallback — the
    * documented boundary: byte features keep the pipeline total where
    * no decoder exists, and swapping in a JNI decoder for more codecs
    * changes only the [[headerDims]] gate + decode call. The
    * [[headerDims]] magic-byte gate keeps non-image payloads off the
    * ImageIO reader-lookup path entirely (a 100 TB text corpus never
    * pays image-decoder probing). */
  private def decodeFeats(payload: Array[Byte]): Array[Float] = {
    val codec = headerDims(payload)._1
    if (codec == "png" || codec == "jpeg" || codec == "gif" ||
        codec == "bmp") {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
      // a recognized header with an undecodable body (truncated file,
      // exotic sub-format) degrades to byte features, never throws
      if (img != null) return pixelFeatures(img)
    }
    byteFeatures(payload)
  }

  /** REAL pixel features, deterministic integer sums over the decoded
    * raster: [meanR, meanG, meanB, meanLuma, quadrant lumas TL/TR/BL/
    * BR], all normalized to [0,1]. Luma is the integer ITU BT.601 fold
    * (299r+587g+114b)/1000. Enough signal for the embedding / near-dup
    * paths downstream (q31/q80-style) while staying exact for tests. */
  private[ops] def pixelFeatures(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb, sl) = (0L, 0L, 0L, 0L)
    val ql = new Array[Long](4)
    val qn = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        sr += r; sg += g; sb += b; sl += luma
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        ql(q) += luma; qn(q) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array(
      sr.toFloat / (n * 255f), sg.toFloat / (n * 255f),
      sb.toFloat / (n * 255f), sl.toFloat / (n * 255f),
      if (qn(0) == 0) 0f else ql(0).toFloat / (qn(0) * 255f),
      if (qn(1) == 0) 0f else ql(1).toFloat / (qn(1) * 255f),
      if (qn(2) == 0) 0f else ql(2).toFloat / (qn(2) * 255f),
      if (qn(3) == 0) 0f else ql(3).toFloat / (qn(3) * 255f))
  }

  /** The no-decoder fallback: a stable 8-dim byte-fold (kept exactly as
    * the historical stub so text-payload pipelines and their oracles
    * are unchanged). */
  private def byteFeatures(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feats(i % 8) = feats(i % 8) + (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    feats
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 0L
    payload.foreach(b => h = (h * 31 + (b & 0xFF)) % TextOps.P)
    h
  }

  /** Per-partition batch decode — the Scala analog of a `mapInPandas`
    * vectorized UDF: one iterator pass per partition, constant memory. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    df.select("id", "modality", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload"))
          .getOrElse(Array.emptyByteArray)
        Row(r.getLong(0), r.getString(1), payload.length,
          checksum(payload), decodeFeats(payload))
      }
    }(enc)
  }

  /** REAL (non-stub) container-header dimension extraction — the
    * dependency-free slice of image decoding that a 100 TB lake wants
    * BEFORE any pixel work: filter/route by dimensions without
    * decompressing a single pixel. Pure byte arithmetic over the
    * payload prefix:
    *   - PNG: signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk
    *     fixed at offset 16: width/height as big-endian u32
    *     (ISO/IEC 15948 §11.2.2).
    *   - JPEG: `FF D8`, then scan marker segments for SOF0-SOF15
    *     (C0-CF except C4/C8/CC): height/width big-endian u16 at
    *     payload offsets +5/+7 from the marker (ITU T.81 §B.2.2);
    *     inter-segment 0xFF fill bytes skipped (§B.1.1.2), scan stops
    *     at SOS/EOI.
    *   - GIF: `GIF87a`/`GIF89a`, logical screen size LE u16 at 6/8.
    *   - BMP: `BM`, BITMAPINFOHEADER s32 LE dims at 18/22.
    * Returns (codec, width, height), nulls when not parseable. Runs in
    * the same mapPartitions batch pass as [[decodeFeatures]] — no
    * shuffle, payload pruned downstream. */
  def headerDims(payload: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = payload(i) & 0xFF
    def beU32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beU16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def leU16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def leS32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (payload.length >= 24 &&
        pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      ("png", beU32(16), beU32(20))
    } else if (payload.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 9 < payload.length) {
        if (u8(i) != 0xFF) return ("jpeg", -1, -1) // corrupt stream
        // 0xFF fill bytes are legal between segments (T.81 §B.1.1.2):
        // skip the padding run, NOT two bytes at a time — treating a
        // fill byte as a marker would read arbitrary bytes as a
        // segment length and mis-skip the rest of the stream
        if (u8(i + 1) == 0xFF) { i += 1 }
        else {
          val marker = u8(i + 1)
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            return ("jpeg", beU16(i + 7), beU16(i + 5))
          }
          // SOS starts entropy-coded data and EOI ends the stream: a
          // truncated pre-SOF JPEG must stop here, not walk entropy
          // bytes as if they were segments
          if (marker == 0xDA || marker == 0xD9) return ("jpeg", -1, -1)
          if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) ||
              marker == 0x01) {
            i += 2 // standalone marker, no length field
          } else {
            i += 2 + beU16(i + 2)
          }
        }
      }
      ("jpeg", -1, -1)
    } else if (payload.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      // GIF87a/89a: logical screen width/height little-endian u16 at
      // offsets 6/8 (GIF89a spec §18)
      ("gif", leU16(6), leU16(8))
    } else if (payload.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      // BMP: BITMAPINFOHEADER width s32 LE at 18, height s32 LE at 22
      // (negative height = top-down rows; dimension is the magnitude)
      ("bmp", leS32(18), math.abs(leS32(22)))
    } else ("unknown", -1, -1)
  }

  /** Audio-container header parse, same no-decoder discipline as
    * [[headerDims]]: WAV/RIFF chunk walk (RIFF 1991 spec) — returns
    * (codec, sample_rate_hz, duration_ms) from the `fmt ` chunk's
    * byte rate and the `data` chunk's size, touching zero samples.
    * (-1, -1) when the container is recognized but chunks are absent
    * or truncated; ("unknown", -1, -1) otherwise. */
  def audioHeader(payload: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = payload(i) & 0xFF
    def leU32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (payload.length < 12 || u8(0) != 'R' || u8(1) != 'I' ||
        u8(2) != 'F' || u8(3) != 'F' || u8(8) != 'W' || u8(9) != 'A' ||
        u8(10) != 'V' || u8(11) != 'E') return ("unknown", -1, -1)
    var rate = -1L; var byteRate = -1L; var dataLen = -1L
    var i = 12
    while (i + 8 <= payload.length && (rate < 0 || dataLen < 0)) {
      val id = new String(payload.slice(i, i + 4), "ISO-8859-1")
      val len = leU32(i + 4)
      if (id == "fmt " && i + 24 <= payload.length) {
        rate = leU32(i + 12); byteRate = leU32(i + 16)
      } else if (id == "data") dataLen = len
      // chunks are word-aligned: odd sizes carry a pad byte; a corrupt
      // length that would wrap the int cursor ends the walk instead
      if (len > Int.MaxValue - 9L - i) i = payload.length
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (rate < 0 || byteRate <= 0 || dataLen < 0) ("wav", -1, -1)
    else ("wav", rate.toInt, (dataLen * 1000L / byteRate).toInt)
  }

  /** Dimension columns from payload headers: adds (codec_detected,
    * px_width, px_height) — -1/-1 when the container is recognized but
    * the size marker is absent, nulls-as--1 for unknown payloads. */
  def withHeaderDims(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("codec_detected", StringType, nullable = false),
      StructField("px_width", IntegerType, nullable = false),
      StructField("px_height", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]](payloadIdx))
          .getOrElse(Array.emptyByteArray)
        val (codec, w, h) = headerDims(payload)
        Row.fromSeq(r.toSeq ++ Seq(codec, w, h))
      }
    }(enc)
  }

  /** "Resize": recompute features at a target resolution — metadata-only
    * in the stub (real impl rescales pixels). Kept as a Column transform
    * so it stays inside codegen. */
  def resizeMeta(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.codec").as("codec"),
      lit(width).as("width"),
      lit(height).as("height"),
      col("meta.duration_ms").as("duration_ms")))

  /** Frame sampling for video payloads: emit one row per sampled frame
    * index (every `everyMs` of duration), payload sliced per frame by the
    * stub (real impl seeks the container). Iterator-based — no
    * materialization. */
  def sampleFrames(df: DataFrame, everyMs: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ms", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col("id"), col("payload"), col("meta.duration_ms").as("dur"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val dur = if (r.isNullAt(2)) 0 else r.getInt(2)
          val n = math.max(1, dur / math.max(1, everyMs))
          (0 until n).iterator.map { i =>
            // stub frame = byte slice; real impl decodes frame i*everyMs
            val start = if (payload.isEmpty) 0
              else (i.toLong * payload.length / n).toInt
            val end = if (payload.isEmpty) 0
              else (((i + 1).toLong * payload.length) / n).toInt
            Row(id, i, i * everyMs, payload.slice(start, end))
          }
        }
      }(enc)
  }
}
