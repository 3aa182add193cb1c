package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing: media travel as opaque
 * `binary` columns + typed metadata structs; decode / feature-extract /
 * resize / frame-sample run per-partition over the binary payloads.
 *
 * The Spark-side plumbing — schema, partition-parallel execution, batch
 * shape — is real and tested. The codec step itself is STUBBED with a
 * deterministic fake (this container ships no image/audio libraries): it
 * parses a tiny synthetic header and derives "features" from content bytes.
 * Swap [[decodeStub]] for a real codec (JNI/javax.imageio/ffmpeg) without
 * touching the plan shape.
 */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png/jpeg/wav/mp4/...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("meta", mediaMetaSchema),
    StructField("feature", ArrayType(FloatType))))

  /**
   * STUB codec: deterministic fake decode. Header convention for the
   * synthetic fixtures: "IMG:<w>:<h>:" / "AUD:<ms>:" prefix, rest is
   * payload. Features: 8 moments of the payload bytes. Replace with a real
   * decoder for production; everything downstream only sees the schema.
   */
  def decodeStub(id: Long, payload: Array[Byte]): Row = {
    val header = new String(payload.take(32), "ISO-8859-1")
    // parse the declared header fields left-to-right and take the body
    // AFTER the header's own final delimiter — a lastIndexOf over the
    // first 32 bytes would misparse any body that itself contains ':'.
    // Malformed headers (truncated, non-numeric) degrade to opaque "raw"
    // with the full payload as body instead of throwing on a bad record.
    def field(from: Int): Option[(String, Int)] = {
      val i = header.indexOf(':', from)
      if (i < 0) None else Some((header.substring(from, i), i + 1))
    }
    val parsed: Option[(String, String, Int, Int, Long, Int)] =
      if (header.startsWith("IMG:"))
        for {
          (ws, afterW) <- field(4); wv <- ws.toIntOption
          (hs, afterH) <- field(afterW); hv <- hs.toIntOption
        } yield ("image", "fake-img", wv, hv, 0L, afterH)
      else if (header.startsWith("AUD:"))
        for {
          (ds, afterD) <- field(4); dv <- ds.toLongOption
        } yield ("audio", "fake-aud", 0, 0, dv, afterD)
      else None
    val (mediaType, fmt, w, h, dur, bodyStart) =
      parsed.getOrElse(("unknown", "raw", 0, 0, 0L, 0))
    val body = payload.drop(bodyStart)
    val feats = Array.tabulate(8) { k =>
      if (body.isEmpty) 0f
      else body.iterator.zipWithIndex
        .map { case (b, i) => ((b & 0xff) * math.cos((k + 1) * (i + 1) * 0.01)).toFloat }
        .sum / body.length
    }
    Row(id, Row(mediaType, fmt, w, h, dur, payload.length.toLong), feats)
  }

  /**
   * Decode a frame of (id: long, payload: binary) rows partition-parallel.
   * `mapPartitions` keeps one codec context per partition (where a real
   * codec would be initialized once) — the Scala analogue of the
   * mapInPandas batch shape.
   */
  def decode(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    df.select(col("id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        // real impl: initialize codec once here, reuse across the partition
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** Frame sampling for video payloads: every nth chunk of `frameBytes` as
   *  its own row — the partition-parallel explode shape a real video
   *  pipeline uses (chunking is the stub; the plan shape is real). */
  def sampleFrames(df: DataFrame, frameBytes: Int, everyNth: Int)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          payload.grouped(frameBytes).zipWithIndex.collect {
            case (chunk, i) if i % everyNth == 0 => Row(r.getLong(0), i, chunk)
          }
        }
      }(enc)
  }

  /** "Resize": deterministic byte-level downsample of an image payload —
   *  stub for a real scaler; keeps the 1-in-N-bytes plan shape. */
  def resizeStub(df: DataFrame, factor: Int)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(StructField("id", LongType), StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val p = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), p.zipWithIndex.collect { case (b, i) if i % factor == 0 => b })
        }
      }(enc)
  }
}
