package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (north-star extension X4): image/audio/
 * video payloads as opaque `binary` columns + typed metadata, with
 * decode / feature-extract / resize / frame-sample stages.
 *
 * The decode kernels are STUBS (this container ships no image/audio
 * codecs — see the builder brief): `decodeStub` derives a
 * deterministic fake feature vector from the bytes. Everything
 * AROUND the stub is real and tested: schema, batch shape
 * (mapPartitions = the Scala analogue of `mapInPandas` batches),
 * partition sizing, and the downstream joins.
 */
object Multimodal {

  /** Canonical media-row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap any table with a string column into media rows (payload =
    * UTF-8 bytes) — the test-data on-ramp; production ingests real
    * binary parquet columns with the same schema. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Deterministic fake "decode + feature extract": a `dim`-bucket
    * byte histogram, L1-normalized. Real deployments swap the body
    * for an actual codec call; the signature, batching and schema
    * stay identical. Implemented with mapPartitions so the per-batch
    * shape (one partition = one decode batch) matches how a JNI/codec
    * library would be amortized. */
  def decodeStub(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](1)
        val hist = new Array[Double](dim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1.0; i += 1 }
        val total = math.max(bytes.length.toDouble, 1.0)
        Row(id, bytes.length.toLong, hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize" stage stub: metadata-only transform (target dims recorded,
    * payload passed through) — exercises the schema evolution path. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame-sampling stub for video rows: emit `n` frame stubs per
    * media row via posexplode — the real generator shape (row ->
    * frames) with a fake payload slice per frame. */
  def frameSampleStub(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"), posexplode(sequence(lit(0), lit(n - 1)))
        .as(Seq("frame_idx", "frame_no")))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * 1000L).as("frame_ts_ms"))
}
