package graft.scale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * BINARY columns with typed metadata structs, processed in batched
  * per-partition passes.
  *
  * The Spark-side plumbing — binary schema, partitioning, batch iteration
  * shape, deterministic output schema — is real and tested. The actual
  * media DECODE is a ==STUB== (this container ships no image/audio
  * codecs): metadata is derived deterministically from the byte stream
  * (length/prefix arithmetic), exactly where a libjpeg/ffmpeg call would
  * plug in. */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType), StructField("n_bytes", LongType)))

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of a
    * text column — in production this is the raw image/audio blob read
    * from object storage). */
  def attachBinary(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", to_binary(col(srcCol), lit("utf-8")))

  /** ==STUB DECODE== — deterministic fake: width/height/format derived
    * from byte length. Real implementation: replace the body of the
    * mapPartitions batch loop with the codec call; everything around it
    * (batching, schema, partition preservation) stays. */
  def decodeMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("meta", metaSchema))
    val mediaIdx = inSchema.fieldIndex("media")
    val rdd = df.rdd.mapPartitions { it =>
      // batched per-partition loop — the codec would process `batch` here
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val n = if (bytes == null) 0L else bytes.length.toLong
        val width = (32 + n % 64).toInt            // STUB: fake decode
        val height = (32 + (n * 7) % 64).toInt     // STUB: fake decode
        val format = (n % 3) match {
          case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
        }
        Row.fromSeq(row.toSeq :+ Row(width, height, format, n))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** ==STUB FEATURE EXTRACT== — deterministic fake embedding (k floats
    * from a rolling hash of the bytes); the real path calls the vision
    * encoder per batch. Output shape (array<float>, dim k) is the real
    * contract that downstream Similarity operators consume. */
  def extractFeatures(df: DataFrame, k: Int = 8): DataFrame = {
    val extract = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.fill(k)(0.0f)
      else {
        var h = 1125899906842597L
        val out = new Array[Float](k)
        var i = 0
        while (i < bytes.length) { h = 31 * h + bytes(i); i += 1
          out(i % k) = ((h >>> 11) % 1000) / 1000.0f }
        out
      }
    }
    df.withColumn("features", extract(col("media")))
  }

  /** ==STUB RESIZE== — deterministic fake: "resizing" to w×h produces a
    * payload of exactly w·h bytes (truncate / cycle-pad); the real path
    * calls the image library per batch. The metadata struct is rewritten
    * to the target dimensions — that struct is the contract downstream
    * consumers read, and it is what the oracle checks. Requires `meta`
    * (run [[decodeMeta]] first); the original format is preserved. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val target = w * h
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      val out = new Array[Byte](target)
      if (bytes != null && bytes.length > 0) {
        var i = 0
        while (i < target) { out(i) = bytes(i % bytes.length); i += 1 }
      }
      out
    }
    df.withColumn("media", resizeUdf(col("media")))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.format").as("format"), lit(target.toLong).as("n_bytes")))
  }

  /** ==STUB FRAME SAMPLE== — "video" frame sampling as byte slices at a
    * fixed stride; the real path seeks keyframes. Generator shape
    * (posexplode → one row per frame) is the real contract. */
  def sampleFrames(df: DataFrame, stride: Int = 256, maxFrames: Int = 4): DataFrame =
    df.select(col("*"), posexplode(expr(
      s"transform(sequence(0, least(int(length(media) / $stride), ${maxFrames - 1})), " +
      s"i -> substring(media, i * $stride + 1, $stride))")))
      .withColumnRenamed("pos", "frame_idx").withColumnRenamed("col", "frame_bytes")
}
