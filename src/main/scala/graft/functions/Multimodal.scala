package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video treated as opaque `binary`
  * columns with typed metadata. The Spark-side machinery — schemas, batched
  * per-partition processing (the Scala analogue of `mapInPandas`),
  * partitioning, UDF signatures — is real and tested; only the codec calls
  * that would need external media libraries are stubbed behind
  * [[MediaCodec]] with a deterministic fake (images are REAL via JDK
  * ImageIO; audio/video decode is the clearly-marked stub).
  */
object Multimodal {

  /** Magic-number sniffing on the first bytes — pure codegen'd expressions,
    * runs at scan speed with only the binary prefix read. */
  def sniffFormat(bin: Column): Column =
    when(substring(bin, 1, 8) === lit(Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)), "png")
      .when(substring(bin, 1, 3) === lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "jpeg")
      .when(substring(bin, 5, 4) === lit("ftyp".getBytes("US-ASCII")), "mp4")
      .when(substring(bin, 1, 4) === lit("RIFF".getBytes("US-ASCII")), "wav")
      .otherwise("unknown")

  /** Cheap typed metadata without decoding: byte length + format. */
  def binaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", length(col(binCol)).cast("long"))
      .withColumn("sniffed_fmt", sniffFormat(col(binCol)))

  /** Pluggable codec boundary. Image path is real (JDK ImageIO); audio/video
    * are deterministic STUBS — the container has no media libs, so the fake
    * derives "samples"/"frames" from the byte content reproducibly. */
  trait MediaCodec extends Serializable {
    def decodeImage(bytes: Array[Byte]): (Array[Int], Int, Int)
    /** STUB: real impl would call an audio codec. */
    def audioSampleCount(bytes: Array[Byte]): Long
    /** STUB: real impl would demux + select keyframes. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  object DefaultCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): (Array[Int], Int, Int) = Images.decode(bytes)
    def audioSampleCount(bytes: Array[Byte]): Long =
      bytes.length.toLong * 2 // STUB: deterministic fake (2 "samples"/byte)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      // STUB: deterministic fake — n evenly spaced 16-byte slices stand in
      // for decoded keyframes; partitioning/batch shape is the real part.
      val stride = math.max(1, bytes.length / math.max(n, 1))
      (0 until n).map { i =>
        val off = math.min(i * stride, math.max(bytes.length - 16, 0))
        java.util.Arrays.copyOfRange(bytes, off, math.min(off + 16, bytes.length))
      }
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("id", StringType), StructField("w", IntegerType),
    StructField("h", IntegerType), StructField("mean_luma", IntegerType),
    StructField("phash", LongType)))

  /** Decode + feature-extract, batched per partition (the Scala analogue of
    * mapInPandas: one codec instance per partition, iterator in / iterator
    * out, never materializing the partition). Input: (id: string, bytes:
    * binary). Output: (id, w, h, mean_luma, phash). */
  def decodeImages(df: DataFrame, idCol: String, binCol: String,
                   codec: MediaCodec = DefaultCodec): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("string"), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val (px, w, h) = codec.decodeImage(r.getAs[Array[Byte]](1))
        val mean = (px.foldLeft(0L)(_ + _) / math.max(px.length, 1)).toInt
        Row(r.getString(0), w, h, mean, Images.phash64(px, w, h))
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Deterministic "resize": decode, area-average to (tw, th), re-encode PNG.
    * Real pixels end-to-end for images. */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   tw: Int, th: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(StructField("id", StringType), StructField("bytes", BinaryType)))
    val rows = df.select(col(idCol).cast("string"), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val (px, w, h) = Images.decode(r.getAs[Array[Byte]](1))
        val out = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val x0 = x * w / tw; val x1 = math.max(x0 + 1, (x + 1) * w / tw)
            val y0 = y * h / th; val y1 = math.max(y0 + 1, (y + 1) * h / th)
            var s = 0L; var c = 0
            var yy = y0
            while (yy < y1) { var xx = x0; while (xx < x1) { s += px(yy * w + xx); c += 1; xx += 1 }; yy += 1 }
            out(y * tw + x) = (s / c).toInt
            x += 1
          }
          y += 1
        }
        Row(r.getString(0), Images.encodePng(out, tw, th))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Frame sampling over "video" binaries (STUB decode, real plumbing):
    * one output row per sampled frame with frame index. */
  def sampleVideoFrames(df: DataFrame, idCol: String, binCol: String, n: Int,
                        codec: MediaCodec = DefaultCodec): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    val rows = df.select(col(idCol).cast("string"), col(binCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        codec.sampleFrames(r.getAs[Array[Byte]](1), n).zipWithIndex.map {
          case (f, i) => Row(r.getString(0), i, f)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
