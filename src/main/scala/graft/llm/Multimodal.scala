package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise.
  *
  * The decode step is a STUB — the real implementation would call an
  * image/audio codec (not present in this container) inside the same
  * per-partition batch loop. Everything around it is real and tested:
  * the schema contract, the binary column plumbing, the fixed-dimension
  * `array<float>` feature output feeding [[Ann]], and the partition-wise
  * batch shape (amortizing per-batch codec setup, exactly like a Pandas-
  * batched UDF would).
  */
object Multimodal {

  /** media metadata struct: (format, width, height, duration_ms). */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", metaSchema)))

  /** STUB "decoder": a deterministic 16-bin byte histogram (L1-normalized)
    * standing in for a real decode→embed step. Swap the body for a codec
    * call; the signature — bytes in, fixed-dim float features out — is the
    * production contract.
    */
  val FeatureDim = 16
  private def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](FeatureDim)
    if (bytes == null || bytes.isEmpty) return new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) % FeatureDim) += 1; i += 1 }
    // divide in DOUBLE then narrow — the rounding any SQL engine doing
    // `CAST(c AS DOUBLE)/n → REAL` produces, so the oracle can match bitwise
    val n = bytes.length.toDouble
    hist.map(c => (c / n).toFloat)
  }

  /** Feature extraction over a binary column, batched per partition.
    * Implemented with mapPartitions on the typed Dataset so per-partition
    * setup (a real codec context) happens once per task, not per row.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: open codec here, close after the iterator drains
        rows.map { case (id, bytes) => (id, stubFeatures(bytes)) }
      }
    out.toDF(idCol, "features")
      .withColumn("features", col("features").cast("array<float>"))
  }

  /** Deterministic frame sampling STUB: n evenly-spaced byte-slices of the
    * blob (stand-in for video frame extraction); output one row per frame
    * with its index — the explode shape a real frame sampler produces.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val step = math.max(bytes.length / n, 1)
          (0 until math.min(n, bytes.length)).iterator.map { f =>
            (id, f, bytes.slice(f * step, math.min(f * step + step, bytes.length)))
          }
        }
      }
    out.toDF(idCol, "frame_idx", "frame")
  }

  /** "Resize" STUB: truncate/pad the binary to a target size — the shape
    * of a thumbnailing step (bytes in, smaller bytes out). */
  def resizeStub(bin: Column, targetBytes: Int): Column = {
    // substring on binary is 1-based and native; padding skipped (real
    // resize never pads).
    substring(bin, 1, targetBytes)
  }
}
