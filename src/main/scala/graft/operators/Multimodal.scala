package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in partition-local batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are clearly-marked deterministic STUBS — what is real and
  * tested is everything Spark-side: the schema contract, the
  * mapPartitions batching (one buffer reuse per batch, the shape a Pandas
  * UDF / JNI decoder would plug into), partition preservation, and the
  * feature-vector output schema that downstream Similarity operators
  * consume.
  */
object Multimodal {

  /** Metadata contract for an opaque media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate_hz", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a synthetic media payload to any string column: the bytes are
    * the UTF-8 of the text (an opaque stand-in), metadata derived
    * deterministically. Gives every pipeline a `content binary, meta struct`
    * pair shaped exactly like a real ingest. */
  def syntheticMedia(df: DataFrame, textCol: String,
                     kind: String = "image"): DataFrame =
    df.withColumn("content", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        (pmod(xxhash64(col(textCol)), lit(1920L)) + 1).cast("int")
          .as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080L)) + 1).cast("int")
          .as("height"),
        lit(16000).as("sample_rate_hz"),
        (length(col(textCol)) * 20L).cast("long").as("duration_ms")))

  /** Feature-extraction output schema: id + fixed-dim float vector. */
  def featureSchema(idField: StructField, dim: Int): StructType =
    StructType(Seq(idField,
      StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB decode kernel — a real deployment swaps this single function for
    * an image/audio decoder (libjpeg/ffmpeg via JNI, or an Arrow-batched
    * Python worker). Deterministic: features are a folded hash of the
    * payload bytes, so tests can assert exact values. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      val v = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      out(d) = ((v % 1000003L).toFloat) / 1000003.0f
      d += 1
    }
    out
  }

  /** Batched feature extraction over the binary column: partition-local,
    * batch-at-a-time iteration (the exact shape of an Arrow/Pandas-UDF
    * bridge: the decoder sees `batchSize` payloads per call, amortizing
    * codec setup), preserving partitioning — no shuffle. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      dim: Int = 64, batchSize: Int = 256): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = featureSchema(idField, dim)
    val idIx = df.schema.fieldIndex(idCol)
    val binIx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decoder invocation per batch — swap point for a real codec
        batch.map { row =>
          val payload = row.getAs[Array[Byte]](binIx)
          Row(row.get(idIx),
              stubDecodeFeatures(payload, dim).toSeq)
        }
      }
    }
  }

  /** STUB frame sampler: every video payload yields `frames` byte slices
    * (deterministic offsets). Real plumbing under test: one-to-many
    * expansion with an index column, partition-preserving. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frames: Int = 4): DataFrame = {
    val frameIdx = sequence(lit(0), lit(frames - 1))
    df.select(col(idCol), col(binCol), explode(frameIdx).as("frame_ix"))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_ix * 8 + 1, 8)"))
      .drop(binCol)
  }

  /** STUB "resize": truncate/pad payload to a target byte budget and update
    * metadata — exercises the content+meta co-update contract. */
  def resize(df: DataFrame, binCol: String, metaCol: String,
             targetW: Int, targetH: Int): DataFrame =
    df.withColumn(binCol, expr(s"substring($binCol, 1, ${targetW * targetH})"))
      .withColumn(metaCol, struct(
        col(s"$metaCol.kind").as("kind"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col(s"$metaCol.sample_rate_hz").as("sample_rate_hz"),
        col(s"$metaCol.duration_ms").as("duration_ms")))
}
