package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction as per-partition batch transforms.
  *
  * The real decode step (image/audio codecs) is STUBBED — this container has
  * no media libraries — but everything Spark-side is real and tested: the
  * schema (binary payload + metadata struct), the partition-parallel transform
  * shape, and the batch iteration contract. A production deployment swaps
  * [[FakeDecoder]] for a codec-backed one with the same signature; on a real
  * cluster this is the `mapInPandas`/`mapPartitions` slot where batch size and
  * arrow page shape matter, not the driver.
  */
object Multimodal {

  /** Decoder contract: bytes → fixed-length feature vector. One instance per
    * partition (model/codec init amortized across the partition's rows). */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in "decoder": summary statistics of the raw bytes.
    * STUB — replace with a real image/audio decode in production. Every
    * feature is an integral float (len, byte sum, min, max) so the vector
    * is exactly representable and differential-testable across engines
    * (exact up to 2^24, i.e. payloads ≤ ~64 KiB of 0xff bytes — far above
    * any byte-stat use of this stub). */
  object FakeDecoder extends Decoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return Array(0f, 0f, 0f, 0f)
      var sum = 0L; var mn = 255; var mx = 0
      payload.foreach { b => val v = b & 0xff; sum += v; mn = math.min(mn, v); mx = math.max(mx, v) }
      Array(payload.length.toFloat, sum.toFloat, mn.toFloat, mx.toFloat)
    }
  }

  /** Wrap a text corpus as a multimodal table: payload (binary) + metadata
    * struct. Testdata carries no real media, so payload bytes are the UTF-8
    * text — the schema/partitioning plumbing is what's under test. */
  def asMultimodal(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Image resize stub: real codecs are unavailable in this container, so the
    * transform records the target geometry in metadata and passes payload
    * bytes through — the Spark-side plumbing (schema evolution, partition
    * parallelism) is real; swap the identity for a codec call in production. */
  def resizeStub(mm: DataFrame, width: Int, height: Int): DataFrame =
    mm.withColumn("meta",
      struct(col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"),
        lit(width).as("target_w"), lit(height).as("target_h")))

  /** Video frame-sampling stub: emits one row per sampled frame index with a
    * deterministic byte-range "frame" slice — the explode/fan-out shape a real
    * frame sampler produces (n rows out per video in), with the decode `???`
    * replaced by a slice so tests can assert the plumbing. */
  def frameSampleStub(mm: DataFrame, idCol: String, everyNBytes: Int): DataFrame =
    mm.select(col(idCol), col("payload"),
      explode(sequence(lit(0L),
        greatest(ceil(col("meta.n_bytes") / everyNBytes) - 1, lit(0L)).cast("long"))).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(payload, CAST(frame_idx * $everyNBytes + 1 AS INT), $everyNBytes)"))
      .drop("payload")

  /** Partition-parallel feature extraction over the payload column: the
    * decoder is instantiated once per partition and applied to every row —
    * never per-row init, never a driver-side loop. */
  def extractFeatures(mm: DataFrame, idCol: String, decoder: Decoder): DataFrame = {
    val spark = mm.sparkSession
    val idIdx = mm.schema.fieldIndex(idCol)
    val payloadIdx = mm.schema.fieldIndex("payload")
    val idType = mm.schema(idIdx).dataType
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField("features", ArrayType(FloatType))))
    val rdd = mm.rdd.mapPartitions { rows =>
      val d = decoder // partition-local handle; real impl would open codec here
      rows.map(r => Row(r.get(idIdx), d.decode(r.getAs[Array[Byte]](payloadIdx))))
    }
    spark.createDataFrame(rdd, schema)
  }
}
