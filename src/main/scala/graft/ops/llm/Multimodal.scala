package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata. The Spark-side plumbing (schema, batch shape, partition
  * sizing) is real; the actual media decode is STUBBED as a deterministic
  * byte-level feature extractor — media codec libraries are not available
  * in this environment, and the stub keeps every query reproducible.
  *
  * Scale notes: payloads dominate row size, so anything that shuffles media
  * rows must project the payload away first (extract features, then join
  * features back by id if needed). `decodeStub`/`frameSample` run scan-side
  * with zero shuffle.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))),
      nullable = false)))

  /** Deterministic decode stub: byte-level features standing in for a real
    * image/audio decode (size, content digest, checksum). A production
    * build replaces the body, not the signature.
    */
  def decodeStub(payload: Column): Column = struct(
    octet_length(payload).cast("long").as("n_bytes"),
    sha2(payload, 256).as("content_sha"),
    crc32(payload).as("checksum"))

  /** Frame sampling stub: digest per sampled frame index, `every`-th frame
    * of `nFrames`. Real decoders substitute frame bytes for the digest
    * input; the plumbing (1→N expansion scan-side) is what matters here.
    */
  def frameSample(payload: Column, nFrames: Column, every: Int = 1): Column =
    transform(
      sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every)),
      i => sha2(concat(concat(i.cast("string"), lit(":")).cast("binary"),
        payload), 256))

  /** Resize stub: new meta dimensions (aspect-preserving fit into
    * `maxSide`) plus a digest standing in for the resampled pixel buffer.
    * The real geometry math runs for real (integer floor-scale identical
    * on any engine); only the pixel transform is stubbed. Null
    * width/height (non-image media) pass through untouched.
    */
  def resizeStub(payload: Column, meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scaleNeeded = greatest(w, h) > maxSide
    // w/h widened to long BEFORE the multiply: int*int wraps (non-ANSI)
    // for dimensions above ~2^31/maxSide, yielding negative scaled dims
    val newW = when(w.isNull || h.isNull || !scaleNeeded, w)
      .otherwise(floor(w.cast("long") * maxSide / greatest(w, h)).cast("int"))
    val newH = when(w.isNull || h.isNull || !scaleNeeded, h)
      .otherwise(floor(h.cast("long") * maxSide / greatest(w, h)).cast("int"))
    struct(
      newW.as("width"), newH.as("height"),
      sha2(concat(
        concat(coalesce(newW.cast("string"), lit("-")), lit("x"),
          coalesce(newH.cast("string"), lit("-")), lit(":")).cast("binary"),
        payload), 256).as("pixels_sha"))
  }

  /** Batched partition-level decode — the shape for decoders/models with
    * heavy per-instance init (codec contexts, ONNX sessions): ONE decoder
    * per partition, rows processed in `batchSize` groups (the batch is
    * what a vectorized decoder consumes), results re-flattened. This is
    * the Scala analog of mapInPandas batching; the decoder itself is the
    * deterministic stub (no codec libs in this environment) — swap
    * `StubDecoder` for a real one without touching the plumbing.
    */
  def decodePartitioned(df: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("feature", LongType, nullable = false)))
    implicit val enc = Encoders.row(schema)
    df.select(col("media_id"), col("payload")).mapPartitions { rows =>
      val decoder = new StubDecoder // once per partition, like a codec ctx
      rows.grouped(batchSize).flatMap { batch =>
        decoder.decodeBatch(batch.map(r =>
          (r.getLong(0), r.getAs[Array[Byte]](1))))
      }.map { case (id, n, f) => Row(id, n, f) }
    }
  }

  /** Deterministic decoder stand-in: byte length + a rolling byte
    * checksum as the "feature". Counts instances so specs can assert the
    * one-per-partition property.
    */
  final class StubDecoder extends Serializable {
    StubDecoder.instances.incrementAndGet()
    def decodeBatch(batch: Seq[(Long, Array[Byte])])
        : Seq[(Long, Long, Long)] =
      batch.map { case (id, bytes) =>
        var f = 0L
        bytes.foreach(b => f = f * 31 + (b & 0xff))
        (id, bytes.length.toLong, f)
      }
  }
  object StubDecoder {
    val instances = new java.util.concurrent.atomic.AtomicLong(0)
  }

  /** Wrap a text table as a media table (payload = utf-8 bytes) — the
    * testdata has no real media, so `documents` stands in; the binary
    * column path (cast, octet_length, digest over bytes) is exercised for
    * real.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(df(idCol).cast("long").as("media_id"),
      df(textCol).cast("binary").as("payload"),
      struct(lit("text/plain").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(3).as("n_frames")).as("meta"))
}
