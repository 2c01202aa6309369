package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary payload round-trip, deterministic decode
  * stub, and frame-sampling expansion shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, "héllo wörld")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("schema matches the canonical media shape") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
  }

  test("decode stub: n_bytes counts utf-8 bytes, digest is stable") {
    val d = media.select(col("media_id"),
      Multimodal.decodeStub(col("payload")).as("dec"))
    val rows = d.select(col("media_id"), col("dec.n_bytes"),
      col("dec.content_sha")).as[(Long, Long, String)].collect().toMap2
    assert(rows(1L)._1 == 11L)
    assert(rows(2L)._1 == 13L) // two 2-byte chars
    assert(rows(1L)._2 ==
      // sha256("hello world") — fixed vector
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }

  test("frame sampling: n_frames digests, distinct per frame") {
    val frames = media.filter(col("media_id") === 1L)
      .select(Multimodal.frameSample(col("payload"),
        col("meta.n_frames")).as("f"))
      .as[Seq[String]].head()
    assert(frames.size == 3)
    assert(frames.distinct.size == 3)
  }

  test("resize stub: aspect-preserving fit, null dims pass through") {
    val m = Seq(
        (1L, Array[Byte](1, 2), Some(4000), Some(3000)), // scales 4:3
        (2L, Array[Byte](3), Some(100), Some(50)),       // under max: as-is
        (3L, Array[Byte](4), None, None))                // non-image: nulls
      .toDF("media_id", "payload", "w", "h")
      .select(col("media_id"), col("payload"),
        struct(lit("img").as("format"), col("w").as("width"),
          col("h").as("height"), lit(1).as("n_frames")).as("meta"))
    val out = m.select(col("media_id"),
        Multimodal.resizeStub(col("payload"), col("meta"), 1024).as("r"))
      .select(col("media_id"), col("r.width"), col("r.height"),
        col("r.pixels_sha"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getString(3))).toMap
    assert(out(1L)._1.contains(1024) && out(1L)._2.contains(768))
    assert(out(2L)._1.contains(100) && out(2L)._2.contains(50))
    assert(out(3L)._1.isEmpty && out(3L)._2.isEmpty)
    assert(out.values.map(_._3).toSet.size == 3) // digests all distinct
  }

  test("decodePartitioned: one decoder per partition, batched rows") {
    val m = media.repartition(2)
    val before = Multimodal.StubDecoder.instances.get()
    val out = m.select(col("media_id"), col("payload"))
      .transform(Multimodal.decodePartitioned(_, batchSize = 1))
      .as[(Long, Long, Long)].collect().toMap2b
    val created = Multimodal.StubDecoder.instances.get() - before
    assert(out(1L)._1 == 11L) // "hello world" bytes
    assert(out(1L)._2 != out(2L)._2) // distinct features
    assert(created <= 2, s"decoder must init once per partition ($created)")
  }

  test("ASCII sentinel: decode prefix is byte==char at the gate SFs") {
    // q_multimodal_decode's DuckDB oracle folds CHARS (ord over
    // substr) while the engine folds BYTES; the two agree iff the
    // 48-char decode prefix is pure ASCII. Pin that corpus property at
    // both gate scale factors (the events-user_id sentinel precedent)
    // so a non-ASCII testdata rewrite fails HERE instead of silently
    // diverging at the oracle only.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val nonAscii = graft.Tables.table(spark, dir, "documents")
        .filter(length(substring(col("text"), 1, 48)) =!=
          octet_length(substring(col("text"), 1, 48).cast("binary")))
        .count()
      assert(nonAscii == 0,
        s"$dir: $nonAscii docs whose decode prefix is not ASCII — " +
          "the q_multimodal_decode oracle char-fold no longer equals " +
          "the engine byte-fold")
    }
  }

  test("non-ASCII payload: the byte fold diverges from a char fold") {
    // documents WHY the sentinel matters: on a 2-byte UTF-8 char the
    // engine's byte fold and the oracle's char fold differ — the
    // divergence lives in the oracle only, never in the engine
    val m = Multimodal.fromText(
      Seq((1L, "héllo")).toDF("doc_id", "text"), "doc_id", "text")
    val (_, n, f) = m.select(col("media_id"), col("payload"))
      .transform(Multimodal.decodePartitioned(_))
      .as[(Long, Long, Long)].collect().head
    val bytes = "héllo".getBytes("UTF-8")
    var acc = 0L
    bytes.foreach(b => acc = acc * 31 + (b & 0xff))
    assert(n == bytes.length.toLong && f == acc)
    var charAcc = 0L
    "héllo".foreach(c => charAcc = charAcc * 31 + c.toLong)
    assert(f != charAcc, "byte fold must differ from the char fold here")
  }

  private implicit class ToMap2b(rows: Array[(Long, Long, Long)]) {
    def toMap2b: Map[Long, (Long, Long)] =
      rows.map { case (id, n, f) => id -> (n, f) }.toMap
  }

  private implicit class ToMap2(rows: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] =
      rows.map { case (id, n, s) => id -> (n, s) }.toMap
  }
}
