package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Multimodal-column operators: documents ⋈ embeddings as a typed record, and
  * a binary-payload pipeline (opaque bytes + typed metadata).
  *
  * The decode stage of a real image/audio pipeline needs native codecs that
  * this container doesn't ship; [[decodeStub]] keeps the Spark-side plumbing
  * real (binary column in, fixed-schema struct out, executed per-partition on
  * executors) with a deterministic fake decoder — swap its body for an actual
  * codec call in production. This is the Scala equivalent of a batched
  * `mapInPandas` decode.
  */
object Multimodal {

  /** A multimodal record: text + vector + opaque binary payload + metadata. */
  final case class MediaRecord(
      doc_id: Long,
      lang: String,
      payload: Array[Byte],
      embedding: Array[Float])

  /** Deterministic fake "decoded media" — stands in for image decode. */
  final case class DecodedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** documents ⋈ embeddings on id: one typed multimodal row per doc, with the
    * embedding reduced to exact scalars. Dim-side broadcast not needed — both
    * sides share the id key, so at scale this is a co-partitioned join.
    */
  def q43MultimodalJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .join(Tables.embeddings(spark, dir), col("doc_id") === col("vec_id"))
      .selectExpr(
        "doc_id", "lang", "source", "n_chars", "label",
        "size(embedding) AS dim",
        s"${Det.arrSumExpr("embedding")} AS emb_sum")
      .orderBy(col("doc_id"))

  val q43Oracle: String =
    s"""SELECT doc_id, lang, source, n_chars, label,
       |  len(embedding) AS dim, ${Det.arrSumSql("embedding")} AS emb_sum
       |FROM documents JOIN embeddings ON doc_id = vec_id
       |ORDER BY doc_id""".stripMargin

  /** Binary-payload pipeline over the text bytes: byte length, content md5,
    * and deterministic fake decode metadata (the SQL-expressible face of
    * [[decodeStub]]).
    */
  def q44BinaryPipeline(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("byte_len", octet_length(col("text")))
      .select(
        col("doc_id"),
        col("byte_len"),
        md5(col("text")).as("content_md5"),
        (col("byte_len") % 64 + 16).as("fake_width"),
        (expr("byte_len div 7") % 64 + 16).as("fake_height"),
        (expr("n_chars div 100") + 1).as("n_frames"))
      .orderBy(col("doc_id"))

  val q44Oracle: String =
    """SELECT doc_id, byte_len, md5(text) AS content_md5,
      |  byte_len % 64 + 16 AS fake_width,
      |  (byte_len // 7) % 64 + 16 AS fake_height,
      |  (n_chars // 100) + 1 AS n_frames
      |FROM (SELECT *, strlen(text) AS byte_len FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Assemble typed multimodal records (binary payload = UTF-8 text bytes as
    * a stand-in for real media bytes).
    */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .join(Tables.embeddings(spark, dir), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), encode(col("text"), "UTF-8").as("payload"),
        col("embedding"))
      .as[MediaRecord]
  }

  /** Batched per-partition decode stub: the real-world shape of a media
    * decode stage (executor-side, streaming over partitions, no driver
    * collect). The "decode" itself is a deterministic fake over the bytes.
    */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        // Stand-in for codec work: derive fixed "dimensions" + checksum from
        // the payload. A real implementation would decode r.payload here.
        val len = r.payload.length
        var sum = 0L
        var i = 0
        while (i < len) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
        DecodedMedia(r.doc_id, len % 64 + 16, (len / 7) % 64 + 16, len / 100 + 1, sum)
      }
    }
  }

  /** One sampled frame of a binary payload. */
  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      offset: Int,
      frame_len: Int,
      head_byte: Int)

  /** Typed frame sampling: chunk each payload into fixed-size frames and
    * keep every `every`-th one, slicing the REAL bytes per frame (executor-
    * side flatMap over partitions — the batch shape a video/audio
    * frame-sampler runs in; swap the body for a codec's keyframe iterator).
    */
  def frameSample(
      records: Dataset[MediaRecord],
      frameBytes: Int = 256,
      every: Int = 3): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        val total = (n + frameBytes - 1) / frameBytes
        (0 until total).iterator
          .filter(_ % every == 0)
          .map { i =>
            val off = i * frameBytes
            Frame(r.doc_id, i, off, math.min(frameBytes, n - off),
              r.payload(off) & 0xff)
          }
      }
    }
  }

  /** SQL face of [[frameSample]]: identical frame geometry derived with
    * integer arithmetic + explode (no per-row byte access, so DuckDB can
    * replay it — the byte-level slicing itself is covered by the typed path
    * and its spec). head_byte uses ascii() of the frame's first character,
    * valid because offsets are codepoint==byte on this corpus's ASCII text.
    */
  def q74FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("byte_len", octet_length(col("text")))
      .withColumn("frame_idx", explode(expr(
        "filter(sequence(0, CAST(ceil(byte_len / 256.0) AS INT) - 1), i -> i % 3 = 0)")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * 256).cast("int").as("offset"),
        least(lit(256), col("byte_len") - col("frame_idx") * 256).cast("int").as("frame_len"),
        ascii(expr("substring(text, frame_idx * 256 + 1, 1)")).as("head_byte"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val q74Oracle: String =
    """SELECT doc_id, frame_idx, frame_idx * 256 AS offset,
      |  least(256, byte_len - frame_idx * 256) AS frame_len,
      |  unicode(substr(text, frame_idx * 256 + 1, 1)) AS head_byte
      |FROM (
      |  SELECT doc_id, text, byte_len,
      |    unnest([i for i in range(0, CAST(ceil(byte_len / 256.0) AS INT)) if i % 3 = 0]) AS frame_idx
      |  FROM (SELECT doc_id, text, strlen(text) AS byte_len FROM documents))
      |ORDER BY doc_id, frame_idx""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q43_multimodal_join", q43MultimodalJoin, q43Oracle),
    GraftQuery.sql("q44_binary_pipeline", q44BinaryPipeline, q44Oracle),
    GraftQuery.sql("q74_frame_sample", q74FrameSample, q74Oracle)
  )
}
