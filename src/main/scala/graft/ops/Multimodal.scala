package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The real decode (image/audio codecs) is STUBBED with a deterministic
  * fake — the codec libraries are not in this container — but the
  * Spark-side contract is real and tested: schema, batch iteration,
  * partition-preserving mapPartitions, and the downstream feature columns.
  * Swapping `decodeStub` for a real decoder changes no plan shape.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, byte_len: Long, magic: String,
      kind: String, fake_width: Int, fake_height: Int)

  /** html/binary payload inspector over the canonical page table: byte
    * length + sniffed magic. Pure column ops where possible; the
    * "decode" runs as typed mapPartitions over the binary column (the
    * batch shape a Pandas-UDF/mapInPandas stage would have).
    */
  def mediaMeta(pages: DataFrame): DataFrame = {
    val rows = pages.select(col("doc_id").cast("long"), col("payload"))
      .as(Encoders.product[(Long, Array[Byte])])
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val magic = bytes.take(4).map(b => f"$b%02x").mkString
        val kind = sniff(bytes)
        val (w, h) = decodeStub(bytes)
        MediaMeta(id, bytes.length.toLong, magic, kind, w, h)
      }
    }(Encoders.product[MediaMeta]).toDF()
  }

  private def sniff(bytes: Array[Byte]): String = {
    def startsWith(sig: Array[Int]): Boolean =
      bytes.length >= sig.length && sig.indices.forall(i => (bytes(i) & 0xff) == sig(i))
    if (startsWith(Array(0x89, 0x50, 0x4e, 0x47))) "png"
    else if (startsWith(Array(0xff, 0xd8, 0xff))) "jpeg"
    else if (startsWith(Array(0x52, 0x49, 0x46, 0x46))) "riff"
    else if (bytes.length >= 5 && new String(bytes.take(5), "ASCII").equalsIgnoreCase("<html")) "html"
    else "unknown"
  }

  /** STUB decoder: a real implementation would hand `bytes` to an image
    * library and return true dimensions. The deterministic fake derives
    * fake dimensions from content so tests pin the plumbing end-to-end.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    var h = 0
    var i = 0
    while (i < math.min(bytes.length, 64)) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val w = 16 + math.abs(h % 1024)
    (w, 16 + math.abs((h / 1024) % 1024))
  }

  /** Frame-sampling shape: explode a binary payload into n fixed-offset
    * "frames" (byte slices) — the plan shape of video frame extraction:
    * one input row → n frame rows, batch-local, no shuffle.
    */
  def sampleFrames(pages: DataFrame, nFrames: Int = 4): DataFrame = {
    val rows = pages.select(col("doc_id").cast("long"), col("payload"))
      .as(Encoders.product[(Long, Array[Byte])])
    rows.flatMap { case (id, bytes) =>
      val stride = math.max(1, bytes.length / nFrames)
      (0 until nFrames).iterator.filter(f => f * stride < bytes.length).map { f =>
        val slice = bytes.slice(f * stride, math.min(bytes.length, f * stride + 16))
        (id, f, slice.length, slice.map(b => f"$b%02x").mkString)
      }
    }(Encoders.product[(Long, Int, Int, String)])
      .toDF("doc_id", "frame", "frame_bytes", "frame_hex")
  }

  /** S7 parity — oversized-blob guard, CONTENT-OMIT semantics: a payload
    * over `maxBytes` is nulled but its row is KEPT, exactly the reference's
    * `max-file-size` behavior (`/root/reference/monstache.go:1405-1433` —
    * the size check at `:1425` skips only the file field; the document is
    * still indexed). A narrow codegen'd length conditional applied BEFORE
    * decode/feature work: at 100 TB this is the difference between skipping
    * a 2 GB blob at the scan and OOMing a decode task on it.
    */
  def sizeGuard(pages: DataFrame, maxBytes: Long): DataFrame =
    pages.withColumn("payload",
      when(length(col("payload")) <= maxBytes, col("payload")))

  /** The guarded ingest path: `sizeGuard` feeding pure-column media
    * metadata. Omitted payloads keep their doc row with NULL byte_len/magic
    * and kind `omitted` — the observable trace of the guard, mirroring a
    * reference document indexed without its attachment field.
    */
  def guardedMeta(pages: DataFrame, maxBytes: Long): DataFrame = {
    val guarded = sizeGuard(pages, maxBytes)
    val magicHex = lower(hex(substring(col("payload"), 1, 4)))
    val kind = when(magicHex.startsWith("89504e47"), "png")
      .when(magicHex.startsWith("ffd8ff"), "jpeg")
      .when(magicHex.startsWith("52494646"), "riff")
      .when(lower(substring(col("payload"), 1, 5).cast("string")) === "<html", "html")
      .otherwise("unknown")
    guarded.select(col("doc_id"),
      length(col("payload")).cast("bigint").as("byte_len"),
      when(col("payload").isNotNull, magicHex).as("magic"),
      when(col("payload").isNotNull, kind).otherwise(lit("omitted")).as("kind"))
  }

  /** Audit twin of `sizeGuard`: per media kind, how many payloads the guard
    * keeps vs drops and the largest kept size. Kind comes from the magic
    * bytes as a pure column expression (hex prefix of the payload — no
    * decode, stays in whole-stage codegen); one uniform-key aggregation.
    */
  def oversizeReport(pages: DataFrame, maxBytes: Long): DataFrame = {
    val magicHex = lower(hex(substring(col("payload"), 1, 4)))
    val kind = when(magicHex.startsWith("89504e47"), "png")
      .when(magicHex.startsWith("ffd8ff"), "jpeg")
      .when(magicHex.startsWith("52494646"), "riff")
      .when(lower(substring(col("payload"), 1, 5).cast("string")) === "<html", "html")
      .otherwise("unknown")
    val kept = length(col("payload")) <= maxBytes
    pages.select(kind.as("kind"), length(col("payload")).cast("bigint").as("byte_len"),
        kept.as("kept"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        max(when(col("kept"), col("byte_len"))).as("max_kept_bytes"))
  }

  /** The canonical page table's html column as the media payload. */
  def htmlPayload(spark: SparkSession, sfDir: String): DataFrame =
    graft.corpus.Corpus.pagesFromDocuments(spark, sfDir)
      .withColumn("doc_id",
        regexp_extract(col("url"), "/(\\d+)$", 1).cast("long"))
      .select(col("doc_id"), col("html").as("payload"))

  private val PngMagic: Array[Byte]  = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
  private val JpegMagic: Array[Byte] = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
  private val RiffMagic: Array[Byte] = Array(0x52, 0x49, 0x46, 0x46).map(_.toByte)

  /** Deterministic mixed-media corpus: docs with doc_id mod 4 = 0/1/2 get a
    * png/jpeg/riff magic prefix, the rest stay html — so every `sniff`
    * branch is exercised by the driver oracle, not just the trivial html
    * case. Pure column ops (binary concat stays in codegen).
    */
  def mixedPayload(spark: SparkSession, sfDir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(4L))
    htmlPayload(spark, sfDir).withColumn("payload",
      when(m === 0, concat(lit(PngMagic), col("payload")))
        .when(m === 1, concat(lit(JpegMagic), col("payload")))
        .when(m === 2, concat(lit(RiffMagic), col("payload")))
        .otherwise(col("payload")))
  }
}
