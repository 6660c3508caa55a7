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

  /** REAL container-header dimension parsing — pure-JVM byte work over the
    * three public formats whose dimensions live in a fixed-layout header
    * (no codec needed, unlike pixel decode which stays stubbed):
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first —
    *    width/height are the two big-endian u32 at offsets 16/20.
    *  - JPEG: walk the marker segments from SOI (FFD8); any SOFn frame
    *    header (C0–CF except C4 DHT / C8 JPG / CC DAC) carries
    *    precision(1) height(2,BE) width(2,BE) after the length field.
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    *    width/height as little-endian u16 at offsets 6/8.
    *
    * Returns None for unrecognized/truncated payloads (caller keeps the
    * row — content-omit discipline, same as sizeGuard).
    */
  def headerDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e && u8(3) == 0x47 &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      Some(("png", be32(16).toInt, be32(20).toInt))
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG marker walk: skip fill bytes, stop at SOS/EOI, read any SOFn
      var i = 2
      var out: Option[(String, Int, Int)] = None
      while (out.isEmpty && i + 3 < bytes.length) {
        if (u8(i) != 0xff) i += 1 // not positioned on a marker — resync
        else {
          var j = i + 1
          while (j < bytes.length && u8(j) == 0xff) j += 1 // fill bytes
          if (j >= bytes.length) i = bytes.length
          else {
            val marker = u8(j)
            if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) i = j + 1 // standalone
            else if (marker == 0xd9 || marker == 0xda) i = bytes.length // EOI / SOS: dims must precede
            else if (j + 2 >= bytes.length) i = bytes.length
            else {
              val segLen = be16(j + 1)
              val isSof = marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc
              if (isSof && j + 7 < bytes.length)
                out = Some(("jpeg", be16(j + 6), be16(j + 4))) // (width, height)
              i = j + 1 + segLen
            }
          }
        }
      }
      out
    } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else None
  }

  final case class MediaDims(doc_id: Long, kind: String, width: Int, height: Int)

  /** Dimensions per doc from real header parsing ([[headerDims]]); rows
    * whose payload has no parseable container header are kept with kind
    * `unknown` and NULL-like -1 dims omitted — here we emit only parsed
    * rows plus an explicit unknown marker, all batch-local (mapPartitions,
    * no shuffle).
    */
  def mediaDims(pages: DataFrame): DataFrame = {
    val rows = pages.select(col("doc_id").cast("long"), col("payload"))
      .as(Encoders.product[(Long, Array[Byte])])
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        headerDims(bytes) match {
          case Some((k, w, h)) => MediaDims(id, k, w, h)
          case None            => MediaDims(id, "unknown", -1, -1)
        }
      }
    }(Encoders.product[MediaDims]).toDF()
  }

  /** Deterministic REAL-header media fixture: per doc_id, a payload whose
    * container header encodes dimensions that are pure arithmetic in
    * doc_id — so the DuckDB oracle checks the parser against the format
    * spec without parsing bytes itself. mod 3 = 0 → PNG (BE u32 IHDR),
    * 1 → JPEG (APP0 + COM + SOF0 walk), 2 → GIF89a (LE u16 LSD).
    */
  def dimsPayload(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    ids.map { id =>
      val w = (16 + id % 617).toInt
      val h = (16 + id % 419).toInt
      (id, synthHeader((id % 3).toInt, w, h))
    }.toDF("doc_id", "payload")
  }

  /** Minimal REAL headers (public formats): enough bytes that headerDims
    * must do actual layout work (PNG signature+IHDR; JPEG APP0+COM+SOF0;
    * GIF89a LSD).
    */
  private[graft] def synthHeader(kind: Int, w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    kind match {
      case 0 => // PNG: sig + IHDR(len=13): w, h, bit depth 8, color 2, 0,0,0
        Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32(13) ++ "IHDR".getBytes("ASCII") ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // (fake CRC)
      case 1 => // JPEG: SOI, APP0 JFIF, COM, SOF0(precision 8, h, w, 3 comps)
        Array[Byte](0xff.toByte, 0xd8.toByte) ++
          (Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
            "JFIF".getBytes("ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
          (Array[Byte](0xff.toByte, 0xfe.toByte) ++ be16(7) ++ "graft".getBytes("ASCII")) ++
          (Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
            be16(h) ++ be16(w) ++ Array[Byte](3,
              1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      case _ => // GIF89a: LSD w/h little-endian + packed fields
        "GIF89a".getBytes("ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0xf7.toByte, 0, 0)
    }
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
