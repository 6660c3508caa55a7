package graft.corpus

import graft.model.PageDoc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Corpus sources: (a) deterministic synthetic page table for unit/property
  * tests (FIXTURES.md §2, seed-fixed, no external data), (b) adapter mapping
  * the driver-harness `documents.parquet` onto the canonical `PageDoc` shape
  * (FIXTURES.md §4).
  */
object Corpus {

  /** 2025-01-01T00:00:00Z */
  val EpochBase = 1735689600L

  private val vocabHead = Array("the", "of", "and", "to", "in", "a", "is", "for", "on", "with")
  private val vocabBody: Array[String] = {
    // deterministic mid-frequency vocabulary
    val roots = Array("data", "spark", "index", "query", "page", "web", "crawl", "term",
      "score", "rank", "block", "byte", "token", "text", "lang", "site", "link", "node",
      "graph", "table", "shard", "merge", "batch", "stream", "delta", "store", "cache",
      "hash", "sort", "scan", "join", "group", "count", "stat", "doc", "list", "tree",
      "heap", "disk", "mem", "net", "api", "job", "task", "core", "exec", "plan")
    (for (r <- roots; s <- Array("", "s", "er", "ing", "ed")) yield r + s)
  }

  /** One deterministic page as a pure function of (seed, i) — partitioning
    * and generation order never affect content, so the same corpus can be
    * built sequentially (tests) or distributed (bench) byte-identically.
    * Zipf(1.1)-ish head terms + per-doc rare terms exercise head-term skew
    * and df=1 long tails (FIXTURES.md §2).
    */
  def syntheticPage(i: Long, seed: Long, nSites: Int = 10): PageDoc = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val len = 8 + rnd.nextInt(505) // [8, 512] tokens
    val sb  = new StringBuilder
    var t   = 0
    while (t < len) {
      val u = rnd.nextDouble()
      val w =
        if (u < 0.45) vocabHead(zipfIdx(rnd, vocabHead.length))
        else if (u < 0.97) vocabBody(rnd.nextInt(vocabBody.length))
        else s"rare${i}x${rnd.nextInt(4)}" // per-doc rare terms (df≈1)
      if (t > 0) sb.append(' ')
      sb.append(w)
      t += 1
    }
    val text = sb.toString
    val site = i % nSites
    PageDoc(
      url = s"https://example.org/site$site/page$i",
      warc_ts = new Timestamp((EpochBase + i) * 1000L),
      html = ("<html><body>" + text + "</body></html>").getBytes(StandardCharsets.UTF_8),
      text = text,
      lang = if (i % 10 != 0) "en" else Seq("de", "fr", "zh")((i / 10 % 3).toInt)
    )
  }

  def synthetic(nDocs: Int, seed: Long = 42L, nSites: Int = 10): Seq[PageDoc] =
    (0L until nDocs.toLong).map(syntheticPage(_, seed, nSites))

  /** Distributed generation of the same corpus (bench-scale). */
  def syntheticDistributed(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      parts: Int = 32): Dataset[PageDoc] = {
    import spark.implicits._
    spark.range(0L, nDocs, 1L, parts).map(i => syntheticPage(i, seed))
  }

  /** Pages for an id range [start, end) — fresh urls disjoint from any
    * [0, n) corpus (page ids are the url key), for append benchmarks.
    */
  def syntheticRange(spark: SparkSession, start: Long, end: Long, seed: Long = 42L,
      parts: Int = 32): Dataset[PageDoc] = {
    import spark.implicits._
    spark.range(start, end, 1L, parts).map(i => syntheticPage(i, seed))
  }

  /** Cumulative Zipf(1.1) CDF per n, computed ONCE with the exact FP op
    * order the old per-call loop used (norm as a left-fold sum, then
    * acc += 1/pow(k+1,1.1)/norm) so every draw is bit-identical to the
    * historical corpus. The per-call recompute was ~80% of syntheticPage
    * cost (HotProf: 55 µs/doc → ~2k math.pow calls per doc), paid by every
    * staging write and every warm-up build of the bench.
    */
  private val zipfCumCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def zipfCum(n: Int): Array[Double] =
    zipfCumCache.computeIfAbsent(n, { nn =>
      val norm = (0 until nn).map(k => 1.0 / math.pow(k + 1, 1.1)).sum
      val cum  = new Array[Double](nn)
      var acc  = 0.0
      var k    = 0
      while (k < nn) {
        acc += 1.0 / math.pow(k + 1, 1.1) / norm
        cum(k) = acc
        k += 1
      }
      cum
    })

  private def zipfIdx(rnd: scala.util.Random, n: Int): Int = {
    // inverse-CDF-ish skewed pick: P(k) ∝ 1/(k+1)^1.1
    val u   = rnd.nextDouble()
    val cum = zipfCum(n)
    var k   = 0
    while (k < n - 1) {
      if (u < cum(k)) return k
      k += 1
    }
    n - 1
  }

  def syntheticDS(spark: SparkSession, nDocs: Int, seed: Long = 42L, parts: Int = 8): Dataset[PageDoc] = {
    import spark.implicits._
    spark.createDataset(synthetic(nDocs, seed)).repartition(parts)
  }

  /** Map `documents.parquet` (doc_id, text, lang, source, n_chars) to the
    * canonical page table (FIXTURES.md §4). Pure column ops — stays inside
    * whole-stage codegen; the parquet scan prunes to the used columns.
    */
  def pagesFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("testdata://"), col("source"), lit("/"), col("doc_id")).as("url"),
        timestamp_seconds(lit(EpochBase) + col("doc_id")).as("warc_ts"),
        encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8").as("html"),
        col("text"),
        col("lang")
      )
  }

  def pageDocsFromDocuments(spark: SparkSession, sfDir: String): Dataset[PageDoc] = {
    import spark.implicits._
    pagesFromDocuments(spark, sfDir).as[PageDoc]
  }
}
