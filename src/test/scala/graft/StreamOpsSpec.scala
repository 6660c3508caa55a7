package graft

import graft.model.PageDoc
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Watermarked windows + keyed state over the page stream (X8/X9):
  * windows finalize exactly once the watermark passes; keyed state
  * collapses replays and flags recrawls.
  */
class StreamOpsSpec extends SparkSpecBase {

  private def page(url: String, tsSec: Long, text: String = "x y z"): PageDoc =
    PageDoc(url, new Timestamp(tsSec * 1000L),
      s"<html><body>$text</body></html>".getBytes("UTF-8"), text, "en")

  private val T0 = 1735689600L // 2025-01-01T00:00:00Z

  test("windowed crawl stats finalize when the watermark passes the window end") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[PageDoc]
    val out = StreamOps.windowedCrawlStats(mem.toDS(), windowLen = "1 hour",
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wstats")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [00:00, 01:00): two sites
      mem.addData(page("https://example.org/site0/page1", T0 + 60),
        page("https://example.org/site0/page2", T0 + 120, "a b"),
        page("https://example.org/site1/page3", T0 + 180))
      q.processAllAvailable()
      assert(spark.table("wstats").count() === 0, "window must not close early")

      // event at 02:00 pushes watermark past 01:00 → first window finalizes
      mem.addData(page("https://example.org/site0/page4", T0 + 7200))
      q.processAllAvailable()
      mem.addData(page("https://example.org/site0/page5", T0 + 7260))
      q.processAllAvailable()
      val rows = spark.table("wstats").collect()
        .map(r => (r.getAs[Timestamp]("window_start").getTime / 1000L - T0,
          r.getAs[String]("site"), r.getAs[Long]("n_pages"), r.getAs[Long]("chars")))
        .sortBy(t => (t._1, t._2))
      assert(rows.toSeq === Seq((0L, "site0", 2L, 8L), (0L, "site1", 1L, 5L)))
    } finally q.stop()
  }

  test("firstSeen state collapses replays and flags recrawls") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[PageDoc]
    val out = StreamOps.firstSeen(mem.toDS(), watermarkDelay = "10 minutes")
    val q = out.toDF("url", "version", "is_recrawl")
      .writeStream.format("memory").queryName("fseen")
      .outputMode(OutputMode.Append()).start()
    try {
      val u = "https://example.org/site0/pageX"
      mem.addData(page(u, T0), page(u, T0)) // duplicate delivery in-batch
      q.processAllAvailable()
      mem.addData(page(u, T0)) // replay across batches
      q.processAllAvailable()
      mem.addData(page(u, T0 + 3600)) // genuine recrawl
      q.processAllAvailable()
      val rows = spark.table("fseen").collect()
        .map(r => (r.getLong(1) / 1000L - T0, r.getBoolean(2))).sortBy(_._1)
      assert(rows.toSeq === Seq((0L, false), (3600L, true)),
        "exactly one first-seen and one recrawl, replays collapsed")
    } finally q.stop()
  }

  test("continuous percolation: streaming alerts == batch percolate on the same pages") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pages = Seq(
      page("https://example.org/site0/p1", T0 + 1, "spark makes the query fast"),
      page("https://example.org/site0/p2", T0 + 2, "spark is slow here"),
      page("https://example.org/site1/p3", T0 + 3, "hash join versus merge sort"),
      page("https://example.org/site1/p4", T0 + 4, "nothing relevant"))
    val mem = MemoryStream[PageDoc]
    val out = StreamOps.percolateStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("perc")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(pages.take(2): _*)
      q.processAllAvailable()
      mem.addData(pages.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("perc").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val batch = graft.query.SearchOps
        .percolate(spark.createDataset(pages).toDF(), keyCol = "url")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(streamed == batch, s"streaming $streamed != batch $batch")
      // semantics spot-check: p1 matches b1 (spark, no slow), p2 does not
      assert(streamed.contains(("https://example.org/site0/p1", "b1")))
      assert(!streamed.exists(t => t._1.endsWith("/p2") && t._2 == "b1"))
      assert(streamed.contains(("https://example.org/site1/p3", "b2")))
    } finally q.stop()
  }
}
