package graft.streaming

import graft.model.PageDoc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed state of StreamOps.firstSeen: highest version seen per url.
  * Top-level (not nested in the object) — nested case classes break the
  * state encoder's generated code.
  */
final case class SeenState(version: Long)

/** Streaming transforms over the page stream itself (beyond the ingest
  * sink): watermarked event-time windows and keyed state — the Structured
  * Streaming analogs of the reference's in-daemon counters and dedup
  * buffers (`monstache.go:3510-3527` stats loop; gtm's op buffering).
  *
  * Scale notes: both operators shuffle once on their grouping key (window
  * bucket / url), state is per-key-bounded, and the watermark bounds state
  * retention — the standard unbounded-stream discipline.
  */
object StreamOps {

  /** Per-(site, event-time-window) crawl stats with a watermark: counts and
    * token volume per window close exactly once the watermark passes the
    * window end (append mode). The site key is the url authority.
    */
  def windowedCrawlStats(pages: Dataset[PageDoc], windowLen: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    import pages.sparkSession.implicits._
    pages.toDF()
      .withColumn("site", regexp_extract(col("url"), "^[a-z]+://([^/]+)/([^/]+)/", 2))
      .withWatermark("warc_ts", watermarkDelay)
      .groupBy(window(col("warc_ts"), windowLen).as("w"), col("site"))
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("text"))).as("chars"))
      .select(col("w.start").as("window_start"), col("site"), col("n_pages"), col("chars"))
  }

  /** Stateful first-seen / recrawl classifier: per url, keyed state holds
    * the highest version seen; emits each page tagged `is_recrawl` (a
    * LOWER-or-equal version arriving later is dropped — at-least-once
    * upstream replays collapse here, the reference's dedup-buffer role).
    * State expires after `stateTtl` of event-time inactivity via the
    * watermark, so state size is bounded by the active-url working set.
    */
  def firstSeen(pages: Dataset[PageDoc], watermarkDelay: String = "30 minutes"): Dataset[(String, Long, Boolean)] = {
    import pages.sparkSession.implicits._
    pages
      .withWatermark("warc_ts", watermarkDelay)
      .groupByKey(_.url)
      .flatMapGroupsWithState[SeenState, (String, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (url: String, batch: Iterator[PageDoc], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.map(_.version).getOrElse(Long.MinValue)
            // in-batch ordering: process versions ascending for determinism
            val sorted = batch.toSeq.sortBy(p => p.warc_ts.getTime)
            var high = prev
            val out = sorted.flatMap { p =>
              val v = p.warc_ts.getTime
              if (v > high) {
                val isRecrawl = high != Long.MinValue
                high = v
                Some((url, v, isRecrawl))
              } else None
            }
            state.update(SeenState(high))
            if (state.getCurrentWatermarkMs() > 0)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600 * 1000L)
            out.iterator
          }
      }
  }

  /** Continuous percolation — the alerting/routing pipeline: every arriving
    * page is matched against the stored query set and emits (url, query_id)
    * alert rows. This is what a reference user percolates change events
    * for (monstache's change stream → ES percolator); here the SAME
    * compiled predicates as the batch operator run inside the stream —
    * entirely narrow (broadcast literals over each page's own token array),
    * no state, no shuffle, so it composes with any source/sink and batch ≡
    * streaming semantics hold by construction (StreamOpsSpec asserts it).
    */
  def percolateStream(pages: Dataset[PageDoc],
      stored: Seq[(String, String, String)] = graft.query.SearchOps.StoredQueries): DataFrame =
    graft.query.SearchOps.percolate(pages.toDF(), stored, keyCol = "url")
}
