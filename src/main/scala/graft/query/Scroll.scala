package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-pinned scroll / export cursor — the ES scroll / point-in-time
  * analog for bulk export (the reference's direct-read resume loop walks
  * collections in `_id` order with a cursor, `/root/reference/monstache.go:
  * 1939-2048`; ES's scroll+PIT freezes the reader's view while it pages).
  *
  * A cursor pins the snapshotId that was committed when it was opened:
  *
  *  - BUCKET visibility — appends land in fresh buckets, and every bucket's
  *    lineage row carries the snapshotId that committed it, so the pinned
  *    view is "buckets whose first lineage snapshot ≤ pinned" (an O(buckets)
  *    read + docs-table partition pruning, never a row filter);
  *  - TOMBSTONE visibility — tombstone rows carry the snapshotId that wrote
  *    them; only tombstones ≤ pinned apply (a delete committed after the
  *    cursor opened must not perforate an in-flight export).
  *
  * Validity window: like an ES scroll context, a cursor survives any number
  * of concurrent appends/deletes but NOT a `compact()` (compaction
  * physically reclaims tombstoned rows; ES holds segment files for the
  * scroll's keep-alive — a storage-level retention this engine delegates to
  * scheduling compaction after exports drain).
  *
  * Each page is one `docId > after ORDER BY docId LIMIT n` job: the
  * predicate pushes to the parquet scan (docs files are docId-sorted per
  * bucket → row-group min/max pruning) and the sort is a
  * TakeOrderedAndProject, so a page costs O(page + skipped row-group
  * headers), not O(corpus) — the deep-pagination shape search_after has.
  */
object Scroll {

  /** An open cursor: the pinned snapshot + the exclusive docId low bound. */
  final case class Cursor(snapshotId: Long, afterDocId: Long)

  /** Open a cursor at the latest committed snapshot. */
  def open(spark: SparkSession, indexDir: String): Cursor = {
    val snap = spark.read.parquet(s"$indexDir/snapshots")
      .agg(max(col("snapshotId"))).head().getLong(0)
    Cursor(snap, -1L)
  }

  /** Buckets visible at the pinned snapshot (bounded: bucket count). */
  private def visibleBuckets(spark: SparkSession, indexDir: String, snapshotId: Long): Array[Int] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/lineage")
      .groupBy(col("partitionId"))
      .agg(min(col("snapshotId")).as("s0"))
      .filter(col("s0") <= snapshotId)
      .select(col("partitionId").cast("int")).as[Int].collect()
  }

  /** One page of the export: live docs at the pinned snapshot with
    * docId > cursor, docId-ascending, `pageSize` rows. Returns the rows and
    * the advanced cursor (afterDocId = last docId of the page; unchanged if
    * the export is drained).
    */
  def page(spark: SparkSession, indexDir: String, cur: Cursor, pageSize: Int): (DataFrame, Cursor) = {
    // one job per page; the page itself is client-sized (the ES scroll
    // response analog), so collecting it to hand back is bounded by design
    val plan = pagePlan(spark, indexDir, cur, pageSize)
    val rows = plan.collect()
    val nextAfter =
      if (rows.isEmpty) cur.afterDocId
      else rows.iterator.map(_.getLong(0)).max
    (spark.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema),
      Cursor(cur.snapshotId, nextAfter))
  }

  /** The page's (uncollected) plan: docId low bound pushed to the scan,
    * bucket visibility as a partition filter, TakeOrdered for the limit.
    */
  def pagePlan(spark: SparkSession, indexDir: String, cur: Cursor, pageSize: Int): DataFrame = {
    val vis = visibleBuckets(spark, indexDir, cur.snapshotId)
    val docs = spark.read.parquet(s"$indexDir/docs")
      .filter(col("dbucket").isin(vis.map(Int.box).toSeq: _*)) // partition pruning
      .filter(col("docId") > cur.afterDocId)                    // row-group pruning
      .select(col("docId"), col("url"), col("doclen"), col("version"))
    val live =
      if (graft.index.IndexBuilder.exists(spark, s"$indexDir/tombstones")) {
        val dead = spark.read.parquet(s"$indexDir/tombstones")
          .filter(col("snapshotId") <= cur.snapshotId)
          .select(col("docId")).distinct()
        docs.join(broadcast(dead), Seq("docId"), "left_anti")
      } else docs
    live.orderBy(col("docId")).limit(pageSize)
  }

  /** Drive a whole scroll chain of `nPages`, unioning the pages with their
    * page number — the bulk-export loop a client would run.
    */
  def export(spark: SparkSession, indexDir: String, nPages: Int, pageSize: Int,
      cursor: Cursor = null): DataFrame = {
    var cur = if (cursor == null) open(spark, indexDir) else cursor
    var out: DataFrame = null
    var p = 0
    while (p < nPages) {
      val (rows, next) = page(spark, indexDir, cur, pageSize)
      val withPage = rows.withColumn("page", lit(p))
      out = if (out == null) withPage else out.unionByName(withPage)
      cur = next
      p += 1
    }
    out
  }
}
