package graft

import graft.corpus.Corpus
import graft.query.Scroll
import graft.streaming.StreamIngest
import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Snapshot-pinned scroll/export: a page chain is stable under concurrent
  * appends and deletes committed after the cursor opened (the ES scroll /
  * point-in-time contract).
  */
class ScrollSpec extends SparkSpecBase {
  import spark.implicits._

  test("3-page chain ≡ one deep export at the pinned snapshot, stable under concurrent append+delete") {
    val dir = Files.createTempDirectory("scroll-idx").toString
    val pages = spark.createDataset(Corpus.synthetic(300, seed = 91L))(Encoders.product[graft.model.PageDoc])
    StreamIngest.appendBatch(spark, pages, dir, bucketSize = 64, snapshotId = 1)

    // the reference export taken at snapshot 1, before any concurrent churn
    val want = Scroll.export(spark, dir, nPages = 3, pageSize = 50)
      .select("page", "docId", "url").as[(Int, Long, String)].collect().sortBy(_._2)
    assert(want.length === 150)

    // open a cursor at snapshot 1, read page 1
    val c0 = Scroll.open(spark, dir)
    assert(c0.snapshotId === 1L)
    val (p1, c1) = Scroll.page(spark, dir, c0, 50)
    val got1 = p1.select("docId", "url").as[(Long, String)].collect().sortBy(_._1)

    // concurrent churn AFTER the cursor opened: an append (snapshot 2) and
    // a delete of docs the cursor has not paged over yet
    val extra = spark.createDataset(Corpus.synthetic(380, seed = 91L).drop(300))(
      Encoders.product[graft.model.PageDoc])
    StreamIngest.appendBatch(spark, extra, dir, bucketSize = 64, snapshotId = 2)
    val killed = StreamIngest.deleteByQuery(spark, dir,
      col("docId").between(60L, 80L), snapshotId = 3)
    assert(killed === 21L)

    // pages 2 and 3 on the pinned cursor: the churn must be invisible
    val (p2, c2) = Scroll.page(spark, dir, c1, 50)
    val (p3, _) = Scroll.page(spark, dir, c2, 50)
    val got = (got1 ++ p2.select("docId", "url").as[(Long, String)].collect()
      ++ p3.select("docId", "url").as[(Long, String)].collect()).sortBy(_._1)
    assert(got.toSeq === want.map(w => (w._2, w._3)).toSeq,
      "scroll chain diverged from the pinned-snapshot export under concurrent churn")

    // a FRESH cursor (snapshot 3) sees the new docs and not the deleted ones
    val cNew = Scroll.open(spark, dir)
    assert(cNew.snapshotId === 3L)
    val all = Scroll.export(spark, dir, nPages = 8, pageSize = 50, cursor = cNew)
      .select("docId").as[Long].collect()
    assert(all.length === 300 + 80 - 21)
    assert(!all.exists(d => d >= 60L && d <= 80L))
  }
}
