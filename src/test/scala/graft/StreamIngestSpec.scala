package graft

import graft.corpus.Corpus
import graft.model.ScoredDoc
import graft.query.{ExhaustiveScorer, QueryEngine}
import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming/incremental ingest (reference entry point 3.1): micro-batch
  * appends must leave the index equivalent — scores and member urls — to a
  * batch build over the union corpus; re-crawled urls follow
  * last-writer-wins with tombstoned old versions (W1/W3/X2).
  */
class StreamIngestSpec extends SparkSpecBase {
  import org.apache.spark.sql.Dataset
  import graft.model.PageDoc

  private val queries = Seq("s1" -> "the data", "s2" -> "spark index merge", "s3" -> "rare7x0")

  /** compare by (score, set-of-urls-at-that-score) since docIds differ
    * between streaming-order and batch assignment
    */
  private def byScore(res: Array[ScoredDoc], urlOf: Long => String): Seq[(Double, Set[String])] =
    res.groupBy(_.score).toSeq.sortBy(-_._1).map { case (s, g) => (s, g.map(r => urlOf(r.docId)).toSet) }

  test("two micro-batches == batch build over union corpus (scores + urls)") {
    val all = Corpus.synthetic(800, seed = 7L)
    val (b1, b2) = all.splitAt(500)
    val idxDir = Files.createTempDirectory("stream-idx").toString

    StreamIngest.appendBatch(spark, spark.createDataset(b1)(org.apache.spark.sql.Encoders.product[PageDoc]), idxDir, bucketSize = 128, snapshotId = 1)
    StreamIngest.appendBatch(spark, spark.createDataset(b2)(org.apache.spark.sql.Encoders.product[PageDoc]), idxDir, bucketSize = 128, snapshotId = 2)

    val urlOfStream = spark.read.parquet(s"$idxDir/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val got = QueryEngine.topK(spark, idxDir, queries, 10).collect()

    val pages = spark.createDataset(all)(org.apache.spark.sql.Encoders.product[PageDoc])
    val oracleIdx = Files.createTempDirectory("stream-oracle-idx").toString
    graft.index.IndexBuilder.build(spark, pages, oracleIdx, graft.index.IndexBuilder.Config(numBuckets = 8))
    val urlOfBatch = spark.read.parquet(s"$oracleIdx/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = QueryEngine.topK(spark, oracleIdx, queries, 10).collect()

    queries.foreach { case (qid, _) =>
      val g = byScore(got.filter(_.queryId == qid), urlOfStream)
      val w = byScore(want.filter(_.queryId == qid), urlOfBatch)
      assert(g.map(_._1) === w.map(_._1), s"$qid: score sequences differ")
      // full-score groups must match exactly; the k-th score group may be
      // truncated differently (docId tie-break order differs across
      // assignments), so compare all but the last group strictly
      g.zip(w).dropRight(1).foreach { case ((gs, gu), (ws, wu)) =>
        assert(gu === wu, s"$qid score=$gs: url sets differ")
      }
    }
  }

  test("re-crawl with higher version replaces doc; compaction drops tombstones") {
    val base = Corpus.synthetic(300, seed = 11L)
    val idxDir = Files.createTempDirectory("stream-idx2").toString
    StreamIngest.appendBatch(spark, spark.createDataset(base)(org.apache.spark.sql.Encoders.product[PageDoc]), idxDir, bucketSize = 64, snapshotId = 1)

    // re-crawl page0 with bumped timestamp and new content
    val p0 = base.head
    val recrawl = p0.copy(
      warc_ts = new java.sql.Timestamp(p0.warc_ts.getTime + 86400000L),
      text = "completely new recrawl content xyzzy",
      html = "<html><body>completely new recrawl content xyzzy</body></html>".getBytes("UTF-8"))
    StreamIngest.appendBatch(spark, spark.createDataset(Seq(recrawl))(org.apache.spark.sql.Encoders.product[PageDoc]), idxDir, bucketSize = 64, snapshotId = 2)

    // tombstone exists; old content must not be findable, new must be
    assert(spark.read.parquet(s"$idxDir/tombstones").count() === 1)
    val hits = QueryEngine.topK(spark, idxDir, Seq("q" -> "xyzzy"), 10).collect()
    assert(hits.length === 1)
    val urlOf = spark.read.parquet(s"$idxDir/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(urlOf(hits.head.docId) === p0.url)

    StreamIngest.compact(spark, idxDir)
    assert(!new java.io.File(s"$idxDir/tombstones").exists())
    // still findable post-compaction; stats N unchanged (replace, not add)
    val hits2 = QueryEngine.topK(spark, idxDir, Seq("q" -> "xyzzy"), 10).collect()
    assert(hits2.length === 1)
    import spark.implicits._
    val stats = spark.read.parquet(s"$idxDir/stats").as[graft.model.CorpusStats].head()
    assert(stats.n === 300L)
  }

  test("post-compact scores == fresh-build scores; pre-compact df inflation keeps the top-k set") {
    import org.apache.spark.sql.Encoders
    val base = Corpus.synthetic(400, seed = 17L)
    // recrawl 50 urls with longer content: tombstones + fresh postings, and
    // term segments keep the DEAD docs' df/cf until compact() (documented
    // ES-compatible inflation — stats n/tot are already exact pre-compact)
    val recrawls = base.take(50).map { p =>
      val t = p.text + " recrawled fresh content"
      p.copy(
        warc_ts = new java.sql.Timestamp(p.warc_ts.getTime + 86400000L),
        text = t,
        html = s"<html><body>$t</body></html>".getBytes("UTF-8"))
    }
    val idxDir = Files.createTempDirectory("stream-parity").toString
    StreamIngest.appendBatch(spark, spark.createDataset(base)(Encoders.product[PageDoc]),
      idxDir, bucketSize = 64, snapshotId = 1)
    StreamIngest.appendBatch(spark, spark.createDataset(recrawls)(Encoders.product[PageDoc]),
      idxDir, bucketSize = 64, snapshotId = 2)

    val pre = QueryEngine.topK(spark, idxDir, queries, 10).collect()
    StreamIngest.compact(spark, idxDir)
    val post = QueryEngine.topK(spark, idxDir, queries, 10).collect()
    val urlOfStream = spark.read.parquet(s"$idxDir/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // fresh build over the surviving versions
    val union = recrawls ++ base.drop(50)
    val freshDir = Files.createTempDirectory("stream-parity-fresh").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(union)(Encoders.product[PageDoc]), freshDir,
      graft.index.IndexBuilder.Config(numBuckets = 8))
    val fresh = QueryEngine.topK(spark, freshDir, queries, 10).collect()
    val urlOfFresh = spark.read.parquet(s"$freshDir/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    queries.foreach { case (qid, _) =>
      // (a) post-compact == fresh build: score sequence BIT-equal, url
      // groups equal (docIds differ by assignment path)
      val g = byScore(post.filter(_.queryId == qid), urlOfStream)
      val w = byScore(fresh.filter(_.queryId == qid), urlOfFresh)
      assert(g.map(_._1) === w.map(_._1), s"$qid: post-compact scores differ from fresh build")
      g.zip(w).dropRight(1).foreach { case ((gs, gu), (_, wu)) =>
        assert(gu === wu, s"$qid score=$gs: post-compact url sets differ from fresh build")
      }
      // (b) the pre-compact df/cf inflation shifts idf but must not change
      // the top-k MEMBERSHIP on this corpus
      val preSet = pre.filter(_.queryId == qid).map(r => urlOfStream(r.docId)).toSet
      val postSet = post.filter(_.queryId == qid).map(r => urlOfStream(r.docId)).toSet
      assert(preSet === postSet, s"$qid: pre-compact top-k set differs from post-compact")
    }
  }

  test("structured streaming file source drives appendBatch (AvailableNow)") {
    val src = Files.createTempDirectory("stream-src").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val idxDir = Files.createTempDirectory("stream-idx3").toString
    val pages = Corpus.synthetic(200, seed = 3L)
    spark.createDataset(pages)(org.apache.spark.sql.Encoders.product[PageDoc])
      .write.mode("overwrite").parquet(src)

    val q = StreamIngest.startFileStream(spark, src, idxDir, ckpt, bucketSize = 64)
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$idxDir/docs").count() === 200L)
    val hits = QueryEngine.topK(spark, idxDir, Seq("q" -> "the"), 5).collect()
    assert(hits.length === 5)
  }
}
