package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import java.nio.file.Files

/** The driver-side serving path must be rank-identical (docIds + bit-equal
  * scores) to the distributed scatter-gather path.
  */
class ServePathSpec extends SparkSpecBase {

  test("topKServe == distributed topK, bit-identical") {
    val pages = Corpus.syntheticDS(spark, 800, seed = 5L, parts = 6)
    val dir = Files.createTempDirectory("serve-idx").toString
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 8))
    val queries = Seq(
      "s1" -> "the", "s2" -> "data spark index", "s3" -> "rare5x1",
      "s4" -> "absentzzz", "s5" -> "the of and to in a")
    val dist = QueryEngine.topK(spark, dir, queries, 10).collect()
      .groupBy(_.queryId).view.mapValues(_.sortBy(_.rank)).toMap
    val reader = new QueryEngine.IndexReader(spark, dir)
    val serve = reader.topKServe(queries, 10)
      .groupBy(_.queryId).view.mapValues(_.sortBy(_.rank)).toMap
    // repeat from warm cache — must be stable
    val serve2 = reader.topKServe(queries, 10)
      .groupBy(_.queryId).view.mapValues(_.sortBy(_.rank)).toMap
    queries.foreach { case (qid, _) =>
      val d = dist.getOrElse(qid, Array.empty[graft.model.ScoredDoc]).toSeq
      val s1 = serve.getOrElse(qid, Seq.empty)
      val s2 = serve2.getOrElse(qid, Seq.empty)
      assert(s1 === d, s"$qid: serve vs distributed differ")
      assert(s2 === d, s"$qid: warm serve differs")
    }
    reader.close()
  }

  test("conjunctive serving path == distributed topKAnd, bit-identical") {
    val pages = Corpus.syntheticDS(spark, 600, seed = 7L, parts = 5)
    val dir = Files.createTempDirectory("serve-and").toString
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 8))
    val queries = Seq(
      "a1" -> "the data", "a2" -> "spark index cache", "a3" -> "absentzzz the",
      "a4" -> "the", "a5" -> "the of and")
    val dist = QueryEngine.topKAnd(spark, dir, queries, 10).collect().toSeq
      .sortBy(r => (r.queryId, r.rank))
    val reader = new QueryEngine.IndexReader(spark, dir)
    val serve = reader.topKServeAnd(queries, 10).sortBy(r => (r.queryId, r.rank))
    assert(dist.nonEmpty)
    assert(serve === dist)
    // a3 has a globally-absent term: AND semantics → empty
    assert(!dist.exists(_.queryId == "a3"))
    reader.close()
  }

  test("serving paths drop tombstoned docs pre-compaction (match distributed)") {
    import graft.streaming.StreamIngest
    val base = Corpus.synthetic(300, seed = 21L)
    val dir = Files.createTempDirectory("serve-tomb").toString
    StreamIngest.appendBatch(spark,
      spark.createDataset(base)(org.apache.spark.sql.Encoders.product[graft.model.PageDoc]),
      dir, bucketSize = 64, snapshotId = 1)
    // replace one doc: its old docId is tombstoned until compaction
    val p0 = base.head
    val recrawl = p0.copy(
      warc_ts = new java.sql.Timestamp(p0.warc_ts.getTime + 86400000L),
      text = "replacement content qqxyzzy",
      html = "<html><body>replacement content qqxyzzy</body></html>".getBytes("UTF-8"))
    StreamIngest.appendBatch(spark,
      spark.createDataset(Seq(recrawl))(org.apache.spark.sql.Encoders.product[graft.model.PageDoc]),
      dir, bucketSize = 64, snapshotId = 2)
    assert(spark.read.parquet(s"$dir/tombstones").count() === 1)

    val tombed = QueryEngine.loadTombstones(spark, dir)
    val queries = Seq("t1" -> "the", "t2" -> "qqxyzzy", "t3" -> p0.text.split(" ").head)
    val dist = QueryEngine.topK(spark, dir, queries, 10).collect().toSeq.sortBy(r => (r.queryId, r.rank))
    val reader = new QueryEngine.IndexReader(spark, dir)
    val distReader = reader.topK(queries, 10).collect().toSeq.sortBy(r => (r.queryId, r.rank))
    val serve = reader.topKServe(queries, 10).sortBy(r => (r.queryId, r.rank))
    assert(dist.nonEmpty)
    assert(distReader === dist, "reader distributed path differs from static path")
    assert(serve === dist, "serving path differs from static path")
    assert(!serve.exists(r => tombed.contains(r.docId)), "serving surfaced a tombstoned doc")
    reader.close()
  }
}
