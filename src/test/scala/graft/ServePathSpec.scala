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
}
