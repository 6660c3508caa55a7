package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.tools.GenGolden
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The committed golden top-k (FIXTURES.md §3): the full pipeline — build +
  * block compression + WAND — must reproduce `src/test/resources/golden/
  * topk.tsv` rank-identically with bit-equal scores. Regenerate ONLY via
  * `runMain graft.tools.GenGolden` (exhaustive scorer, no index structures).
  */
class GoldenSpec extends SparkSpecBase {

  private def resourceLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing committed golden resource $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
  }

  test("WAND over the built index reproduces the committed golden top-k bit-for-bit") {
    val queries = resourceLines("queries.tsv").map { l =>
      val Array(id, q) = l.split("\t", 2); id -> q
    }
    assert(queries === GenGolden.Queries, "query set drifted from generator")

    val golden = resourceLines("topk.tsv").map { l =>
      val Array(qid, rank, docId, score) = l.split("\t")
      (qid, rank.toInt, docId.toLong, java.lang.Double.parseDouble(score))
    }

    val dir = Files.createTempDirectory("golden-idx").toString
    val pages = Corpus.syntheticDS(spark, GenGolden.NumDocs, seed = GenGolden.Seed, parts = 8)
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 8))
    val got = QueryEngine.topK(spark, dir, queries, GenGolden.K).collect()
      .sortBy(r => (r.queryId, r.rank))
      .map(r => (r.queryId, r.rank, r.docId, r.score))

    assert(got.length === golden.length,
      s"row count ${got.length} vs golden ${golden.length}")
    got.zip(golden).foreach { case (g, w) =>
      assert(g === w, s"golden mismatch: got $g want $w")
    }
  }
}
