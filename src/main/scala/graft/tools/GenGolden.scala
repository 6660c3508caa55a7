package graft.tools

import graft.corpus.Corpus
import graft.query.ExhaustiveScorer
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** One-off generator for the committed golden files (FIXTURES.md §3):
  * queries.tsv + topk.tsv over the seed-42 1000-page synthetic corpus,
  * scored by the exhaustive oracle (no index structures). GoldenSpec
  * asserts the WAND path reproduces topk.tsv rank- and score-identically.
  */
object GenGolden {

  /** The committed query set: rare term, head term, multi-term, tie-heavy,
    * absent term, mixed absent+present, longer-than-any-doc query.
    */
  val Queries: Seq[(String, String)] = Seq(
    "g_rare"   -> "rare42x0",
    "g_head"   -> "the",
    "g_multi"  -> "the data spark query merge",
    "g_ties"   -> "spark index",
    "g_absent" -> "zzzznotaterm",
    "g_mixed"  -> "zzzznotaterm spark",
    "g_long"   -> ("the of and to in a is for on with data spark index query " +
      "page web crawl term score rank block byte token text lang site link " +
      "node graph table shard merge batch stream delta store cache hash sort " +
      "scan join group count stat doc list tree heap disk mem net api job task")
  )

  val NumDocs = 1000
  val Seed = 42L
  val K = 10

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources/golden")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = Corpus.syntheticDS(spark, NumDocs, seed = Seed, parts = 8)
    val topk = ExhaustiveScorer.topKFromPages(spark, pages, Queries, K, numBuckets = 8)
      .collect().sortBy(r => (r.queryId, r.rank))

    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/queries.tsv"),
      Queries.map { case (id, q) => s"$id\t$q" }.mkString("", "\n", "\n"))
    Files.writeString(Paths.get(s"$outDir/topk.tsv"),
      topk.map(r => s"${r.queryId}\t${r.rank}\t${r.docId}\t${java.lang.Double.toString(r.score)}")
        .mkString("", "\n", "\n"))
    println(s"wrote ${topk.length} golden rows to $outDir")
    spark.stop()
  }
}
