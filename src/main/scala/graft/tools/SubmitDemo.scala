package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import org.apache.spark.sql.SparkSession

/** spark-submit entry point (the north star's literal deployment shape:
  * "the whole pipeline runs via spark-submit"): build the inverted index
  * over a synthetic page corpus and serve a WAND top-k from it, on whatever
  * `--master` the submit provides (a real cluster, `local-cluster[N,c,mem]`,
  * or `local[N]`). The session comes from `getOrCreate()` so every
  * cluster-manager setting rides the submit command, exactly as a cluster
  * deployment would pass them.
  *
  * Usage (see tools/spark-submit-demo.sh):
  *   spark-submit --class graft.tools.SubmitDemo <jar> [nDocs] [workDir]
  */
object SubmitDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val workDir = args.drop(1).headOption.getOrElse(
      s"/tmp/graft-submit-${System.currentTimeMillis()}")

    val spark = SparkSession.builder().appName("graft-submit-demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val pages = Corpus.syntheticDistributed(spark, nDocs, seed = 42L,
      parts = spark.sparkContext.defaultParallelism * 2)
    val r = IndexBuilder.build(spark, pages, s"$workDir/index",
      IndexBuilder.Config(numBuckets = 32))
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = Seq("s1" -> "the data", "s2" -> "spark index merge", "s3" -> "cache plan")
    val hits = QueryEngine.topK(spark, s"$workDir/index", queries, 10).collect()
    hits.groupBy(_.queryId).toSeq.sortBy(_._1).foreach { case (qid, rs) =>
      val top = rs.sortBy(_.rank).take(3).map(h => f"${h.docId}:${h.score}%.4f").mkString(", ")
      println(s"SUBMIT-DEMO $qid top3 = $top")
    }
    val ok = queries.forall { case (qid, _) => hits.count(_.queryId == qid) == 10 }
    println(f"SUBMIT-DEMO build: $nDocs docs in $buildSec%.1f s " +
      f"(${nDocs / buildSec}%.0f docs/s, n=${r.stats.n}); queries: " +
      (if (ok) "PASS" else "FAIL"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
