package graft.tools

import graft.model._
import graft.query.QueryEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Profile.t

/** Dev-only: bisect WAND latency — scan vs deserialize vs algorithm. */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val idx = sys.env("PROF_IDX")
    val terms = Seq("the", "of", "and", "to", "in")

    t("scan-select-count") {
      spark.read.parquet(s"$idx/postings").filter(col("term").isin(terms: _*))
        .select("bucket", "term", "df", "cf", "maxPartial", "blocks").count()
    }
    val rows = t("collect-as-TermPostings") {
      spark.read.parquet(s"$idx/postings").filter(col("term").isin(terms: _*))
        .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxPartial"), col("blocks"))
        .as[TermPostings].collect()
    }
    println(s"rows=${rows.length}, blocks=${rows.map(_.blocks.size).sum}")
    val stats = QueryEngine.loadStats(spark, idx)
    val tstats = t("term-stats")(QueryEngine.loadTermStats(spark, idx, terms))
    t("wand-driver-side") {
      rows.groupBy(_.bucket).foreach { case (_, rs) =>
        val byTerm = rs.map(tp => tp.term -> tp).toMap
        QueryEngine.wandBucketPublic("q", terms.filter(byTerm.contains).sorted, byTerm, tstats,
          stats.n, stats.avgdl, 10)
      }
    }
    t("wand-driver-side-2") {
      rows.groupBy(_.bucket).foreach { case (_, rs) =>
        val byTerm = rs.map(tp => tp.term -> tp).toMap
        QueryEngine.wandBucketPublic("q", terms.filter(byTerm.contains).sorted, byTerm, tstats,
          stats.n, stats.avgdl, 10)
      }
    }
    t("full-topk")(QueryEngine.topK(spark, idx, Seq("b4" -> "the of and to in"), 10).count())
    spark.stop()
  }
}
