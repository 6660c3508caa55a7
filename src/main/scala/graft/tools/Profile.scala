package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Dev-only: stage-by-stage timing of build + query on a synthetic corpus. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROF_DOCS", "20000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val staging = Files.createTempDirectory("prof-corpus").toString
    t("gen+stage") {
      Corpus.syntheticDistributed(spark, n, 42L, 64).write.mode("overwrite").parquet(staging)
    }
    val pages = spark.read.parquet(staging).as[graft.model.PageDoc]
    t("count")(pages.count())
    t("tokenize-only") {
      pages.map(p => graft.textprep.TextPrep.doclen(p.text)).agg(org.apache.spark.sql.functions.sum("value")).head()
    }
    val dir = Files.createTempDirectory("prof-idx").toString
    t("full-build") {
      IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 64))
    }
    val queries = Seq("b1" -> "the", "b2" -> "data spark", "b3" -> "index merge stream",
      "b4" -> "the of and to in", "b5" -> "cache disk exec plan")
    t("wand-cold")(QueryEngine.topK(spark, dir, queries, 10).count())
    t("wand-warm")(QueryEngine.topK(spark, dir, queries, 10).count())
    t("wand-warm2")(QueryEngine.topK(spark, dir, queries, 10).count())
    t("terms-load")(QueryEngine.loadTermStats(spark, dir, Seq("the", "data", "spark")))
    t("postings-filter-count") {
      spark.read.parquet(s"$dir/postings")
        .filter(org.apache.spark.sql.functions.col("term").isin("the", "data", "spark"))
        .count()
    }
    spark.stop()
  }
}
