package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tools.Profile.t

/** Dev-only: raw Spark overheads in this environment. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("range-count-1")(spark.range(1000000).count())
    t("range-count-2")(spark.range(1000000).count())
    t("range-shuffle")(spark.range(1000000).groupBy(org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(100))).count().count())
    t("range-count-3")(spark.range(1000000).count())
    val idx = sys.env.getOrElse("PROF_IDX", "/tmp/nonexistent")
    if (new java.io.File(idx).exists()) {
      t("stats-read-1")(spark.read.parquet(s"$idx/stats").count())
      t("stats-read-2")(spark.read.parquet(s"$idx/stats").count())
      t("terms-read")(spark.read.parquet(s"$idx/terms").count())
      t("postings-read-all")(spark.read.parquet(s"$idx/postings").count())
      t("postings-filter")(spark.read.parquet(s"$idx/postings")
        .filter(org.apache.spark.sql.functions.col("term").isin("the", "data", "spark")).count())
      t("postings-filter2")(spark.read.parquet(s"$idx/postings")
        .filter(org.apache.spark.sql.functions.col("term").isin("the", "data", "spark")).count())
      import spark.implicits._
      t("wand-1")(graft.query.QueryEngine.topK(spark, idx, Seq("b4" -> "the of and to in"), 10).count())
      t("wand-2")(graft.query.QueryEngine.topK(spark, idx, Seq("b4" -> "the of and to in"), 10).count())
      t("wand-3")(graft.query.QueryEngine.topK(spark, idx, Seq("b1" -> "the"), 10).count())
    }
    spark.stop()
  }
}
