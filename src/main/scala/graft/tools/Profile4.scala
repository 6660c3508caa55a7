package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Profile.t

/** Dev-only: isolate the terms-aggregation slowness. */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = sys.env("PROF_IDX")

    t("read-count")(spark.read.parquet(s"$idx/postings").count())
    t("agg-collect") {
      spark.read.parquet(s"$idx/postings").groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxPartial").as("mp")).count()
    }
    t("agg-collect-2") {
      spark.read.parquet(s"$idx/postings").groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxPartial").as("mp")).count()
    }
    t("agg-rangepart-write") {
      spark.read.parquet(s"$idx/postings").groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxPartial").as("mp"))
        .repartitionByRange(8, col("term")).sortWithinPartitions("term")
        .write.mode("overwrite").parquet("/tmp/prof-terms1")
    }
    t("agg-plain-write") {
      spark.read.parquet(s"$idx/postings").groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf"), max("maxPartial").as("mp"))
        .write.mode("overwrite").parquet("/tmp/prof-terms2")
    }
    t("docs-style-write") {
      spark.read.parquet(s"$idx/docs")
        .withColumn("dbucket", col("bucket"))
        .repartition(col("bucket")).sortWithinPartitions("bucket", "docId")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("dbucket").parquet("/tmp/prof-docs1")
    }
    t("docs-nopart-write") {
      spark.read.parquet(s"$idx/docs")
        .repartition(col("bucket")).sortWithinPartitions("bucket", "docId")
        .write.mode("overwrite").parquet("/tmp/prof-docs2")
    }
    spark.stop()
  }
}
