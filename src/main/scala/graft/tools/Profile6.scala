package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Profile.t

/** Dev-only: quantify Hadoop local-fs fork overhead mitigations. */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val raw = args.headOption.contains("raw")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    val spark = (if (raw)
      b.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = sys.env("PROF_IDX")
    (1 to 3).foreach { i =>
      t(s"docs-partby-write-$i") {
        spark.read.parquet(s"$idx/docs")
          .withColumn("dbucket", col("bucket"))
          .repartition(col("bucket")).sortWithinPartitions("bucket", "docId")
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("dbucket").parquet(s"/tmp/prof6-docs-$raw")
      }
    }
    spark.stop()
  }
}
