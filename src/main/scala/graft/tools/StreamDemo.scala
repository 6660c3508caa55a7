package graft.tools

import graft.corpus.Corpus
import graft.model.PageDoc
import graft.query.QueryEngine
import graft.streaming.StreamIngest
import org.apache.spark.sql.{Encoders, SparkSession}
import java.nio.file.Files

/** Demo main: drives the streaming ingest path through the public API —
  * file-source micro-batches → incremental index → live WAND queries.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = Files.createTempDirectory("demo-src").toString
    val ckpt = Files.createTempDirectory("demo-ckpt").toString
    val idx = Files.createTempDirectory("demo-idx").toString
    val all = Corpus.synthetic(600, seed = 99L)

    // batch 1 arrives; stream drains it
    spark.createDataset(all.take(400))(Encoders.product[PageDoc])
      .write.mode("append").parquet(src)
    StreamIngest.startFileStream(spark, src, idx, ckpt, bucketSize = 128).awaitTermination()
    val n1 = spark.read.parquet(s"$idx/docs").count()
    println(s"DEMO after batch1: docs=$n1")
    val r1 = QueryEngine.topK(spark, idx, Seq("q" -> "the data"), 5).collect()
    r1.foreach(r => println(s"DEMO batch1 hit: rank=${r.rank} doc=${r.docId} score=${r.score}"))

    // batch 2 arrives later; resumed stream picks up only the new files
    spark.createDataset(all.drop(400))(Encoders.product[PageDoc])
      .write.mode("append").parquet(src)
    StreamIngest.startFileStream(spark, src, idx, ckpt, bucketSize = 128).awaitTermination()
    val n2 = spark.read.parquet(s"$idx/docs").count()
    println(s"DEMO after batch2: docs=$n2")
    val r2 = QueryEngine.topK(spark, idx, Seq("q" -> "the data"), 5).collect()
    r2.foreach(r => println(s"DEMO batch2 hit: rank=${r.rank} doc=${r.docId} score=${r.score}"))
    println(s"DEMO stats: ${spark.read.parquet(s"$idx/stats").collect().mkString}")
    spark.stop()
  }
}
