package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.textprep.TextPrep
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: sub-step attribution of the two dominant build phases
  * (stage-tokenize, postings) at a given core count, incl. an A/B of the
  * staged `terms` representation (array<string> vs single space-joined
  * string). Usage: sbt "runMain graft.tools.StageProf [nDocs] [cpus]"
  */
object StageProf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val base = "/dev/shm/graft-stageprof"
    new java.io.File(base).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val staging = s"$base/corpus"
    t("gen+stage-corpus") {
      Corpus.syntheticDistributed(s, n, 42L, 64).write.mode("overwrite").parquet(staging)
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pages = s.read.parquet(staging).as[graft.model.PageDoc]
    val versioned = pages.toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
      .select("url", "version", "text")

    // warm-up lap of everything first (JIT)
    for (lap <- Seq("warm", "meas")) {
      val assigned = IndexBuilder.assignDocIds(s, versioned, 64)
        .toDF("docId", "bucket", "url", "version", "text")
      t(s"$lap a-assign+dedup-noop")(noop(assigned))

      val an = TextPrep.Analyzer.Unicode
      val tokenized = assigned.as[(Long, Int, String, Long, String)]
        .map { case (docId, bucket, url, version, text) =>
          val tfs = an.termFreqs(text)
          var dl = 0
          tfs.foreach(dl += _._2)
          (docId, bucket, url, version, dl, tfs.map(_._1), tfs.map(_._2))
        }.toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs")
      t(s"$lap b-assign+tokenize-noop")(noop(tokenized))

      t(s"$lap c-staged-write-array") {
        tokenized.write.mode(SaveMode.Overwrite)
          .option("compression", "lz4")
          .option("parquet.block.size", (16 * 1024 * 1024).toString)
          .parquet(s"$base/stage-array")
      }

      val tokenizedJ = assigned.as[(Long, Int, String, Long, String)]
        .map { case (docId, bucket, url, version, text) =>
          val tfs = an.termFreqs(text)
          var dl = 0
          val sb = new java.lang.StringBuilder(256)
          var i = 0
          while (i < tfs.length) {
            dl += tfs(i)._2
            if (i > 0) sb.append(' ')
            sb.append(tfs(i)._1)
            i += 1
          }
          (docId, bucket, url, version, dl, sb.toString, tfs.map(_._2))
        }.toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs")
      t(s"$lap d-staged-write-joined") {
        tokenizedJ.write.mode(SaveMode.Overwrite)
          .option("compression", "lz4")
          .option("parquet.block.size", (16 * 1024 * 1024).toString)
          .parquet(s"$base/stage-joined")
      }

      // postings phase from each staged form
      t(s"$lap e-postings-from-array") {
        val fatRows = s.read.parquet(s"$base/stage-array")
          .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
          .repartition(64, IndexBuilder.bucketShuffleKey(64))
          .sortWithinPartitions("bucket", "docId")
          .as[(Int, Long, Int, Array[String], Array[Int])]
        noop(fatRows.mapPartitions(IndexBuilder.spimiBlockify)(
          org.apache.spark.sql.Encoders.product[graft.model.TermPostings]).toDF())
      }
      t(s"$lap f-postings-from-joined") {
        val fatRows = s.read.parquet(s"$base/stage-joined")
          .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
          .repartition(64, IndexBuilder.bucketShuffleKey(64))
          .sortWithinPartitions("bucket", "docId")
          .as[(Int, Long, Int, String, Array[Int])]
        noop(fatRows.mapPartitions { it =>
          IndexBuilder.spimiBlockify(it.map { case (b, d, dl, ts, tf) =>
            (b, d, dl, if (ts.isEmpty) Array.empty[String] else ts.split(' '), tf)
          })
        }(org.apache.spark.sql.Encoders.product[graft.model.TermPostings]).toDF())
      }
      // postings write cost (array form), to complete the attribution
      t(s"$lap g-postings-write") {
        val fatRows = s.read.parquet(s"$base/stage-array")
          .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
          .repartition(64, IndexBuilder.bucketShuffleKey(64))
          .sortWithinPartitions("bucket", "docId")
          .as[(Int, Long, Int, Array[String], Array[Int])]
        fatRows.mapPartitions(IndexBuilder.spimiBlockify)(
            org.apache.spark.sql.Encoders.product[graft.model.TermPostings]).toDF()
          .withColumn("pbucket", col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pbucket")
          .option("compression", "zstd")
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$base/postings")
      }
    }
    s.stop()
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
  }
}
