package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.textprep.TextPrep
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: attribute the postings phase — (a) staged read+shuffle+sort+
  * tuple-decode only, (b) + split+spimi+codec (noop), (c) + parquet write.
  * Usage: sbt "runMain graft.tools.PostProf [nDocs] [cpus]"
  */
object PostProf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"POST $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val base = "/dev/shm/graft-postprof"
    new java.io.File(base).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    // stage the tokenized table exactly as the build does (joined form)
    val an = TextPrep.Analyzer.Unicode
    t("prep-staged") {
      Corpus.syntheticDistributed(s, n, 42L, 64)
        .map { p =>
          val tfs = an.termFreqs(p.text)
          var dl = 0
          val sb = new java.lang.StringBuilder(256)
          var i = 0
          while (i < tfs.length) {
            dl += tfs(i)._2
            if (i > 0) sb.append(' ')
            sb.append(tfs(i)._1)
            i += 1
          }
          (0L, 0, p.url, 0L, dl, sb.toString, tfs.map(_._2))
        }.toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs")
        .withColumn("docId", monotonically_increasing_id())
        .write.mode(SaveMode.Overwrite)
        .option("compression", "lz4")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(s"$base/stage")
    }
    // fix buckets deterministically from docId order surrogate
    def fat = s.read.parquet(s"$base/stage")
      .withColumn("bucket", pmod(col("docId"), lit(64)).cast("int"))
      .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
      .repartition(64, IndexBuilder.bucketShuffleKey(64))
      .sortWithinPartitions("bucket", "docId")
      .as[(Int, Long, Int, String, Array[Int])]

    for (lap <- Seq("warm", "meas")) {
      t(s"$lap a-read+shuffle+sort+decode") {
        val c = fat.mapPartitions { it =>
          var rows = 0L
          var chars = 0L
          it.foreach { r => rows += 1; chars += r._4.length + r._5.length }
          Iterator.single(rows + chars)
        }.reduce(_ + _)
        System.err.println(s"  [$lap] checksum=$c")
      }
      t(s"$lap b-plus-split+spimi+codec") {
        fat.mapPartitions { it =>
          IndexBuilder.spimiBlockify(it.map { case (b, d, dl, ts, tf) =>
            (b, d, dl, IndexBuilder.splitTerms(ts), tf)
          })
        }(org.apache.spark.sql.Encoders.product[graft.model.TermPostings]).toDF()
          .write.format("noop").mode("overwrite").save()
      }
      for (codec <- Seq("zstd", "lz4")) t(s"$lap c-plus-parquet-write-$codec") {
        fat.mapPartitions { it =>
          IndexBuilder.spimiBlockify(it.map { case (b, d, dl, ts, tf) =>
            (b, d, dl, IndexBuilder.splitTerms(ts), tf)
          })
        }(org.apache.spark.sql.Encoders.product[graft.model.TermPostings]).toDF()
          .withColumn("pbucket", col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pbucket")
          .option("compression", codec)
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$base/postings-$codec")
        System.err.println(s"  [$lap] $codec bytes=" + {
          def du(f: java.io.File): Long =
            if (f.isDirectory) f.listFiles().map(du).sum else f.length()
          du(new java.io.File(s"$base/postings-$codec"))
        })
      }
    }
    s.stop()
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
  }
}
