package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Scaling profiler: the identical index build at several parallelism
  * levels with per-phase timing (set GRAFT_PROF=1), to attribute any
  * efficiency loss to a phase. Usage:
  *   GRAFT_PROF=1 sbt "runMain graft.tools.ScaleProf [nDocs] [cpus,cpus,...]"
  */
object ScaleProf {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val levels = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 8))
    val base = "/dev/shm/graft-scaleprof"
    new java.io.File(base).mkdirs()

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"scaleprof-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.local.dir", s"$base/spark-local")
        .config("spark.io.compression.codec", sys.env.getOrElse("GRAFT_IO_CODEC", "lz4"))
        .config("spark.shuffle.file.buffer", sys.env.getOrElse("GRAFT_SHUFFLE_BUF", "32k"))
        .config("spark.shuffle.unsafe.file.output.buffer", sys.env.getOrElse("GRAFT_SHUFFLE_OUT_BUF", "32k"))
        .config("spark.shuffle.spill.diskWriteBufferSize", sys.env.getOrElse("GRAFT_SPILL_BUF", "1048576"))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val staging = s"$base/corpus"
    val warm = session(32)
    Corpus.syntheticDistributed(warm, nDocs, seed = 42L, parts = 64)
      .write.mode("overwrite").parquet(staging)
    warm.stop()

    levels.foreach { cpus =>
      Affinity.pin(cpus)
      val s = session(cpus)
      import s.implicits._
      val pages = s.read.parquet(staging).as[graft.model.PageDoc]
      // warm-up
      IndexBuilder.build(s,
        Corpus.syntheticDistributed(s, math.min(nDocs, 100000L), seed = 42L, parts = cpus * 2),
        s"$base/warm$cpus", IndexBuilder.Config(numBuckets = 64))
      System.err.println(s"=== PROFILE local[$cpus] ===")
      val t0 = System.nanoTime()
      IndexBuilder.build(s, pages, s"$base/idx$cpus", IndexBuilder.Config(numBuckets = 64))
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"=== TOTAL local[$cpus]: $sec%.2f s (${nDocs / sec}%.0f docs/s) ===")
      s.stop()
    }
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
  }
}
