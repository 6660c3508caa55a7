package graft.tools

import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
import java.nio.file.Files
import graft.tools.Profile.t

/** Dev-only: phase-level scaling comparison — one build at PROF_CPUS on a
  * pre-staged corpus (set GRAFT_PROF=1 for phase timings).
  */
object Profile7 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROF_CPUS", "32").toInt
    val staging = sys.env("PROF_CORPUS")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.local.dir", "/dev/shm/graft-prof/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pages = spark.read.parquet(staging).as[graft.model.PageDoc]
    (1 to 2).foreach { i =>
      val dir = { val d = new java.io.File(s"/dev/shm/graft-prof/idx-$cpus-$i"); d.mkdirs(); d.toString }
      t(s"build-$i-cpus$cpus")(IndexBuilder.build(spark, pages, dir,
        IndexBuilder.Config(numBuckets = 64)))
    }
    spark.stop()
  }
}
