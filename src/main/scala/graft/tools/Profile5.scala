package graft.tools

import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
import java.nio.file.Files
import graft.tools.Profile.t

/** Dev-only: repeated full builds in one session — warmup vs structural. */
object Profile5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val staging = sys.env.getOrElse("PROF_CORPUS", "/tmp/prof-corpus-shared")
    if (!new java.io.File(staging).exists()) {
      graft.corpus.Corpus.syntheticDistributed(spark, 20000, 42L, 64)
        .write.mode("overwrite").parquet(staging)
    }
    val pages = spark.read.parquet(staging).as[graft.model.PageDoc]
    (1 to 3).foreach { i =>
      val dir = Files.createTempDirectory(s"prof5-idx$i").toString
      t(s"build-$i")(IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 64)))
    }
    spark.stop()
  }
}
