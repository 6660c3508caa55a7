package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only: dump `.explain("formatted")` of named SparkEntry queries to
  * files (the plans/r{N}/ evidence the optimization rounds commit).
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 q2 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote ${n}_$suffix.txt")
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
