package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark main (round-6 optimization evidence; Bench.scala itself
  * is frozen). Times an arbitrary subset of SparkEntry queries on the sf
  * dir with the same min-of-2 protocol BenchServe uses, plus optional
  * noop-sink isolation (guide §1.4) so the computation is timed rather
  * than the collect. Prints one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchExtra [q1,q2,...]"   (default: headline set)
  */
object BenchExtra {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  val Headline = Seq("q_bm25_topk", "q_wand_topk", "q_bool_and", "q_phrase_match",
    "q_term_df", "q_dedup_exact", "q_chunk_dedup", "q_minhash_lsh", "q_ann_cosine",
    "q_relate_join", "q_version_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(Headline)
    val useNoop = sys.env.get("GRAFT_NOOP").contains("1")

    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // same tmpfs scratch as BenchServe — this sandbox's root disk
      // writeback-throttles shuffles 10-20x (Bench.ShmBase note)
      .config("spark.local.dir", "/dev/shm/graft-benchextra/spark-local")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      if (useNoop) fn(s, sfDir).write.format("noop").mode("overwrite").save()
      else fn(s, sfDir).count()

    val qTimes = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        s.sparkContext.setJobDescription(s"bench-extra: $name")
        val (_, sec1) = time(run(fn))
        val (_, sec2) = time(run(fn))
        s.sparkContext.setJobDescription(null)
        (name, sec1, sec2)
      }
    }
    s.stop()
    val qs = qTimes.map { case (k, a, b) => "\"" + k + f"\":${math.min(a, b)}%.3f" }
      .mkString("{", ",", "}")
    val qreps = qTimes.map { case (k, a, b) => "\"" + k + f"""\":[$a%.3f,$b%.3f]""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra","sink":"${if (useNoop) "noop" else "count"}","queries":$qs,"query_reps":$qreps,"q_protocol":"min_of_2","sf":"$sfDir"}""")
  }
}
