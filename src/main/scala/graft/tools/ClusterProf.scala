package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Multi-process scaling profiler: the identical index build on Spark
  * `local-cluster` (real executor JVMs — standalone master/worker in the
  * driver process, separate CoarseGrainedExecutorBackend processes), which
  * maps the north rule's "N executors vs 4N executors" far more faithfully
  * than thread-count scaling inside one JVM: each executor brings its OWN
  * heap, GC, and task threads, exactly like adding machines to a cluster.
  *
  * Usage: runMain graft.tools.ClusterProf [nDocs] [execsxcores,...] [memMb]
  * e.g.   runMain graft.tools.ClusterProf 1000000 1x2,4x2 3072
  */
object ClusterProf {

  /** local-cluster executor launch builds the child command in the DRIVER
    * JVM via AbstractCommandBuilder.getScalaVersion(), which requires
    * SPARK_SCALA_VERSION in the process env. When the harness didn't export
    * it, patch the in-JVM env view (the launcher reads System.getenv; the
    * forked executor itself never needs the variable). JDK17-safe here:
    * build.sbt already opens java.base/java.util.
    */
  def ensureSparkScalaVersion(): Unit = {
    if (!sys.env.contains("SPARK_SCALA_VERSION")) putenv("SPARK_SCALA_VERSION", "2.13")
    reapStaleBenchDirs()
  }

  /** Reclaim /dev/shm bench dirs left by a PREVIOUS bench process that was
    * killed before its own end-of-run cleanup (observed: a timed-out driver
    * run stranded 21 GB of tmpfs — which is RAM — and every later run then
    * paid for it in page-cache pressure). Only entries last modified before
    * THIS JVM started are stale; the current run's freshly created staging
    * dirs are never touched.
    */
  def reapStaleBenchDirs(): Unit =
    try {
      val base = new java.io.File("/dev/shm/graft-bench")
      if (base.isDirectory) {
        val jvmStart =
          java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
        base.listFiles().foreach { d =>
          if (d.lastModified() < jvmStart) {
            import scala.reflect.io.Directory
            new Directory(d).deleteRecursively()
          }
        }
      }
    } catch { case _: Exception => () } // hygiene only — never fail a run

  /** Standalone Workers override the app's spark.local.dir for their
    * executors (the SparkConf WARN): executor shuffle/spill dirs come from
    * the WORKER's SPARK_LOCAL_DIRS env, falling back to java.io.tmpdir —
    * i.e. the root disk, which on this sandbox writeback-throttles 10-20x
    * under 4+ concurrent executors (measured: per-task time inflated 2-3x
    * at 4x2 vs 1x2 on the same stage). local-cluster Workers live in the
    * driver JVM, so injecting the env there routes every executor's local
    * dirs to tmpfs — the cluster analog of giving each node local SSD
    * scratch, which any real deployment has.
    */
  def ensureExecutorShmDirs(dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    putenv("SPARK_LOCAL_DIRS", dir)
    putenv("SPARK_WORKER_DIR", s"$dir/work")
  }

  private def putenv(k: String, v: String): Unit =
    try {
      val env = System.getenv()
      val f = env.getClass.getDeclaredField("m")
      f.setAccessible(true)
      f.get(env).asInstanceOf[java.util.Map[String, String]].put(k, v)
    } catch {
      case e: Exception =>
        System.err.println(s"[clusterprof] could not set $k: $e " +
          "(export it before running if executor launch fails)")
    }

  /** Per-stage wall/task/shuffle profile: makespan (submission→completion),
    * task-time sum/max (straggler visibility), and shuffle+input volumes.
    * Identifies which stage of a multi-stage phase stops scaling.
    */
  final class StageProfiler extends SparkListener {
    private val taskTimes = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      taskTimes.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += t.taskInfo.duration
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      val si = sc.stageInfo
      val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
      val tt = taskTimes.remove(si.stageId).getOrElse(mutable.ArrayBuffer.empty).sorted
      val m = si.taskMetrics
      if (wall >= 500) // skip trivial stages
        System.err.println(
          f"STAGE ${si.stageId}%3d ${si.name.takeWhile(_ != '(').trim}%-28s wall=${wall / 1e3}%7.2fs " +
          f"tasks=${si.numTasks}%3d taskSum=${tt.sum / 1e3}%7.1fs taskMax=${tt.lastOption.getOrElse(0L) / 1e3}%6.2fs " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%7.1fMB sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB spill=${m.diskBytesSpilled / 1e6}%6.1fMB")
    }
  }

  def main(args: Array[String]): Unit = {
    ensureSparkScalaVersion()
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val layouts = args.drop(1).headOption.getOrElse("1x2,4x2")
      .split(",").toSeq.map { s => val Array(e, c) = s.split("x"); (e.toInt, c.toInt) }
    val memMb = args.drop(2).headOption.map(_.toInt).getOrElse(3072)
    val base = "/dev/shm/graft-clusterprof"
    new java.io.File(base).mkdirs()

    def session(execs: Int, coresPer: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local-cluster[$execs,$coresPer,$memMb]")
        .appName(s"clusterprof-${execs}x$coresPer")
        // executors are fresh JVMs: hand them the driver's full classpath
        // (graft classes + /opt/spark/jars), since there is no spark-submit
        // jar distribution here
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.memory", s"${memMb}m")
        // each executor JVM must size its GC/JIT/netty pools for ITS cores,
        // not the host's 32: without this every executor spawns ~23 G1
        // threads and 4x2 runs suffer a context-switch storm no real
        // cluster node has (measured: per-task time inflated ~2x at 4x2).
        // Floor 2: APC=1 serializes GC/JIT behind the single task thread
        // (3.6-5x per-task inflation measured at 8x1) — on a real node
        // those service threads run on neighboring cores
        .config("spark.executor.extraJavaOptions",
          s"-XX:ActiveProcessorCount=${math.max(2, coresPer)} -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64")
        .config("spark.sql.shuffle.partitions", (execs * coresPer).toString)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.local.dir", s"$base/spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        // measure steady state, not executor launch: block until every
        // executor has registered
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
        // keep identical to Bench.clusterSession so phase profiles explain
        // the recorded executor block
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.reducer.maxSizeInFlight", "96m")
        .config("spark.io.compression.lz4.blockSize", "512k")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val staging = s"$base/corpus"
    val warm = session(layouts.map(_._1).max, layouts.map(_._2).max)
    Corpus.syntheticDistributed(warm, nDocs, seed = 42L, parts = 64)
      .write.mode("overwrite").parquet(staging)
    warm.stop()

    layouts.foreach { case (execs, cores) =>
      val s = session(execs, cores)
      import s.implicits._
      val pages = s.read.parquet(staging).as[graft.model.PageDoc]
      // JIT + executor-registration warm-up
      IndexBuilder.build(s,
        Corpus.syntheticDistributed(s, math.min(nDocs, 100000L), seed = 42L, parts = execs * cores * 2),
        s"$base/warm$execs-$cores", IndexBuilder.Config(numBuckets = 64))
      System.err.println(s"=== PROFILE ${execs}x$cores (executors x cores) ===")
      val prof = new StageProfiler
      s.sparkContext.addSparkListener(prof)
      val t0 = System.nanoTime()
      IndexBuilder.build(s, pages, s"$base/idx$execs-$cores", IndexBuilder.Config(numBuckets = 64))
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"=== TOTAL ${execs}x$cores: $sec%.2f s (${nDocs / sec}%.0f docs/s) ===")
      s.sparkContext.removeSparkListener(prof)
      s.stop()
    }
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
  }
}
