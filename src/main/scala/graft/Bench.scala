package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Benchmark harness (driver-run per round → BENCH_r{N}.json).
  *
  * Five measurements, one JSON line:
  *  1. EXECUTOR scaling (`BASELINE.json` north_rule, literal form): the
  *     identical build on `local-cluster` — real separate executor JVMs —
  *     at 1x2 vs 4x2 executors, constant per-executor memory → the
  *     `executors` block with the N→4N efficiency. This is the headline
  *     scaling artifact.
  *  2. thread-level scaling corroboration: the same job at
  *     local[2]/local[8]/local[32], `spark.sql.shuffle.partitions` scaled
  *     to match → docs/sec at each + two ratio pairs (2→8 sits below the
  *     host kernel-contention knee — see BASELINE.md).
  *  3. query p95 latency over the reference query set via block-max WAND
  *     (serving + distributed paths).
  *  4. streaming append throughput onto the built index (O(batch) path).
  *  5. per-query wall time of the headline SparkEntry queries on the sf dir.
  */
object Bench {

  /** Bench storage lives on tmpfs: this sandbox's disk shows 10-20x
    * writeback-throttling stalls that would swamp the scaling signal. The
    * cluster analog is measuring compute/shuffle scaling with storage
    * held constant — exactly what the north rule's efficiency ratio means.
    */
  val ShmBase = "/dev/shm/graft-bench"

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // 16 MB input splits: the staged corpus is a few hundred MB, and the
      // default 128 MB splits give the scan→tokenize and scan→shuffle-write
      // stages only ~6 tasks — fine at 2 cores, starving 8–32 (measured:
      // tokenize sped up only 1.6x from 1x2 to 4x2 executors until this)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", s"$ShmBase/spark-local")
      // local-fs commit path: v2 committer + raw fs (no .crc shadow files);
      // without native-hadoop each extra file op forks a shell — measured
      // 30%+ of partitioned-write wall time in this sandbox
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def shmDir(name: String): String = {
    val d = new java.io.File(s"$ShmBase/$name-${System.nanoTime()}")
    d.mkdirs()
    d.toString
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusHigh = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpusMid = math.max(1, cpusHigh / 4)
    val cpusLow = math.max(1, cpusHigh / 16)
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
    // IDENTICAL job at every level: bucket count must not vary with cpus
    val benchBuckets = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUCKETS", "64").toInt

    // ---- stage the deterministic synthetic corpus once (shared input) ----
    val staging = shmDir("corpus")
    val warm = session(cpusHigh)
    Corpus.syntheticDistributed(warm, benchDocs, seed = 42L, parts = cpusHigh * 2)
      .write.mode("overwrite").parquet(staging)
    warm.stop()

    // ---- scaling runs (north rule, sandbox form): the identical job at
    // N and 4N cores, twice — 2→8 below this VM's kernel-contention knee
    // (the regime matching a real cluster's few-threads-per-executor) and
    // 8→32 at full host pressure.
    //
    // Protocol: levels are INTERLEAVED round-robin (2,8,32, 2,8,32, ...),
    // one JVM-wide warm-up first (JIT outlives SparkSession.stop()), min
    // time per level across rounds. Interleaving is what makes the ratio
    // robust: this sandbox drifts over multi-minute windows (writeback
    // storms, neighbor load) — sequential per-level blocks let one slow
    // window land entirely on one level and fabricate an efficiency
    // anywhere between 0.6 and 1.0 for the SAME plan (per-phase profiling
    // shows the build itself scales ~4x from 2 to 8 cores, ScaleProf).
    // SPARK_GRAFT_EXEC_ONLY=1: run only the executor-scaling block (dev
    // iteration on the north-rule artifact without the ~20 min of other
    // sections); prints a reduced JSON line
    val execOnly = sys.env.get("SPARK_GRAFT_EXEC_ONLY").contains("1")

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val levels = Seq(cpusLow, cpusMid, cpusHigh)
    def buildOnce(cpus: Int): Double = {
      val s = session(cpus)
      import s.implicits._
      val pages = s.read.parquet(staging).as[graft.model.PageDoc]
      val dir = shmDir(s"idx$cpus")
      val (_, sec) = time {
        IndexBuilder.build(s, pages, dir, IndexBuilder.Config(numBuckets = benchBuckets))
      }
      s.stop()
      sec
    }
    locally { // JVM-wide JIT warm-up (shared across all sessions)
      val s = session(cpusHigh)
      IndexBuilder.build(s,
        Corpus.syntheticDistributed(s, math.min(benchDocs, 100000L), seed = 42L, parts = cpusHigh * 2),
        shmDir("warm"), IndexBuilder.Config(numBuckets = benchBuckets))
      s.stop()
    }
    // ---- executor scaling (the north rule's literal claim): the identical
    // build on Spark local-cluster — real separate executor JVMs (own heap,
    // GC, task threads; shuffles cross process boundaries over netty) — at
    // 1x2 vs 4x2 executors with constant per-executor memory. This is the
    // headline scaling artifact and runs FIRST (a driver JVM loaded with
    // the thread-level runs' garbage measurably depresses the 4x2 runs);
    // the thread-level numbers follow as corroboration (BASELINE.md).
    // 4 GB executors: 3 GB heaps GC-thrash under 2 concurrent SPIMI
    // inversion tasks (measured 2-3x slowdown at 4x2); 1M docs amortizes
    // per-build fixed costs without pushing the shuffle past this host's
    // page-cache comfort. 4 interleaved reps because multi-JVM runs on this
    // VM swing up to 3x with neighbor load — min-of-reps needs samples.
    val execDocs = sys.env.getOrElse("SPARK_GRAFT_EXEC_DOCS", "1000000").toLong
    val execMemMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "4096").toInt
    val execReps = sys.env.getOrElse("SPARK_GRAFT_EXEC_REPS", "4").toInt
    val execLayouts = Seq((1, 2), (4, 2)) // (executors, coresPerExecutor)
    graft.tools.ClusterProf.ensureSparkScalaVersion()
    def clusterSession(execs: Int, coresPer: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local-cluster[$execs,$coresPer,$execMemMb]")
        .appName(s"graft-bench-exec-${execs}x$coresPer")
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.memory", s"${execMemMb}m")
        .config("spark.sql.shuffle.partitions", (execs * coresPer).toString)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.local.dir", s"$ShmBase/spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val execStaging = shmDir("corpus-exec")
    locally {
      val s = session(cpusHigh)
      Corpus.syntheticDistributed(s, execDocs, seed = 42L, parts = cpusHigh * 2)
        .write.mode("overwrite").parquet(execStaging)
      s.stop()
    }
    def execBuildOnce(execs: Int, coresPer: Int, warmup: Boolean): Double = {
      val s = clusterSession(execs, coresPer)
      import s.implicits._
      if (warmup)
        IndexBuilder.build(s,
          Corpus.syntheticDistributed(s, math.min(execDocs, 100000L), seed = 42L,
            parts = execs * coresPer * 2),
          shmDir(s"execwarm$execs"), IndexBuilder.Config(numBuckets = benchBuckets))
      val pages = s.read.parquet(execStaging).as[graft.model.PageDoc]
      val (_, sec) = time {
        IndexBuilder.build(s, pages, shmDir(s"execidx$execs"),
          IndexBuilder.Config(numBuckets = benchBuckets))
      }
      s.stop()
      sec
    }
    val execTimes: Map[(Int, Int), Seq[Double]] =
      (1 to execReps).flatMap { r =>
        execLayouts.map { case (e, c) => (e, c) -> execBuildOnce(e, c, warmup = r == 1) }
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val thrExecLow = execDocs.toDouble / execTimes(execLayouts.head).min
    val thrExecHigh = execDocs.toDouble / execTimes(execLayouts.last).min
    val execFactor = execLayouts.last._1.toDouble / execLayouts.head._1
    val effExec = thrExecHigh / (execFactor * thrExecLow)

    if (execOnly) {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(ShmBase)).deleteRecursively()
      println(
        f"""{"metric":"exec_only","executors":{"bench_docs":$execDocs,"mem_mb_per_executor":$execMemMb,"layout_low":"${execLayouts.head._1}x${execLayouts.head._2}","thr_low":$thrExecLow%.1f,"layout_high":"${execLayouts.last._1}x${execLayouts.last._2}","thr_high":$thrExecHigh%.1f,"efficiency":$effExec%.3f}}""")
      return
    }

    // ---- thread-level scaling corroboration ----
    val times: Map[Int, Seq[Double]] =
      (1 to reps).flatMap(_ => levels.map(c => c -> buildOnce(c)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val thrLow = benchDocs.toDouble / times(cpusLow).min
    val thrMid = benchDocs.toDouble / times(cpusMid).min
    val thrHigh = benchDocs.toDouble / times(cpusHigh).min
    val effLowMid = thrMid / ((cpusMid.toDouble / cpusLow) * thrLow)
    val effMidHigh = thrHigh / ((cpusHigh.toDouble / cpusMid) * thrMid)

    // ---- query latency: WAND over a bench index at full parallelism ----
    val s = session(cpusHigh)
    import s.implicits._
    val pages = s.read.parquet(staging).as[graft.model.PageDoc]
    val idxDir = shmDir("idx-q")
    IndexBuilder.build(s, pages, idxDir, IndexBuilder.Config(numBuckets = benchBuckets))
    val benchQueries = Seq(
      "b1" -> "the", "b2" -> "data spark", "b3" -> "index merge stream",
      "b4" -> "the of and to in", "b5" -> "cache disk exec plan")
    // serving shape: warm IndexReader (postings pinned in block cache);
    // per-query latency measured one query at a time
    val reader = new QueryEngine.IndexReader(s, idxDir)
    reader.topK(benchQueries, 10).count() // warm-up distributed path
    val latDist = (1 to 4).flatMap { _ =>
      benchQueries.map { q =>
        val (_, sec) = time(reader.topK(Seq(q), 10).count())
        sec
      }
    }.sorted
    val p95Dist = latDist((latDist.size * 95 / 100).min(latDist.size - 1))
    // serving path: driver-side WAND over the warm term-row cache
    reader.topKServe(benchQueries, 10) // warm term cache
    val latServe = (1 to 10).flatMap { _ =>
      benchQueries.map { q =>
        val (_, sec) = time(reader.topKServe(Seq(q), 10))
        sec
      }
    }.sorted
    val p95 = latServe((latServe.size * 95 / 100).min(latServe.size - 1))

    // ---- streaming append throughput onto the just-built 1M-doc index:
    // K micro-batches of fresh urls; per-batch cost must be O(batch)
    // (urlmap-pruned recrawl lookup, term segments, incremental stats) ----
    val appendBatches = 4
    val appendPerBatch = 50000L
    graft.streaming.StreamIngest.bootstrapSideTables(s, idxDir)
    val (_, appendSec) = time {
      (0 until appendBatches).foreach { b =>
        val lo = benchDocs + b * appendPerBatch
        val batch = Corpus.syntheticRange(s, lo, lo + appendPerBatch, seed = 42L, parts = cpusHigh)
        graft.streaming.StreamIngest.appendBatch(s, batch, idxDir,
          bucketSize = 1 << 16, snapshotId = 100 + b)
      }
    }
    val thrAppend = (appendBatches * appendPerBatch).toDouble / appendSec

    // ---- headline SparkEntry queries on the harness sf dir ----
    val headline = Seq("q_bm25_topk", "q_wand_topk", "q_bool_and", "q_phrase_match",
      "q_term_df", "q_dedup_exact", "q_chunk_dedup", "q_minhash_lsh", "q_ann_cosine",
      "q_relate_join", "q_version_dedup")
    // min of two runs: the first touch of an index-backed query pays the
    // one-time IndexCache build (index build cost is already the headline
    // `value` metric) and single-shot timings swing with neighbor load —
    // the min measures the query itself
    val qTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val (_, sec1) = time(fn(s, sfDir).count())
        val (_, sec2) = time(fn(s, sfDir).count())
        name -> math.min(sec1, sec2)
      }
    }
    s.stop()
    // free tmpfs
    import scala.reflect.io.Directory
    new Directory(new java.io.File(ShmBase)).deleteRecursively()

    val qs = qTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // headline efficiency: the N→4N pair measured below the host's
    // kernel-contention knee (cpusLow→cpusMid); the full-pressure
    // cpusMid→cpusHigh pair is reported alongside (see BASELINE.md for the
    // vmstat evidence of why 32 runnable threads saturate this VM's kernel)
    val execLowName = s"${execLayouts.head._1}x${execLayouts.head._2}"
    val execHighName = s"${execLayouts.last._1}x${execLayouts.last._2}"
    println(
      f"""{"metric":"index_docs_per_sec_local[$cpusHigh]","value":$thrHigh%.1f,"unit":"docs/sec","queries":$qs,"sf":"$sfDir","executors":{"bench_docs":$execDocs,"mem_mb_per_executor":$execMemMb,"layout_low":"$execLowName","thr_low":$thrExecLow%.1f,"layout_high":"$execHighName","thr_high":$thrExecHigh%.1f,"efficiency":$effExec%.3f},"scaling":{"bench_docs":$benchDocs,"cpus_low":$cpusLow,"thr_low":$thrLow%.1f,"cpus_mid":$cpusMid,"thr_mid":$thrMid%.1f,"cpus_high":$cpusHigh,"thr_high":$thrHigh%.1f,"efficiency":$effLowMid%.3f,"efficiency_pair":"${cpusLow}to$cpusMid","efficiency_${cpusMid}_$cpusHigh":$effMidHigh%.3f},"append_docs_per_sec":$thrAppend%.1f,"query_p95_sec":$p95%.3f,"query_p95_dist_sec":$p95Dist%.3f}""")
  }
}
