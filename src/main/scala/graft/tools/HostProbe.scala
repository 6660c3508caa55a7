package graft.tools

/** Host-capability probes backing the scaling analysis in BASELINE.md:
  * measures how this host's OWN compute and memory bandwidth scale from N
  * to 4N pinned cores, independent of Spark. The index build mixes the two
  * (tokenize/compress are ALU-heavy; shuffle/sort/parquet are DRAM-heavy),
  * so its single-host N→4N efficiency is bounded by a traffic-weighted mix
  * of these two ratios — and on a real multi-executor cluster the DRAM
  * term drops out entirely, because every added executor brings its own
  * memory controllers (the sandbox's single shared controller is the one
  * resource a thread-scaled `local[N]` ladder cannot replicate).
  *
  * Usage: runMain graft.tools.HostProbe [levels e.g. 2,8,32]
  * Prints one line per (probe, level): ops/s per thread and aggregate.
  */
object HostProbe {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** ALU probe: cache-resident LCG chain per thread (no memory traffic). */
  private def alu(threads: Int): Double = {
    val iters = 3000000000L
    val sink = new Array[Long](threads)
    def run(): Unit = {
      val ts = (0 until threads).map { ti =>
        new Thread(() => {
          var s = ti.toLong; var i = 0L
          while (i < iters) { s = s * 6364136223846793005L + 1442695040888963407L; i += 1 }
          sink(ti) = s
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }
    run() // warm
    val sec = timed(run())
    threads * iters / sec / 1e9 // G ops/s aggregate
  }

  /** DRAM probe: each thread streams over its own 256 MB array (far beyond
    * L3 per thread at high counts; sequential, prefetch-friendly — the
    * shuffle/sort access pattern's best case).
    */
  private def dram(threads: Int): Double = {
    // per-thread array: 256 MB at low counts, shrunk to keep the total
    // inside a 3 GB budget at 32 threads (96 MB/thread — still 12x the
    // per-thread L3 share)
    val n = math.min(1 << 25, ((3L << 30) / 8 / threads).toInt)
    val arrs = Array.fill(threads)(Array.fill(n)(1L))
    val sink = new Array[Long](threads)
    def run(): Unit = {
      val ts = (0 until threads).map { ti =>
        new Thread(() => {
          var s = 0L; var r = 0
          while (r < 6) { var i = 0; val a = arrs(ti); while (i < n) { s += a(i); i += 1 }; r += 1 }
          sink(ti) = s
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }
    run() // warm
    val sec = timed(run())
    threads * 6.0 * n * 8 / sec / 1e9 // GB/s aggregate
  }

  /** One quick aggregate-bandwidth reading at `threads` pinned cores
    * (~3-4 s incl. allocation) — the per-round window-quality evidence the
    * executor-scaling bench publishes: neighbor-VM DRAM traffic depresses
    * this number but is invisible to /proc/stat steal, so the artifact
    * carries both signals per round.
    */
  def dramGbs(threads: Int): Double = {
    Affinity.pin(threads)
    try dram(threads) finally Affinity.unpin()
  }

  /** (level, aluGopsAggregate, dramGBsAggregate) per level, CPU-pinned —
    * the host envelope any single-host scaling ratio is bounded by. Called
    * by Bench so the artifact itself carries the evidence.
    */
  def probe(levels: Seq[Int]): Seq[(Int, Double, Double)] = {
    val results = levels.map { lvl =>
      Affinity.pin(lvl)
      val a = alu(lvl)
      val d = dram(lvl)
      (lvl, a, d)
    }
    Affinity.unpin()
    results
  }

  def main(args: Array[String]): Unit = {
    val levels = args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 8, 32))
    val results = probe(levels)
    results.foreach { case (lvl, a, d) =>
      println(f"HOSTPROBE level=$lvl%2d alu=$a%6.2f Gops/s dram=$d%6.1f GB/s")
    }
    results.sliding(2).foreach {
      case Seq((l1, a1, d1), (l2, a2, d2)) =>
        val k = l2.toDouble / l1
        println(f"HOSTPROBE eff $l1%d->$l2%d: alu=${a2 / (k * a1)}%.3f dram=${d2 / (k * d1)}%.3f")
      case _ =>
    }
  }
}
