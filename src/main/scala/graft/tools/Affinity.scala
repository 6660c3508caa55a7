package graft.tools

/** CPU-affinity pinning for honest scaling measurements on a single host.
  *
  * `local[N]` alone does NOT emulate an N-core machine: every JVM auxiliary
  * pool — GC workers, netty IO, parquet/Arrow pools, the driver's planner —
  * sizes itself from the HOST's 32 cores and runs beside the N task
  * threads, so a "2-core" level quietly borrows a dozen extra host cores
  * and the measured N→4N efficiency is biased DOWNWARD (the low level is
  * flattered). A real cluster executor on a 2-core container has 2 cores
  * for everything. Pinning the whole process (all current threads; future
  * threads inherit) to exactly N cores restores that boundary.
  */
object Affinity {

  /** Pin every thread of this JVM to cores [0, n). No-op if taskset is
    * unavailable (the bench then reports unpinned numbers, as before).
    */
  def pin(n: Int): Unit = set(s"0-${n - 1}")

  /** Release the pin (all host cores). */
  def unpin(): Unit = set(s"0-${Runtime.getRuntime.availableProcessors() - 1}")

  private def set(cpuList: String): Unit = {
    val pid = ProcessHandle.current().pid()
    try {
      val p = new ProcessBuilder("taskset", "-a", "-c", "-p", cpuList, pid.toString)
        .redirectErrorStream(true).start()
      p.waitFor()
      if (p.exitValue() != 0)
        System.err.println(s"[affinity] taskset exited ${p.exitValue()} (unpinned run)")
    } catch {
      case e: Exception =>
        System.err.println(s"[affinity] unavailable: ${e.getMessage} (unpinned run)")
    }
  }
}
