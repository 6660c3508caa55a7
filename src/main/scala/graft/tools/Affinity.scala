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

  /** Host core count captured BEFORE any pin: after pin(n), Linux reports
    * the current affinity mask through availableProcessors() (= n), so a
    * late read could never widen the mask back out. `nproc --all` reads the
    * full host count independent of the mask; fall back to the JVM value
    * only if nproc is unavailable (then unpin is best-effort, as before).
    */
  private lazy val hostCores: Int = {
    val fromNproc =
      try {
        val p = new ProcessBuilder("nproc", "--all").redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        p.waitFor()
        if (p.exitValue() == 0) out.toIntOption else None
      } catch { case _: Exception => None }
    fromNproc.getOrElse(Runtime.getRuntime.availableProcessors())
  }

  /** Pin every thread of this JVM to cores [0, n). No-op if taskset is
    * unavailable (the bench then reports unpinned numbers, as before).
    */
  def pin(n: Int): Unit = { hostCores; set(s"0-${n - 1}") }

  /** Release the pin (all host cores, captured pre-pin). */
  def unpin(): Unit = set(s"0-${hostCores - 1}")

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
