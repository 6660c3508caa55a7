package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the ACTUAL local (shuffle/spill) dirs of local-cluster executors.
  * In standalone mode the Worker overrides the app's spark.local.dir (the
  * SparkConf WARN), so the only way to know where executor shuffle bytes
  * land is to ask the executor JVM itself.
  *
  * Usage: runMain graft.tools.ExecDirProbe [shm|default]
  */
object ExecDirProbe {
  def main(args: Array[String]): Unit = {
    ClusterProf.ensureSparkScalaVersion()
    if (args.headOption.contains("shm"))
      ClusterProf.ensureExecutorShmDirs("/dev/shm/graft-probe-local")
    val s = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("execdir-probe")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", "/dev/shm/graft-probe-local")
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val dirs = s.sparkContext.parallelize(1 to 2, 2).mapPartitions { _ =>
      val dbm = org.apache.spark.SparkEnv.get.blockManager.diskBlockManager
      val f = dbm.getClass.getDeclaredField("localDirs")
      f.setAccessible(true)
      Iterator.single(f.get(dbm).asInstanceOf[Array[java.io.File]]
        .map(_.getAbsolutePath).mkString(","))
    }.collect().distinct
    println(s"EXECUTOR_LOCAL_DIRS: ${dirs.mkString(" | ")}")
    s.stop()
  }
}
