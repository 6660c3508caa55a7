package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — dynamic namespace discovery (`monstache.go:4783-4825`): list the
  * source's collections, keep those matching the include regex minus the
  * exclude regex, and expose each as a namespace → DataFrame mapping. Here
  * a "collection" is a parquet table under the corpus root; on a real
  * deployment the same listing runs against the catalog/warehouse path —
  * the Hadoop FS listing below works on any cluster filesystem.
  */
object Discovery {

  /** Discovered namespace names under `rootDir`, regex-filtered, sorted. */
  def discoverNamespaces(spark: SparkSession, rootDir: String,
      include: String = ".*", exclude: String = "^$"): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(rootDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inc = include.r
    val exc = exclude.r
    fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .filter(n => inc.findFirstIn(n).isDefined && exc.findFirstIn(n).isEmpty)
      .sorted
  }

  def open(spark: SparkSession, rootDir: String, namespace: String): DataFrame =
    spark.read.parquet(s"$rootDir/$namespace.parquet")

  /** Row counts per discovered namespace — the driver-checkable shape of
    * discovery (each matching table actually opened and scanned).
    */
  def namespaceCounts(spark: SparkSession, rootDir: String,
      include: String, exclude: String = "^$"): DataFrame = {
    val names = discoverNamespaces(spark, rootDir, include, exclude)
    require(names.nonEmpty, s"no namespaces match $include under $rootDir")
    names.map { n =>
      open(spark, rootDir, n).agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("ns"), col("n_rows"))
    }.reduce(_.unionByName(_)).orderBy("ns")
  }
}
