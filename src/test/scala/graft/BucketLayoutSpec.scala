package graft

import graft.index.IndexBuilder
import org.apache.spark.sql.functions._

/** Pins the bijective bucket→shuffle-key layout (IndexBuilder
  * .bucketShuffleKeys) against Spark's ACTUAL HashPartitioning: after
  * `repartition(n, bucketShuffleKey(n))`, every row of bucket b must land
  * in partition b — exactly one bucket per task, no collisions, no empty
  * tasks. This is what keeps the CPU-bound SPIMI inversion stage fully
  * packed on multi-executor runs; if Spark ever changed its shuffle hash
  * (seed, function, pmod), this spec fails before the bench would notice
  * a silent ~30% packing loss.
  */
class BucketLayoutSpec extends SparkSpecBase {

  test("bucketShuffleKeys is a bijection under Spark's HashPartitioning") {
    import spark.implicits._
    for (n <- Seq(8, 32, 64)) {
      val placed = (0 until n).flatMap(b => Seq.fill(3)(b)).toDF("bucket")
        .repartition(n, IndexBuilder.bucketShuffleKey(n))
        .withColumn("pid", spark_partition_id())
        .as[(Int, Int)].collect()
      assert(placed.length == 3 * n)
      placed.foreach { case (bucket, pid) =>
        assert(pid == bucket, s"n=$n bucket=$bucket landed in partition $pid")
      }
    }
  }

  test("key table covers every partition exactly once") {
    val keys = IndexBuilder.bucketShuffleKeys(64)
    assert(keys.distinct.length == 64)
  }
}
