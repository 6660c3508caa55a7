package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators between a cleaned crawl and a tokenized
  * training shard: benchmark decontamination, temperature-balanced source
  * sampling, and sequence packing. Reference context: these are the stages a
  * monstache-style document pipeline feeds when the sink is an LLM training
  * corpus rather than a search index (same ingest/transform surface,
  * `/root/reference/monstache.go:3160-3293`); the algorithms themselves are
  * the published corpus-prep standards (n-gram decontamination, ratio-based
  * source balancing, concat-and-chop packing).
  */
object Pipeline {

  /** Benchmark decontamination (n-gram overlap): flag corpus docs sharing at
    * least one `n`-token shingle with a held-out benchmark/eval set. The
    * fixture benchmark is the docs with `doc_id % benchMod == 0` (derived
    * identically in the oracle); a real deployment passes any shingle set.
    *
    * Scale shape: the benchmark side is eval-suite-sized (thousands of
    * docs), so its distinct shingles broadcast; the corpus side is one
    * narrow shingling pass + a broadcast semi-join — the corpus is never
    * shuffled. Output: contaminated docs with their distinct-hit counts.
    */
  def decontaminate(docs: DataFrame, n: Int = 5, benchMod: Int = 101): DataFrame = {
    val sh = Dedup.shingles(docs, n)
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select("shingle").distinct()
    sh.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Temperature-balanced source sampling: per-source keep probability
    * p_s = sqrt(n_min / n_s) — the τ=0.5 point of the standard
    * (n_min/n_s)^(1−τ) family, chosen because IEEE sqrt and division are
    * correctly rounded in every implementation, so the keep decision is
    * bit-reproducible against the oracle (pow() is not). The per-doc
    * uniform u ∈ [0,1) comes from the md5-derived 32-bit integer of
    * `samp:<doc_id>` (the [[Dedup.md5Hash]] construction; exact division
    * by 2^32). A doc is kept iff
    * u < p_s: head sources are downsampled toward the smallest source,
    * which is always fully kept.
    *
    * Scale shape: source counts are one aggregation (sources ≪ docs →
    * broadcast back); the keep decision is a narrow per-row expression —
    * one scan, one tiny shuffle.
    */
  def sourceSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val nMin = counts.agg(min(col("n_s")).as("n_min"))
    val u = conv(substring(md5(concat(lit("samp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(nMin))
      .withColumn("p_s", sqrt(col("n_min").cast("double") / col("n_s").cast("double")))
      .filter(u < col("p_s"))
      .select(col("doc_id"), col("source"))
  }

  /** Sequence packing (concat-and-chop): documents are concatenated in
    * doc_id order and cut into fixed `ctx`-token training windows; each doc
    * reports its global token offset and the window span it lands in —
    * the manifest a shard writer materializes windows from.
    *
    * Scale shape: the global running offset is the two-pass pattern
    * ([[TextOps.lenDeciles]]'s): range-partition by doc_id, per-partition
    * token sums to the driver (O(partitions)), broadcast prefix offsets,
    * then a narrow per-partition running sum — explicitly NOT a
    * single-partition global window, which would serialize the corpus
    * through one task at 100 TB.
    */
  def seqPack(docs: DataFrame, ctx: Int = 512, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dl = TextOps.doclens(docs)
      .select(col("doc_id").cast("long"), col("doclen").cast("long"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)].cache()
    try {
      val sums = dl.mapPartitions { it =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((org.apache.spark.TaskContext.getPartitionId(), s))
      }.collect().toMap
      val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L)).toArray
      val bOff = spark.sparkContext.broadcast(offsets)
      dl.mapPartitions { it =>
        var off = bOff.value(org.apache.spark.TaskContext.getPartitionId())
        it.map { case (docId, len) =>
          val o = off
          off += len
          (docId, o, len, o / ctx, if (len > 0) (o + len - 1) / ctx else o / ctx)
        }
      }.toDF("doc_id", "tok_offset", "doclen", "win_start", "win_end")
        .localCheckpoint() // pin: the cache below is released on return
    } finally dl.unpersist()
  }
}
