package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k via `functions.aggregate`/`zip_with`
  * column math (codegen'd, no UDF). Scale path: IVF-style bucketing — docs
  * are assigned to the nearest of C deterministic centroid seeds, queries
  * probe only their own bucket(s); the cross join is then bucket-local.
  */
object Similarity {

  def embeddings(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Brute-force cosine top-k: each query vector against the whole corpus.
    * `queries` is a small set → broadcast side of the cross join; the scan
    * side streams, per-partition heaps via window rank.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
    // rank on the UNROUNDED cosine (two cosines that round to the same 4dp
    // value must still order by true value, like the oracle); round only in
    // the final projection
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_raw",
        dot(col("embedding"), col("qvec")) /
          (norm(col("embedding")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        // + 0.0 normalizes IEEE -0.0 (a cosine rounding to zero from below)
        // to +0.0, matching the `round(...) + 0.0` in the SQL oracle
        (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** Filtered kNN (the ES 8 `knn` + `filter` request): exact cosine top-k
    * restricted to candidates satisfying a metadata predicate. The filter
    * gates CANDIDACY before ranking (pre-filter semantics — ES's kNN filter,
    * which guarantees k results from the allowed set, unlike post-filtering
    * a global top-k); scores are untouched. The predicate pushes down to
    * the candidate scan; everything else is [[bruteForceTopK]]'s shape. For
    * the IVF serving path compose the same predicate before bucketing —
    * bucket-local rankings stay exact within probed cells.
    */
  def filteredBruteTopK(corpus: DataFrame, queries: DataFrame,
      predicate: Column, k: Int = 10): DataFrame =
    bruteForceTopK(corpus.filter(predicate), queries, k)

  /** kNN with a minimum-similarity cutoff (the ES 8 `knn.similarity`
    * request parameter): exact top-k, then hits below the raw-cosine
    * threshold are dropped — ES applies the cutoff AFTER candidate
    * collection, so a query may return fewer than k hits but never a
    * below-threshold hit. The compare runs on the UNROUNDED cosine (the
    * engine's doubles are bit-identical to the oracle's ordered-sum
    * doubles, so the predicate cannot disagree across engines). Ranks keep
    * their pre-filter values — ES truncates the ranked list rather than
    * re-ranking the survivors.
    */
  def thresholdTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      minSim: Double = 0.15): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_raw",
        dot(col("embedding"), col("qvec")) /
          (norm(col("embedding")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k && col("cosine_raw") >= minSim)
      .select(col("query_id"), col("rank"), col("vec_id"),
        (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** Collected centroid seeds: the C lowest vec_ids (deterministic). C is
    * small and bounded → a driver-side array is the broadcast-literal side
    * of every assignment.
    */
  private def centroidSeeds(corpus: DataFrame, centroids: Int): Seq[(Int, Seq[Double])] =
    corpus.orderBy(col("vec_id").asc).limit(centroids)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toSeq

  /** Deterministic Lloyd refinement of the seed centroids. Each iteration
    * assigns every vector to its nearest current centroid (narrow argmax,
    * one scan) and recomputes per-cluster means. The per-dimension sums run
    * in QUANTIZED integer space — `floor(x*1e6 + 0.5)` as long — so the
    * reduction is order-independent (integer addition commutes exactly,
    * unlike float addition under Spark's nondeterministic partial-agg
    * order) and therefore bit-reproducible by the SQL oracle. The mean is
    * `sumQ / (n * 1e6)`, one IEEE division on identical operands in both
    * engines. Clusters that receive no vectors keep their previous
    * centroid (cannot happen with in-corpus seeds: a seed has cosine 1
    * with itself, but guarded anyway).
    *
    * Per iteration: one scan + one (cent_id, dim) groupBy of C*dims cells —
    * the shuffle is O(C*dims), independent of corpus size, and the driver
    * collects only C*dims tiny rows. This is the standard scalable k-means
    * step; at 100 TB the cost is the scans, not the update.
    */
  private[graft] def refineCentroids(corpus: DataFrame,
      seeds: Seq[(Int, Seq[Double])], iters: Int): Seq[(Int, Seq[Double])] = {
    var cents = seeds
    for (_ <- 0 until iters) {
      val sums = corpus
        // cent_id via withColumn BEFORE the generator select: a generator
        // select re-resolves sibling expressions and strips struct-field
        // aliases inside nearestCentroidCol's argmax
        .withColumn("cent_id", nearestCentroidCol(col("embedding"), cents))
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy("cent_id", "i")
        .agg(sum(floor(col("v").cast("double") * 1e6 + lit(0.5)).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      cents = cents.map { case (cid, prev) =>
        cid -> sums.get(cid).map { cells =>
          cells.sortBy(_._2).map { case (_, _, sq, n) => sq.toDouble / (n * 1e6) }.toSeq
        }.getOrElse(prev)
      }
    }
    cents
  }

  /** Refined centroids for the ORACLE-PINNED IVF family: deterministic
    * seeds + `IvfIters` Lloyd iterations over the full corpus (pinned so
    * the SQL oracle can reproduce them bit-for-bit). The scale path below
    * (`ivfTopKScaled`) relaxes all three knobs.
    */
  private[graft] val IvfIters = 1
  private def ivfCentroids(corpus: DataFrame, centroids: Int): Seq[(Int, Seq[Double])] =
    refineCentroids(corpus, centroidSeeds(corpus, centroids), IvfIters)

  /** C ∝ √N — the standard IVF sizing (per-bucket candidate lists shrink as
    * N/√N = √N, balancing probe cost against bucket size). Clamped to keep
    * the broadcast centroid table and the O(C·dims) update shuffle bounded.
    */
  def adaptiveCentroids(n: Long): Int =
    math.max(4, math.min(65536, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Centroids for the SCALE path: C ∝ √N seeds (or an explicit C),
    * `iters` ≥ 2 Lloyd rounds over a corpus SAMPLE — at 10^12 vectors the
    * refinement must not rescan the corpus per round; a uniform sample
    * converges the same centroids (k-means is estimated on samples in every
    * production ANN build) while assignment still runs over the full table.
    */
  private[graft] def scaledCentroids(corpus: DataFrame, centroids: Int = 0, iters: Int = 2,
      sampleFraction: Double = 0.25, seed: Long = 42L): Seq[(Int, Seq[Double])] = {
    val c = if (centroids > 0) centroids else adaptiveCentroids(corpus.count())
    val trainSet =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    refineCentroids(trainSet, centroidSeeds(corpus, c), iters)
  }

  /** Nearest-centroid id as a NARROW column expression: argmax over the
    * inlined centroid vectors via `array_max` on (cdist, -cent_id) structs —
    * no explode, no crossJoin, and crucially no window shuffle of the
    * corpus (a per-vector window would shuffle the full embedding table C×
    * at 100 TB; this is a pure map over the scan). Every cdist expression
    * appears exactly ONCE (a when-chain fold would double the expression
    * tree per centroid — 2^C codegen blowup). struct ordering compares
    * cdist first, then -cent_id: max ≡ (cdist desc, cent_id asc) rank 1.
    */
  private def nearestCentroidCol(vecCol: org.apache.spark.sql.Column,
      seeds: Seq[(Int, Seq[Double])]): org.apache.spark.sql.Column = {
    val n = norm(vecCol)
    val scored = seeds.map { case (cid, v) =>
      val cvec = typedlit(v)
      struct((dot(vecCol, cvec) / (n * norm(cvec))).as("d"), lit(-cid).as("nid"))
    }
    -array_max(array(scored: _*)).getField("nid")
  }

  /** IVF-bucketed ANN: every vector is assigned to its nearest centroid
    * (narrow argmax — see nearestCentroidCol); a query probes `nprobe`
    * nearest centroid buckets and ranks only those vectors. Recall < 1 by
    * design; at 100 TB the bucket join replaces the full scan per query.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10, centroids: Int = 16,
      nprobe: Int = 4): DataFrame =
    ivfTopKWith(corpus, queries, k, ivfCentroids(corpus, centroids), nprobe)

  /** Scale-path IVF: C ∝ √N (or explicit), multi-round Lloyd on a sample.
    * Same assignment/probe/score machinery as the oracle-pinned path.
    */
  def ivfTopKScaled(corpus: DataFrame, queries: DataFrame, k: Int = 10, centroids: Int = 0,
      iters: Int = 2, nprobe: Int = 4, sampleFraction: Double = 0.25): DataFrame =
    ivfTopKWith(corpus, queries, k,
      scaledCentroids(corpus, centroids, iters, sampleFraction), nprobe)

  private def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      refined: Seq[(Int, Seq[Double])], nprobe: Int): DataFrame = {
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cent_id", nearestCentroidCol(col("embedding"), refined))
    // query side is small — the explode+window probe ranking is fine there
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(refined.toDF("cent_id", "cvec"))
    val probed = {
      val scored = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .crossJoin(cents)
        .withColumn("cdist", dot(col("qvec"), col("cvec")) /
          (norm(col("qvec")) * norm(col("cvec"))))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("cent_id").asc)
      scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= nprobe)
        .drop("cvec", "cdist", "crank")
    }
    val scored = assigned.join(probed, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_raw",
        dot(col("embedding"), col("qvec")) /
          (norm(col("embedding")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** Recall@k of the IVF path against the brute-force exact ranking, per
    * query — the self-check that turns "approximate" into a measured
    * contract. Both sides are the operators above; the join is tiny
    * (queries × k rows).
    */
  def ivfRecall(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      centroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("vec_id"))
    val approx = ivfTopK(corpus, queries, k, centroids, nprobe)
      .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("hits"))
      .withColumn("recall", round(col("hits").cast("double") / col("n_exact") + lit(1.0e-9), 4))
  }

  /** Recall@k at several centroid counts in one report — the tuning
    * artifact an IVF deployment reads before fixing C (recall falls as C
    * grows at fixed nprobe; the report makes the trade explicit). The
    * brute-force exact ranking is computed once and reused across C.
    */
  def ivfRecallScaled(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      centroidCounts: Seq[Int] = Seq(16, 64), iters: Int = 2, nprobe: Int = 4,
      sampleFraction: Double = 0.25): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("vec_id"))
    centroidCounts.map { c =>
      val approx = ivfTopKScaled(corpus, queries, k, c, iters, nprobe, sampleFraction)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("hits"))
        .withColumn("centroids", lit(c))
        .withColumn("recall", round(col("hits").cast("double") / col("n_exact") + lit(1.0e-9), 4))
    }.reduce(_ unionByName _)
      .select("centroids", "query_id", "n_exact", "hits", "recall")
  }

  /** Embedding-cosine near-duplicate pairs, IVF-bucketed: vectors sharing a
    * centroid bucket are candidates (the standard blocked near-dup shape —
    * the pair join is bucket-local, never all-pairs), kept when cosine ≥
    * `minCosine`. At 100 TB the bucket count scales with the corpus so
    * per-bucket pair counts stay bounded; recall follows IVF locality
    * (near-identical vectors land in the same cell).
    */
  def embeddingNearDups(corpus: DataFrame, minCosine: Double = 0.9,
      centroids: Int = 16): DataFrame = {
    val refined = ivfCentroids(corpus, centroids)
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cent_id", nearestCentroidCol(col("embedding"), refined))
      .select(col("cent_id"), col("vec_id"), col("embedding"))
    val a = assigned.select(col("cent_id"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_raw", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .filter(col("cosine_raw") >= minCosine)
      .select(col("id_a"), col("id_b"), (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** Scalar (int8) quantization top-k — the memory-scale path for ANN: each
    * dimension is affine-mapped to an 8-bit code against corpus-wide
    * per-dim min/max (4× smaller vectors, the standard SQ8 scheme), and
    * ranking runs on the DECODED (symmetric) cosine so the oracle can
    * reproduce scores exactly. The per-dim extrema are min/max (exact,
    * aggregation-order-independent, unlike float sums) over a fixed number
    * of dims — the collect is O(dims), never O(corpus). Codes here are kept
    * as their decoded doubles for scoring; a serving deployment would store
    * the byte codes and decode in-register.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val dec = sq8Decoded(corpus)
    val q = broadcast(dec.join(queries.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"), col("dvec").as("qvec")))
    val scored = dec.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_raw",
        dot(col("dvec"), col("qvec")) / (norm(col("dvec")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** The SQ8 decode as a reusable (vec_id, dvec) projection: per-dim affine
    * 8-bit quantize-then-decode against corpus-wide extrema. The extrema
    * collect is O(dims) (min/max are aggregation-order-exact); the decode is
    * a narrow codegen'd column map.
    */
  private def sq8Decoded(corpus: DataFrame): DataFrame = {
    val mmRows = corpus
      .select(posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg(min(col("col").cast("double")).as("mn"), max(col("col").cast("double")).as("mx"))
      .orderBy("pos").collect()
    val mnLit = array(mmRows.map(r => lit(r.getDouble(1))): _*)
    val mxLit = array(mmRows.map(r => lit(r.getDouble(2))): _*)
    def decode(c: Column): Column = zip_with(c,
      sequence(lit(0), lit(mmRows.length - 1)),
      (x, i) => {
        val lo = element_at(mnLit, i + 1)
        val hi = element_at(mxLit, i + 1)
        when(hi === lo, lo).otherwise(
          lo + floor((x.cast("double") - lo) / (hi - lo) * lit(255.0) + lit(0.5)) / lit(255.0) * (hi - lo))
      })
    corpus.select(col("vec_id"), decode(col("embedding")).as("dvec"))
  }

  /** SQ8 × IVF — the true serving path: quantization solves MEMORY (4×
    * smaller vectors), IVF bucketing solves COMPUTE (a query ranks only its
    * probed buckets' candidates, never the corpus). Assignment/probing run
    * on the raw vectors (the build-time step); ranking runs on the decoded
    * SQ8 values, exact within the probed buckets — so the oracle is the IVF
    * candidate set scored with the SQ8 decode, reproducible in SQL. At
    * 100 TB the cross join of `sq8TopK` disappears: candidates come from a
    * uniform cent_id join, scores from per-bucket-sized work.
    */
  def sq8IvfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      centroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val refined = ivfCentroids(corpus, centroids)
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cent_id", nearestCentroidCol(col("embedding"), refined))
      .select(col("cent_id"), col("vec_id"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(refined.toDF("cent_id", "cvec"))
    val probed = {
      val scored = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .crossJoin(cents)
        .withColumn("cdist", dot(col("qvec"), col("cvec")) /
          (norm(col("qvec")) * norm(col("cvec"))))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("cent_id").asc)
      scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= nprobe)
        .select(col("cent_id"), col("query_id"))
    }
    val dec = sq8Decoded(corpus)
    val qdec = broadcast(dec.join(queries.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"), col("dvec").as("qvec")))
    val scored = assigned.join(broadcast(probed), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(dec, Seq("vec_id"))
      .join(qdec, Seq("query_id"))
      .withColumn("cosine_raw",
        dot(col("dvec"), col("qvec")) / (norm(col("dvec")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        (round(col("cosine_raw"), 4) + lit(0.0)).as("cosine"))
  }

  /** Exact cosine ranks of request-supplied query vectors against the WHOLE
    * corpus — the kNN retriever half of hybrid (RRF) search. Unlike
    * [[bruteForceTopK]] there is no self-exclusion: the query vector arrives
    * with the request (ES `knn.query_vector`), it is not a corpus row.
    * `queryVecs` is (query_id: string, qvec: array<float>); emits
    * (query_id, doc_id, knn_rank) for ranks ≤ `window`, doc_id being the
    * corpus `vec_id` (≡ the documents table's doc_id in the harness tables).
    *
    * Scale shape: queries broadcast, corpus streamed once; per-query rank is
    * a window over (query × corpus) rows partitioned by query_id — at real
    * scale the same statement swaps in the IVF candidate cut
    * ([[ivfTopK]]'s probed-bucket join) before the window without touching
    * the fusion contract downstream.
    */
  def cosineRanks(corpus: DataFrame, queryVecs: DataFrame, window: Int = 10): DataFrame =
    cosineScored(corpus, queryVecs, window).select("query_id", "doc_id", "knn_rank")

  /** [[cosineRanks]] keeping the raw cosine — the scored kNN leg the linear
    * (weighted-score) retriever normalizes; the ordered element fold keeps
    * it bit-identical to the oracle's `sum(x ORDER BY i)` cosine.
    */
  def cosineScored(corpus: DataFrame, queryVecs: DataFrame, window: Int = 10): DataFrame = {
    val q = broadcast(queryVecs.select(col("query_id"), col("qvec")))
    val scored = corpus.select(col("vec_id").cast("long").as("doc_id"), col("embedding"))
      .crossJoin(q)
      .withColumn("cosine_raw",
        dot(col("embedding"), col("qvec")) / (norm(col("embedding")) * norm(col("qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_raw").desc, col("doc_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= window)
      .select("query_id", "doc_id", "knn_rank", "cosine_raw")
  }
}
