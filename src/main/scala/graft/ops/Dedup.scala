package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation at scale:
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes (100 TB): every variant below is shuffle-bounded by
  * (a) hashing the *document key* (uniform — exact dedup), or
  * (b) exploding to shingle/band keys whose cardinality grows with the
  * corpus (uniform-ish) — candidate generation joins on band buckets, never
  * an all-pairs product. Head shingles (ubiquitous n-grams) are the skew
  * risk: `shingles` drops the top-frequency shingles above
  * `maxShingleDf` before the pair join, the standard stopword-shingle cut.
  */
object Dedup {

  /** Exact duplicate groups by content hash. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** Token n-gram shingles, distinct per doc. Docs with fewer than n tokens
    * contribute nothing — the guard runs BEFORE the index sequence is built
    * (sequence(0, size-n) with size < n would produce a descending range and
    * slice() would throw at runtime on short/symbol-only docs).
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = col("toks")
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .filter(size(toks) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))).as("shingle"))
      .filter(size(split(col("shingle"), " ")) === n)
      .distinct()
  }

  /** N-gram Jaccard near-duplicate pairs: candidate pairs share >=1 shingle
    * (bucket join on shingle), Jaccard = |A∩B| / (|A|+|B|-|A∩B|) computed
    * from shingle-set sizes — no pairwise cross product.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.5,
      maxShingleDf: Long = 1000L): DataFrame = {
    val sh = shingles(docs, n)
    // drop ubiquitous shingles (skew guard, analog of head-term salting)
    val rare = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("sdf"))
        .filter(col("sdf") <= maxShingleDf && col("sdf") >= 2),
      Seq("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val a = rare.select(col("shingle"), col("doc_id").as("id_a"))
    val b = rare.select(col("shingle"), col("doc_id").as("id_b"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("set_size", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("set_size", "size_b"), Seq("id_b"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double") + lit(1.0e-9), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
  }

  /** Span-level (chunk) dedup, C4-style: the corpus is cut into
    * non-overlapping `w`-token chunks; a chunk occurrence survives iff it is
    * the FIRST occurrence of that chunk text corpus-wide (first = lowest
    * (doc_id, chunk_idx)). Returns per-doc counts: total chunks, duplicated
    * chunks (text seen elsewhere), kept chunks, and kept token mass — the
    * inputs to a duplicate-span removal pass.
    *
    * Scale shape: chunking is a NARROW transform over the token array (no
    * per-token shuffle); the only shuffle is the groupBy on the chunk hash,
    * whose key cardinality grows with the corpus (uniform md5 keys, no head
    * skew — unlike shingles, chunks are position-anchored so a stop-phrase
    * cannot dominate a bucket).
    */
  def chunkDedup(docs: DataFrame, w: Int = 10): DataFrame = {
    val toks = col("toks")
    val nChunks = ((size(toks) + lit(w - 1)) / lit(w)).cast("int")
    val chunks = docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .filter(size(toks) > 0) // guard BEFORE sequence() — empty docs contribute nothing
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), nChunks - 1),
          i => struct(
            concat_ws(" ", slice(toks, i * w + 1, lit(w))).as("chunk"),
            size(slice(toks, i * w + 1, lit(w))).cast("bigint").as("chunk_toks")))))
      .select(col("doc_id"), col("pos").cast("bigint").as("chunk_idx"),
        md5(col("col.chunk")).as("chunk_hash"), col("col.chunk_toks").as("chunk_toks"))
    val w1 = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
    chunks
      .withColumn("occ", count(lit(1)).over(w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("first", row_number().over(w1) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("first"), 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(col("first"), col("chunk_toks")).otherwise(0L)).as("kept_tokens"))
  }

  /** A deterministic 32-bit-ish hash family over strings, built from md5 so
    * the DuckDB oracle can reproduce it exactly:
    * h_i(s) = first 8 hex digits of md5(i || ':' || s) as a BIGINT.
    */
  def md5Hash(c: Column, i: Int): Column =
    conv(substring(md5(concat(lit(i.toString), lit(":"), c)), 1, 8), 16, 10).cast("bigint")

  /** MinHash signatures: k independent permutation-approximating hashes,
    * min over the doc's shingle set. Signature as k columns, banded for LSH.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 8): DataFrame = {
    val sh = shingles(docs, n)
    val aggs = (0 until k).map(i => min(md5Hash(col("shingle"), i)).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: band the k-hash signature into `bands`
    * bands of `k/bands` rows; docs sharing any band bucket are candidates;
    * verified candidates carry the estimated Jaccard (signature agreement).
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs, n, k).cache()
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*).as("key"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = buckets.alias("x").join(buckets.alias("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    // verify: fraction of agreeing minhashes estimates Jaccard
    val agree = (0 until k).map(i =>
      when(col(s"a.mh_$i") === col(s"b.mh_$i"), 1).otherwise(0)).reduce(_ + _)
    cand
      .join(sig.alias("a"), col("id_a") === col("a.doc_id"))
      .join(sig.alias("b"), col("id_b") === col("b.doc_id"))
      .withColumn("est_jaccard", round(agree.cast("double") / k, 4))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash: 64-bit signature; bit j = sign of Σ_terms tf · (±1 per bit of
    * h(term)). Near-dups = signatures within `maxHamming`. The term hash is
    * the first 8 bytes of md5(term) (big-endian) so the DuckDB oracle
    * reproduces signatures bit-for-bit. Implemented with typed
    * mapPartitions over per-doc term vectors (bit-twiddling does not belong
    * in Catalyst).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[(Long, Long)]
    docs.select(col("doc_id").cast("long"), col("text"))
      .as(Encoders.product[(Long, String)])
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, text) =>
          val tfs = graft.textprep.TextPrep.termFreqs(text)
          val acc = new Array[Int](64)
          tfs.foreach { case (term, tf) =>
            val h = md5Hash64(md, term)
            var j = 0
            while (j < 64) {
              if (((h >>> j) & 1L) == 1L) acc(j) += tf else acc(j) -= tf
              j += 1
            }
          }
          var sig = 0L
          var j = 0
          while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
          (docId, sig)
        }
      }.toDF("doc_id", "simhash")
  }

  /** Candidate generation by `maxHamming + 1` disjoint bands over the
    * 64-bit signature: by pigeonhole, two signatures within Hamming
    * distance h must agree on at least one of h+1 disjoint bands — recall
    * is COMPLETE at the configured radius (a fixed band count with a larger
    * radius would silently miss pairs). 64 must divide evenly; supported
    * radii: 0, 1, 3, 7, 15, 31.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(64 % bands == 0,
      s"simhash banding needs (maxHamming+1) | 64, got maxHamming=$maxHamming")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val sig = simhashSignatures(docs).cache()
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.alias("x").join(banded.alias("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("sig_a"), col("y.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Connected components over a near-duplicate pair graph — the clustering
    * step that turns pairwise LSH hits into keep-one-per-cluster decisions.
    * Input: (id_a, id_b) edges. Output: (doc_id, cluster) where cluster is
    * the minimum doc_id reachable in the component, for every doc that
    * appears in at least one edge.
    *
    * Algorithm: iterative min-label propagation to a fixpoint. Each round is
    * ONE shuffle keyed by uniform doc ids (edges join labels, groupBy min);
    * convergence is detected by a scalar sum(label) aggregate — labels only
    * decrease, so an unchanged sum IS the fixpoint; nothing is collected.
    * `localCheckpoint` truncates the growing lineage each round. Rounds =
    * component diameter; near-dup graphs are overwhelmingly tiny cliques
    * (diameter ≤ ~3), so this beats the O(log n)-round large-star/small-star
    * scheme (Kiveris et al., SoCC'14) in practice while staying a drop-in
    * upgrade path if a corpus ever produces long chains.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 200,
      strict: Boolean = true): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint()
      var curSum = labels.agg(sum(col("label"))).head().getLong(0)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        val nbrMin = sym.join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("nbr_label")).as("nbr"))
        val next = labels
          .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
          .select(col("id"), least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
          .localCheckpoint()
        val nextSum = next.agg(sum(col("label"))).head().getLong(0)
        converged = nextSum == curSum
        labels = next
        curSum = nextSum
        iter += 1
      }
      // A component with diameter > maxIters (a pathological long chain):
      // strict mode (the default — every oracle-parity path) FAILS FAST so
      // a silently over-segmented clustering can never diverge from the
      // exact answer downstream; strict=false degrades to the partial
      // labels, which are a consistent OVER-segmentation (every label is a
      // reachable minimum, so components are only split finer, never
      // merged). The large-star/small-star scheme (Kiveris et al.,
      // SoCC'14; O(log n) rounds) is the upgrade path if a corpus ever
      // hits this in practice.
      if (!converged) {
        val msg = s"[dedup] connectedComponents did not reach a fixpoint in " +
          s"$maxIters rounds; labels would be over-segmented. A diameter this " +
          "large suggests switching to large-star/small-star."
        if (strict) throw new IllegalStateException(msg)
        else System.err.println(msg + " Returning partial labels (strict=false).")
      }
      labels.select(col("id").as("doc_id"), col("label").as("cluster"))
    } finally sym.unpersist()
  }

  /** URL canonicalization: lowercase, strip scheme, leading `www.`, query
    * string / fragment, and trailing slashes. A pure codegen'd column
    * expression (no UDF) — usable in any pipeline stage.
    */
  def normalizeUrl(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), "^[a-z]+://", ""),
          "^www[.]", ""),
        "[?#].*$", ""),
      "/+$", "")

  /** URL-level dedup: group by canonical URL, keep the lowest doc_id.
    * Uniform hash keys (canonical URLs), one shuffle.
    */
  def urlDedup(pages: DataFrame, urlCol: String = "url"): DataFrame =
    pages.groupBy(normalizeUrl(col(urlCol)).as("norm_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** First 8 bytes of md5(s), big-endian — identical to DuckDB's
    * ('0x' || substr(md5(s), 1, 16))::UBIGINT bit pattern.
    */
  private def md5Hash64(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }
}
