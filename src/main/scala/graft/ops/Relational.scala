package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's pipeline operators (SURVEY.md §2), re-expressed as
  * declarative Spark plans over the harness tables. Each maps to a cited
  * monstache behavior; each has an exact DuckDB SQL oracle in SparkEntry.
  */
object Relational {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** W1/X2 — external-version last-writer-wins dedup: keep each user's
    * latest event (version = ts, tie-break event_id desc), exactly
    * monstache's bulk-index versioning (`monstache.go:4053-4063`,
    * 409-conflict-ignore `monstache.go:568-571`).
    */
  def versionDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }

  /** F2/F3 — namespace include/exclude regex filters
    * (`monstache.go:1454-1462`, `monstache.go:1531-1539`): rlike include
    * minus rlike exclude, pushed down by Catalyst.
    */
  def namespaceFilter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .filter(col("event_type").rlike("^(click|view|purchase)$"))
      .filter(!col("event_type").rlike("^view$"))
      // + 0.0 normalizes IEEE -0.0 (a sum rounding to zero from below) to
      // +0.0, matching the `round(...) + 0.0` in the SQL oracle (DuckDB's
      // round preserves the sign; Spark's BigDecimal HALF_UP does not)
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        (round(sum("value"), 4) + lit(0.0)).as("total_value"))
      .orderBy("event_type")

  /** J1 — relate equi-join (`monstache.go:1221-1358`): the per-row point
    * lookups become one declared broadcast join (customer is the small
    * dimension side).
    */
  def relateJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 4).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** J2 — recursive relate (multi-hop BFS, `monstache.go:1225-1356`):
    * region → nation → customer as chained broadcast joins.
    */
  def relateTwoHop(spark: SparkSession, sfDir: String): DataFrame = {
    val region = t(spark, sfDir, "region")
    val nation = t(spark, sfDir, "nation")
    val customer = t(spark, sfDir, "customer")
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        (round(avg("c_acctbal") + lit(1.0e-9), 4) + lit(0.0)).as("avg_bal"))
      .orderBy("r_name")
  }

  /** has_child (ES parent-join): return PARENT docs (customers) having
    * between `minChildren` and `maxChildren` children (orders) matching the
    * child query (open status), with score_mode=sum over the children's
    * totalprice — the full min_children/max_children/score_mode surface the
    * plain relate join (J1) doesn't carry. Children aggregate first (the
    * big side shrinks to one row per parent), then one broadcast join
    * fetches parent fields — no parent-side shuffle at any scale.
    */
  def hasChild(spark: SparkSession, sfDir: String,
      minChildren: Int = 2, maxChildren: Int = 5): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_children"),
        round(sum("o_totalprice"), 4).as("child_score"))
      .filter(col("n_children").between(minChildren, maxChildren))
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_children"),
        col("child_score"))
  }

  /** has_parent (ES parent-join): return CHILD docs (orders) whose parent
    * (customer) matches the parent query — a broadcast semi-join, the
    * parent predicate never touching the child scan.
    */
  def hasParent(spark: SparkSession, sfDir: String,
      segment: String = "BUILDING", minBal: Double = 1000.0): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val parents = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === segment && col("c_acctbal") > minBal)
      .select(col("c_custkey"))
    orders.join(broadcast(parents), orders("o_custkey") === parents("c_custkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
  }

  /** inner_hits on the parent-join (ES `has_child` + `inner_hits`): the
    * matched PARENTS come back with their top-N matching children inlined.
    * Parents = [[hasChild]]'s bounded-children customers; inner hits = each
    * parent's top-2 open orders by totalprice (orderkey tie-break), emitted
    * flattened one row per (parent, child_rank). The per-parent window is
    * keyed by custkey — bounded fan-in per key (an ES parent's children
    * live in one shard the same way), never a global window.
    */
  def innerHits(spark: SparkSession, sfDir: String, perParent: Int = 2,
      minChildren: Int = 2, maxChildren: Int = 5): DataFrame = {
    val parents = hasChild(spark, sfDir, minChildren, maxChildren)
      .select(col("c_custkey"), col("n_children"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "O")
      .join(broadcast(parents), col("o_custkey") === col("c_custkey"))
      .withColumn("child_rank", row_number().over(w))
      .filter(col("child_rank") <= perParent)
      .select(col("c_custkey"), col("n_children"), col("child_rank"),
        col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
  }

  /** reverse_nested aggregation (ES): bucket the CHILD docs (orders, the
    * "nested" side of the parent-join fixture), then step back up and count
    * the distinct PARENT docs (customers) per bucket — the defining
    * reverse_nested semantic: a bucket's parent count can be far below its
    * child count when one parent holds many children. Open orders only
    * (query context). One aggregation keyed by the bucket; child and parent
    * counts come from the same pass (count vs count_distinct on the
    * parent key) — no join back to the parent table needed for counting.
    */
  def reverseNested(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_children"),
        count_distinct(col("o_custkey")).as("n_parents"))

  /** W3 — tombstone delete propagation: drop every order whose customer is
    * in the tombstone set (stateless delete via anti-join,
    * `monstache.go:4065-4147`). Tombstones: customers with negative balance.
    */
  def tombstoneAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val tombstones = t(spark, sfDir, "customer")
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
    orders.join(broadcast(tombstones), orders("o_custkey") === tombstones("c_custkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      .orderBy("o_orderstatus")
  }

  /** M6 — JSON-merge-patch history (`monstache.go:3084-3158`): batch analog
    * via lag() — per user, each event paired with its previous value, the
    * patch being the delta.
    */
  def patchHistory(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    t(spark, sfDir, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", round(col("value") - coalesce(col("prev_value"), lit(0.0)), 4) + lit(0.0))
      .select("user_id", "event_id", "event_type", "delta")
      .orderBy("user_id", "event_id")
  }

  /** W6 — time-machine dated index: every version appended to a
    * date-suffixed index (`monstache.go:3253-3291`) → date-partitioned
    * history counts.
    */
  def timeMachine(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("day", "event_type")

  /** Scalar — bit-packed external version `(t<<32)|ordinal`
    * (`monstache.go:4053-4063`): expressed with arithmetic so the oracle is
    * engine-agnostic (shiftleft(x,32) == x*2^32 for in-range values).
    */
  def bitpackVersions(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"),
        (unix_timestamp(col("ts")) * lit(4294967296L) + pmod(col("event_id"), lit(4294967296L)))
          .as("version"))
      .orderBy("event_id")

  /** T1 — sort+limit with deterministic tie-break (`monstache.go:3760-3785`):
    * Catalyst plans this as TakeOrderedAndProject (per-partition heaps, no
    * global sort).
    */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("o_totalprice"))

  /** F8 — worker partition filter (`monstache.go:4761-4769`): consistent
    * hash of the doc key → keep this worker's share. Hash is md5-derived so
    * the DuckDB oracle reproduces it bit-for-bit (Spark's xxhash64 has no
    * DuckDB twin); in production this IS Spark's shuffle partitioning.
    */
  def workerPartition(spark: SparkSession, sfDir: String, workers: Int = 8, worker: Int = 3): DataFrame =
    t(spark, sfDir, "documents")
      .withColumn("whash",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint"),
          lit(workers.toLong)))
      .filter(col("whash") === worker)
      .select(col("doc_id"), col("whash"))
      .orderBy("doc_id")

  /** P2/M1 — dot-path field extraction from the schemaless props JSON
    * (`monstache.go:1112-1138`): get_json_object ≡ json_extract_string.
    */
  def jsonPath(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(col("k").cast("int"))

  /** F9 — invalid-value pruning (`monstache.go:878-950`): drop NaN/±Inf
    * values and out-of-range dates before indexing.
    */
  def invalidPrune(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity &&
        year(col("ts")).between(0, 9999))
      .agg(count(lit(1)).as("n_valid"), (round(sum("value"), 4) + lit(0.0)).as("sum_valid"))

  /** M4 — canonical type encoding (`monstachemap/encoding.go:13,27-82`):
    * the observable output formats of every indexed doc —
    *   Time → fixed `2006-01-02T15:04:05.000Z07:00` layout (millis, UTC);
    *   Binary subtype 3/4 (UUID) → dashed hex 8-4-4-4-12;
    *   other Binary → base64;
    *   Decimal128 → decimal string, NaN/Inf → null.
    * Exercised over `events`: a deterministic 16-byte binary is derived per
    * row (md5 of the event id) so both UUID and base64 branches run on real
    * bytes; the decimal branch runs on the double `value` incl. its NaN/Inf
    * rows. All pure column expressions (codegen'd).
    */
  def canonicalEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val hx = md5(col("event_id").cast("string")) // 32 lowercase hex chars
    val uuid = concat_ws("-",
      substring(hx, 1, 8), substring(hx, 9, 4), substring(hx, 13, 4),
      substring(hx, 17, 4), substring(hx, 21, 12))
    t(spark, sfDir, "events")
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("time_canonical"),
        uuid.as("uuid_canonical"),
        base64(unhex(hx)).as("bin_base64"),
        when(isnan(col("value")) ||
          col("value") === Double.PositiveInfinity ||
          col("value") === Double.NegativeInfinity, lit(null))
          .otherwise(col("value").cast("decimal(38,6)").cast("string"))
          .as("decimal_canonical"))
      .orderBy("event_id")
  }

  /** M6 — RFC-7386 JSON merge patch between consecutive versions per key
    * (`monstache.go:3084-3158`): each user's event stream is a document
    * history {k?, type}; the patch holds exactly the changed members, with
    * member REMOVAL encoded as null (k is absent whenever k % 10 == 0, so
    * the null-removal rule is exercised). First version's patch is the full
    * document. Serialization is canonical: members in key order.
    */
  def mergePatch(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val ev = t(spark, sfDir, "events")
      .withColumn("k_raw", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("curK", when(pmod(col("k_raw"), lit(10)) =!= 0, col("k_raw")))
      .withColumn("curT", col("event_type"))
      .withColumn("prevK", lag(col("curK"), 1).over(w))
      .withColumn("prevT", lag(col("curT"), 1).over(w))
      .withColumn("hasPrev", lag(col("event_id"), 1).over(w).isNotNull)
    val kEntry =
      when(!col("hasPrev"),
        when(col("curK").isNotNull, concat(lit("\"k\":"), col("curK").cast("string"))))
      .otherwise(
        when(col("curK").isNotNull && (col("prevK").isNull || col("prevK") =!= col("curK")),
          concat(lit("\"k\":"), col("curK").cast("string")))
        .when(col("curK").isNull && col("prevK").isNotNull, lit("\"k\":null")))
    val tEntry =
      when(!col("hasPrev") || col("prevT") =!= col("curT"),
        concat(lit("\"type\":\""), col("curT"), lit("\"")))
    ev.select(col("user_id"), col("event_id"),
        concat(lit("{"), concat_ws(",", kEntry, tEntry), lit("}")).as("patch"))
      .orderBy("user_id", "event_id")
  }

  /** ES `exists` query over the optional-member document model this corpus
    * pins in [[mergePatch]] (member `k` is absent whenever k % 10 == 0,
    * RFC-7386 removal-as-null): docs whose field IS present vs the missing
    * complement, counted per event_type — field presence, not value truth,
    * which is exactly ES's `exists` contract. Narrow derivation + one
    * aggregation.
    */
  def existsQuery(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("k_raw", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("has_k", pmod(col("k_raw"), lit(10)) =!= 0)
      .groupBy("event_type")
      .agg(sum(when(col("has_k"), 1L).otherwise(0L)).as("n_exists"),
        sum(when(!col("has_k"), 1L).otherwise(0L)).as("n_missing"))

  /** `mapIndex`-style namespace→index routing (`monstache.go:802-813`):
    * per-namespace output remapping with a passthrough default.
    */
  def indexRouting(spark: SparkSession, sfDir: String,
      rules: Map[String, String] = Map("click" -> "idx_clicks", "view" -> "idx_views")): DataFrame = {
    val routed = rules.foldLeft(concat(lit("idx_"), col("event_type"))) {
      case (acc, (ns, idx)) => when(col("event_type") === ns, lit(idx)).otherwise(acc)
    }
    t(spark, sfDir, "events")
      .withColumn("target_index", routed)
      .groupBy("target_index").agg(count(lit(1)).as("n"))
      .orderBy("target_index")
  }
}
