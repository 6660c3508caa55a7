package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geo query/aggregation surface (ES `geo_bounding_box`, `geo_distance`,
  * `geotile_grid`) over the harness `events` table. The reference ships geo
  * documents through to Elasticsearch untouched and queries there
  * (/root/reference/monstache.go:46); here the three operators are
  * declarative Catalyst plans with DuckDB oracle twins.
  *
  * Coordinate discipline: the harness table carries no geo columns, so a
  * deterministic (lat, lon) in integer CENTI-DEGREES is derived per event
  * from `user_id` (hash-spread, pinned identically in the oracle SQL); a
  * real pipeline reads its own lat/lon columns and multiplies by 100. All
  * three operators then run on exact integer arithmetic — box compares,
  * squared planar distance, and tile floor-division — so every count is
  * bit-stable across engines. The distance predicate is the plate-carrée
  * (equirectangular) approximation pinned for oracle parity; swapping in
  * haversine at 100 TB changes one narrow projection, not the plan (same
  * narrow filter + one aggregation; ES itself offers `arc` vs `plane`).
  *
  * Scale shape: every operator is a narrow per-row derivation + one
  * aggregation keyed by (center|tile|type) — no joins against the corpus,
  * centers broadcast, result cardinality = centers or tiles.
  */
object Geo {

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Derived latitude in centi-degrees, [-9000, 9000]. */
  def centiLat: Column = (col("user_id") * 2654435761L) % 18001L - 9000L

  /** Derived longitude in centi-degrees, [-18000, 18000]. */
  def centiLon: Column = (col("user_id") * 40503L + 7L) % 36001L - 18000L

  /** The SQL-dialect twins of [[centiLat]]/[[centiLon]] (DuckDB `%` on
    * non-negative BIGINT operands matches Spark's).
    */
  val CentiLatSql = "(user_id * 2654435761) % 18001 - 9000"
  val CentiLonSql = "(user_id * 40503 + 7) % 36001 - 18000"

  /** geo_bounding_box (ES): events inside a lat/lon box, counted per
    * event_type. Box edges in centi-degrees; pure integer compares.
    */
  def boundingBox(ev: DataFrame, latLo: Long = -4500, latHi: Long = 4500,
      lonLo: Long = -9000, lonHi: Long = 9000): DataFrame =
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .filter(col("clat").between(latLo, latHi) && col("clon").between(lonLo, lonHi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))

  /** Fixed query centers (center_id, clat, clon, radius in centi-degrees) —
    * one equatorial, one mid-latitude, one near a pole (no wraparound in
    * the planar approximation; a haversine swap handles wrap natively).
    */
  val Centers: Seq[(String, Long, Long, Long)] = Seq(
    ("c_equator", 0L, 0L, 6000L),
    ("c_mid", 4500L, -9000L, 4000L),
    ("c_pole", 8000L, 15000L, 3000L))

  /** geo_distance (ES): events within each center's radius, counted per
    * center — squared planar distance in exact integer centi-degrees
    * against radius², centers broadcast, one narrow filter + aggregation.
    */
  def geoDistance(ev: DataFrame,
      centers: Seq[(String, Long, Long, Long)] = Centers): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val c = centers.toDF("center_id", "c_lat", "c_lon", "radius")
    val d2 = (col("clat") - col("c_lat")) * (col("clat") - col("c_lat")) +
      (col("clon") - col("c_lon")) * (col("clon") - col("c_lon"))
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .crossJoin(broadcast(c))
      .filter(d2 <= col("radius") * col("radius"))
      .groupBy("center_id")
      .agg(count(lit(1)).as("n_events"))
  }

  /** geo_distance AGGREGATION (ES): ring buckets per center — events
    * bucketed by distance band [0, r/2), [r/2, r), [r, 2r), counted per
    * (center, ring). Same exact-integer squared-distance discipline as
    * [[geoDistance]] (compare d² against the band edges squared, so no
    * sqrt anywhere); centers broadcast, one narrow derivation + one
    * aggregation, result cardinality = centers × 3 rings.
    */
  def distanceRings(ev: DataFrame,
      centers: Seq[(String, Long, Long, Long)] = Centers): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val c = centers.map { case (id, la, lo, r) => (id, la, lo, r, r / 2) }
      .toDF("center_id", "c_lat", "c_lon", "radius", "half")
    val d2 = (col("clat") - col("c_lat")) * (col("clat") - col("c_lat")) +
      (col("clon") - col("c_lon")) * (col("clon") - col("c_lon"))
    val half2 = col("half") * col("half")
    val r2 = col("radius") * col("radius")
    val twice2 = (col("radius") * 2) * (col("radius") * 2)
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .crossJoin(broadcast(c))
      .withColumn("d2", d2)
      .withColumn("ring",
        when(col("d2") < half2, 0)
          .when(col("d2") < r2, 1)
          .when(col("d2") < twice2, 2))
      .filter(col("ring").isNotNull)
      .groupBy("center_id", "ring")
      .agg(count(lit(1)).as("n_events"))
  }

  /** geotile_grid (ES, `precision` = zoom): events bucketed into a
    * 2^z × 2^z lat/lon grid (the rectangular analog of ES's web-mercator
    * tiles — same floor-division shape, no mercator projection so the tile
    * key stays exact integer), top-n tiles by count. Tile keys derive
    * per-row (narrow); one aggregation; a single window over ≤ 4^z tile
    * rows ranks the result.
    */
  /** geo_centroid (ES): per event_type, the arithmetic centroid of the
    * derived points — exact integer sums, one double division per output
    * row (ES computes the same running mean; arc-corrected centroids at
    * 100 TB swap the projection, not the plan).
    */
  def geoCentroid(ev: DataFrame): DataFrame =
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("clat")).as("sum_lat"), sum(col("clon")).as("sum_lon"))
      .select(col("event_type"), col("n_events"),
        (round(col("sum_lat").cast("double") / col("n_events") + lit(1.0e-9), 4) + lit(0.0)).as("centroid_lat"),
        (round(col("sum_lon").cast("double") / col("n_events") + lit(1.0e-9), 4) + lit(0.0)).as("centroid_lon"))

  /** geo_bounds (ES): the smallest lat/lon box containing each
    * event_type's points — exact integer min/max per axis, one narrow
    * derivation + one aggregation, result cardinality = event types.
    */
  def geoBounds(ev: DataFrame): DataFrame =
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("clat")).as("lat_lo"), max(col("clat")).as("lat_hi"),
        min(col("clon")).as("lon_lo"), max(col("clon")).as("lon_hi"))

  def geotileGrid(ev: DataFrame, zoom: Int = 4, n: Int = 10): DataFrame = {
    val cells = 1L << zoom
    val w = Window.orderBy(col("n_events").desc, col("tile_x").asc, col("tile_y").asc)
    ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .withColumn("tile_x", expr(s"((clon + 18000) * $cells) DIV 36001"))
      .withColumn("tile_y", expr(s"((clat + 9000) * $cells) DIV 18001"))
      .groupBy("tile_x", "tile_y")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select("rank", "tile_x", "tile_y", "n_events")
  }

  // ------------------------------------------------------- geohash_grid

  /** The geohash base-32 alphabet (public spec: Niemeyer's geohash). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash cell of the derived point at `precision` chars, computed in
    * EXACT integer arithmetic: quantize each axis to its bit budget
    * (precision 5 ⇒ 13 lon + 12 lat bits) with one integer floor-division,
    * interleave lon-first (the geohash spec), then base-32 the 5-bit
    * groups. The whole thing is a single codegen'd expression tree —
    * 25 shift/mask terms and `precision` table lookups, zero UDF — and the
    * oracle evaluates the same integer ops, so cells are bit-stable.
    */
  def geohashCell(precision: Int = 5): Column = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2 // lon gets the extra bit (spec)
    val latBits = totalBits / 2
    val lonQ = expr(s"((clon + 18000) * ${1L << lonBits}) DIV 36001")
    val latQ = expr(s"((clat + 9000) * ${1L << latBits}) DIV 18001")
    // interleaved bit 2j   ← lon bit j   (lon claims the MSB)
    // interleaved bit 2j+1 ← lat bit j
    val lonTerms = (0 until lonBits).map(j =>
      shiftleft(shiftright(lonQ, j).bitwiseAND(lit(1L)), 2 * j))
    val latTerms = (0 until latBits).map(j =>
      shiftleft(shiftright(latQ, j).bitwiseAND(lit(1L)), 2 * j + 1))
    val iv = (lonTerms ++ latTerms).reduce(_ + _)
    val chars = (0 until precision).map { i =>
      val shift = totalBits - 5 * (i + 1)
      lit(GeohashAlphabet).substr(
        (shiftright(iv, shift).bitwiseAND(lit(31L)) + lit(1L)).cast("int"), lit(1))
    }
    concat(chars: _*)
  }

  /** The DuckDB twin of [[geohashCell]] — the same quantization,
    * interleave, and base-32 grouping as integer `//`, `%`, and
    * substring arithmetic.
    */
  def geohashCellSql(precision: Int = 5): String = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val lonQ = s"(((clon + 18000) * ${1L << lonBits}) // 36001)"
    val latQ = s"(((clat + 9000) * ${1L << latBits}) // 18001)"
    val lonTerms = (0 until lonBits).map(j =>
      s"(($lonQ // ${1L << j}) % 2) * ${1L << (2 * j)}")
    val latTerms = (0 until latBits).map(j =>
      s"(($latQ // ${1L << j}) % 2) * ${1L << (2 * j + 1)}")
    val iv = (lonTerms ++ latTerms).mkString(" + ")
    val chars = (0 until precision).map { i =>
      val shift = totalBits - 5 * (i + 1)
      s"substr('$GeohashAlphabet', ((iv // ${1L << shift}) % 32 + 1)::INT, 1)"
    }
    s"SELECT *, ${chars.mkString(" || ")} AS geohash FROM (SELECT *, $iv AS iv FROM pts) ivt"
  }

  /** geohash_grid (ES): top-n geohash cells by event count — the
    * bucket-key sibling of [[geotileGrid]] with geohash keys instead of
    * z/x/y tiles. Narrow per-row derivation, one aggregation, one window
    * over ≤ 32^precision cell rows.
    */
  def geohashGrid(ev: DataFrame, precision: Int = 5, n: Int = 10): DataFrame = {
    // unlike geotile's ≤ 4^z cells, 32^precision can be millions: take the
    // top-n with TakeOrderedAndProject (distributed heap), THEN rank the n
    // survivors — no global single-partition window over the cell table
    val top = ev.withColumn("clat", centiLat).withColumn("clon", centiLon)
      .withColumn("geohash", geohashCell(precision))
      .groupBy("geohash")
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("geohash").asc)
      .limit(n)
    val w = Window.orderBy(col("n_events").desc, col("geohash").asc)
    top.withColumn("rank", row_number().over(w))
      .select("rank", "geohash", "n_events")
  }
}
