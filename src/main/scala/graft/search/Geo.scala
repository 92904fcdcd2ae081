package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LatLonPoint analogue (`/root/reference/core/document/latlon.go:19`):
  * geo points as two doc-values columns, queried by bounding box and by
  * distance. Spark-first mapping of Lucene's two-phase geo search:
  *
  *  - the BOX predicate is a pair of codegen'd range comparisons that push
  *    to the parquet scan (the BKD tree's cell-pruning role — row groups
  *    whose lat/lon min/max miss the box are skipped);
  *  - the DISTANCE query runs box-first (a bounding box that encloses the
  *    radius circle prunes the scan), then the exact haversine — built from
  *    Spark's native sin/cos/asin Column functions, whole-stage codegen,
  *    no UDF — confirms, exactly Lucene's approximate-then-verify shape.
  *
  * Longitude boxes crossing the antimeridian split into two disjuncts, as
  * Lucene does.
  */
object Geo {
  val EarthRadiusKm: Double = 6371.0088 // IUGG mean Earth radius

  /** Inclusive bounding-box predicate; handles dateline-crossing boxes
    * (minLon > maxLon => two-range disjunction). */
  def inBox(lat: Column, lon: Column,
            minLat: Double, maxLat: Double, minLon: Double, maxLon: Double): Column = {
    val latOk = lat >= minLat && lat <= maxLat
    val lonOk =
      if (minLon <= maxLon) lon >= minLon && lon <= maxLon
      else (lon >= minLon && lon <= 180.0) || (lon >= -180.0 && lon <= maxLon)
    latOk && lonOk
  }

  /** Great-circle distance in km (haversine), as a codegen'd Column. */
  def haversineKm(lat: Column, lon: Column, lat2: Double, lon2: Double): Column = {
    val dLat = radians(lat) - lit(math.toRadians(lat2))
    val dLon = radians(lon) - lit(math.toRadians(lon2))
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat)) * lit(math.cos(math.toRadians(lat2))) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** A latitude/longitude box that encloses the radius circle — the cheap
    * prefilter (distance-per-degree of longitude shrinks with cos(lat);
    * near the poles the box degenerates to the full longitude range). */
  private def circleBox(lat: Double, lon: Double, radiusKm: Double): (Double, Double, Double, Double) = {
    val dLat = math.toDegrees(radiusKm / EarthRadiusKm)
    val minLat = math.max(-90.0, lat - dLat)
    val maxLat = math.min(90.0, lat + dLat)
    val cosLat = math.cos(math.toRadians(math.min(89.9999, math.abs(lat) + dLat)))
    if (cosLat <= 1e-9 || minLat <= -90.0 + 1e-9 || maxLat >= 90.0 - 1e-9)
      (minLat, maxLat, -180.0, 180.0)
    else {
      val dLon = math.toDegrees(radiusKm / (EarthRadiusKm * cosLat))
      if (dLon >= 180.0) (minLat, maxLat, -180.0, 180.0)
      else {
        // normalize to [-180, 180]; a crossing becomes minLon > maxLon
        def norm(x: Double): Double = { val y = (x + 540.0) % 360.0 - 180.0; y }
        (minLat, maxLat, norm(lon - dLon), norm(lon + dLon))
      }
    }
  }

  /** Docs within `radiusKm` of (lat2, lon2): box prefilter (scan pushdown)
    * then exact haversine; returns rows + a `dist_km` column. */
  def withinDistance(df: DataFrame, latCol: String, lonCol: String,
                     lat2: Double, lon2: Double, radiusKm: Double): DataFrame = {
    val (a, b, c, d) = circleBox(lat2, lon2, radiusKm)
    val dist = haversineKm(col(latCol), col(lonCol), lat2, lon2)
    df.where(inBox(col(latCol), col(lonCol), a, b, c, d))
      .withColumn("dist_km", dist)
      .where(col("dist_km") <= radiusKm)
  }

  /** k nearest docs to (lat2, lon2), with expanding-ring pruning (the role
    * of LatLonPoint's best-first BKD traversal in `nearest`): probe
    * [[circleBox]] rings of growing radius — each probe a BOX-PRUNED scan —
    * until a ring holds >= k confirmed hits. Soundness: `withinDistance`
    * keeps only dist <= r, so >= k hits mean the k-th distance is <= r,
    * and every point outside box(r) is farther than r — the ring's top-k
    * IS the global top-k. A k-NN over 10^12 points therefore evaluates
    * haversine only inside the winning ring's box instead of everywhere;
    * rings that cover the planet degrade to the exhaustive scan
    * ([[nearestExhaustive]]).
    */
  def nearest(df: DataFrame, latCol: String, lonCol: String,
              lat2: Double, lon2: Double, k: Int, idCol: String,
              initialRadiusKm: Double = 25.0): DataFrame = {
    var r = math.max(1e-3, initialRadiusKm)
    // half the Earth's circumference bounds every great-circle distance;
    // past it the box is the whole planet and probing adds nothing
    val maxR = math.Pi * EarthRadiusKm
    // ranking is by 6dp-ROUNDED distance then id, so a doc just OUTSIDE
    // the ring could tie a doc at the boundary after rounding and win on
    // id. Accepting a ring only when k hits sit at least two rounding
    // quanta INSIDE it guarantees every outside doc rounds strictly above
    // the k-th hit — the ring's top-k is then the global top-k under the
    // exact tie-break, not just up to boundary ties.
    val margin = 2e-6
    while (r < maxR) {
      val ring = withinDistance(df, latCol, lonCol, lat2, lon2, r)
      if (ring.where(col("dist_km") <= r - margin).limit(k).count() >= k)
        return ring.orderBy(round(col("dist_km"), 6).asc, col(idCol).asc).limit(k)
      r *= 4
    }
    nearestExhaustive(df, latCol, lonCol, lat2, lon2, k, idCol)
  }

  /** Unpruned k-nearest — haversine over every row, TakeOrderedAndProject
    * bounded heap. The correctness reference for [[nearest]] and the
    * fallback when the rings exhaust the planet (k close to |corpus|). */
  def nearestExhaustive(df: DataFrame, latCol: String, lonCol: String,
                        lat2: Double, lon2: Double, k: Int, idCol: String): DataFrame =
    df.withColumn("dist_km", haversineKm(col(latCol), col(lonCol), lat2, lon2))
      .orderBy(round(col("dist_km"), 6).asc, col(idCol).asc)
      .limit(k)
}
