package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** contrib/Spatial analog (/root/reference/src/contrib/Spatial/): point
  * indexing + spatial query operations over lat/lon columns.
  *
  * The reference's strategies map as:
  *  - PointVectorStrategy (Vector/PointVectorStrategy.cs — two numeric
  *    fields x/y, queries are NumericRangeQuery conjunctions + an optional
  *    exact distance refine): here the lat/lon columns ARE the two fields;
  *    bbox ops are plain range predicates that reach the Parquet scan.
  *  - QuadPrefixTree / RecursivePrefixTreeFilter (Prefix/Tree/
  *    QuadPrefixTree.cs, Prefix/RecursivePrefixTreeFilter.cs — world
  *    recursively quartered, a shape is filtered by the union of covering
  *    cells, then refined): here a cell at `level` is the integer pair
  *    (floor-scaled lon, lat); covering cells of a bbox are the x/y cell
  *    RANGES, so the filter is two BETWEENs on the materialized cell
  *    columns — Parquet min/max row-group pruning replaces the term-index
  *    walk when the table is written sorted by cell (writeIndexed).
  *  - SpatialOperation (Queries/SpatialOperation.cs): for point data
  *    Intersects == IsWithin (a point intersects a shape iff it is within
  *    it); IsDisjointTo is the complement (PointVectorStrategy.MakeDisjoint).
  *  - MakeDistanceValueSource / MakeRecipDistanceValueSource
  *    (SpatialStrategy.cs:135-143): distance in km, and c/(d+c) with
  *    c = 0.1 * half the bbox diagonal.
  *
  * Distances are great-circle haversine in km over the mean earth radius
  * (spatial4j DistanceUtils.EARTH_MEAN_RADIUS_KM); all column math is
  * native Catalyst — no UDFs anywhere, every predicate pushes down.
  */
object Spatial {

  val EarthMeanRadiusKm: Double = 6371.0087714

  /** Great-circle distance in km (haversine), pure column arithmetic:
    * 2R * asin(sqrt(sin^2(dLat/2) + cos(lat1) cos(lat2) sin^2(dLon/2))). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthMeanRadiusKm) * asin(sqrt(a))
  }

  // ------------------------------------------------------------ quad cells

  /** Cells per axis at `level`: the world quartered `level` times
    * (QuadPrefixTree levelS — side = 2^level). */
  def cellsPerAxis(level: Int): Long = 1L << level

  /** Integer quad-cell coordinates of a point at `level` (x from lon, y
    * from lat), clamped so +90/+180 land in the last cell. */
  def cellX(lon: Column, level: Int): Column = {
    val n = cellsPerAxis(level)
    least(floor((lon + 180.0) / 360.0 * n).cast("long"), lit(n - 1))
  }
  def cellY(lat: Column, level: Int): Column = {
    val n = cellsPerAxis(level)
    least(floor((lat + 90.0) / 180.0 * n).cast("long"), lit(n - 1))
  }

  /** Covering cell ranges of a bbox at `level` (driver-side, the
    * RecursivePrefixTreeFilter cell union — for an axis-aligned box the
    * union is exactly the x and y index ranges). */
  def coveringRanges(minLat: Double, maxLat: Double, minLon: Double,
                     maxLon: Double, level: Int): ((Long, Long), (Long, Long)) = {
    val n = cellsPerAxis(level)
    def cx(lon: Double) = math.min(((lon + 180.0) / 360.0 * n).toLong, n - 1)
    def cy(lat: Double) = math.min(((lat + 90.0) / 180.0 * n).toLong, n - 1)
    ((cx(minLon), cx(maxLon)), (cy(minLat), cy(maxLat)))
  }

  /** Materialize cell columns (CreateIndexableFields analog). */
  def withCells(df: DataFrame, latCol: String, lonCol: String,
                level: Int): DataFrame =
    df.withColumn("cell_x", cellX(col(lonCol), level))
      .withColumn("cell_y", cellY(col(latCol), level))

  /** Write a point table sorted by cell (z-ish: y-major then x) so that
    * bbox/cell predicates prune Parquet row groups — the columnar
    * re-expression of the prefix-tree term index. */
  def writeIndexed(df: DataFrame, latCol: String, lonCol: String, level: Int,
                   path: String): Unit =
    withCells(df, latCol, lonCol, level)
      .repartitionByRange(col("cell_y"), col("cell_x"))
      .sortWithinPartitions("cell_y", "cell_x")
      .write.mode("overwrite").parquet(path)

  // ------------------------------------------------------------ operations

  /** IsWithin / Intersects for points: plain range predicates (
    * PointVectorStrategy.MakeWithin — two NumericRangeQueries ANDed).
    * Inclusive bounds like NumericRangeQuery(min,max,true,true). */
  def bboxFilter(df: DataFrame, latCol: String, lonCol: String,
                 minLat: Double, maxLat: Double,
                 minLon: Double, maxLon: Double): DataFrame =
    df.filter(col(latCol) >= minLat && col(latCol) <= maxLat &&
      col(lonCol) >= minLon && col(lonCol) <= maxLon)

  /** IsDisjointTo: the complement (PointVectorStrategy.MakeDisjoint). */
  def disjointFilter(df: DataFrame, latCol: String, lonCol: String,
                     minLat: Double, maxLat: Double,
                     minLon: Double, maxLon: Double): DataFrame =
    df.filter(!(col(latCol) >= minLat && col(latCol) <= maxLat &&
      col(lonCol) >= minLon && col(lonCol) <= maxLon))

  /** Prefix-tree path: prune by covering cell ranges at `level` (row-group
    * prunable on a cell-materialized table), then refine exactly — the
    * RecursivePrefixTreeFilter covering-union + PointPrefixTreeFieldCache
    * refine, as two pushed BETWEENs + the exact predicate. `df` must carry
    * cell_x/cell_y (withCells / writeIndexed output). */
  def cellBboxFilter(df: DataFrame, latCol: String, lonCol: String,
                     minLat: Double, maxLat: Double,
                     minLon: Double, maxLon: Double, level: Int): DataFrame = {
    val ((x0, x1), (y0, y1)) = coveringRanges(minLat, maxLat, minLon, maxLon, level)
    val pruned = df.filter(col("cell_x").between(x0, x1) &&
      col("cell_y").between(y0, y1))
    bboxFilter(pruned, latCol, lonCol, minLat, maxLat, minLon, maxLon)
  }

  /** Circle Intersects: bounding-box prune first (pushed-down ranges — the
    * lon band widens with latitude, clamped at the poles), then the exact
    * haversine refine (PointVectorStrategy.MakeQuery Circle branch:
    * bbox query + ValueSourceFilter distance refine). Adds `distKm`. */
  def distanceFilter(df: DataFrame, latCol: String, lonCol: String,
                     lat: Double, lon: Double, radiusKm: Double): DataFrame = {
    val latDelta = math.toDegrees(radiusKm / EarthMeanRadiusKm)
    val minLat = math.max(-90.0, lat - latDelta)
    val maxLat = math.min(90.0, lat + latDelta)
    // the highest-|lat| parallel in the band has the smallest cosine and
    // therefore needs the widest lon delta — that bounds the whole circle
    val widestLat = math.max(math.abs(minLat), math.abs(maxLat))
    val cosW = math.cos(math.toRadians(widestLat))
    // lon band, dateline-aware: a band crossing +-180 becomes TWO pushed
    // ranges (the geohash/quad world is cyclic in x; Parquet min/max stats
    // prune each range independently)
    val lonPred: Column =
      if (cosW <= 1e-9) lit(true)
      else {
        val d = math.toDegrees(radiusKm / (EarthMeanRadiusKm * cosW))
        if (d >= 180.0) lit(true)
        else {
          val lo = lon - d; val hi = lon + d
          if (lo < -180.0) col(lonCol) >= lo + 360.0 || col(lonCol) <= hi
          else if (hi > 180.0) col(lonCol) >= lo || col(lonCol) <= hi - 360.0
          else col(lonCol) >= lo && col(lonCol) <= hi
        }
      }
    val pruned = df.filter(col(latCol) >= minLat && col(latCol) <= maxLat && lonPred)
    pruned.withColumn("distKm",
        haversineKm(col(latCol), col(lonCol), lit(lat), lit(lon)))
      .filter(col("distKm") < radiusKm)
  }

  /** Distance value source (Vector/DistanceValueSource.cs): km to the query
    * point, for scoring/sorting. */
  def distanceValueSource(latCol: String, lonCol: String,
                          lat: Double, lon: Double): Column =
    haversineKm(col(latCol), col(lonCol), lit(lat), lit(lon))

  /** MakeRecipDistanceValueSource (SpatialStrategy.cs:135-143): c/(d+c),
    * c = 0.1 * (half the query bbox diagonal) — 1 at the center, ~0.1 at
    * the farthest edge. */
  def recipDistance(dist: Column, minLat: Double, maxLat: Double,
                    minLon: Double, maxLon: Double): Column = {
    val diagonal = haversineDouble(minLat, minLon, maxLat, maxLon)
    val c = diagonal * 0.5 * 0.1
    lit(c) / (dist + c)
  }

  /** Driver-side haversine twin (same formula/op order as the column). */
  def haversineDouble(lat1: Double, lon1: Double,
                      lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2.0
    val dLon = math.toRadians(lon2 - lon1) / 2.0
    val a = math.pow(math.sin(dLat), 2.0) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon), 2.0)
    2.0 * EarthMeanRadiusKm * math.asin(math.sqrt(a))
  }

  // ------------------------------------------------- BBoxStrategy (rects)

  /** A query rectangle (BBox/BBoxStrategy.cs stores minX/maxX/minY/maxY per
    * doc; here those are four numeric columns). Indexed rectangles are
    * stored non-dateline-crossing (split crossing rects into two rows at
    * write time) — the reference's XDL flag machinery then reduces to the
    * plain interval algebra below. */
  final case class Rect(minLat: Double, maxLat: Double,
                        minLon: Double, maxLon: Double)

  /** Rectangle relation predicates over (minLat,maxLat,minLon,maxLon)
    * columns — BBoxStrategy.MakeIntersects/MakeWithin/MakeContains/
    * MakeEquals/MakeDisjoint as pushed-down range conjunctions. */
  object BBox {
    private val (tMinLat, tMaxLat, tMinLon, tMaxLon) =
      (col("minLat"), col("maxLat"), col("minLon"), col("maxLon"))

    def intersects(q: Rect): Column =
      tMinLon <= q.maxLon && tMaxLon >= q.minLon &&
        tMinLat <= q.maxLat && tMaxLat >= q.minLat

    /** Target IsWithin the query box. */
    def within(q: Rect): Column =
      tMinLon >= q.minLon && tMaxLon <= q.maxLon &&
        tMinLat >= q.minLat && tMaxLat <= q.maxLat

    /** Target Contains the query box. */
    def containsBox(q: Rect): Column =
      tMinLon <= q.minLon && tMaxLon >= q.maxLon &&
        tMinLat <= q.minLat && tMaxLat >= q.maxLat

    def equalsBox(q: Rect): Column =
      tMinLon === q.minLon && tMaxLon === q.maxLon &&
        tMinLat === q.minLat && tMaxLat === q.maxLat

    def disjoint(q: Rect): Column = !intersects(q)

    /** AreaSimilarity.Score (BBox/AreaSimilarity.cs:86-176, non-XDL arm):
      * height/width of the intersection; when both positive,
      * pow(iArea/qArea, queryPower) * pow(iArea/tArea, targetPower) * 10000
      * (defaults 2.0 / 0.5); else 0. */
    def areaScore(q: Rect, queryPower: Double = 2.0,
                  targetPower: Double = 0.5): Column = {
      val qArea = math.abs(q.maxLon - q.minLon) * math.abs(q.maxLat - q.minLat)
      val height = least(lit(q.maxLat), tMaxLat) - greatest(lit(q.minLat), tMinLat)
      val width = least(lit(q.maxLon), tMaxLon) - greatest(lit(q.minLon), tMinLon)
      val tArea = (tMaxLon - tMinLon) * (tMaxLat - tMinLat)
      val iArea = width * height
      when(width > 0d && height > 0d && tArea > 0d && lit(qArea) > 0d,
        pow(iArea / qArea, queryPower) * pow(iArea / tArea, targetPower) * 10000.0)
        .otherwise(0d)
    }
  }

  /** Nearest-k by great-circle distance: distance column + driver-ranked
    * top-k (TakeOrderedAndProject; never a global sort). Ties on `idCol`. */
  def nearestK(df: DataFrame, latCol: String, lonCol: String, idCol: String,
               lat: Double, lon: Double, k: Int): DataFrame = {
    val withDist = df.withColumn("distKm",
      haversineKm(col(latCol), col(lonCol), lit(lat), lit(lon)))
    graft.Ranks.rankTopK(withDist, k, Seq(col("distKm").asc, col(idCol).asc))
  }

  // --------------------------------------------- SpatialArgs string syntax

  sealed trait Shape extends Serializable
  final case class PointShape(lat: Double, lon: Double) extends Shape
  final case class RectShape(rect: Rect) extends Shape
  /** Circle with a radius in DEGREES (the spatial4j surface syntax
    * `Circle(x y d=deg)`); `radiusKm` converts via the mean earth radius
    * (DistanceUtils Degrees2Dist). */
  final case class CircleShape(lat: Double, lon: Double, radiusDeg: Double) extends Shape {
    def radiusKm: Double = math.toRadians(radiusDeg) * EarthMeanRadiusKm
  }
  final case class SpatialArgs(op: String, shape: Shape)

  private val Operations = Set("Intersects", "IsWithin", "Contains",
    "IsDisjointTo", "IsEqualTo", "BBoxIntersects", "BBoxWithin", "Overlaps")

  /** SpatialArgsParser.cs:Parse — `Op(shapeBody)`: the op name before the
    * first paren, the shape between it and the LAST paren. Shape bodies
    * follow the spatial4j surface forms the reference reads: `x y` point,
    * `minX minY maxX maxY` rect, `Circle(x y d=deg)` circle (x = lon,
    * y = lat). */
  def parseArgs(v: String): SpatialArgs = {
    val idx = v.indexOf('('); val edx = v.lastIndexOf(')')
    require(idx >= 0 && idx <= edx, s"missing parens: $v")
    val op = v.substring(0, idx).trim
    require(Operations.contains(op), s"unknown operation: $op")
    val body = v.substring(idx + 1, edx).trim
    require(body.nonEmpty, s"missing body : $v")
    SpatialArgs(op, parseShape(body))
  }

  private def parseShape(body: String): Shape =
    if (body.startsWith("Circle(")) {
      val inner = body.stripPrefix("Circle(").stripSuffix(")").trim
      val parts = inner.split("\\s+")
      val d = parts.find(_.startsWith("d="))
        .getOrElse(sys.error(s"circle needs d=: $body")).drop(2).toDouble
      val xy = parts.filterNot(_.startsWith("d="))
      CircleShape(lat = xy(1).toDouble, lon = xy(0).toDouble, radiusDeg = d)
    } else body.split("\\s+") match {
      case Array(x, y) => PointShape(lat = y.toDouble, lon = x.toDouble)
      case Array(x0, y0, x1, y1) => RectShape(
        Rect(minLat = y0.toDouble, maxLat = y1.toDouble,
          minLon = x0.toDouble, maxLon = x1.toDouble))
      case _ => sys.error(s"unreadable shape: $body")
    }

  /** Apply parsed args to a POINT table (lat/lon columns) — the
    * PointVectorStrategy.MakeQuery dispatch. */
  def applyToPoints(df: DataFrame, latCol: String, lonCol: String,
                    args: SpatialArgs): DataFrame = (args.op, args.shape) match {
    case ("Intersects" | "IsWithin" | "BBoxIntersects" | "BBoxWithin" | "Overlaps",
          RectShape(r)) =>
      bboxFilter(df, latCol, lonCol, r.minLat, r.maxLat, r.minLon, r.maxLon)
    case ("IsDisjointTo", RectShape(r)) =>
      disjointFilter(df, latCol, lonCol, r.minLat, r.maxLat, r.minLon, r.maxLon)
    case ("Intersects" | "IsWithin", c: CircleShape) =>
      distanceFilter(df, latCol, lonCol, c.lat, c.lon, c.radiusKm)
    case ("IsEqualTo", PointShape(la, lo)) =>
      df.filter(col(latCol) === la && col(lonCol) === lo)
    case (op, sh) => sys.error(s"unsupported point operation: $op on $sh")
  }

  /** Apply parsed args to a RECT table — the BBoxStrategy dispatch. */
  def applyToRects(df: DataFrame, args: SpatialArgs): DataFrame =
    (args.op, args.shape) match {
      case ("Intersects" | "BBoxIntersects" | "Overlaps", RectShape(r)) =>
        df.filter(BBox.intersects(r))
      case ("IsWithin" | "BBoxWithin", RectShape(r)) => df.filter(BBox.within(r))
      case ("Contains", RectShape(r)) => df.filter(BBox.containsBox(r))
      case ("IsEqualTo", RectShape(r)) => df.filter(BBox.equalsBox(r))
      case ("IsDisjointTo", RectShape(r)) => df.filter(BBox.disjoint(r))
      case (op, sh) => sys.error(s"unsupported rect operation: $op on $sh")
    }
}
