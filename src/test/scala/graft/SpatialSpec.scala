package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Spatial
import java.nio.file.Files

/** contrib/Spatial analog: bbox/cell/distance filters vs brute force on
  * seeded random points (incl. dateline and near-pole cases), formula pins,
  * and row-group pruning over a cell-sorted table (the prefix-tree index
  * analog).
  */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 3000
  private val rnd = new scala.util.Random(421)

  private lazy val points: Seq[(Long, Double, Double)] =
    (0 until N).map { i =>
      (i.toLong, rnd.nextDouble() * 180.0 - 90.0, rnd.nextDouble() * 360.0 - 180.0)
    }

  private lazy val df = points.toDF("id", "lat", "lon").cache()

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("bbox filter equals brute force; cell prune+refine equals bbox, all levels") {
    val boxes = Seq(
      (10.0, 45.0, -30.0, 60.0),
      (-90.0, -60.0, 100.0, 179.0), // near south pole
      (-5.0, 5.0, -1.0, 1.0),       // small box
      (88.0, 90.0, -180.0, 180.0))  // polar cap
    for ((la0, la1, lo0, lo1) <- boxes) {
      val want = points.filter { case (_, la, lo) =>
        la >= la0 && la <= la1 && lo >= lo0 && lo <= lo1
      }.map(_._1).toSet
      assert(ids(Spatial.bboxFilter(df, "lat", "lon", la0, la1, lo0, lo1)) == want)
      for (level <- Seq(1, 4, 8)) {
        val cells = Spatial.withCells(df, "lat", "lon", level)
        val got = ids(Spatial.cellBboxFilter(cells, "lat", "lon", la0, la1, lo0, lo1, level))
        assert(got == want, s"level $level box ($la0,$la1,$lo0,$lo1)")
      }
    }
  }

  test("covering cells contain every in-box point's cell") {
    val (la0, la1, lo0, lo1) = (20.0, 33.0, 150.0, 179.5)
    val level = 7
    val ((x0, x1), (y0, y1)) = Spatial.coveringRanges(la0, la1, lo0, lo1, level)
    val inBox = Spatial.withCells(
      Spatial.bboxFilter(df, "lat", "lon", la0, la1, lo0, lo1), "lat", "lon", level)
    inBox.select("cell_x", "cell_y").collect().foreach { r =>
      assert(r.getLong(0) >= x0 && r.getLong(0) <= x1)
      assert(r.getLong(1) >= y0 && r.getLong(1) <= y1)
    }
  }

  test("distance filter equals brute haversine, incl. dateline and pole centers") {
    val circles = Seq(
      (48.85, 2.35, 1500.0),
      (0.0, 179.9, 2000.0),   // dateline crossing
      (-89.5, 10.0, 800.0),   // near-pole
      (65.0, -179.0, 3000.0), // high-lat + dateline
      (10.0, 10.0, 15000.0))  // hemisphere-scale
    for ((cla, clo, r) <- circles) {
      val want = points.filter { case (_, la, lo) =>
        Spatial.haversineDouble(la, lo, cla, clo) < r
      }.map(_._1).toSet
      val got = ids(Spatial.distanceFilter(df, "lat", "lon", cla, clo, r))
      assert(got == want, s"circle ($cla,$clo,$r): missing ${want -- got}, extra ${got -- want}")
      assert(want.nonEmpty, s"fixture should have points within ($cla,$clo,$r)")
    }
  }

  test("haversine column equals the driver twin and known geography") {
    // Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
    val d = Spatial.haversineDouble(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(d - 343.5) < 1.5, s"Paris-London was $d")
    val sample = df.limit(50)
      .withColumn("d", Spatial.haversineKm(col("lat"), col("lon"), lit(48.8566), lit(2.3522)))
      .select("lat", "lon", "d").collect()
    sample.foreach { r =>
      val want = Spatial.haversineDouble(r.getDouble(0), r.getDouble(1), 48.8566, 2.3522)
      assert(r.getDouble(2) == want, "column and driver twin must agree bit-for-bit")
    }
  }

  test("nearestK equals brute-force k nearest with id tie-break") {
    val (cla, clo) = (40.0, -75.0)
    val want = points.map { case (id, la, lo) =>
      (Spatial.haversineDouble(la, lo, cla, clo), id)
    }.sorted.take(10).map(_._2)
    val got = Spatial.nearestK(df, "lat", "lon", "id", cla, clo, 10)
      .orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("recipDistance is c/(d+c) with c = half-diagonal * 0.1") {
    val (la0, la1, lo0, lo1) = (40.0, 50.0, 0.0, 10.0)
    val c = Spatial.haversineDouble(la0, lo0, la1, lo1) * 0.5 * 0.1
    val got = df.limit(20)
      .withColumn("d", Spatial.distanceValueSource("lat", "lon", 45.0, 5.0))
      .withColumn("r", Spatial.recipDistance(col("d"), la0, la1, lo0, lo1))
      .select("d", "r").collect()
    got.foreach { r => assert(r.getDouble(1) == c / (r.getDouble(0) + c)) }
  }

  private lazy val rects = {
    val r = new scala.util.Random(77)
    (0 until 800).map { i =>
      val la0 = r.nextDouble() * 160.0 - 85.0
      val lo0 = r.nextDouble() * 330.0 - 180.0
      (i.toLong, la0, la0 + r.nextDouble() * 20.0, lo0, lo0 + r.nextDouble() * 25.0)
    }
  }
  private lazy val rectDf =
    rects.toDF("id", "minLat", "maxLat", "minLon", "maxLon").cache()

  test("bbox rectangle relations equal brute force") {
    val q = Spatial.Rect(-10.0, 25.0, -40.0, 15.0)
    def brute(p: (Long, Double, Double, Double, Double) => Boolean) =
      rects.filter(r => p(r._1, r._2, r._3, r._4, r._5)).map(_._1).toSet
    val wantI = brute((_, la0, la1, lo0, lo1) =>
      lo0 <= q.maxLon && lo1 >= q.minLon && la0 <= q.maxLat && la1 >= q.minLat)
    val wantW = brute((_, la0, la1, lo0, lo1) =>
      lo0 >= q.minLon && lo1 <= q.maxLon && la0 >= q.minLat && la1 <= q.maxLat)
    val wantC = brute((_, la0, la1, lo0, lo1) =>
      lo0 <= q.minLon && lo1 >= q.maxLon && la0 <= q.minLat && la1 >= q.maxLat)
    assert(ids(rectDf.filter(Spatial.BBox.intersects(q))) == wantI)
    assert(ids(rectDf.filter(Spatial.BBox.within(q))) == wantW)
    assert(ids(rectDf.filter(Spatial.BBox.containsBox(q))) == wantC)
    assert(ids(rectDf.filter(Spatial.BBox.disjoint(q))) == rects.map(_._1).toSet -- wantI)
    assert(wantI.nonEmpty && wantW.nonEmpty,
      "fixture must exercise the relations non-trivially")
    // within and contains are both subsets of intersects
    assert(wantW.subsetOf(wantI) && wantC.subsetOf(wantI))
  }

  test("areaScore matches the AreaSimilarity formula") {
    val q = Spatial.Rect(-10.0, 25.0, -40.0, 15.0)
    val qArea = math.abs(q.maxLon - q.minLon) * math.abs(q.maxLat - q.minLat)
    val got = rectDf.withColumn("s", Spatial.BBox.areaScore(q))
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rects.foreach { case (id, la0, la1, lo0, lo1) =>
      val h = math.min(q.maxLat, la1) - math.max(q.minLat, la0)
      val w = math.min(q.maxLon, lo1) - math.max(q.minLon, lo0)
      val tArea = (lo1 - lo0) * (la1 - la0)
      val want =
        if (w > 0 && h > 0 && tArea > 0) {
          val i = w * h
          math.pow(i / qArea, 2.0) * math.pow(i / tArea, 0.5) * 10000.0
        } else 0.0
      assert(got(id) == want, s"rect $id")
    }
  }

  test("spatial args parse + dispatch equal the direct filters") {
    import Spatial._
    assert(parseArgs("Intersects(-40 -10 15 25)") ==
      SpatialArgs("Intersects", RectShape(Rect(-10.0, 25.0, -40.0, 15.0))))
    assert(parseArgs("IsWithin(Circle(2.35 48.85 d=13.5))") ==
      SpatialArgs("IsWithin", CircleShape(48.85, 2.35, 13.5)))
    intercept[IllegalArgumentException] { parseArgs("Nope(0 0 1 1)") }
    intercept[IllegalArgumentException] { parseArgs("Intersects") }
    // rect over points == bboxFilter; circle == distanceFilter at d-km
    val viaArgs = ids(applyToPoints(df, "lat", "lon", parseArgs("Intersects(-40 -10 15 25)")))
    assert(viaArgs == ids(bboxFilter(df, "lat", "lon", -10.0, 25.0, -40.0, 15.0)))
    val c = parseArgs("Intersects(Circle(2.35 48.85 d=13.5))")
      .shape.asInstanceOf[CircleShape]
    assert(ids(applyToPoints(df, "lat", "lon", SpatialArgs("Intersects", c))) ==
      ids(distanceFilter(df, "lat", "lon", 48.85, 2.35, c.radiusKm)))
    assert(math.abs(c.radiusKm - math.toRadians(13.5) * Spatial.EarthMeanRadiusKm) == 0.0)
    // rect table dispatch
    val q = Spatial.Rect(-10.0, 25.0, -40.0, 15.0)
    assert(ids(applyToRects(rectDf, parseArgs("Contains(-40 -10 15 25)"))) ==
      ids(rectDf.filter(Spatial.BBox.containsBox(q))))
  }

  test("cell-sorted table: bbox predicates push down and prune row groups") {
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevPage = hc.get("parquet.page.size")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 4 * 1024)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = Files.createTempDirectory("graftspatial").toString + "/pts"
    try {
      val level = 8
      val big = (0 until 60000).map { i =>
        val r = new scala.util.Random(i)
        (i.toLong, r.nextDouble() * 180.0 - 90.0, r.nextDouble() * 360.0 - 180.0)
      }.toDF("id", "lat", "lon")
      Spatial.writeIndexed(big, "lat", "lon", level, dir)
      val table = spark.read.parquet(dir)
      val total = table.count()
      val q = Spatial.cellBboxFilter(table, "lat", "lon", 10.0, 14.0, 20.0, 24.0, level)
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("cell_x") && pushed.contains("cell_y"),
        s"cell ranges not pushed: $pushed")
      val scanned = scan.metrics("numOutputRows").value
      assert(scanned < total / 10,
        s"scan read $scanned of $total rows — cell sort did not prune row groups")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
      if (prevPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", prevPage)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
