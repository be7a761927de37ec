package graft

import org.apache.spark.sql.functions._

/** Geo extension: the grid-bucketed bbox join must (1) equal the brute
  * cross-join-with-range-predicate semantics exactly, (2) broadcast the
  * zone-cell index (the point side must not shuffle), and (3) index a
  * bbox under EVERY cell it overlaps — indexing only the corner cell is
  * the classic grid-join bug and silently drops matches in the bbox's
  * other cells. */
class GeoSpec extends SparkSpec {

  test("bbox join matches brute-force cross join + range filter") {
    val pts = ext.Geo.listings(spark, sf0001)
    val z = ext.Geo.zones(spark, sf0001)
    val brute = pts.crossJoin(z)
      .filter(col("lat").between(col("lat0"), col("lat1")) &&
              col("lon").between(col("lon0"), col("lon1")))
      .select("c_custkey", "zone_id", "lat", "lon")
    val fast = ext.Geo.bboxJoin(spark, sf0001)
    assert(fast.count() > 0, "test would be vacuous with zero matches")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      "grid-bucketed join diverges from brute-force containment")
  }

  test("multi-cell bboxes are matched beyond their corner cell") {
    // a match whose point cell differs from the zone's bbox-corner cell
    // proves the multi-cell explode is live (not just corner-indexed)
    val z = ext.Geo.zones(spark, sf0001)
      .select(col("zone_id"),
              floor(col("lat0") / 36.0).cast("long").as("zcl"),
              floor(col("lon0") / 72.0).cast("long").as("zcn"))
    val crossCell = ext.Geo.bboxJoin(spark, sf0001)
      .withColumn("cl", floor(col("lat") / 36.0).cast("long"))
      .withColumn("cn", floor(col("lon") / 72.0).cast("long"))
      .join(z, Seq("zone_id"))
      .filter(col("cl") =!= col("zcl") || col("cn") =!= col("zcn"))
    assert(crossCell.count() > 0,
      "no match outside bbox corner cells — multi-cell indexing unexercised")
  }

  test("geojson zones: written document is real GeoJSON; parsed bboxes " +
       "equal the zone fixture exactly") {
    val got = ext.Geo.geojsonZones(spark, sf0001)
    // parsed-and-rederived bbox == the construction-side zone table
    val want = ext.Geo.zones(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/nation.parquet")
              .select(col("n_nationkey"), col("n_name").as("name")),
            col("zone_id") === col("n_nationkey"))
      .select(col("zone_id").cast("long"), col("name"),
              col("lat0").cast("double"), col("lat1").cast("double"),
              col("lon0").cast("double"), col("lon1").cast("double"),
              lit(5L).as("n_vertices"))
    assert(got.count() === 25)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "parsed GeoJSON bboxes diverge from the zone fixture")
    // and the artifact on disk is ONE well-formed FeatureCollection
    // document (a third-party GeoJSON consumer could read it)
    val dir = new java.io.File(Tables.scratch("geojson_zones"))
    val part = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(part.length === 1, "expected a single-file document")
    val txt = new String(
      java.nio.file.Files.readAllBytes(part.head.toPath), "UTF-8").trim
    assert(txt.startsWith("{\"type\":\"FeatureCollection\"") &&
           txt.endsWith("]}") && txt.contains("\"Polygon\""))
  }

  test("zone-cell index is broadcast; point side does not shuffle") {
    val plan = ext.Geo.bboxJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "points must not sort-merge")
  }
}
