package graft

import graft.tools.RefScale

/** Test-time coverage of the reference-scale parity harness
  * (tools/RefScale): the SAME generator + prove() contract the full
  * 2,226,382-row run uses, at a 100×-reduced row count so `sbt test`
  * stays fast. The full-scale run is `runMain graft.tools.RefScale`;
  * its recorded result lives in BASELINE.md. */
class RefScaleSpec extends SparkSpec {

  test("RefScale generator layout: states, covered/uncovered ZIPs, victim stripes") {
    val df = RefScale.listings(spark, 22000L).cache()
    try {
      assert(df.count() === 22000L)
      assert(df.columns.length === 12)
      // 3-of-5 target-state stripe
      val states = df.select("state").distinct().collect().map(_.getString(0)).toSet
      assert(states === Set("Massachusetts", "California", "New York",
                            "Texas", "Florida"))
      // leading-zero MA ZIPs survive as strings
      val maZips = df.filter(org.apache.spark.sql.functions.col("state") === "Massachusetts")
        .select("zip_code").distinct().collect().map(_.getString(0))
      assert(maZips.forall(z => z.length == 5 && z.startsWith("01")))
      // uncovered stripe exists (zipIdx 100..109)
      assert(maZips.exists(_.drop(2).toInt >= 100))
      // null-victim stripes present
      assert(df.filter("price IS NULL").count() > 0)
      assert(df.filter("house_size IS NULL").count() > 0)
    } finally df.unpersist()
  }

  test("prove() passes the ASL-declared contract at reduced scale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-refscale").toString
    val stats = RefScale.prove(spark, dir,
      listingsDf = Some(RefScale.listings(spark, 22000L)),
      expectRaw = 22000L)
    // the declared output contract: 100 × 3 states, 18 cols, ≥95 % match
    assert(stats.joined === 300L)
    assert(stats.outputColumns === 18)
    assert(stats.matchRatePct >= 95.0)
    // cascade is strictly monotone and every stage did real work
    assert(stats.afterStateFilter < stats.rawListings)
    assert(stats.afterNullClean < stats.afterStateFilter)
    assert(stats.afterCoverage < stats.afterNullClean)
  }
}
