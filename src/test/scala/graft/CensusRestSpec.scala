package graft

import graft.sources.{CensusRest, RawCensusPayload}

/** REST-source modeling (S6/F10): injected transport, throttle contract,
  * positional decode with the reference's edge semantics. */
class CensusRestSpec extends SparkSpec {

  private def payload(name: String, values: Seq[String]): String = {
    val hdr = Seq("NAME", "B19013_001E", "B01003_001E", "B15003_022E",
      "B15003_023E", "B15003_024E", "B15003_025E", "B15003_001E",
      "B23025_005E", "B23025_003E", "B01002_001E").map(s => s""""$s"""")
    val row = (name +: values).map(s => s""""$s"""")
    s"[[${hdr.mkString(",")}],[${row.mkString(",")}]]"
  }

  test("fetchRaw: sequential with throttle, failures collected not fatal") {
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val (ok, failed) = CensusRest.fetchRaw(
      Seq("01002", "99999", "93650"),
      transport = z => if (z == "99999") throw new RuntimeException("HTTP 500")
                       else s"""[["h"],["ZCTA5 $z","1","2","3","4","5","6","7","8","9","10"]]""",
      throttleMs = 100L, sleep = slept.append(_))
    assert(ok.map(_.zip_code) === Seq("01002", "93650"))
    assert(failed === Seq("99999" -> "HTTP 500"))
    assert(slept.toSeq === Seq(100L, 100L, 100L)) // one throttle per ZIP
  }

  test("fetchRawConcurrent: in-flight bound reached but never exceeded, " +
       "input-order output, failures collected") {
    val max = 4
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    // the first `max` calls hold until all `max` are simultaneously in
    // flight — deterministically proves the pool reaches its bound
    // (later calls find the latch already open and pass straight through)
    val firstWave = new java.util.concurrent.CountDownLatch(max)
    val zips = (1 to 12).map(i => f"$i%05d")
    val (ok, failed) = CensusRest.fetchRawConcurrent(zips, transport = z => {
      val n = inFlight.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, n))
      firstWave.countDown()
      firstWave.await(10, java.util.concurrent.TimeUnit.SECONDS)
      try {
        if (z == "00007") throw new RuntimeException("HTTP 500")
        s"body-$z"
      } finally inFlight.decrementAndGet()
    }, maxConcurrentRequests = max)
    assert(peak.get() === max)   // reached the bound...
    // ...and a 4-thread fixed pool structurally cannot exceed it; peak
    // is the measured witness either way
    assert(peak.get() <= max)
    assert(ok.map(_.zip_code) === zips.filterNot(_ == "00007"))
    assert(ok.forall(r => r.payload == s"body-${r.zip_code}"))
    assert(failed === Seq("00007" -> "HTTP 500"))
  }

  test("fetchRawConcurrent: maxConcurrentRequests=1 is sequential input order") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val zips = Seq("01002", "93650", "10001")
    val (ok, failed) = CensusRest.fetchRawConcurrent(zips,
      transport = z => { order.add(z); s"body-$z" }, maxConcurrentRequests = 1)
    assert(order.toArray.toSeq === zips) // single thread ⇒ submission order
    assert(ok.map(_.zip_code) === zips)
    assert(failed === Seq.empty)
  }

  test("fetchRawConcurrent: pool=1 pacing spaces request starts exactly " +
       "(injected clock, no wall-clock waits)") {
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val zips = (1 to 5).map(i => f"$i%05d")
    val (ok, failed) = CensusRest.fetchRawConcurrent(zips,
      transport = z => { starts.add(clock.get()); s"body-$z" },
      maxConcurrentRequests = 1, minStartIntervalMs = 100L,
      clock = () => clock.get(), sleep = ms => { clock.addAndGet(ms); () })
    // sequential pool: each start lands exactly on its claimed slot
    assert(starts.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
             === Seq(0L, 100L, 200L, 300L, 400L))
    assert(ok.map(_.zip_code) === zips && failed.isEmpty)
  }

  test("fetchRawConcurrent: pacing is GLOBAL across the pool, not per-thread") {
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val zips = (1 to 8).map(i => f"$i%05d")
    val (ok, failed) = CensusRest.fetchRawConcurrent(zips,
      transport = z => s"body-$z",
      maxConcurrentRequests = 4, minStartIntervalMs = 100L,
      clock = () => clock.get(), sleep = ms => { clock.addAndGet(ms); () })
    // 8 requests claim slots 0,100,...,700 on the SHARED limiter, so the
    // injected clock must advance to at least the last slot. A per-thread
    // throttle at pool=4 would only advance (8/4 - 1) * 100 = 100 — this
    // bound is what separates the two contracts.
    assert(clock.get() >= 700L,
      s"clock advanced only ${clock.get()} ms — pacing is per-thread, not global")
    assert(ok.map(_.zip_code) === zips && failed.isEmpty)
  }

  test("decode: positional fields, derivations, sentinel and or-0/or-1 semantics") {
    val raws = Seq(
      // normal: income 85000, pop 39000, college 100+200+50+50=400 of
      // 1000 → 40.0%, unemployed 42 of 1000 → 4.2%, age 28
      RawCensusPayload("01002", payload("ZCTA5 01002",
        Seq("85000", "39000", "100", "200", "50", "50", "1000", "42", "1000", "28"))),
      // sentinel income → null; labor force 0 → or1 guard, unemployment
      // computes against denominator 1; education total 0 → or1 → pct 0
      RawCensusPayload("93650", payload("ZCTA5 93650",
        Seq("-999999999", "11000", "0", "0", "0", "0", "0", "7", "0", "31"))),
      // malformed numerics → null via try_cast
      RawCensusPayload("10001", payload("ZCTA5 10001",
        Seq("abc", "25000", "1", "1", "1", "1", "4", "1", "4", "37"))))
    val df = CensusRest.decode(spark, raws)
    val byZip = df.collect().map(r => r.getString(0) -> r).toMap

    val ok = byZip("01002")
    assert(ok.getString(1) === "ZCTA5 01002")
    assert(ok.getLong(2) === 85000L)
    assert(ok.getDouble(4) === 40.0)
    assert(ok.getDouble(5) === 4.2)
    assert(ok.getLong(6) === 28L)
    assert(ok.getString(7) === "US Census Bureau ACS 2021")

    val sentinel = byZip("93650")
    assert(sentinel.isNullAt(2))              // sentinel income → null
    assert(sentinel.getDouble(4) === 0.0)     // college pct: 0/1 → 0
    assert(sentinel.getDouble(5) === 700.0)   // 7 / or1(0)=1 * 100 (Python parity)

    val malformed = byZip("10001")
    assert(malformed.isNullAt(2))             // "abc" → null
    assert(malformed.getDouble(4) === 100.0)  // 4 of 4 college
  }

  test("default http transport GETs the built URL, returns body, surfaces non-200") {
    // pure-JDK loopback server — no egress, exercises the real client path
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val payload = """[["NAME","B19013_001E"],["ZCTA5 01002","85000"]]"""
    server.createContext("/acs", ex => {
      val q = ex.getRequestURI.getQuery
      val (code, body) =
        if (q != null && q.contains("zip=01002")) (200, payload) else (404, "nope")
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val transport = CensusRest.httpTransport(
        zip => s"http://127.0.0.1:$port/acs?zip=$zip")
      assert(transport("01002") === payload)
      val err = intercept[RuntimeException](transport("99999"))
      assert(err.getMessage.contains("404"))
      // and it plugs into fetchRaw's failure-collection contract
      val (ok, failed) = CensusRest.fetchRaw(
        Seq("01002", "99999"), transport, throttleMs = 0, sleep = _ => ())
      assert(ok.map(_.zip_code) === Seq("01002"))
      assert(failed.map(_._1) === Seq("99999"))
    } finally server.stop(0)
  }
}
