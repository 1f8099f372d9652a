package graft

/** CLI parameter parity with the reference (`main.go:20-21` -bearing /
  * -delta flags, plus graft's -k / -tau extensions). */
class CliSpec extends SparkSpec {

  test("parse: flags override defaults, defaults match the driver surface") {
    val (dir, query, p) = Cli.parse(Array(
      "--data", "/tmp/x", "--query", "bearing", "--bearing", "270", "--delta", "10"))
    assert(dir == "/tmp/x" && query == "bearing")
    assert(p.bearing == 270.0 && p.delta == 10.0 && p.k.isEmpty && p.tau == 0.8)
    val (_, _, d) = Cli.parse(Array("--query", "top10"))
    assert(d == Cli.Params())
  }

  test("run: bearing query honors an arbitrary --bearing/--delta") {
    val dir = TestSpark.sf0001
    val out = Cli.run(spark, dir, "bearing", Cli.Params(bearing = 270, delta = 10))
      .collect()
    val direct = graft.queries.VehicleQueries.byBearing(
      graft.core.Catalog.vehicles(spark, dir), 270, 10).collect()
    assert(out.map(_.toString).sorted.sameElements(direct.map(_.toString).sorted))
    assert(out.forall { r =>
      val b = r.getAs[Int]("bearing"); b >= 260 && b <= 280
    })
    // flagless run = the oracle-checked driver surface, row for row
    val viaCli = Cli.run(spark, dir, "v_bearing_filter").collect()
    val viaEntry = SparkEntry.queries("v_bearing_filter")(spark, dir).collect()
    assert(viaCli.map(_.toString).sorted.sameElements(viaEntry.map(_.toString).sorted))
  }

  test("run: --k bounds top-k queries; unset k keeps driver-surface parity") {
    val dir = TestSpark.sf0001
    assert(Cli.run(spark, dir, "top10", Cli.Params(k = Some(3))).collect().length == 3)
    assert(Cli.run(spark, dir, "s_ann_topk", Cli.Params(k = Some(5))).collect().length == 5)
    // flagless: each query's own default applies (s_ann_topk = 20, like the driver key)
    assert(Cli.run(spark, dir, "s_ann_topk").collect().length ==
      SparkEntry.queries("s_ann_topk")(spark, dir).collect().length)
    intercept[IllegalArgumentException] { Cli.run(spark, dir, "nope") }
  }
}
