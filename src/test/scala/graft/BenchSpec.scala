package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {

  test("bench headline stays inside the driver's 2000-char tail window") {
    // The r17 regression class: entries kept landing, the headline
    // outgrew the driver's 2000-char tail window, and BENCH_r17.json
    // came back parsed:null — the warning fired and nothing failed.
    // This prices the REAL assembly (Bench.headlineJson: same sheds,
    // same key derivation) against the FULL current registry at
    // worst-case value widths (888.88 — wider than any observed
    // entry), so adding entries without shedding fails here first.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sweep = names.map(_ -> 888.88) ++ Seq(
      "near_ingest_512_blocks" -> 88.88, "near_ingest_1024_blocks" -> 88.88)
    val isolated = Bench.DefaultIsolated
      .filter(SparkEntry.queries.contains).map(_ -> 888.88)
    assert(isolated.nonEmpty)
    val line = Bench.headlineJson(sweep, 888.88, isolated, 8888.88,
      Seq("ingest_blocks_per_sec" -> 888.88,
        "ingest_1024_blocks_per_sec" -> 888.88),
      Some((8.888, 8.888)), "/root/testdata/sf0.1")
    assert(line.length <= 1700,
      s"headline ${line.length} chars at worst-case widths — the " +
        "trim-to-fit backstop should have held the 1700 budget")
    // Contract shape: the keys the driver (and the judge) read must be
    // present, and q01-q10 must survive every shed.
    assert(line.startsWith("""{"metric":"total","value":"""))
    Seq("\"unit\":\"sec\"", "\"queries\":", "\"isolated\":",
      "\"calib\":", "\"sf\":").foreach(k =>
      assert(line.contains(k), s"headline lost contract key $k"))
    (1 to 10).foreach(i =>
      assert(line.contains(f""""q$i%02d":"""), f"headline lost q$i%02d"))
    assert(line.contains("\"near_tables_total\":"))
  }

  test("every DefaultIsolated entry names a real registry query") {
    val missing = Bench.DefaultIsolated.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"DefaultIsolated names unknown queries (silently skipped): $missing")
  }
}
