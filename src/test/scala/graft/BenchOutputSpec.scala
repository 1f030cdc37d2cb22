package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-parseability contract of Bench's stdout line: the
  * harness's bounded log-tail capture truncated the ~2 kB full-map JSON
  * line in rounds 1-2 (front of the line cut off → `"parsed": null`), so
  * the compact line must stay well under that window NO MATTER how many
  * queries the registry grows to, while failed (-1) entries must never be
  * dropped from it.
  */
class BenchOutputSpec extends AnyFunSuite {

  private def fake(n: Int): Map[String, Double] =
    (1 to n).map(i => f"query_with_a_long_name_$i%03d" -> i * 0.01).toMap

  test("compact stdout line stays under 1.5 kB at 4x the current registry size") {
    val results = fake(Registry.all.size * 4)
    val line = Bench.compactJson(results, results.values.sum, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"compact bench line grew to ${line.length} bytes")
  }

  test("failed queries always surface in the compact line") {
    val results = fake(200) + ("exploded_query" -> -1.0)
    val line = Bench.compactJson(results, 1.0, "sf")
    assert(line.contains("\"exploded_query\":-1.000"))
  }

  test("compact line stays bounded even when the whole registry fails") {
    // pathological case: every query reports -1. Failed entries are
    // force-included, so without the hard cap this line would overflow
    // the tail-capture window exactly when the driver most needs it.
    val n = math.max(Registry.all.size, 137)
    val results = (1 to n).map(i => f"query_with_a_long_name_$i%03d" -> -1.0).toMap
    val line = Bench.compactJson(results, 0.0, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"all-fail compact line grew to ${line.length} bytes")
    assert(line.contains(s""""failed_omitted":${n - 30}"""))
    // and it still parses as the driver's expected shape
    assert(line.startsWith("""{"metric":"total","value":0.000,"unit":"sec","queries":{"""))
    assert(line.endsWith(""""sf":"/root/testdata/sf0.1"}"""))
  }

  test("compact line is valid JSON with the driver's expected fields") {
    val line = Bench.compactJson(fake(50), 12.345, "/sf")
    // minimal structural check without a JSON lib on the classpath
    assert(line.startsWith("""{"metric":"total","value":12.345,"unit":"sec","queries":{"""))
    assert(line.endsWith(""""sf":"/sf"}"""))
  }

  test("contention-telemetry scalars keep the compact line bounded and well-formed") {
    val tele = s""","load_avg_start":31.420,"load_avg_end":2.718,"max_spread_pct":153.021""" +
      s""","high_spread_frac":0.371,"contended":true""" +
      s""","cache_assisted":["dedup_ensemble_components"],"value_excl_cached":97.310"""
    val line = Bench.compactJson(fake(Registry.all.size * 4), 1.0, "/sf", tele)
    assert(line.length < 1500, s"telemetry pushed the compact line to ${line.length} bytes")
    assert(line.contains("\"load_avg_start\":31.420") && line.endsWith(""""sf":"/sf"}"""))
    assert(line.contains("\"contended\":true"))
    assert(line.contains("\"value_excl_cached\":97.310"))
  }

  test("the registry declares every cache-assisted timing") {
    // the flag is what keeps cross-round comparisons honest — losing it
    // silently would reintroduce the cache-hit-as-speedup artifact.
    // Current set: the ensemble's published pair checkpoints + the LR
    // family's shared feature/weight relations (round 10) + the
    // leakage split (rides the published pairs) + the TxLog consumers
    // of the shared versioned-orders fixture (round-10 continuation).
    val cached = Registry.all.filter(_.cacheAssisted).map(_.name).sorted
    assert(cached == Seq("dedup_ensemble_components", "dedup_recall_audit",
      "pipeline_leakage_split", "table_incremental", "table_time_travel",
      "text_lr_gate", "text_lr_holdout", "text_lr_train"),
      s"unexpected cache-assisted set: $cached")
  }

  test("full-map JSON round-trips every entry") {
    val results = fake(120)
    val json = Bench.toJson(results, results.values.sum, "/sf")
    assert(results.keys.forall(k => json.contains("\"" + k + "\":")))
  }

  test("canary: ratios against the newest committed artifact, median + drift flag") {
    val dir = java.nio.file.Files.createTempDirectory("canary").toFile
    def write(name: String, body: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(dir, name).toPath, body)
    // an OLDER artifact that must lose to r12 (numeric, not lexicographic)
    write("BENCH_FULL_r3.json", """{"queries":{"sql_tpch_q5":9.0}}""")
    write("BENCH_FULL_r12.json",
      """{"queries":{"sql_tpch_q5":1.0,"table_merge_cow":2.0,"join_range_auto":0.5}}""")
    val results = Map(
      "sql_tpch_q5" -> 1.1,        // ratio 1.1
      "table_merge_cow" -> 2.0,    // ratio 1.0
      "join_range_auto" -> 0.45,   // ratio 0.9
      "unrelated" -> 5.0)
    val (scalars, map) = Bench.canaryFields(results, dir)
    assert(scalars.contains(""""canary_baseline":"BENCH_FULL_r12.json""""),
      s"newest artifact must win: $scalars")
    assert(scalars.contains(""""canary_ratio":1.000"""), scalars)
    assert(scalars.contains(""""canary_drift":false"""), scalars)
    assert(map.contains(""""sql_tpch_q5":1.100""") &&
      map.contains(""""join_range_auto":0.900"""), map)
    // drift flags when the median moves >15%
    val slow = results.map { case (k, v) => k -> v * 1.4 }
    val (s2, _) = Bench.canaryFields(slow, dir)
    assert(s2.contains(""""canary_drift":true"""), s2)
  }

  test("canary: no baseline and unreadable baseline are both null, never fatal") {
    val empty = java.nio.file.Files.createTempDirectory("canary_none").toFile
    assert(Bench.canaryFields(Map("x" -> 1.0), empty)._1 ==
      ""","canary_baseline":null""")
    val bad = java.nio.file.Files.createTempDirectory("canary_bad").toFile
    java.nio.file.Files.writeString(
      new java.io.File(bad, "BENCH_FULL_r9.json").toPath, "not json{{")
    assert(Bench.canaryFields(Map("x" -> 1.0), bad)._1 ==
      ""","canary_baseline":null""")
  }

  test("canary names all resolve in the registry (a renamed query kills the ratio)") {
    val names = Registry.all.map(_.name).toSet
    val missing = Bench.CanaryQueries.filterNot(names)
    assert(missing.isEmpty, s"canary names missing from registry: $missing")
  }
}
