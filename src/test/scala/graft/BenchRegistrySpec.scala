package graft

import org.scalatest.funsuite.AnyFunSuite

/** The best-ever registry behind Bench's isolation trigger (r12, the
  * r11 VERDICT's q108 blind spot): driver-persisted BENCH_r*.json lines
  * truncate to the top-~120 queries, so a light query's best-ever used
  * to rest solely on the overwritable bench_out.json and could drift
  * past the 1.5x regression gate without ever earning an isolation
  * receipt. tools/bench_best.json is the committed FULL registry; these
  * tests pin its parse / min-merge / write-read cycle and the artifact
  * parser's tolerance of the r12 host-telemetry field.
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("parseQueries reads the registry format, a full artifact line, " +
      "and a line carrying the r12 host object before queries") {
    val registry = """{"queries":{"q01":0.451,"q02":0.232}}"""
    assert(Bench.parseQueries(registry) ==
      Map("q01" -> 0.451, "q02" -> 0.232))
    val artifact = """{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"q108":0.363,"q346":2.340},"sf":"x","errs":[]}"""
    assert(Bench.parseQueries(artifact) ==
      Map("q108" -> 0.363, "q346" -> 2.34))
    // host telemetry (its own brace-closed object) precedes "queries"
    // in the emitted line — the parser must not be derailed by it
    val withHost = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"errs":[],"isolated":[],"host":{"load_start":3.10,""" +
      """"load_end":2.50,"cpus":32,"ts_start":1,"ts_end":2,""" +
      """"iso_load":{"q346":1.20}},"queries":{"q346":2.890}}"""
    assert(Bench.parseQueries(withHost) == Map("q346" -> 2.89))
  }

  test("writeBestEver min-merges into the registry and bestEver reads " +
      "it back; a later slower run never raises a best") {
    val dir = java.nio.file.Files.createTempDirectory("benchreg")
    val path = dir.resolve("best.json").toString
    Bench.writeBestEver(Map("qA" -> 1.5, "qB" -> 0.4), path)
    Bench.writeBestEver(Map("qA" -> 2.0, "qB" -> 0.3, "qC" -> 9.0), path)
    val best = Bench.parseQueries(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))
    assert(best("qA") == 1.5) // slower rerun did not raise the best
    assert(best("qB") == 0.3) // faster rerun lowered it
    assert(best("qC") == 9.0) // new key entered at its first value
  }

  test("isolation trigger needs BOTH gates: 1.5x best-ever AND +0.5s " +
      "over it (sub-second jitter never earns an isolation slot)") {
    // the r12 driver-run pathology: 0.056s best, 0.577s loaded batch —
    // 10.3x by ratio, but the delta is the ~0.5s scheduling/JIT floor
    assert(!Bench.regressed(batched = 0.556, best = 0.056))
    assert(Bench.regressed(batched = 0.98, best = 0.42)) // q108 class: real
    assert(!Bench.regressed(batched = 0.3, best = 0.08)) // jitter band
    assert(!Bench.regressed(batched = 8.0, best = 7.6)) // big but < 1.5x
    assert(Bench.regressed(batched = 13.08, best = 6.12)) // q196 class
    // boundary: both gates must be strictly exceeded
    assert(!Bench.regressed(batched = 1.5, best = 1.0))
    assert(!Bench.regressed(batched = 0.9, best = 0.4))
  }

  test("committed registry covers every declared query (the top-120 " +
      "blind spot stays closed as the board grows)") {
    val reg = Bench.parseQueries(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/bench_best.json")), "UTF-8"))
    val declared = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSet
    val missing = declared.diff(reg.keySet)
    assert(missing.isEmpty,
      s"queries missing a best-ever row (run a full bench or seed " +
        s"them): ${missing.toSeq.sorted.mkString(",")}")
  }
}
