package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Bench artifact lifecycle guard (round-11 verdict #1): a run that
  * self-flags contaminated — or a smoke run with a tiny sweep — must
  * never replace the authoritative idle `BENCH_FULL.json`; it goes to
  * a sidecar file instead. No SparkSession needed: the policy is a
  * pure function plus one filesystem write.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("artifact target policy: idle full-sweep owns BENCH_FULL.json") {
    assert(Bench.artifactTarget(contaminated = false, fullSweep = true)
      === "BENCH_FULL.json")
    assert(Bench.artifactTarget(contaminated = true, fullSweep = true)
      === "BENCH_FULL_contaminated.json")
    // contamination outranks the smoke route: a loaded smoke run is
    // still evidence of contamination, not a smoke artifact
    assert(Bench.artifactTarget(contaminated = true, fullSweep = false)
      === "BENCH_FULL_contaminated.json")
    assert(Bench.artifactTarget(contaminated = false, fullSweep = false)
      === "BENCH_FULL_smoke.json")
  }

  test("a flagged run cannot replace an unflagged artifact on disk") {
    val dir = Files.createTempDirectory("bench_artifact_spec")
    try {
      val idle = """{"loadavg":{"contaminated":false},"value":1.0}"""
      val idlePath = Bench.writeArtifact(dir, idle,
        contaminated = false, fullSweep = true)
      assert(idlePath.getFileName.toString === "BENCH_FULL.json")

      val poisoned = """{"loadavg":{"contaminated":true},"value":99.0}"""
      val sidecar = Bench.writeArtifact(dir, poisoned,
        contaminated = true, fullSweep = true)
      assert(sidecar.getFileName.toString === "BENCH_FULL_contaminated.json")
      // the authoritative artifact survives byte-for-byte
      assert(Files.readString(dir.resolve("BENCH_FULL.json")).trim === idle)
      assert(Files.readString(sidecar).trim === poisoned)

      val smoke = """{"loadavg":{"contaminated":false},"value":0.1}"""
      val smokePath = Bench.writeArtifact(dir, smoke,
        contaminated = false, fullSweep = false)
      assert(smokePath.getFileName.toString === "BENCH_FULL_smoke.json")
      assert(Files.readString(dir.resolve("BENCH_FULL.json")).trim === idle)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }

  test("canonicalSummary extracts total + sweep ratios from a committed artifact") {
    val dir = Files.createTempDirectory("bench_canon_spec")
    try {
      val art = """{"metric":"total","value":176.25,"unit":"sec",""" +
        """"queries":{"a":1.5},"scale":{"factor":10,"gen_sec":2.0,""" +
        """"queries":{"dedup_jaccard":{"base":0.5,"scaled":1.855,"ratio":3.71,""" +
        """"bytes_base":{"shuffle_read":1,"shuffle_write":2,"spill":0}},""" +
        """"warehouse_day":{"base":1.0,"scaled":2.72,"ratio":2.72}}}}"""
      val f = dir.resolve("BENCH_FULL.json")
      Files.writeString(f, art)
      val Some((total, ratios)) = Bench.canonicalSummary(f)
      assert(total === 176.25)
      assert(ratios.toMap === Map("dedup_jaccard" -> 3.71,
        "warehouse_day" -> 2.72))
      // missing file and malformed content both degrade to None
      assert(Bench.canonicalSummary(dir.resolve("nope.json")).isEmpty)
      Files.writeString(f, "not json at all")
      assert(Bench.canonicalSummary(f).isEmpty)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }
}
