package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r14 Next #5 self-review: the quarantine path's behavior when
  * `<out>.rejected.json` already exists. Files.write truncates, so the
  * r14 form silently destroyed the FIRST rejection's evidence when a
  * re-shoot loop rejected twice into the same output name; since r15
  * the path counts up instead. */
class BenchQuarantineSpec extends AnyFunSuite {

  test("first rejection lands at <out>.rejected.json") {
    assert(Bench.quarantinePath("B.json", _ => false) == "B.json.rejected.json")
  }

  test("an existing quarantine file is never clobbered — counts up") {
    val taken = Set("B.json.rejected.json")
    assert(Bench.quarantinePath("B.json", taken) == "B.json.rejected.2.json")
    val taken2 = taken + "B.json.rejected.2.json" + "B.json.rejected.3.json"
    assert(Bench.quarantinePath("B.json", taken2) == "B.json.rejected.4.json")
  }

  test("quarantine names stay inside the gitignore patterns") {
    // .gitignore carries *.rejected.json and *.rejected.*.json — every
    // generated name must match one of them so a quarantined sweep can
    // never be committed by a blanket `git add`.
    val names = Seq(
      Bench.quarantinePath("BENCH_SWEEP.json", _ => false),
      Bench.quarantinePath("BENCH_SWEEP.json", Set("BENCH_SWEEP.json.rejected.json")))
    names.foreach { n =>
      assert(n.endsWith(".rejected.json") ||
        n.matches(""".*\.rejected\.\d+\.json"""), n)
    }
  }
}
