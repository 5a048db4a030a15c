package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the data-adaptive shuffle-partitions heuristic against the
  * MEASURED sweet spots from the sf10 probe (TESTDATA.md round-13
  * wave): 32 (= cores) is right for every working set up through sf1,
  * 96 (= 3 waves of 32) is where the sweep found the sf10 build chain
  * goes ≈linear-or-better, and 256 overshoots. The heuristic must
  * resolve to exactly today's measured values at today's scales — an
  * sf0.1 bench under the adaptive default has to be byte-comparable to
  * every pre-adaptive round — and keep growing in full waves of cores
  * past them.
  */
class SessionTuningSpec extends AnyFunSuite {
  import SessionTuning._

  private val MiB = 1024L * 1024L

  test("core floor: every driver test scale resolves to the core count") {
    // Real on-disk sizes of the driver's sf dirs (sf0.001 ≈ 0.45 MiB,
    // sf0.01 ≈ 1.8 MiB, sf0.1 ≈ 16.7 MiB) all sit at or under
    // cores × 1.5 MiB for the harness core counts.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val bytes = inputBytes(s"/root/testdata/$sf")
      assert(bytes > 0, s"$sf dir unreadable — inputBytes saw nothing")
      assert(shufflePartitionsFor(32, bytes) === 32, s"at $sf, 32 cores")
    }
    // Verify's default 4-core session stays at 4 for sf0.01 (the
    // driver's correctness scale): ~1.8 MiB = 2 slices <= 4 cores.
    assert(shufflePartitionsFor(4, inputBytes("/root/testdata/sf0.01")) === 4)
  }

  test("sf1/sf10 land on the measured sweep points") {
    // sf1 ≈ 10x the text/embedding tables of sf0.1 ≈ 29 MiB: 20 slices,
    // still under the 32-core floor — the scale where 32 measured right.
    assert(shufflePartitionsFor(32, 29 * MiB) === 32)
    // sf10 ≈ 122 MiB compressed input: 82 slices -> 3 full waves = 96,
    // exactly the sweep's optimum (32 OOM'd, 256 overshot).
    assert(shufflePartitionsFor(32, 122 * MiB) === 96)
  }

  test("full waves: a partial last wave rounds up, never down") {
    // 33 slices on 32 cores is 2 waves (64), not 33: a lone 33rd task
    // would idle 31 cores without shrinking anyone's slice.
    assert(shufflePartitionsFor(32, 33 * TargetSliceBytes) === 64)
    // Exactly one wave stays one wave.
    assert(shufflePartitionsFor(32, 32 * TargetSliceBytes) === 32)
    // 100 TB-class input: ~66.7M slices, rounded to a whole wave —
    // linear in data, no Int overflow, always a multiple of cores.
    val p = shufflePartitionsFor(32, 100L * 1000 * 1000 * 1000 * 1000)
    assert(p % 32 === 0 && p > 2000000)
  }

  test("inputBytes: recursive over part-dirs, 0 for unreadable paths") {
    val dir = Files.createTempDirectory("tuning").toFile
    val sub = new java.io.File(dir, "table.parquet"); sub.mkdirs()
    Files.write(new java.io.File(sub, "part-0").toPath, new Array[Byte](1000))
    Files.write(new java.io.File(dir, "flat.parquet").toPath, new Array[Byte](500))
    assert(inputBytes(dir.getAbsolutePath) === 1500L)
    assert(inputBytes("/no/such/dir") === 0L)
    // Degradation contract: unreadable input sizes to the core floor.
    assert(shufflePartitionsFor(32, 0L) === 32)
  }

  test("bad sizing inputs fail loudly, not with a zero-partition session") {
    intercept[IllegalArgumentException](shufflePartitionsFor(0, 1000L))
    intercept[IllegalArgumentException](shufflePartitionsFor(32, 1000L, 0L))
  }
}
