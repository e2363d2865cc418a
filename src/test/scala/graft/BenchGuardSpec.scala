package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention self-defense (VERDICT r14 ask #5): interleaved
  * calibration probes + prior-round minima flag queries whose slow minima
  * are machine contention rather than code, and a post-sweep retime
  * recovers the clean number. No SparkSession — the sweep machinery is
  * pure, driven here by CPU-bound thunks with a real 16+-core burn.
  */
class BenchGuardSpec extends AnyFunSuite {

  @volatile private var blackhole = 0L

  /** Fixed CPU-bound work unit: `threads` spinners of `iters` each —
    * wall-clock inflates under core contention, unlike sleeps.
    */
  private def work(threads: Int, iters: Long): Unit = {
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var x = 0L; var i = 0L
        while (i < iters) { x = x * 31 + i; i += 1 }
        blackhole ^= x
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
  }

  test("suspect rule: both conditions required (pure decision matrix)") {
    import Bench.{SweepResult, suspectNames}
    val priors = Map("a" -> 0.1, "b" -> 0.1, "c" -> 0.1)
    val rs = Seq(
      SweepResult("a", Seq(0.5), calAt = 0.30), // slow + hot cal → suspect
      SweepResult("b", Seq(0.5), calAt = 0.10), // slow + cool cal → genuine regression, NOT masked
      SweepResult("c", Seq(0.15), calAt = 0.30), // hot cal but within 3× → fine
      SweepResult("d", Seq(9.9), calAt = 0.30)) // no prior → nothing to compare
    assert(suspectNames(rs, priors) === Seq("a"))
    // no positive calibration samples → rule disabled, never throws
    assert(suspectNames(rs.map(_.copy(calAt = -1.0)), priors).isEmpty)
    assert(suspectNames(Nil, priors).isEmpty)
  }

  test("priorMinima parses a persisted bench line; absent/garbled → empty") {
    val f = java.nio.file.Files.createTempFile("bench_prior", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":1.5,"unit":"sec","runs":3,""" +
        """"queries":{"q1":0.25,"q2":0.0312,"qbad":-1.0},"rest":{}}""")
    val m = Bench.priorMinima(f.toString)
    assert(m === Map("q1" -> 0.25, "q2" -> 0.0312)) // -1 (failed) dropped
    assert(Bench.priorMinima("/nonexistent/bench.json") === Map.empty)
    val g = java.nio.file.Files.createTempFile("bench_prior_bad", ".json")
    java.nio.file.Files.writeString(g, "not json at all")
    assert(Bench.priorMinima(g.toString) === Map.empty)
  }

  test("latestRoundPriors falls back to the newest committed round artifact") {
    val d = java.nio.file.Files.createTempDirectory("bench_rounds")
    java.nio.file.Files.writeString(d.resolve("BENCH_r03.json"),
      """{"n":3,"parsed":{"queries":{"q1":0.5}}}""")
    java.nio.file.Files.writeString(d.resolve("BENCH_r11.json"),
      """{"n":11,"parsed":{"queries":{"q1":0.25,"q2":0.1}}}""")
    java.nio.file.Files.writeString(d.resolve("BENCH_r12.json"),
      """{"n":12,"parsed":null}""") // a parse-failed round: skip to r11
    assert(Bench.latestRoundPriors(d.toString)
      === Map("q1" -> 0.25, "q2" -> 0.1))
    assert(Bench.latestRoundPriors("/nonexistent") === Map.empty)
    val empty = java.nio.file.Files.createTempDirectory("bench_rounds_e")
    assert(Bench.latestRoundPriors(empty.toString) === Map.empty)
  }

  test("synthetic 16+-core burn mid-sweep: contended window flagged, retime recovers") {
    val nThreads = 32
    // calibrate iteration count to ~30ms clean wall-clock on this box
    val probeIters = {
      var iters = 1L << 20
      var t = 0.0
      while ({ val t0 = System.nanoTime(); work(nThreads, iters)
               t = (System.nanoTime() - t0) / 1e9; t < 0.03 && iters < (1L << 30) })
        iters *= 2
      iters
    }
    def oneQuery(): Unit = work(nThreads, probeIters)
    def calProbe(): Double = {
      val t0 = System.nanoTime(); work(nThreads, probeIters / 2)
      (System.nanoTime() - t0) / 1e9
    }
    val names = (0 until 12).map(i => s"q$i")
    // clean pass establishes this machine's priors
    val clean = Bench.timedSweep(
      names.map(n => n -> (() => oneQuery())), nRuns = 1, calEvery = 4, calProbe)
    val priors = clean.map(r => r.name -> r.times.min).toMap
    // the burn: 192 spinner threads (≫16 cores' worth) across q4..q7's
    // window — started at the END of q3 so the i=4 interleaved probe runs
    // hot, stopped at the END of q7 so q8+ and the retime run clean
    val burning = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (0 until 192).map { _ =>
      val th = new Thread(() => {
        var x = 0L
        while (burning.get()) { x = x * 31 + 1 }
        blackhole ^= x
      })
      th.setDaemon(true); th
    }
    val items: Seq[(String, () => Unit)] = names.map {
      case n @ "q3" => n -> (() => {
        oneQuery(); burning.set(true); burners.foreach(_.start()) })
      case n @ "q7" => n -> (() => { oneQuery(); burning.set(false)
        // join, don't just signal: lingering spinner threads have bled into
        // q8's window on a loaded box and flagged a clean-window query
        burners.foreach(_.join()) })
      case n => n -> (() => oneQuery())
    }
    val sweep = Bench.timedSweep(items, nRuns = 1, calEvery = 4, calProbe)
    val suspects = Bench.suspectNames(sweep, priors)
    // the contended window (after q3's thunk lit the burn) must be caught;
    // clean-window queries must not be flagged
    assert(suspects.nonEmpty, s"no suspects flagged; sweep=$sweep priors=$priors")
    assert(suspects.toSet.subsetOf(Set("q4", "q5", "q6", "q7")),
      s"clean-window query flagged: $suspects")
    assert(suspects.toSet.intersect(Set("q4", "q5", "q6")).nonEmpty,
      s"the heart of the burn window escaped: $suspects")
    // retime (burn is out): the clean re-measurement beats the contended min
    suspects.foreach { n =>
      val sweptMin = sweep.find(_.name == n).get.times.min
      val t0 = System.nanoTime(); oneQuery()
      val retimed = (System.nanoTime() - t0) / 1e9
      assert(retimed < sweptMin,
        s"$n: retimed $retimed not below contended $sweptMin")
    }
  }
}
