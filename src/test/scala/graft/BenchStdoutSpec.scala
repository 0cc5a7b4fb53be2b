package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver json-parses only the LAST ~2000 chars of Bench stdout.
  * These tests pin the contract that saved BENCH_r1..r10 from being
  * unparseable: a sweep too big for the window degrades to a compact
  * summary line that always fits and always parses.
  */
class BenchStdoutSpec extends AnyFunSuite {

  private def sweepOf(n: Int) = Bench.Sweep(
    results = (1 to n).map(i => f"q_synthetic_name_$i%03d" -> i * 0.01),
    errors = Map.empty[String, String],
    calibration = 0.5)

  test("small sweeps keep the full per-query line") {
    val line = Bench.stdoutLine(sweepOf(5), "/tmp/sf", None)
    assert(line.contains("\"queries\""))
    assert(line.length <= 1800)
  }

  test("a 147-query sweep degrades to a compact line inside the tail window") {
    val line = Bench.stdoutLine(sweepOf(147), "/tmp/sf", Some("bench/last_run.json"))
    assert(line.length <= 1800, s"len ${line.length}")
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"n\":147"))
    assert(line.contains("\"queries_path\":\"bench/last_run.json\""))
    // structural smoke: balanced braces, no raw newline
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(!line.contains("\n"))
  }

  test("compact total equals the sum of non-error times") {
    val s = Bench.Sweep(
      results = Seq("a" -> 1.5, "b" -> -1.0, "c" -> 2.0) ++
        (1 to 200).map(i => s"pad_query_number_$i" -> 0.0),
      errors = Map("b" -> "boom"),
      calibration = 0.1)
    val line = Bench.stdoutLine(s, "/tmp/sf", None)
    assert(line.contains("\"value\":3.5"))
    assert(line.contains("\"n_errors\":1"))
  }
}
