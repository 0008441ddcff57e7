package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the /proc/self/stat parse behind Bench's steal telemetry (r12
  * ADVICE): comm (field 2) is an arbitrary process name that may contain
  * spaces AND parentheses, so a naive whitespace split shifts the
  * utime/stime indices; the parse must anchor after the LAST ')'.
  */
class BenchTelemetrySpec extends AnyFunSuite {

  // kernel layout after comm: state ppid pgrp session tty tpgid flags
  // minflt cminflt majflt cmajflt UTIME STIME ...
  private def line(comm: String) =
    s"4242 ($comm) R 1 2 3 4 5 6 7 8 9 10 100 200 20 0 1 0 0 0 0"

  test("utime+stime parse from a plain comm") {
    assert(Bench.selfJiffies(line("java")) == 300L)
  }

  test("comm with spaces must not shift the field indices") {
    assert(Bench.selfJiffies(line("my cool process")) == 300L)
  }

  test("comm with parentheses anchors on the LAST ')'") {
    assert(Bench.selfJiffies(line("weird (name) v2)")) == 300L)
  }

  test("the parse agrees with the live /proc/self/stat of this JVM") {
    val stat = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")), "UTF-8").linesIterator.next()
    val j = Bench.selfJiffies(stat)
    assert(j > 0L, s"a running JVM has consumed CPU jiffies, got $j from: $stat")
  }
}
