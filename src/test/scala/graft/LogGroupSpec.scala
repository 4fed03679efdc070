package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{HarmonicRankGroup, LogGroup}

class LogGroupSpec extends AnyFunSuite {

  test("log_group.rs test_log_group vectors") {
    val lg = new LogGroup(100, 10)
    assert(lg.group(0) == 0)
    assert(lg.group(1) == 1)
    assert(lg.group(2) == 2)
    assert(lg.group(10) == 5)
    assert(lg.group(11) == 5)
    assert(lg.group(90) == 9)
    assert(lg.group(99) == 9)
    // items over num_items clamp to the last group
    assert(lg.group(100) == 9)
    assert(lg.group(1000) == 9)

    val big = new LogGroup(40000000L, 10)
    (0L until 5L).foreach(i => assert(big.group(i) == 0, s"i = $i"))
  }

  test("log_group.rs test_harmonic_rank_group vectors") {
    val hrg = new HarmonicRankGroup(100, 10)
    assert(hrg.group(0) == 9)
    assert(hrg.group(1) == 8)
    assert(hrg.group(10) == 4)
    assert(hrg.group(11) == 4)
    assert(hrg.group(90) == 0)
    assert(hrg.group(99) == 0)
    assert(hrg.group(100) == 0)
  }
}
