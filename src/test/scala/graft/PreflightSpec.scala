package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the spill-floor preflight guard (r18 verdict #2): the measured
  * 0.375 GB/slot boundary from SCALE.md r18 becomes an up-front check
  * with an actionable message instead of an obscure
  * UnsafeSorterSpillWriter OOM. */
class PreflightSpec extends AnyFunSuite {

  private val gb = 1L << 30

  test("configurations at or above the measured floor pass") {
    // the r18 surviving leg: 3 g / 8 slots = 0.375 GB/slot (the floor)
    assert(Preflight.heapPerSlotWarning(3 * gb, 8).isEmpty)
    // the standard sizing: 1 GB/core (2.5x above the floor)
    assert(Preflight.heapPerSlotWarning(32 * gb, 32).isEmpty)
    // degenerate slots are clamped, not divide-by-zero
    assert(Preflight.heapPerSlotWarning(8 * gb, 0).isEmpty)
  }

  test("the r18 dying configuration (3 g / 32 slots) refuses with guidance") {
    val msg = Preflight.heapPerSlotWarning(3 * gb, 32)
    assert(msg.isDefined)
    assert(msg.get.contains("0.09 GB/slot"))
    assert(msg.get.contains("UnsafeSorterSpillWriter"))
    assert(msg.get.contains("SCALE.md"))
    assert(msg.get.contains("SPARK_GRAFT_CPUS"))
  }

  test("the floor constant is the measured 0.375 GB/slot") {
    assert(Preflight.SpillFloorBytesPerSlot === (0.375 * gb).toLong)
    // one byte under the floor trips, the floor itself passes
    assert(Preflight.heapPerSlotWarning(
      Preflight.SpillFloorBytesPerSlot - 1, 1).isDefined)
    assert(Preflight.heapPerSlotWarning(
      Preflight.SpillFloorBytesPerSlot, 1).isEmpty)
  }
}
