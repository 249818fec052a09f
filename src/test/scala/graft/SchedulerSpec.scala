package graft

import graft.operators.{Cookies, Scheduler}
import org.scalatest.funsuite.AnyFunSuite

/** Pure scheduler arithmetic (P6, F3) and cookie truncation (G3). */
class SchedulerSpec extends AnyFunSuite {

  test("path-query-limit matches the BUbiNG formula shape") {
    // delay-bound: 300000/2000 = 150
    assert(Scheduler.pathQueryLimit(2000, 1L << 40, 100, 1) == 150)
    // memory-bound: tiny workbench forces the floor of 4
    assert(Scheduler.pathQueryLimit(1, 10, 100, 1000) == 4)
    // memory-bound above floor
    assert(Scheduler.pathQueryLimit(1, 1000000, 100, 10) == 1000)
  }

  test("adaptive batch grows when starved, capped, stable when saturated") {
    assert(Scheduler.adaptBatch(4, dequeued = 10, quota = 100) == 8)
    assert(Scheduler.adaptBatch(64, dequeued = 0, quota = 100) == 64)
    assert(Scheduler.adaptBatch(4, dequeued = 90, quota = 100) == 4)
    assert(Scheduler.adaptBatch(4, dequeued = 0, quota = 0) == 4)
  }

  test("cookie truncation keeps prefix within byte budget") {
    val cs = Seq("a" -> "1", "bb" -> "22", "ccc" -> "333")
    assert(Cookies.limitCookies(cs, 3) == Seq("a" -> "1"))
    assert(Cookies.limitCookies(cs, 8) == Seq("a" -> "1", "bb" -> "22"))
    assert(Cookies.limitCookies(cs, 100) == cs)
    assert(Cookies.limitCookies(Nil, 10) == Nil)
  }
}
