package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** S10 ping hook: once-per-interval rate limit, first call always fires
  * (reference `src/importer/mod.rs:266-292`). Pure unit test — the
  * transport is injected, no network involved. */
class PingListenerSpec extends AnyFunSuite {

  test("pings on first progress, then at most once per interval") {
    var pings = Vector[Long]()
    var now = 0L
    val l = new PingListener("http://monitor/ping", _ => pings :+= now,
      minIntervalMs = 60000L, clock = () => now)
    l.onQueryProgress(null) // first attempt always pings
    now = 30000L; l.onQueryProgress(null) // < 1 min: skipped
    now = 59999L; l.onQueryProgress(null) // still skipped
    now = 60000L; l.onQueryProgress(null) // interval reached: pings
    now = 90000L; l.onQueryProgress(null) // skipped again
    assert(pings == Vector(0L, 60000L))
  }

  test("concurrent progress events produce exactly one ping") {
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new PingListener("http://monitor/ping",
      _ => { count.incrementAndGet(); () }, minIntervalMs = 60000L)
    val threads = (0 until 8).map(_ => new Thread(() => l.onQueryProgress(null)))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(count.get() == 1)
  }
}
