package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.concurrent.atomic.AtomicLong

/** S10: the automatic-mode health ping (reference `ping_url`,
  * `src/importer/mod.rs:266-292`): after each successful import cycle the
  * reference GETs a monitoring URL, rate-limited to once a minute under a
  * mutex. The Structured-Streaming shape is a [[StreamingQueryListener]]
  * firing on every micro-batch progress event, with the same
  * once-per-interval limit (an AtomicLong CAS replaces the mutex — progress
  * callbacks may race across queries).
  *
  * The transport is injected (`ping: String => Unit`): a real deployment
  * passes an HTTP GET; this sandbox has no egress, so specs (and the
  * default no-op) observe the hook without a network. Attach with
  * `spark.streams.addListener(new PingListener(url, ping))`.
  */
final class PingListener(url: String, ping: String => Unit,
                         minIntervalMs: Long = 60000L,
                         clock: () => Long = () => System.currentTimeMillis())
  extends StreamingQueryListener {

  private val lastPingMs = new AtomicLong(Long.MinValue)

  /** Rate-limited fire: at most one ping per `minIntervalMs`, first call
    * always pings (reference: "or if there never was a previous attempt"). */
  private def maybePing(): Unit = {
    val now = clock()
    val prev = lastPingMs.get()
    if ((prev == Long.MinValue || now - prev >= minIntervalMs) &&
        lastPingMs.compareAndSet(prev, now)) {
      ping(url)
    }
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = maybePing()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
