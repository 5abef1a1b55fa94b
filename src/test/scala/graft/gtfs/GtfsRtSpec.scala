package graft.gtfs

import org.scalatest.funsuite.AnyFunSuite
import GtfsRt._

/** Round-trip + wire-level tests for the hand-rolled GTFS-RT codec
  * (field numbers per the public gtfs-realtime.proto; the reference decodes
  * the same subset at src/importer/per_schedule_importer.rs:96-117). */
class GtfsRtSpec extends AnyFunSuite {

  private val msg = FeedMessage(
    headerTimestamp = Some(1710517441L),
    tripUpdates = Seq(
      TripUpdate(
        TripDescriptor(Some("trip-1"), Some("route-A"), Some("25:10:00"), Some("20240315")),
        Seq(
          StopTimeUpdate(Some(1), Some("stop-a"),
            arrival = Some(StopTimeEvent(Some(-120), Some(1710517000L))),
            departure = Some(StopTimeEvent(Some(60), None))),
          StopTimeUpdate(Some(2), Some("stop-b"),
            arrival = Some(StopTimeEvent(None, None)),
            departure = None))),
      TripUpdate(
        TripDescriptor(Some("trip-2"), None, None, None), Seq.empty)))

  test("encode/decode round-trips a FeedMessage") {
    val decoded = decode(encode(msg))
    assert(decoded == msg)
  }

  test("negative delays survive (sign-extended 64-bit varints)") {
    val d = decode(encode(msg))
    assert(d.tripUpdates.head.stopTimeUpdates.head.arrival.get.delay.contains(-120))
  }

  test("zip-wrapped payloads are transparently unwrapped") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("feed.pb"))
    zos.write(encode(msg))
    zos.closeEntry(); zos.close()
    assert(decode(bos.toByteArray, "feed_2024-03-15.zip") == msg)
    assert(decode(bos.toByteArray) == msg) // magic-byte sniffing, no filename
  }

  test("unknown fields are skipped, known subset preserved") {
    // append an unknown top-level field (no 15, wire 0) to the payload
    val extra = encode(msg) ++ Array[Byte]((15 << 3).toByte, 0x01)
    assert(decode(extra) == msg)
  }
}
