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

  test("malformed feeds terminate with a failure, never hang or overrun") {
    import graft.gtfs.RtIngest.decodeOrEmpty
    val good = encode(msg)
    // a length-delimited field whose varint decodes to a NEGATIVE Int32:
    // without bounds discipline pos would move BACKWARDS and the field
    // loop would cycle forever (task hang, uncatchable)
    val negativeLen = Array[Byte](0x0a.toByte, // field 1 (header), wire 2
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f) // len < 0
    assert(decodeOrEmpty(negativeLen, "evil.pb").isEmpty)
    // a varint of endless continuation bytes must fail, not scan past end
    assert(decodeOrEmpty(Array.fill[Byte](64)(0x80.toByte), "evil2.pb").isEmpty)
    // truncations of a valid feed at every prefix length: fail or parse,
    // never throw past decodeOrEmpty, never hang
    (0 until good.length by 3).foreach { n =>
      decodeOrEmpty(good.take(n), s"trunc$n.pb")
    }
    // seeded single-byte corruptions of a valid feed
    val rand = new scala.util.Random(5)
    (0 until 200).foreach { i =>
      val mutated = good.clone()
      mutated(rand.nextInt(mutated.length)) = rand.nextInt(256).toByte
      decodeOrEmpty(mutated, s"mut$i.pb")
    }
  }

  test("zip bomb fails the file instead of exhausting executor memory") {
    // ~300 MB of zeros deflates to ~300 KB; the 256 MB inflation cap must
    // reject it (OutOfMemoryError is not rescuable by the corrupt-feed
    // skip, so the cap has to fire first)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("feed.pb"))
    val chunk = new Array[Byte](1 << 20)
    (0 until 300).foreach(_ => zos.write(chunk))
    zos.closeEntry(); zos.close()
    assert(graft.gtfs.RtIngest.decodeOrEmpty(bos.toByteArray, "bomb.zip").isEmpty)
  }
}
