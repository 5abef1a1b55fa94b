package graft.gtfs

import java.io.ByteArrayOutputStream
import java.util.zip.ZipInputStream

/** Minimal GTFS-realtime `FeedMessage` codec over the protobuf wire format
  * (field numbers from the public gtfs-realtime.proto; the reference decodes
  * the same subset with prost, `src/importer/per_schedule_importer.rs:96-117`).
  *
  * Hand-rolled on purpose: the build has no protobuf dependency, and the
  * subset needed (trip updates with stop-time delays) is tiny. The decoder
  * is used inside a `flatMap` over `binaryFile` rows; the encoder exists for
  * test fixtures.
  */
object GtfsRt {

  final case class StopTimeEvent(delay: Option[Int], time: Option[Long])
  final case class StopTimeUpdate(stopSequence: Option[Int], stopId: Option[String],
                                  arrival: Option[StopTimeEvent], departure: Option[StopTimeEvent])
  final case class TripDescriptor(tripId: Option[String], routeId: Option[String],
                                  startTime: Option[String], startDate: Option[String])
  final case class TripUpdate(trip: TripDescriptor, stopTimeUpdates: Seq[StopTimeUpdate])
  final case class FeedMessage(headerTimestamp: Option[Long], tripUpdates: Seq[TripUpdate])

  // ── wire-format primitives ──

  /** Bounds discipline (malformed input must FAIL, caught by the ingest's
    * corrupt-feed skip — it must never hang or overrun): every advance of
    * `pos` is validated against `end`. In particular a crafted varint
    * decoding to a NEGATIVE length would otherwise move `pos` backwards
    * and cycle the field loop forever — a task hang that no try/catch
    * rescues; and a nested message's reader must not read its siblings'
    * bytes past its own `end`. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed protobuf: $msg at $pos")
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift <= 63) {
        if (pos >= end) fail("varint overruns message bounds")
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      fail("varint longer than 64 bits")
    }
    private def advance(len: Int): Int = {
      if (len < 0 || pos + len > end || pos + len < pos) fail(s"length $len")
      val start = pos
      pos += len
      start
    }
    def readLengthDelimited(): (Int, Int) = {
      val len = readVarint().toInt
      val start = advance(len)
      (start, start + len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => advance(8)
      case 2 => advance(readVarint().toInt)
      case 5 => advance(4)
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def fields(buf: Array[Byte], start: Int, end: Int)(
      f: (Int, Int, Reader) => Unit): Unit = {
    val r = new Reader(buf, start, end)
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNo = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      f(fieldNo, wire, r)
    }
  }

  // ── decode ──

  /** Decode a FeedMessage; input may be a raw .pb or a .zip containing one
    * (the reference accepts both, `per_schedule_importer.rs:99-107`). */
  def decode(bytes: Array[Byte], fileName: String = ""): FeedMessage = {
    val raw =
      if (fileName.endsWith(".zip") || (bytes.length > 1 && bytes(0) == 'P' && bytes(1) == 'K'))
        unzipFirstEntry(bytes)
      else bytes
    decodeFeedMessage(raw)
  }

  /** Inflation cap: real GTFS-RT feeds are a few MB; a zip bomb
    * (kilobytes inflating to gigabytes) must fail the file — caught by
    * the corrupt-feed skip — before it can OOM the executor, which a
    * try/catch would not rescue. */
  private val MaxInflatedBytes = 256 * 1024 * 1024

  private def unzipFirstEntry(bytes: Array[Byte]): Array[Byte] = {
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zis.getNextEntry
      while (entry != null && entry.isDirectory) entry = zis.getNextEntry
      require(entry != null, "zip archive has no file entry")
      val out = new ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = zis.read(chunk)
      while (n >= 0) {
        require(out.size() + n <= MaxInflatedBytes, "zip entry exceeds inflation cap")
        out.write(chunk, 0, n)
        n = zis.read(chunk)
      }
      out.toByteArray
    } finally zis.close()
  }

  private def decodeFeedMessage(buf: Array[Byte]): FeedMessage = {
    var headerTs: Option[Long] = None
    val updates = Seq.newBuilder[TripUpdate]
    fields(buf, 0, buf.length) { (no, wire, r) =>
      (no, wire) match {
        case (1, 2) => // FeedHeader
          val (s, e) = r.readLengthDelimited()
          fields(buf, s, e) { (hn, hw, hr) =>
            if (hn == 3 && hw == 0) headerTs = Some(hr.readVarint())
            else hr.skip(hw)
          }
        case (2, 2) => // FeedEntity
          val (s, e) = r.readLengthDelimited()
          fields(buf, s, e) { (en, ew, er) =>
            if (en == 3 && ew == 2) { // trip_update
              val (ts, te) = er.readLengthDelimited()
              updates += decodeTripUpdate(buf, ts, te)
            } else er.skip(ew)
          }
        case _ => r.skip(wire)
      }
    }
    FeedMessage(headerTs, updates.result())
  }

  private def decodeTripUpdate(buf: Array[Byte], start: Int, end: Int): TripUpdate = {
    var trip = TripDescriptor(None, None, None, None)
    val stus = Seq.newBuilder[StopTimeUpdate]
    fields(buf, start, end) { (no, wire, r) =>
      (no, wire) match {
        case (1, 2) =>
          val (s, e) = r.readLengthDelimited()
          trip = decodeTripDescriptor(buf, s, e)
        case (2, 2) =>
          val (s, e) = r.readLengthDelimited()
          stus += decodeStopTimeUpdate(buf, s, e)
        case _ => r.skip(wire)
      }
    }
    TripUpdate(trip, stus.result())
  }

  private def str(buf: Array[Byte], s: Int, e: Int): String =
    new String(buf, s, e - s, java.nio.charset.StandardCharsets.UTF_8)

  private def decodeTripDescriptor(buf: Array[Byte], start: Int, end: Int): TripDescriptor = {
    var tripId, routeId, startTime, startDate: Option[String] = None
    fields(buf, start, end) { (no, wire, r) =>
      (no, wire) match {
        case (1, 2) => val (s, e) = r.readLengthDelimited(); tripId = Some(str(buf, s, e))
        case (2, 2) => val (s, e) = r.readLengthDelimited(); startTime = Some(str(buf, s, e))
        case (3, 2) => val (s, e) = r.readLengthDelimited(); startDate = Some(str(buf, s, e))
        case (5, 2) => val (s, e) = r.readLengthDelimited(); routeId = Some(str(buf, s, e))
        case _ => r.skip(wire)
      }
    }
    TripDescriptor(tripId, routeId, startTime, startDate)
  }

  private def decodeStopTimeUpdate(buf: Array[Byte], start: Int, end: Int): StopTimeUpdate = {
    var seq: Option[Int] = None
    var stopId: Option[String] = None
    var arrival, departure: Option[StopTimeEvent] = None
    fields(buf, start, end) { (no, wire, r) =>
      (no, wire) match {
        case (1, 0) => seq = Some(r.readVarint().toInt)
        case (4, 2) => val (s, e) = r.readLengthDelimited(); stopId = Some(str(buf, s, e))
        case (2, 2) => val (s, e) = r.readLengthDelimited(); arrival = Some(decodeEvent(buf, s, e))
        case (3, 2) => val (s, e) = r.readLengthDelimited(); departure = Some(decodeEvent(buf, s, e))
        case _ => r.skip(wire)
      }
    }
    StopTimeUpdate(seq, stopId, arrival, departure)
  }

  private def decodeEvent(buf: Array[Byte], start: Int, end: Int): StopTimeEvent = {
    var delay: Option[Int] = None
    var time: Option[Long] = None
    fields(buf, start, end) { (no, wire, r) =>
      (no, wire) match {
        case (1, 0) => delay = Some(r.readVarint().toInt) // negative int32 arrives as 64-bit varint
        case (2, 0) => time = Some(r.readVarint())
        case _ => r.skip(wire)
      }
    }
    StopTimeEvent(delay, time)
  }

  // ── encode (test fixtures only) ──

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(fieldNo: Int, wire: Int): Unit = varint((fieldNo.toLong << 3) | wire)
    def string(fieldNo: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); tag(fieldNo, 2); varint(b.length); out.write(b)
    }
    def int(fieldNo: Int, v: Long): Unit = { tag(fieldNo, 0); varint(v) }
    def message(fieldNo: Int, m: Writer): Unit = {
      val b = m.out.toByteArray; tag(fieldNo, 2); varint(b.length); out.write(b)
    }
  }

  def encode(msg: FeedMessage): Array[Byte] = {
    val w = new Writer
    val h = new Writer
    h.string(1, "2.0")
    msg.headerTimestamp.foreach(t => h.int(3, t))
    w.message(1, h)
    msg.tripUpdates.zipWithIndex.foreach { case (tu, i) =>
      val e = new Writer
      e.string(1, s"e$i")
      val tw = new Writer
      val td = new Writer
      tu.trip.tripId.foreach(td.string(1, _))
      tu.trip.startTime.foreach(td.string(2, _))
      tu.trip.startDate.foreach(td.string(3, _))
      tu.trip.routeId.foreach(td.string(5, _))
      tw.message(1, td)
      tu.stopTimeUpdates.foreach { stu =>
        val sw = new Writer
        stu.stopSequence.foreach(v => sw.int(1, v.toLong))
        stu.arrival.foreach { ev =>
          val evw = new Writer
          ev.delay.foreach(d => evw.int(1, d.toLong)) // sign-extended 64-bit varint
          ev.time.foreach(t => evw.int(2, t))
          sw.message(2, evw)
        }
        stu.departure.foreach { ev =>
          val evw = new Writer
          ev.delay.foreach(d => evw.int(1, d.toLong))
          ev.time.foreach(t => evw.int(2, t))
          sw.message(3, evw)
        }
        stu.stopId.foreach(sw.string(4, _))
        tw.message(2, sw)
      }
      e.message(3, tw)
      w.message(2, e)
    }
    w.out.toByteArray
  }
}
