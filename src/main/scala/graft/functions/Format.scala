package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presentation scalars C14/C16 (reference `src/monitor/mod.rs:1174-1180,27`):
  * tiny, but they complete the operator inventory — the HTML/PNG layers
  * around them stay out of engine scope (SURVEY §7.4.7). */
object Format {

  /** C14 `format_delay`: positive delays get an explicit '+'
    * (`mod.rs:1174-1180`). Pure Column expression — codegen'd. */
  def formatDelay(delay: Column): Column =
    when(delay > 0, concat(lit("+"), delay.cast("string")))
      .otherwise(delay.cast("string"))

  /** C14 `format_duration` (`mod.rs:1183-1190`): "<s> Sek." under a
    * minute, else "<m>:<ss> Min." — pure Column expression. */
  def formatDuration(seconds: Column): Column =
    when(seconds < 60, concat(seconds.cast("string"), lit(" Sek.")))
      .otherwise(concat((seconds / 60).cast("int").cast("string"), lit(":"),
        lpad((seconds % 60).cast("int").cast("string"), 2, "0"), lit(" Min.")))

  /** The reference's PATH_ELEMENT_ESCAPE set: ASCII controls plus
    * '/', '?', '"', '`' (`mod.rs:27`). Only these are %XX-escaped;
    * everything else — including '%' and non-ASCII — passes through, like
    * `utf8_percent_encode` with a custom AsciiSet. */
  private val EscapeSet: Set[Char] =
    (0.toChar to 0x1f.toChar).toSet + 0x7f.toChar + '/' + '?' + '"' + '`'

  /** Pure twin, used by the UDF and directly testable. */
  def pathElementEncode(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach { c =>
      if (EscapeSet(c)) b.append(f"%%${c.toInt}%02X")
      else b.append(c)
    }
    b.toString
  }

  /** C16 percent-encoding as a column (presentation scalar, not a hot
    * path — a UDF is acceptable here; the per-char escape set does not map
    * onto a builtin). */
  val pathElementEncodeUdf = udf((s: String) =>
    if (s == null) null else pathElementEncode(s))
}
