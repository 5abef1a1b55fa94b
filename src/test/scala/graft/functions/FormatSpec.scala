package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C14 format_delay / C16 percent-encoding (reference
  * `src/monitor/mod.rs:1174-1180` and the PATH_ELEMENT_ESCAPE set). */
class FormatSpec extends SparkSpec {

  test("format_delay: '+' only for positive values") {
    import spark.implicits._
    val got = Seq(120, 0, -45).toDF("d")
      .select(Format.formatDelay(col("d"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("+120", "0", "-45"))
  }

  test("format_duration: seconds under a minute, m:ss above") {
    import spark.implicits._
    val got = Seq(45, 60, 61, 605, 3725).toDF("s")
      .select(Format.formatDuration(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("45 Sek.", "1:00 Min.", "1:01 Min.", "10:05 Min.", "62:05 Min."))
  }

  test("path element encoding escapes exactly the reference's AsciiSet") {
    assert(Format.pathElementEncode("Haupt/Bahnhof?") == "Haupt%2FBahnhof%3F")
    assert(Format.pathElementEncode("a\"b`cd") == "a%22b%60c%01d")
    // '%' and non-ASCII pass through unencoded (set-based, not URL-generic)
    assert(Format.pathElementEncode("100% Fußweg") == "100% Fußweg")
    import spark.implicits._
    val viaUdf = Seq("Haupt/Bahnhof?").toDF("s")
      .select(Format.pathElementEncodeUdf(col("s"))).collect().head.getString(0)
    assert(viaUdf == "Haupt%2FBahnhof%3F")
  }
}
