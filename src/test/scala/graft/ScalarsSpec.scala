package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars._

/** Golden-row tests for the scalar library — semantics the SQL oracle
  * can't pin down cleanly (SURVEY §5.2): malformed-date passthrough,
  * empty-string behavior, owner-string round-trips.
  */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String = {
    val r = Seq(input).toDF("v").select(c.as("r")).head().getString(0)
    if (r == null) "<null>" else r
  }

  test("F2 formatDate: valid timestamp renders reference style") {
    assert(one(formatDate($"v"), "2025-08-25 20:41:07") == "25-Aug-25 8:41 PM")
    // %d pads the day; %-I does not pad the hour (quote.py:180)
    assert(one(formatDate($"v"), "2025-08-05 08:05:07") == "05-Aug-25 8:05 AM")
    assert(one(formatDate($"v"), "2025-08-05 00:00:00") == "05-Aug-25 12:00 AM")
  }

  test("F2-F4 malformed input passes through unchanged (quote.py:181-182)") {
    for (bad <- Seq("not a date", "2025-13-45 99:99:99", "25/08/2025", "")) {
      assert(one(formatDate($"v"), bad) == bad)
      assert(one(formatDateOnly($"v"), bad) == bad)
      assert(one(formatDateUi($"v"), bad) == bad)
    }
  }

  test("F3/F4 date-only formats") {
    assert(one(formatDateOnly($"v"), "2025-08-05 08:05:07") == "08/05/2025")
    assert(one(formatDateUi($"v"), "2025-08-05 08:05:07") == "05/08/2025")
    // F4 takes the date part before the space — time part irrelevant
    assert(one(formatDateUi($"v"), "2025-08-05 garbage") == "05/08/2025")
  }

  test("F1 cleanText replaces each CR/LF with one space and trims") {
    assert(one(cleanText($"v"), " a\r\nb \n") == "a  b")
    assert(one(cleanText($"v"), "plain") == "plain")
  }

  test("F5 owner-string round-trip: ID;Name -> name") {
    val df = Seq((7L, "Ada Lovelace")).toDF("id", "name")
    val r = df.select(
      ownerIdName($"id", $"name").as("o"),
      ownerNameFromIdName(ownerIdName($"id", $"name")).as("n"),
      ownerPipeFormat($"id", $"name").as("p"))
      .head()
    assert(r.getString(0) == "7;Ada Lovelace")
    assert(r.getString(1) == "Ada Lovelace")
    assert(r.getString(2) == "Ada Lovelace||7||User")
  }

  test("F10 shareToken: base64url, no padding, u! prefix (one_drive.py:94-96)") {
    // python: base64.b64encode(url).rstrip('=').replace('/','_').replace('+','-')
    val t = one(shareToken($"v"), "https://x.example/a?b=c")
    assert(t.startsWith("u!"))
    assert(!t.contains("=") && !t.contains("/") && !t.contains("+") && !t.contains("\r"))
    assert(t == "u!" + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("https://x.example/a?b=c".getBytes))
  }

  test("F11 urlBasename strips query and path") {
    assert(one(urlBasename($"v"), "https://h/p/dir/file.xlsx?x=1&y=2") == "file.xlsx")
    assert(one(urlBasename($"v"), "file.xlsx") == "file.xlsx")
  }
}
