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

  test("direct date_format equals the parse round-trip on real timestamps (optimization-round pin)") {
    // The export pipelines format a TIMESTAMP column straight to the UI
    // pattern instead of formatting to "yyyy-MM-dd HH:mm:ss" and
    // re-parsing through formatDate/formatDateOnly/formatDateUi (the
    // round-trip measured ~0.65 s of invoice_export alone at sf0.1).
    // This pin proves the shortcut is exact on every timestamp shape
    // the tables hold: the round-trip parse of a just-formatted string
    // always succeeds, so the malformed-passthrough arm is dead there
    // (it stays covered by f_dates/stage_report, whose inputs are
    // genuinely strings).
    import org.apache.spark.sql.functions._
    val ts = Seq(
      Some(java.sql.Timestamp.valueOf("1992-01-01 00:00:00")),
      Some(java.sql.Timestamp.valueOf("1998-12-31 23:59:59")),
      Some(java.sql.Timestamp.valueOf("2026-02-28 12:00:00")),
      Some(java.sql.Timestamp.valueOf("0099-07-04 01:02:03")),
      None).toDF("ts")
    val r = ts.select(
      formatDate(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as("a1"),
      date_format($"ts", "dd-MMM-yy h:mm a").as("b1"),
      formatDateOnly(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as("a2"),
      date_format($"ts", "MM/dd/yyyy").as("b2"),
      formatDateUi(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as("a3"),
      date_format($"ts", "dd/MM/yyyy").as("b3")).collect()
    r.foreach { row =>
      assert(row.get(0) == row.get(1), s"formatDate: $row")
      assert(row.get(2) == row.get(3), s"formatDateOnly: $row")
      assert(row.get(4) == row.get(5), s"formatDateUi: $row")
    }
    // and on the real order-date / ship-date columns end to end
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val mism = o.select(
        formatDate(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("a"),
        date_format(col("o_orderdate"), "dd-MMM-yy h:mm a").as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(mism == 0L)
  }
}
