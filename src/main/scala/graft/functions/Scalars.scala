package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — F1–F11 of SURVEY.md §2g, re-expressed as
  * pure `Column => Column` compositions of built-in (codegen'd)
  * Catalyst expressions. Zero UDFs: every function here stays inside
  * whole-stage codegen, which is what makes them free at 100 TB.
  *
  * ANSI note: Spark 4 runs with `spark.sql.ansi.enabled=true`; every
  * parse/cast that can fail on data uses the `try_*` family so that the
  * reference's pass-through-on-malformed contract (quote.py:181-182)
  * maps to `coalesce(try_parse(...), original)` instead of a runtime
  * error.
  */
object Scalars {

  private val SrcFmt = "yyyy-MM-dd HH:mm:ss"

  /** F1 `clean_text` (organisation.py:101-104): CR/LF → space, trim. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(c, "[\\r\\n]", " "))

  /** F2 `format_date` (quote.py:175-182): "yyyy-MM-dd HH:mm:ss" →
    * "25-Aug-25 8:41 PM" (`%d-%b-%y %-I:%M %p` — day zero-padded, hour
    * not); malformed input passes through unchanged.
    */
  def formatDate(c: Column): Column =
    coalesce(date_format(try_to_timestamp(c, lit(SrcFmt)), "dd-MMM-yy h:mm a"), c)

  /** F3 `format_date_only` (organisation.py:108-116): → "MM/dd/yyyy",
    * pass-through on parse failure.
    */
  def formatDateOnly(c: Column): Column =
    coalesce(date_format(try_to_timestamp(c, lit(SrcFmt)), "MM/dd/yyyy"), c)

  /** F4 `format_date_ui` (invoice.py:137-145): date part before " " →
    * "dd/MM/yyyy", pass-through on failure.
    */
  def formatDateUi(c: Column): Column =
    coalesce(
      date_format(try_to_timestamp(substring_index(c, " ", 1), lit("yyyy-MM-dd")), "dd/MM/yyyy"),
      c)

  /** F5 owner-string formats. The reference round-trips "ID;First Last"
    * (opportunity.py:132-134,230-231); we carry (id, name) as columns
    * and only format at projection time.
    */
  def ownerIdName(id: Column, name: Column): Column =
    concat_ws(";", id.cast("string"), name)

  /** F5 equipment variant "First Last||ID||User" (equiment.py:104-111).
    * concat, not format_string: java.util.Formatter runs per row and
    * measured ~20% of f_owner's scan+format stage; for %s-only
    * patterns concat is byte-identical on non-null inputs (and on
    * nulls it matches the oracle's `||`, which format_string did not).
    */
  def ownerPipeFormat(id: Column, name: Column): Column =
    concat(name, lit("||"), id.cast("string"), lit("||User"))

  /** F5 name-only re-split: `"ID;First Last".split(";")[1]` — as
    * substring_index (second ';'-delimited segment), which skips the
    * per-row regex split + array materialization (measured ~30% of
    * f_owner warm). Identical output for any name without ';' (the
    * formats this helper round-trips never embed one; the oracle's
    * `s_name` twin pins that on every SF).
    */
  def ownerNameFromIdName(c: Column): Column =
    substring_index(substring_index(c, ";", 2), ";", -1)

  /** F6 full-name concat (quote.py:129): trim-joined first+last. */
  def fullName(first: Column, last: Column): Column =
    trim(concat_ws(" ", first, last))

  /** F7 boolean render "TRUE"/"FALSE" from a state (opportunity.py:221-222). */
  def boolFromState(state: Column, wonValue: String): Column =
    when(state === wonValue, "TRUE").otherwise("FALSE")

  /** F7 variant: stringly-typed custom-field flag → upper-case python-ish
    * literal (organisation.py:126-127 renders `str(bool).upper()`).
    */
  def boolRenderUpper(c: Column): Column =
    upper(coalesce(c, lit("false")))

  /** F8 null-safe string cast of ids: `str(x or "")`. */
  def idToString(c: Column): Column =
    coalesce(c.cast("string"), lit(""))

  /** F10 base64url share-token encode (one_drive.py:94-96):
    * `"u!" + b64(url).rstrip("=").replace("/","_").replace("+","-")`.
    */
  def shareToken(url: Column): Column = {
    // Spark's base64 may MIME-chunk with CRLF every 76 chars; strip first.
    val b64 = regexp_replace(base64(url.cast("binary")), "[\\r\\n]", "")
    concat(lit("u!"), translate(regexp_replace(b64, "=+$", ""), "/+", "_-"))
  }

  /** F11 URL basename (opportunity_stage.py:103-115). */
  def urlBasename(url: Column): Column =
    substring_index(substring_index(url, "?", 1), "/", -1)
}
