package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable relational operator library — the Spark-first re-expression
  * of SURVEY.md §2's inventory (G1–G3 generators, A1–A5 aggregates,
  * S4 semi-join prefetch, J-family broadcast joins, D1 dedup).
  *
  * Scale notes per operator are inline; the common theme: keep
  * everything declarative so Catalyst prunes columns into the scan,
  * keep dims broadcast (no shuffle of the fact side), and do array
  * work with higher-order functions (per-row, narrow, no shuffle).
  */
object Relational {

  // ---------------------------------------------------------------- G3
  /** EAV pivot (quote.py:202): `array<struct<FIELD_NAME,FIELD_VALUE>>`
    * → map. Narrow per-row op; column pruning still reaches the scan
    * because `map_from_entries` is a deterministic expression.
    */
  def pivotEav(eav: Column): Column = map_from_entries(eav)

  /** Custom-field extraction with the reference's `dict.get(k, "")`
    * default (quote.py:211-213). `try_element_at` keeps ANSI mode from
    * erroring on absent keys.
    */
  def eavGet(m: Column, key: String): Column =
    coalesce(try_element_at(m, lit(key)), lit(""))

  /** eavGet with a non-empty fallback chain (P2, quote.py:212). */
  def eavGetOr(m: Column, key: String, fallback: Column): Column =
    coalesce(try_element_at(m, lit(key)), fallback, lit(""))

  // ---------------------------------------------------------------- A1
  /** Conditional count over an array of typed links
    * (organisation.py:124) — `size(filter(...))`, no shuffle at all.
    */
  def countLinksOfType(links: Column, tpe: String): Column = {
    val n = size(filter(links, l => l.getField("LINK_OBJECT_NAME") === tpe))
    when(links.isNull, 0).otherwise(greatest(n, lit(0)))
  }

  // ---------------------------------------------------------------- G2
  /** Last-wins link routing (task.py:223-246): the reference's Python
    * loop overwrites per-type slots, so with two links of one type the
    * LAST in array order wins. `try_element_at(filter, -1)` preserves
    * exactly that; null-safe for tasks with no link of the type.
    */
  def lastLinkOfType(links: Column, tpe: String): Column =
    try_element_at(
      filter(links, l => l.getField("LINK_OBJECT_NAME") === tpe), lit(-1)
    ).getField("LINK_OBJECT_ID")

  // ---------------------------------------------------------------- A4
  /** Falsy-skipping string aggregation with separator
    * (opportunity.py:196: `" and ".join(names)` skipping empties).
    * Input is an already-collected array column; sort first so the
    * result is deterministic under Spark's unordered collect_list.
    */
  def joinNonEmptySorted(arr: Column, sep: String): Column =
    array_join(array_sort(filter(arr, x => x.isNotNull && x =!= "")), sep)

  // ---------------------------------------------------------------- S4
  /** Semi-join prefetch (task.py:79-104): restrict a dimension to the
    * fact's key set before joining. On a cluster this is what keeps the
    * broadcast build side small when the dim is huge but the fact only
    * references a sliver of it.
    */
  def semiFilteredDim(dim: DataFrame, dimKey: String, factKeys: DataFrame): DataFrame =
    dim.join(factKeys, dim(dimKey) === factKeys(factKeys.columns.head), "left_semi")

  // ---------------------------------------------------------------- J*
  /** Role-playing broadcast left join (J4/J12): join the same dim under
    * a role prefix. Broadcast hint ⇒ no shuffle of the fact side, and
    * N roles cost N map-side probes of the same small hash relation.
    */
  def rolePlayingJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: String,
      rolePrefix: String,
      payload: Seq[(String, String)]): DataFrame = {
    val sel = dim(dimKey).as(s"__${rolePrefix}_key") +:
      payload.map { case (src, out) => dim(src).as(s"${rolePrefix}_$out") }
    val d = dim.select(sel: _*)
    fact.join(broadcast(d), factKey === d(s"__${rolePrefix}_key"), "left")
      .drop(s"__${rolePrefix}_key")
  }

  // ---------------------------------------------------------------- D1
  /** Whole-row dedup at the reference's post-projection position
    * (opportunity.py:257-258). At scale this is one hash-aggregate
    * shuffle on the (already narrow) report columns.
    */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  // ------------------------------------------------------------- skew
  /** Salted equi-join for skewed fact keys: the dim side is replicated
    * `buckets` times (one copy per salt value), the fact side gets a
    * deterministic salt from a secondary column, and the join key
    * becomes (key, salt) — a hot key's rows spread over `buckets`
    * reducers instead of one. Result is exactly the plain join
    * (dim replicated × fact salted-once ⇒ one match per original
    * match). AQE's skew-join handles moderate skew automatically; this
    * is the explicit tool for the pathological keys AQE can't split
    * (e.g. a single null-ish default key owning 10% of a 100 TB
    * fact).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: Column, buckets: Int, joinType: String = "left"): DataFrame = {
    // only fact-preserving joins are equivalent under dim replication
    // (an unmatched dim row would otherwise be emitted `buckets` times)
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    // null saltSource must still land in a bucket, or the row would
    // match no dim copy and silently diverge from the plain join
    val salt = pmod(coalesce(saltSource.cast("long"), lit(0L)), lit(buckets))
    val salted = fact.withColumn("__salt", salt)
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
