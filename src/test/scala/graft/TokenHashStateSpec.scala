package graft

import org.apache.spark.sql.functions._

/** The native TokenHashState (optimization round: replaces the
  * interpreted aggregate/filter/split HOF pair in
  * TextOps.tokenHashFrame) must be bit-equal to the HOF formulation on
  * the tokenizer domain and edge shapes.
  */
class TokenHashStateSpec extends SparkSpec {
  import spark.implicits._

  private val P = llm.TextOps.HashMod

  private def hofPair(c: org.apache.spark.sql.Column) = {
    val chars = filter(split(c, ""), ch => length(ch) > 0)
    struct(
      aggregate(chars, lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P).as("th"),
      aggregate(chars, lit(1L), (acc, _) => (acc * 31) % P).as("tp"))
  }

  test("native state equals the HOF fold on tokens, empties, and long strings") {
    val toks = Seq("a", "z", "0", "9", "hello", "x1y2z3", "",
      "a" * 500, "0123456789abcdefghijklmnopqrstuvwxyz" * 3,
      "mixedCASE", "Ünïcødé", "tab\tand space") // beyond-domain BMP strings too
    val df = toks.toDF("tok")
    val rows = df.select(
      hofPair($"tok").as("hof"),
      org.apache.spark.sql.graft.TokenHashState($"tok").as("nat")).collect()
    toks.zip(rows).foreach { case (t, r) =>
      val hof = r.getStruct(0)
      val nat = r.getSeq[Long](1)
      assert(nat == Seq(hof.getLong(0), hof.getLong(1)), s"token '$t'")
    }
  }

  test("null token yields null; tokenHashFrame columns unchanged") {
    val dfn = Seq(Option.empty[String]).toDF("tok")
    assert(dfn.select(org.apache.spark.sql.graft.TokenHashState($"tok")).head().isNullAt(0))
    val frame = llm.TextOps.tokenHashFrame(
      Seq((1L, "the quick brown fox the quick")).toDF("doc_id", "text"))
    assert(frame.columns.toSeq == Seq("doc_id", "pos", "tok", "th", "tp"))
    // spot-pin one value against the direct fold
    val row = frame.where($"pos" === 0).head()
    val th = "the".foldLeft(0L)((a, c) => (a * 31 + c) % P)
    assert(row.getAs[Long]("th") == th && row.getAs[Long]("tp") ==
      (1L to 3L).foldLeft(1L)((a, _) => (a * 31) % P))
  }
}
