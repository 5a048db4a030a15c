package graft

import org.apache.spark.sql.functions._

/** The native codegen'd PlaneBuckets (optimization round: one
  * expression instead of explode + interpreted HOF dots + a
  * groupBy(vec_id, band) exchange) must produce bit-identical buckets
  * to the HOF formulation it replaced, for every registered config
  * (single-band 16/24, banded 4×8/6×8) and on adversarial vectors
  * (negatives, zeros, empty arrays, dot exactly 0).
  */
class PlaneBucketsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-optimization formulation, verbatim: explode over planes,
    * interpreted zip_with/aggregate dot, groupBy re-assembly.
    */
  private def hofBuckets(df: org.apache.spark.sql.DataFrame,
      bands: Int, r: Int): org.apache.spark.sql.DataFrame = {
    val dots = df.select(col("vec_id"), col("qe"),
        explode(sequence(lit(0), lit(bands * r - 1))).as("plane"))
      .select(col("vec_id"), col("plane"),
        aggregate(
          zip_with(col("qe"), sequence(lit(0), size(col("qe")) - 1),
            (x, j) => x * (((col("plane") * 97 + j * 31 + 7) % 21) - 10)),
          lit(0L), (acc, x) => acc + x).as("dot"))
    dots
      .groupBy(col("vec_id"), (col("plane") / lit(r)).cast("long").as("band"))
      .agg(sum(when(col("dot") >= 0,
          expr(s"shiftleft(cast(1 as bigint), plane % $r)")).otherwise(0L))
        .as("bucket"))
  }

  private def nativeBuckets(df: org.apache.spark.sql.DataFrame,
      bands: Int, r: Int): org.apache.spark.sql.DataFrame =
    df.select(col("vec_id"),
        posexplode(org.apache.spark.sql.graft.PlaneBuckets(col("qe"), bands * r, r))
          .as(Seq("band", "bucket")))
      .select(col("vec_id"), col("band").cast("long").as("band"), col("bucket"))

  private val rnd = new scala.util.Random(7)
  // In-domain vectors (quantized embeddings: |qe[j]| ≤ ~1e7, so every
  // dot stays far below 2⁶³). The out-of-domain wraparound vector is
  // exercised only in the interpreted-vs-codegen test below: under
  // ANSI mode the HOF reference THROWS on long overflow while the
  // native loop wraps — both are outside the quantize() contract.
  private val vectors: Seq[(Long, Seq[Long])] =
    (1L to 40L).map(i => i -> Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong() % 20000)) ++
      Seq(41L -> Seq.empty[Long], // empty: every dot is 0 => all sign bits set
        42L -> Seq.fill(64)(0L), // zero vector: same
        43L -> Seq.fill(64)(-1000000L))
  private val wraparound: Seq[(Long, Seq[Long])] =
    Seq(44L -> Seq(Long.MaxValue, Long.MinValue, 123L))

  test("native banded buckets match the HOF formulation on every registered config") {
    val df = vectors.toDF("vec_id", "qe")
    for ((bands, r) <- Seq((1, 16), (1, 24), (4, 8), (6, 8), (2, 12))) {
      val exp = hofBuckets(df, bands, r).orderBy("vec_id", "band").collect()
      val got = nativeBuckets(df, bands, r).orderBy("vec_id", "band").collect()
      assert(got.toSeq == exp.toSeq, s"mismatch at bands=$bands r=$r")
    }
  }

  test("native buckets match on real testdata embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), llm.TextOps.quantize(col("embedding")).as("qe"))
    val exp = hofBuckets(e, 6, 8).orderBy("vec_id", "band").collect()
    val got = nativeBuckets(e, 6, 8).orderBy("vec_id", "band").collect()
    assert(got.length > 0 && got.toSeq == exp.toSeq)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val df = (vectors ++ wraparound).toDF("vec_id", "qe")
    val viaDf = df.select(col("vec_id"),
        org.apache.spark.sql.graft.PlaneBuckets(col("qe"), 48, 8).as("b"))
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    val interpreted = org.apache.spark.sql.graft.PlaneBuckets(
      BoundReference(0, ArrayType(LongType), nullable = true), 48, 8)
    (vectors ++ wraparound).sortBy(_._1).map(_._2).zip(viaDf).foreach { case (qe, expected) =>
      val got = interpreted.eval(InternalRow(new GenericArrayData(qe.toArray)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      assert(got == expected.toSeq)
    }
  }

  test("null input yields null") {
    val df = Seq((1L, Option.empty[Seq[Long]])).toDF("vec_id", "qe")
    assert(df.select(org.apache.spark.sql.graft.PlaneBuckets(col("qe"), 16, 16))
      .head().isNullAt(0))
  }
}
