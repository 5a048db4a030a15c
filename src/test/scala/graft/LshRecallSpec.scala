package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Verifies the MinHash-LSH banding math EMPIRICALLY: candidate
  * recall on a synthetic corpus with planted near-dup pairs at
  * controlled Jaccard levels must track the theoretical S-curve
  * P(candidate) = 1 − (1 − s^r)^b, for both shipped band layouts.
  * This turns the banding parameters from documented intent into a
  * measured property — a regression in the signature or band-key
  * construction (e.g. a permutation reused across bands, or a key
  * that drops a row) shifts the curve far outside the tolerance.
  *
  * Construction: each planted pair lives in its own pseudo-random
  * shingle-id universe (fixed seed — fully deterministic), sharing
  * exactly c of n shingles per side so its Jaccard c/(2n−c) is exact
  * by construction. Pairs are mutually disjoint, so each is an
  * independent Bernoulli trial of the banding; with 150 trials per
  * level the binomial noise is ≈±0.04 and the ±0.12 gate leaves room
  * for the residual min-wise bias of 2-universal hashing.
  */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val nPairs = 150
  private val nShingles = 50
  // shared-shingle counts for ~{0.30, 0.49, 0.70, 0.85, 0.96} Jaccard
  private val sharedCounts = Seq(23, 33, 41, 46, 49)

  /** (postings, planted) — postings rows (doc_id, sid); planted maps
    * each (doc_a, doc_b) pair to its exact Jaccard.
    */
  private def plantedCorpus(): (Seq[(Long, Long)], Map[(Long, Long), Double]) = {
    val rows = Seq.newBuilder[(Long, Long)]
    val planted = Map.newBuilder[((Long, Long)), Double]
    var pairIdx = 0
    for (c <- sharedCounts; _ <- 0 until nPairs) {
      val rnd = new Random(pairIdx * 7919 + 17)
      val universe = Iterator.continually(rnd.nextLong(1L << 50))
        .distinct.take(2 * nShingles - c).toSeq
      val shared = universe.take(c)
      val onlyA = universe.slice(c, nShingles)
      val onlyB = universe.drop(nShingles)
      val (da, db) = (2L * pairIdx, 2L * pairIdx + 1)
      (shared ++ onlyA).foreach(s => rows += ((da, s)))
      (shared ++ onlyB).foreach(s => rows += ((db, s)))
      planted += ((da, db)) -> c.toDouble / (2 * nShingles - c)
      pairIdx += 1
    }
    (rows.result(), planted.result())
  }

  test("MinHash-LSH candidate recall tracks the 1-(1-s^r)^b S-curve for both band layouts") {
    val (rows, planted) = plantedCorpus()
    val post = rows.toDF("doc_id", "sid")
    for ((perms, bands) <- Seq((8, 4), (16, 8))) {
      val r = perms / bands
      val cands = llm.DedupQueries.bandCandidates(post, perms, bands)
        .as[(Long, Long)].collect().toSet
      // group planted pairs by their (identical within a level) Jaccard
      val byLevel = planted.groupBy(_._2).toSeq.sortBy(_._1)
      val report = byLevel.map { case (j, pairs) =>
        val recall = pairs.keys.count(cands).toDouble / pairs.size
        val theory = 1.0 - math.pow(1.0 - math.pow(j, r), bands)
        (j, recall, theory)
      }
      report.foreach { case (j, recall, theory) =>
        assert(math.abs(recall - theory) <= 0.12,
          f"($perms perms/$bands bands) j=$j%.3f: measured recall $recall%.3f " +
            f"vs theoretical $theory%.3f — banding math off " +
            f"(full curve: ${report.map(t => f"${t._1}%.2f->${t._2}%.2f/${t._3}%.2f").mkString(", ")})")
      }
      // and the curve is monotone in similarity, as any banding must be
      report.sliding(2).foreach { case Seq((j1, r1, _), (j2, r2, _)) =>
        assert(r2 >= r1 - 0.05, f"recall not monotone: j=$j1%.3f -> $r1%.3f but j=$j2%.3f -> $r2%.3f")
      }
    }
  }
}
