package graft

import graft.llm.MediaDecode
import graft.llm.MultimodalQueries.MediaRow

/** Golden-bytes tests for the REAL pure-JVM media decoders: byte-exact
  * PPM(P6) and 24-bpp BMP fixtures built by hand, decoded both
  * directly and through the distributed 64-item mapPartitions seam.
  * The shared 2×2 image is red/green/blue/white, so every feature is
  * hand-derivable: channel means 127.5/255 = 0.5; per-pixel luma
  * 85, 85, 85, 255 → min 1/3, max 1.0, mean 0.5; one of four pixels
  * bright → 0.25; aspect 2/(2+2) = 0.5; position-weighted R over
  * logical order (red, green, blue, white) = 0·255+1·0+2·0+3·255 =
  * 765 → 765/(255·4²) = 0.1875.
  */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val expectedFeatures =
    Array(0.5f, 0.5f, 0.5f, 85f / 255f, 1.0f, 0.5f, 0.25f, 0.5f, 0.1875f)

  private def assertFeatures(got: Array[Float], what: String): Unit = {
    // length pinned first: zip() truncates, so a decoder silently
    // dropping the 9th (position-weighted) feature must not pass
    assert(got.length == expectedFeatures.length,
      s"$what: ${got.length} features, want ${expectedFeatures.length}")
    expectedFeatures.zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(math.abs(g - want) < 1e-6f, s"$what: feature $i: got $g want $want")
    }
  }

  /** P6, 2×2, maxval 255, with a header comment: pixels row-major
    * red green / blue white.
    */
  private def goldenPpm: Array[Byte] =
    "P6\n# golden fixture\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      255.toByte, 0, 0, /**/ 0, 255.toByte, 0,
      0, 0, 255.toByte, /**/ 255.toByte, 255.toByte, 255.toByte)

  /** 24-bpp bottom-up BMP of the same 2×2 image, rows padded to 4
    * bytes, samples BGR: file row 0 is the image's BOTTOM row.
    */
  private def goldenBmp: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val rowSize = 8 // ((2*3 + 3)/4)*4
    val pix =
      Array[Byte](255.toByte, 0, 0, /*BGR blue*/ 255.toByte, 255.toByte, 255.toByte, 0, 0) ++ // bottom: blue, white
        Array[Byte](0, 0, 255.toByte, /*BGR red*/ 0, 255.toByte, 0, 0, 0) // top: red, green
    assert(pix.length == rowSize * 2)
    Array[Byte]('B', 'M') ++ le32(54 + pix.length) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++ // DIB: w=2 h=2 24bpp BI_RGB
      le32(pix.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      pix
  }

  test("PPM golden bytes decode exactly (header comment, maxval 255)") {
    val Seq(d) = MediaDecode.decodeBatchReal(Seq(MediaRow(7L, goldenPpm, "ppm")))
    assert((d.doc_id, d.width, d.height, d.format, d.n_frames) == ((7L, 2, 2, "ppm", 1)))
    assertFeatures(d.features, "ppm")
  }

  test("BMP golden bytes decode exactly (bottom-up rows, BGR, padding)") {
    val Seq(d) = MediaDecode.decodeBatchReal(Seq(MediaRow(8L, goldenBmp, "bmp")))
    assert((d.doc_id, d.width, d.height, d.format, d.n_frames) == ((8L, 2, 2, "bmp", 1)))
    assertFeatures(d.features, "bmp")
  }

  test("top-down BMP (negative height) yields the same pixels") {
    val bottomUp = goldenBmp
    // negate the height field (offset 22) and swap the two pixel rows
    val topDown = bottomUp.clone()
    val negH = -2
    topDown(22) = negH.toByte; topDown(23) = (negH >> 8).toByte
    topDown(24) = (negH >> 16).toByte; topDown(25) = (negH >> 24).toByte
    Array.copy(bottomUp, 54 + 8, topDown, 54, 8)
    Array.copy(bottomUp, 54, topDown, 54 + 8, 8)
    val Seq(a) = MediaDecode.decodeBatchReal(Seq(MediaRow(1L, bottomUp, "bmp")))
    val Seq(b) = MediaDecode.decodeBatchReal(Seq(MediaRow(1L, topDown, "bmp")))
    assert(a.features.toSeq == b.features.toSeq && a.width == b.width && a.height == b.height)
  }

  test("non-square BMP exercises real row padding (3x1 -> 12-byte rows)") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // one row: black, mid-gray(90), white + 3 padding bytes
    val pix = Array[Byte](0, 0, 0, 90, 90, 90, 255.toByte, 255.toByte, 255.toByte, 0, 0, 0)
    val bmp = Array[Byte]('B', 'M') ++ le32(54 + pix.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(1) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(pix.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ pix
    val Seq(d) = MediaDecode.decodeBatchReal(Seq(MediaRow(2L, bmp, "bmp")))
    assert((d.width, d.height) == ((3, 1)))
    val mean = (0 + 90 + 255).toFloat / 3 / 255
    assert(math.abs(d.features(0) - mean) < 1e-6 && math.abs(d.features(5) - mean) < 1e-6)
    assert(d.features(3) == 0f && d.features(4) == 1f) // min/max luma
    assert(math.abs(d.features(7) - 0.75f) < 1e-6) // aspect 3/(3+1)
    // posWeightR: 0·0 + 1·90 + 2·255 = 600 over 255·3² = 2295
    assert(math.abs(d.features(8) - 600f / 2295f) < 1e-6)
  }

  test("distributed decode: golden bytes through the 64-item mapPartitions seam") {
    // >64 items across both formats forces at least two decoder
    // batches inside a partition — the batch boundary itself is real.
    val rows = (0L until 150L).map { i =>
      if (i % 2 == 0) MediaRow(i, goldenPpm, "ppm") else MediaRow(i, goldenBmp, "bmp")
    }
    val got = MediaDecode.decodeMedia(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.doc_id)
    assert(got.length == 150)
    got.foreach { d =>
      assert(d.width == 2 && d.height == 2 && d.n_frames == 1)
      assert(d.format == (if (d.doc_id % 2 == 0) "ppm" else "bmp"))
      assertFeatures(d.features, s"doc ${d.doc_id}")
    }
  }

  test("undecodable magic names the document") {
    val e = intercept[IllegalArgumentException] {
      MediaDecode.decodeBatchReal(Seq(MediaRow(42L, "GIF89a".getBytes("US-ASCII"), "gif")))
    }
    assert(e.getMessage.contains("doc_id=42"))
  }

  test("corrupt containers fail loudly, not garbage-decode") {
    intercept[IllegalArgumentException] { // truncated PPM pixel data
      MediaDecode.decodeBatchReal(Seq(MediaRow(1L, "P6\n2 2\n255\nxy".getBytes("US-ASCII"), "ppm")))
    }
    intercept[IllegalArgumentException] { // 16-color BMP (unsupported bpp)
      val b = goldenBmp.clone(); b(28) = 4
      MediaDecode.decodeBatchReal(Seq(MediaRow(2L, b, "bmp")))
    }
  }
}
