package graft.llm

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata. The decode step is a clearly-marked deterministic
  * STUB (no image/audio libs in this container) — but the Spark-side
  * shape is real: binary payload column, typed metadata schema,
  * partition-batched decode via mapPartitions, feature vectors out.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no row-level
  * string conversions); the decode runs partition-local in micro-
  * batches (the same shape a vectorized/Arrow UDF would have), so a
  * 100 TB corpus decodes embarrassingly parallel with no shuffle.
  */
object MultimodalQueries {

  /** Metadata extraction over the binary payload — pure built-in
    * expressions (byte length, format sniff, derived dimensions), all
    * oracle-checkable.
    */
  val multimodalMeta: QueryDef = QueryDef.sql(
    "x_multimodal_meta",
    """WITH m AS (SELECT doc_id, encode(text) AS payload, source FROM documents)
      |SELECT doc_id,
      |       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |       CAST(octet_length(payload) % 640 + 1 AS BIGINT) AS width,
      |       CAST((octet_length(payload) * 7) % 480 + 1 AS BIGINT) AS height,
      |       CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      |       CAST(octet_length(payload) % 24 + 1 AS BIGINT) AS n_frames,
      |       base64(encode(substr(source, 1, 16))) AS thumb_b64
      |FROM m""") { (s, d) =>
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        (length(col("payload")) % 640 + 1).cast("long").as("width"),
        ((length(col("payload")) * 7) % 480 + 1).cast("long").as("height"),
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("format"),
        (length(col("payload")) % 24 + 1).cast("long").as("n_frames"),
        base64(substring(col("source"), 1, 16).cast("binary")).as("thumb_b64"))
  }

  /** Input row: media id + opaque payload + declared mime. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Decoded output: typed metadata + a fixed-width feature vector —
    * the schema a real image/audio decoder would produce.
    */
  final case class DecodedMedia(
      doc_id: Long, width: Int, height: Int, format: String,
      n_frames: Int, features: Array[Float])

  /** STUB batch decoder — deterministic fake standing in for an
    * image/audio library (none available in this container). The
    * BATCH signature is the real contract: a native decoder is handed
    * the whole batch once (one JNI/subprocess crossing per 64 items,
    * reusing decode state), not one call per row. Real byte access,
    * fake pixels: dimensions/features derive from payload bytes so the
    * pipeline is testable and reproducible.
    */
  private def stubDecodeBatch(batch: Seq[MediaRow]): Seq[DecodedMedia] = {
    // ??? real batch decoder goes here (e.g. ffmpeg/imageio handed the
    // full buffer set); deterministic per-item fake keeps the plumbing
    // exercised.
    batch.map { m =>
      val bytes = m.payload
      val n = bytes.length
      val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      DecodedMedia(
        doc_id = m.doc_id,
        width = (n % 640) + 1,
        height = ((n * 7) % 480) + 1,
        format = m.mime,
        n_frames = (n % 24) + 1,
        features = Array.tabulate(8)(i => ((checksum >> (i * 4)) & 0xff).toFloat / 255f))
    }
  }

  /** Partition-batched decode: mapPartitions feeding 64-item batches
    * to the batch decoder — the JVM analog of an Arrow-batched decode
    * UDF. Fully oracle-checked: the stub is a deterministic function
    * of the payload bytes (rolling `(a*31+b) mod 1e9+7` checksum and
    * modular dims), and the testdata text is ASCII, so DuckDB
    * reproduces the same values by folding `ascii(c)` over the
    * characters — the same primitive x_fingerprint already pins.
    * `f0_q` quantizes feature[0]: the float step (2^-24 relative) is
    * 100× smaller than the closest any `(x/255)*1000` value comes to
    * a rounding boundary (1/102), so float-vs-double rounding agrees.
    */
  val multimodalDecode: QueryDef = QueryDef.sql(
    "x_multimodal_decode",
    """WITH m AS (
      |  SELECT doc_id,
      |         octet_length(encode(text)) AS n,
      |         CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS mime,
      |         list_reduce(
      |           list_prepend(CAST(0 AS BIGINT),
      |             list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(n % 640 + 1 AS BIGINT) AS width,
      |       CAST((n * 7) % 480 + 1 AS BIGINT) AS height,
      |       mime AS format,
      |       CAST(n % 24 + 1 AS BIGINT) AS n_frames,
      |       CAST(round((CAST((checksum & 255) AS DOUBLE) / 255) * 1000) AS BIGINT) AS f0_q
      |FROM m""") { (s, d) =>
    val spark: SparkSession = s
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("mime"))
      .as[MediaRow]
    media
      .mapPartitions(_.grouped(64).flatMap(stubDecodeBatch))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("format"),
        col("n_frames").cast("long").as("n_frames"),
        round(element_at(col("features"), 1).cast("double") * 1000).cast("long").as("f0_q"))
  }

  /** Frame sampling (keyframe selection): every 4th frame plus the
    * final frame of each media item — the standard subsample-before-
    * decode step for video, so the expensive decode only ever sees
    * the sampled set. Pure index arithmetic over the (deterministic)
    * frame count: per-row fan-out bounded by frames-per-item, zero
    * shuffle, and — unlike the decode itself — fully oracle-checkable.
    */
  val frameSample: QueryDef = QueryDef.sql(
    "x_frame_sample",
    """WITH m AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1)) AS frame_no
      |  FROM m)
      |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, n_frames
      |FROM f
      |WHERE frame_no % 4 = 0 OR frame_no = n_frames - 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        (length(col("text").cast("binary")) % 24 + 1).cast("long").as("n_frames"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"),
        col("n_frames"))
      .where(col("frame_no") % 4 === 0 || col("frame_no") === col("n_frames") - 1)
      .select("doc_id", "frame_no", "n_frames")
  }

  /** One sampled frame awaiting decode: the frame's own byte slice of
    * the media payload plus the container mime.
    */
  final case class FrameRow(doc_id: Long, frame_no: Long, payload: Array[Byte], mime: String)

  final case class DecodedFrame(doc_id: Long, frame_no: Long,
      width: Long, height: Long, f0_q: Long)

  /** Frame-level batch decode: same 64-item batch contract as
    * [[stubDecodeBatch]], re-used per frame slice.
    */
  private def decodeFrameBatch(batch: Seq[FrameRow]): Seq[DecodedFrame] = {
    val dec = stubDecodeBatch(batch.map(f => MediaRow(f.doc_id, f.payload, f.mime)))
    batch.zip(dec).map { case (f, m) =>
      DecodedFrame(f.doc_id, f.frame_no, m.width.toLong, m.height.toLong,
        math.round(m.features(0).toDouble * 1000))
    }
  }

  /** Sample-before-decode, end to end: the frame sampler (every 4th
    * frame + the final frame) runs FIRST, so the expensive batched
    * decode only ever touches the sampled subset — the composed shape
    * of a video-preprocessing pipeline, where decoding all frames
    * would dominate the job. Each sampled frame decodes its own byte
    * slice of the payload (suffix at the frame offset — deterministic,
    * so the checksum/dims are oracle-checkable per frame exactly like
    * x_multimodal_decode). Zero shuffle: sample, slice, and decode are
    * all partition-local.
    */
  val framesDecoded: QueryDef = QueryDef.sql(
    "x_frames_decoded",
    """WITH m AS (
      |  SELECT doc_id, text, CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text, n_frames, unnest(generate_series(0, n_frames - 1)) AS frame_no
      |  FROM m),
      |s AS (
      |  SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
      |         substr(text, CAST(frame_no + 1 AS INTEGER)) AS ftext
      |  FROM f
      |  WHERE frame_no % 4 = 0 OR frame_no = n_frames - 1),
      |c AS (
      |  SELECT doc_id, frame_no,
      |         octet_length(encode(ftext)) AS n,
      |         list_reduce(
      |           list_prepend(CAST(0 AS BIGINT),
      |             list_transform(string_split(ftext, ''), ch -> CAST(ascii(ch) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      |  FROM s)
      |SELECT doc_id, frame_no,
      |       CAST(n % 640 + 1 AS BIGINT) AS width,
      |       CAST((n * 7) % 480 + 1 AS BIGINT) AS height,
      |       CAST(round((CAST((checksum & 255) AS DOUBLE) / 255) * 1000) AS BIGINT) AS f0_q
      |FROM c""") { (s, d) =>
    val spark: SparkSession = s
    import spark.implicits._
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (length(col("text").cast("binary")) % 24 + 1).cast("long").as("n_frames"))
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"))
      // the SAMPLER runs before any decode work exists in the plan
      .where(col("frame_no") % 4 === 0 || col("frame_no") === col("n_frames") - 1)
      .select(col("doc_id"), col("frame_no"),
        expr("substring(text, cast(frame_no + 1 as int))").cast("binary").as("payload"),
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("mime"))
      .as[FrameRow]
    frames.mapPartitions(_.grouped(64).flatMap(decodeFrameBatch)).toDF()
  }

  val all: Seq[QueryDef] =
    Seq(multimodalMeta, multimodalDecode, frameSample, framesDecoded)
}
