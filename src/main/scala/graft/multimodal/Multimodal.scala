package graft.multimodal


import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Multimodal column handling (builder mandate; SURVEY §7.4): media as
  * opaque BinaryType with a typed metadata struct, decode/feature-extract
  * as per-partition batch plumbing.
  *
  * The container has no image/audio libraries, so decoding is STUBBED
  * behind [[FakeDecoder]] — a deterministic fake deriving features from the
  * md5 of the bytes. Everything around the stub is real Spark plumbing:
  * binary schema, partition-batched decode via mapPartitions (the Scala
  * analogue of mapInPandas batch decoding), and expression-level metadata
  * extraction with a DuckDB oracle.
  *
  * Scale design: media bytes never shuffle — metadata extraction projects
  * doc_id + digests before any wide operation, and mapPartitions keeps
  * decode zero-copy per partition; real decoders would amortize model/lib
  * init once per partition exactly like this stub does.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media: Array[Byte], format: String, n_bytes: Long)

  /** Decoded per-media features (deterministic fake values). */
  case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** Synthesize a media table from any (doc_id, text) frame: payload =
    * UTF-8 bytes of the text, format round-robins img/audio/video. */
  def mediaFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      element_at(
        array(lit("img"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Synthesize a media table from `documents`. */
  def mediaFromDocuments(s: SparkSession, dir: String): DataFrame =
    mediaFrom(Tables.documents(s, dir))

  /** STUB decoder — stands in for image/audio/video codecs that are not in
    * this container. Deterministic: features derive from md5(payload), so
    * the expression-level query and the mapPartitions path agree. A real
    * deployment replaces `decode` with the actual codec call; the
    * partition-batch shape stays identical. */
  object FakeDecoder {
    /** Same value as the SQL-side `Portable.h32` of the original text
      * (md5 over the identical UTF-8 bytes, first 4 digest bytes read
      * big-endian — hex round-trip elided; ThreadLocal digest via
      * Md5Hash instead of a per-row getInstance). */
    def h32(bytes: Array[Byte]): Long =
      graft.functions.expressions.Md5Hash.hashPair(bytes)._1

    def decode(r: MediaRow): MediaFeatures = {
      val h = h32(r.media)
      MediaFeatures(
        r.doc_id, r.format, r.n_bytes,
        width = (32 + h % 97).toInt,
        height = (24 + (h / 97) % 97).toInt,
        n_frames = if (r.format == "video") (1 + h % 16).toInt else 1)
    }
  }

  /** REAL codec behind the same seam (round-3 item 7): PNG decode via
    * `javax.imageio` — pure-JVM, headless-safe, present in this
    * container's JDK. Proves [[decodeFeaturesWith]] is a genuine codec
    * seam, not stub-shaped plumbing: swap the function, keep the schema,
    * partitioning, and per-partition batch shape. (Audio/video codecs
    * are still absent from the container, so the fake decoder remains
    * the default for the oracle-checked gate, which covers all three
    * formats.) */
  object PngDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      MediaFeatures(r.doc_id, r.format, r.n_bytes,
        width = img.getWidth, height = img.getHeight, n_frames = 1)
    }
  }

  /** Partition-batched decode through an arbitrary codec: one decoder
    * instantiation per partition (where a real codec binds native
    * resources), rows streamed through it. */
  def decodeFeaturesWith(media: Dataset[MediaRow])(
      decoder: MediaRow => MediaFeatures): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real decoder/native lib
      rows.map(decoder)
    }
  }

  /** [[decodeFeaturesWith]] using the deterministic [[FakeDecoder]] —
    * the oracle-checkable default. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeFeaturesWith(media)(FakeDecoder.decode)

  /** A sampled "frame" of a media payload (payload treated as a stream of
    * fixed-size frames — the shape a real video pipeline produces). */
  case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  val FrameBytes = 256

  /** Frame sampling: every `everyN`-th FrameBytes-sized slice of the
    * payload, with a deterministic checksum per frame. Real decoders swap
    * the slicing for codec frame extraction; the partition-batched
    * pipeline shape (and downstream schema) is the deliverable. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[FrameSample] = {
    require(everyN > 0, "everyN must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = (r.media.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by everyN).iterator.map { i =>
          val from = i * FrameBytes
          val until = math.min(from + FrameBytes, r.media.length)
          var sum = 0L
          var j = from
          while (j < until) { sum = (sum * 31 + (r.media(j) & 0xff)) % 1000000007L; j += 1 }
          FrameSample(r.doc_id, i, until - from, sum)
        }
      }
    }
  }

  /** A media embedding row — the `Array[Float]` column shape the ANN
    * operators (graft.functions.Similarity) consume. */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** STUB media encoder: a deterministic `dim`-float vector folded from
    * the payload bytes per output slot — stands in for a real
    * vision/audio encoder (not in this container), while everything
    * downstream is the real ANN path: per-partition batched encoding
    * (where a real model would load weights once per partition), an
    * `Array[Float]` embedding column, sign-LSH bucketing, exact cosine
    * verification. Identical payloads embed identically, so planted
    * byte-level duplicates are recoverable by the similarity stack —
    * the multimodal near-dup loop, end to end. */
  def embedMedia(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaEmbedding] = {
    require(dim > 0, "embedding dim must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for real encoder weights
      rows.map { r =>
        // ONE pass over the payload; per-slot values mix the shared
        // rolling hash with a slot seed (O(bytes + dim), not O(dim×bytes))
        var h = 1125899906842597L
        var i = 0
        while (i < r.media.length) { h = h * 31 + (r.media(i) & 0xff); i += 1 }
        val v = Array.tabulate(dim) { j =>
          var m = h + j * 2654435761L
          m ^= (m >>> 33); m *= 0xff51afd7ed558ccdL; m ^= (m >>> 33)
          // map to (-1, 1) deterministically
          (m % 1000003L).toFloat / 1000003f
        }
        MediaEmbedding(r.doc_id, v)
      }
    }
  }

  /** Resize stub: recompute fake dimensions to a bounded box, keeping
    * aspect from the fake decode — placeholder for a real image resize,
    * same per-partition batch shape. */
  def resizeFeatures(features: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, math.floor(f.width * scale).toInt),
        height = math.max(1, math.floor(f.height * scale).toInt))
    }
  }

  /** REAL pixel resize behind the same media seam ([[PngDecoder]]'s
    * transform sibling): decode via `javax.imageio`, aspect-preserving
    * scale to `maxSide` using the SAME floor arithmetic as the
    * metadata stub [[resizeFeatures]] (so the stub PREDICTS the real
    * path's output dimensions — differential-spec-pinned), re-encode
    * in `format`. `javax.imageio` decodes AND encodes both PNG and
    * JPEG natively (only video is genuinely environment-bound), so
    * both image formats ride this one codec; JPEG re-encode is lossy
    * in pixels but exact in dimensions, which is what the stub
    * predicts. An actual BufferedImage pixel transform, not metadata
    * arithmetic; payloads ≤ maxSide pass through untouched. */
  object ImageResizer {
    def resize(maxSide: Int, format: String)(r: MediaRow): MediaRow = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      if (math.max(w, h) <= maxSide) r
      else {
        val scale = maxSide.toDouble / math.max(w, h)
        val nw = math.max(1, math.floor(w * scale).toInt)
        val nh = math.max(1, math.floor(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null); ()
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, format, bos)
        val bytes = bos.toByteArray
        MediaRow(r.doc_id, bytes, r.format, bytes.length.toLong)
      }
    }

    /** Tolerant sibling of [[resize]]: an undecodable payload (codec
      * returns null or throws) passes through UNCHANGED instead of
      * failing the whole task on one bad row — the DQ-style
      * skip-don't-crash contract. Callers that need the bad rows
      * surfaced filter them first with [[decodable]]. */
    def resizeOrPass(maxSide: Int, format: String = "png")(r: MediaRow): MediaRow =
      try {
        if (javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media)) == null) r
        else resize(maxSide, format)(r)
      } catch { case scala.util.control.NonFatal(_) => r }

    /** Decodability probe for the quarantine path: true iff the payload
      * would survive [[resize]] — run as a filter to split a corpus into
      * a processable stream and a quarantine stream BEFORE the strict
      * codec stage. */
    def decodable(r: MediaRow): Boolean =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media)) != null
      catch { case scala.util.control.NonFatal(_) => false }
  }

  /** PNG-specific alias kept for the original call sites/specs —
    * [[ImageResizer]] with the PNG re-encode. */
  object PngResizer {
    def resize(maxSide: Int)(r: MediaRow): MediaRow =
      ImageResizer.resize(maxSide, "png")(r)
    def resizeOrPass(maxSide: Int)(r: MediaRow): MediaRow =
      ImageResizer.resizeOrPass(maxSide, "png")(r)
    def decodable(r: MediaRow): Boolean = ImageResizer.decodable(r)
  }

  /** Partition-batched media transform through an arbitrary
    * row-to-row codec stage (resize, transcode, watermark …) — the
    * payload-to-payload sibling of [[decodeFeaturesWith]]. */
  def transformMediaWith(media: Dataset[MediaRow])(
      stage: MediaRow => MediaRow): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real codec/native lib
      rows.map(stage)
    }
  }

  /** Every-2nd-frame sampling over the synthesized media table through
    * the real mapPartitions pipeline ([[sampleFrames]]), as a gate query:
    * the DuckDB oracle recomputes the identical 256-byte slicing and
    * rolling checksum character-wise (the corpus is pure ASCII, so byte
    * positions == character positions). This pins the full plumbing —
    * binary synthesis, partition-batched flatMap, frame schema — not
    * just expression-level metadata. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaFromDocuments(s, dir).as[MediaRow]
    sampleFrames(media, everyN = 2).toDF()
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("checksum"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Expression-level metadata + fake-decode features (oracle-checkable
    * twin of [[decodeFeatures]]). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("h", Portable.h32(col("text")))
      .select(
        col("doc_id"),
        element_at(
          array(lit("img"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        expr("32 + h % 97").as("width"),            // integer ops only —
        expr("24 + (h div 97) % 97").as("height"))  // match the JVM stub
      .orderBy("doc_id")
}
