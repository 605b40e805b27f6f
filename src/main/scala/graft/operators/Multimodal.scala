package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver-mandated §2e E8): media as opaque
  * binary columns with typed metadata, decode/feature steps as
  * deterministic stubs (no image/audio libs in this container — the
  * Spark-side schema, partitioning, and batch shapes are the real,
  * tested part; a production deploy swaps the stub for a real decoder
  * run via `mapInPandas`/`mapPartitions` over the same schema).
  *
  * The `documents.text` bytes stand in for the media payload, making
  * every derived value deterministic and oracle-checkable.
  */
object Multimodal extends QueryPack {

  /** E8a — binary payload + typed metadata extraction: byte length,
    * content hash (the dedup key for media), stub-decoded dimensions
    * (deterministic functions of the payload — a real decoder reads the
    * container header exactly like this, a few bytes per file), and a
    * decoded preview.
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "utf-8"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("content_hash"),
        (lit(64L) + expr("CAST(octet_length(text) AS BIGINT)") % 192L)
          .as("fake_width"),
        (lit(64L) + expr("CAST(octet_length(text) AS BIGINT)") * 7L % 416L)
          .as("fake_height"),
        lit(3L).as("channels"),
        substring(col("text"), 1, 16).as("decoded_preview"))
      .orderBy("doc_id")

  /** E8b — frame sampling: a stub "video" has n_chars/40 + 1 frames;
    * sample every 2nd frame and fingerprint it. The explode-over-
    * metadata shape is exactly how real frame extraction fans out work
    * units before the heavy per-frame decode (which would run in
    * mapPartitions against the binary payload).
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr("n_chars div 40"))).as("frame_no"))
      .filter(col("frame_no") % 2 === 0)
      .select(col("doc_id"), col("frame_no"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_no").cast("string"))).as("frame_fingerprint"))
      .orderBy("doc_id", "frame_no")

  /** Decoded media record — the typed batch shape a real decoder fills
    * (swap `decode` for an image/audio library call; schema and
    * partition flow stay identical).
    */
  final case class DecodedMedia(doc_id: Long, n_bytes: Long,
      width: Long, height: Long, checksum: Long)

  /** E8c — per-partition decode over binary payloads via a typed
    * `Dataset.mapPartitions`: the Scala twin of `mapInPandas` (one
    * iterator per partition, library handles amortized across the
    * batch, no per-row interpreter crossing). The decode itself is a
    * deterministic stub (byte checksum + fake dimensions); oracle-
    * checked because the stub is SQL-expressible.
    */
  def mmDecodePartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // a real decoder opens its codec context once per partition here
        batch.map { case (id, bytes) =>
          var sum = 0L
          var i = 0
          val n = math.min(bytes.length, 64)
          while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
          DecodedMedia(id, bytes.length.toLong,
            64L + bytes.length % 192, 64L + bytes.length * 7 % 416,
            sum % 997L)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** E8d — resize planning: letterbox every stub image to fit 224×224
    * (scale = min over axes, floor to integer pixels, 3-byte pixels).
    * This is the projection a resize stage computes per item before the
    * pixel work; the pixel work itself belongs in the mapPartitions
    * decode. Exact double division + floor → oracle-checked.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val w = (lit(64L) + expr("CAST(octet_length(text) AS BIGINT)") % 192L)
    val h = (lit(64L) + expr("CAST(octet_length(text) AS BIGINT)") * 7L % 416L)
    t(spark, dir, "documents")
      .select(col("doc_id"), w.as("width"), h.as("height"))
      .withColumn("scale",
        least(lit(224.0) / col("width").cast("double"),
          lit(224.0) / col("height").cast("double")))
      .select(col("doc_id"), col("width"), col("height"), col("scale"),
        floor(col("width").cast("double") * col("scale")).cast("long")
          .as("resized_w"),
        floor(col("height").cast("double") * col("scale")).cast("long")
          .as("resized_h"))
      .withColumn("out_bytes", col("resized_w") * col("resized_h") * 3L)
      .orderBy("doc_id")
  }

  /** Stub feature vector: 8 strided byte sums over the first 64 payload
    * bytes. Integer-exact, so the norm is sqrt of an exact integer —
    * bitwise portable without float-fold concerns.
    */
  final case class MediaEmbedding(doc_id: Long,
      e0: Double, e1: Double, e2: Double, e3: Double,
      e4: Double, e5: Double, e6: Double, e7: Double, norm: Double)

  /** E8e — feature extraction over binary payloads (the embed step of a
    * multimodal pipeline) as typed `mapPartitions`: same batch shape as
    * the decode stub — a real model host loads weights once per
    * partition and maps the iterator. Emits fixed-width embedding
    * columns + an exact-integer-rooted norm, ready for the E6 ANN
    * operators downstream.
    */
  def mmEmbedPartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val v = new Array[Long](8)
          var i = 0
          val n = math.min(bytes.length, 64)
          while (i < n) { v(i % 8) += (bytes(i) & 0xffL); i += 1 }
          val sumSq = v.map(x => x * x).sum
          MediaEmbedding(id, v(0).toDouble, v(1).toDouble, v(2).toDouble,
            v(3).toDouble, v(4).toDouble, v(5).toDouble, v(6).toDouble,
            v(7).toDouble, math.sqrt(sumSq.toDouble))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** E8f — FRAME-LEVEL dedup across videos (the E8×E5 crossover every
    * video pipeline runs: identical intro/outro/static frames recur
    * across files and within a file, and storage/training both want
    * one copy): each stub frame fingerprints its CONTENT slice (a real
    * pipeline pHashes the decoded frame — same dataflow, the hash
    * input is the only stub), duplicated fingerprints group, and each
    * group reports its copy count, distinct-video spread, and the
    * kept (min doc, min frame) representative. The corpus's
    * duplicate/near-duplicate document structure yields real
    * cross-video frame collisions.
    *
    * Scale: one explode over frame COUNTS (metadata, not pixels), the
    * hash dies into a fixed-width group key, and the single shuffle is
    * the fingerprint groupBy with O(1) partial state (count + two
    * mins + the distinct-doc count's per-key state) — the exact-dedup
    * plan shape at frame granularity. No pairs, no windows.
    */
  def mmFrameDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // empty docs emit no frames — guarded IDENTICALLY in the oracle
      // (ADVICE r12: Spark's `div` truncates toward zero while DuckDB's
      // `//` floors, so n_chars = 0 would otherwise yield one empty
      // frame here and none there)
      .filter(col("n_chars") >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          expr("(n_chars - 1) div 40"))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        md5(expr("substr(text, CAST(frame_no * 40 + 1 AS INT), 40)"))
          .as("frame_hash"))
      .groupBy("frame_hash")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_videos"),
        min(col("doc_id")).as("keep_doc"),
        min(struct(col("doc_id"), col("frame_no")))
          .getField("frame_no").as("keep_frame"))
      .filter(col("n_copies") > 1)
      .orderBy("frame_hash")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> mmMeta _,
    "mm_frames" -> mmFrames _,
    "mm_frame_dedup" -> mmFrameDedup _,
    "mm_decode_partitions" -> mmDecodePartitions _,
    "mm_resize" -> mmResize _,
    "mm_embed_partitions" -> mmEmbedPartitions _)

  val oracles: Map[String, String] = Map(
    "mm_frame_dedup" -> """
      WITH frames AS (
        SELECT doc_id, frame_no,
               md5(substr(text, CAST(frame_no * 40 + 1 AS INT), 40))
                 AS frame_hash
        FROM (
          SELECT doc_id, text,
                 unnest(range(0, (n_chars - 1) // 40 + 1)) AS frame_no
          FROM documents WHERE n_chars >= 1)
      )
      SELECT frame_hash,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
             min(doc_id) AS keep_doc,
             min(struct_pack(doc_id := doc_id, frame_no := frame_no))
               .frame_no AS keep_frame
      FROM frames
      GROUP BY frame_hash
      HAVING count(*) > 1
      ORDER BY frame_hash""",
    "mm_decode_partitions" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             64 + CAST(octet_length(encode(text)) AS BIGINT) % 192
               AS width,
             64 + CAST(octet_length(encode(text)) AS BIGINT) * 7 % 416
               AS height,
             CAST(list_sum(list_transform(
               string_split(substr(text, 1, 64), ''),
               c -> ascii(c))) % 997 AS BIGINT) AS checksum
      FROM documents ORDER BY doc_id""",
    "mm_meta" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS content_hash,
             64 + CAST(octet_length(encode(text)) AS BIGINT) % 192
               AS fake_width,
             64 + CAST(octet_length(encode(text)) AS BIGINT) * 7 % 416
               AS fake_height,
             CAST(3 AS BIGINT) AS channels,
             substring(text, 1, 16) AS decoded_preview
      FROM documents ORDER BY doc_id""",
    "mm_frames" -> """
      SELECT doc_id, frame_no,
             md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(frame_no AS VARCHAR)) AS frame_fingerprint
      FROM (
        SELECT doc_id, unnest(range(0, n_chars // 40 + 1)) AS frame_no
        FROM documents
      )
      WHERE frame_no % 2 = 0
      ORDER BY doc_id, frame_no""",
    "mm_resize" -> """
      WITH dims AS (
        SELECT doc_id,
               64 + CAST(octet_length(encode(text)) AS BIGINT) % 192
                 AS width,
               64 + CAST(octet_length(encode(text)) AS BIGINT) * 7 % 416
                 AS height
        FROM documents
      ),
      scaled AS (
        SELECT doc_id, width, height,
               least(224.0 / CAST(width AS DOUBLE),
                     224.0 / CAST(height AS DOUBLE)) AS scale
        FROM dims
      )
      SELECT doc_id, width, height, scale,
             CAST(floor(CAST(width AS DOUBLE) * scale) AS BIGINT)
               AS resized_w,
             CAST(floor(CAST(height AS DOUBLE) * scale) AS BIGINT)
               AS resized_h,
             CAST(floor(CAST(width AS DOUBLE) * scale) AS BIGINT) *
             CAST(floor(CAST(height AS DOUBLE) * scale) AS BIGINT) * 3
               AS out_bytes
      FROM scaled ORDER BY doc_id""",
    "mm_embed_partitions" -> {
      def lane(k: Int) =
        s"""CAST(coalesce(list_sum(list_transform(
          list_filter(range(1, least(length(text), 64) + 1),
            p -> (p - 1) % 8 = $k),
          p -> ascii(substr(text, p, 1)))), 0) AS BIGINT)"""
      val lanes = (0 to 7).map(k => s"${lane(k)} AS v$k").mkString(",\n               ")
      val sumSq = (0 to 7).map(k => s"v$k * v$k").mkString(" + ")
      val outs = (0 to 7).map(k => s"CAST(v$k AS DOUBLE) AS e$k").mkString(", ")
      s"""
      WITH lanes AS (
        SELECT doc_id,
               $lanes
        FROM documents
      )
      SELECT doc_id, $outs,
             sqrt(CAST($sumSq AS DOUBLE)) AS norm
      FROM lanes ORDER BY doc_id"""
    })
}
