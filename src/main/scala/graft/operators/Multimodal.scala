package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing — north-star LLM-pipeline operator.
  *
  * Pattern: media (image/audio/video) live in a DataFrame as opaque
  * `binary` columns next to typed metadata; decode / feature-extract
  * runs batch-wise close to the data (in PySpark: pandas UDFs over
  * `mapInPandas`; in Scala: `Dataset.mapPartitions`), everything else —
  * filtering, joining, partitioning — stays relational on the metadata
  * columns.
  *
  * This container has no media files or codec libraries, so the corpus
  * is simulated: `documents.text` is cast to its UTF-8 bytes as the
  * opaque blob. The DECODE STEP IS A DETERMINISTIC FAKE (clearly marked
  * below) — it stands in for "call the image library on blob bytes".
  * Everything around it — the binary column, the typed metadata struct
  * schema, the per-partition batch iteration, the partition-preserving
  * plan shape — is the real Spark plumbing and is what this operator
  * demonstrates and tests.
  *
  * Two surfaces:
  *  - `multimodalMeta`   — pure-expression metadata over the binary
  *    column (octet length, sha-256, header bytes): codegen'd, exact
  *    DuckDB oracle over the same bytes;
  *  - `multimodalDecode` — the mapPartitions decode pattern: typed
  *    batch iteration per partition emitting a (doc_id, width, height,
  *    format, blob_len) record; the fake decode is arithmetic on blob
  *    bytes so it is SQL-reproducible and therefore oracle-checkable
  *    end-to-end, which is exactly what you want before swapping the
  *    real codec in.
  *
  * Scale notes: both are map-only (no shuffle); the blob never moves
  * through an exchange — only extracted metadata does. At 100 TB the
  * binary column stays in parquet until the partition-local decode
  * touches it, and column pruning drops it for metadata-only queries.
  */
/** Typed rows for the decode path (top-level: Dataset encoders generate
  * code that must access these from outside the enclosing object). */
case class MediaBlob(doc_id: Long, blob: Array[Byte])
case class MediaMeta(doc_id: Long, width: Int, height: Int,
    format: String, blob_len: Long)

object Multimodal {

  // `multimodal_meta` — binary-column metadata via built-in expressions.
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("blob_len"),
        sha2(col("blob"), 256).as("sha"),
        // first-4-chars-then-encode (not blob[1:4]) so the oracle can
        // reproduce it without DuckDB blob slicing; identical for the
        // ASCII corpus
        lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("header_hex"))
      .orderBy("doc_id")

  // `multimodal_frames` — the frame-sampling pattern for video-shaped
  // blobs: treat the blob as a sequence of fixed 32-byte "frames",
  // sample every 4th, emit one row per sampled frame with its content
  // hash. posexplode keeps it a proper Generate (one output row per
  // frame, streamed — the full blob is never duplicated per frame
  // because the substring slices lazily from the row's blob). At 100 TB
  // the sampled-frame rows (hashes + metadata) are what shuffles
  // onward; raw media stays in the scan.
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val frameLen = 32
    val stride = 4
    val nFrames = ceil(length(col("text")) / frameLen.toDouble).cast("int")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as(Seq("k", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(col("text").substr(col("frame_idx") * frameLen + 1, lit(frameLen))
          .cast("binary")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  // `multimodal_decode` — the batch-decode pattern over opaque blobs.
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    // mapPartitions = one iterator per partition: the real pattern for
    // amortizing per-batch decoder setup (codec init, model load) —
    // the analogue of a pandas UDF batch in PySpark.
    val decoded = blobs.mapPartitions { it =>
      // >>> FAKE DECODE — STUB <<<
      // A real deployment calls the media library here, e.g.
      //   val img = ImageIO.read(new ByteArrayInputStream(b.blob))
      // This container has no codecs, so dimensions are derived
      // deterministically from the first bytes (SQL-reproducible so the
      // whole pipeline stays oracle-checkable). NOTE: the oracle reads
      // CHARACTER codepoints (ascii(substr(...))) — identical to these
      // byte reads only because the corpus is pure ASCII (verified for
      // all sf dirs), same assumption as multimodalMeta's header_hex.
      it.map { b =>
        val len = b.blob.length.toLong
        val b0 = if (len > 0) b.blob(0) & 0xff else 0
        val b1 = if (len > 1) b.blob(1) & 0xff else 0
        MediaMeta(
          doc_id = b.doc_id,
          width  = 16 + b0 % 64,
          height = 16 + b1 % 48,
          format = if (len % 2 == 0) "png" else "jpeg",
          blob_len = len)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("format"),
        col("blob_len"))
      .orderBy("doc_id")
  }
}
