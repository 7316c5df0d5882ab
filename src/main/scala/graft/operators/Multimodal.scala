package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed in
  * partition-batched imperative passes (`mapPartitions` — the Scala
  * analogue of `mapInPandas` batch UDFs).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * container): [[StubDecoder]] derives deterministic fake
  * width/height/duration from the payload bytes. Everything around it
  * — schema, binary transport, batch iteration, partition sizing,
  * downstream joins — is the real Spark plumbing a production decode
  * UDF would drop into.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      media_type: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      checksum: Long
  )

  /** A "media table": binary payload column + minimal metadata,
    * standing in for a table of encoded images/audio. The payload here
    * is the UTF-8 document text — opaque bytes as far as the pipeline
    * is concerned.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 3).cast("int").as("modality") // 0=image, 1=audio, 2=video
      )

  /** STUB decoder — deterministic fake of a media codec.
    * A real deployment replaces `decode` with e.g. an image library
    * call; the signature (bytes in, typed struct out) is the contract.
    */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte], modality: Int): MediaMeta = {
      // FNV-1a over the payload: cheap deterministic checksum standing
      // in for decoded-content inspection.
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      val mt = modality match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaMeta(
        doc_id = docId,
        n_bytes = payload.length.toLong,
        media_type = mt,
        width = if (modality == 0 || modality == 2) 320 + (math.abs(h) % 1600).toInt else 0,
        height = if (modality == 0 || modality == 2) 240 + (math.abs(h >> 17) % 840).toInt else 0,
        duration_ms = if (modality != 0) 1000L + math.abs(h >> 31) % 600000L else 0L,
        checksum = h
      )
    }
  }

  /** Batched decode over partitions — one decoder instance per
    * partition (mirrors per-batch model loading in a Pandas UDF),
    * rows streamed through without materializing the partition.
    */
  def extractMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("doc_id", "payload", "modality")
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { rows =>
        // per-partition setup would go here (codec/model init)
        rows.map { case (id, bytes, modality) => StubDecoder.decode(id, bytes, modality) }
      }
  }

  /** STUB media embedder: payload bytes → deterministic unit-norm
    * Array[Float] (a real deployment swaps in a vision/audio encoder;
    * batch shape, schema, and downstream indexability are the
    * contract). Output plugs straight into [[Similarity]]'s ANN
    * operators — the full decode → featurize → index path.
    */
  def embedMedia(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "model load" would happen here
        rows.map { case (id, payload) =>
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
          val v = new Array[Float](dim)
          var d = 0
          var z = h
          var norm = 0.0
          while (d < dim) {
            z += 0x9e3779b97f4a7c15L
            var m = z
            m = (m ^ (m >>> 30)) * 0xbf58476d1ce4e5b9L
            m = (m ^ (m >>> 27)) * 0x94d049bb133111ebL
            m = m ^ (m >>> 31)
            v(d) = ((m >>> 11) * (2.0 / (1L << 53)) - 1.0).toFloat
            norm += v(d) * v(d)
            d += 1
          }
          val inv = (1.0 / math.sqrt(norm)).toFloat
          (id, v.map(_ * inv))
        }
      }
      .toDF("vec_id", "embedding")
  }

  /** Deterministic frame sampling for "video" rows: every `stride`-th
    * frame index up to a fake frame count derived from the payload —
    * the explode-shaped (one row in, many rows out) media op.
    *
    * The stub duration/signature hash is the first 15 hex digits of
    * md5(payload) as a 60-bit integer — deliberately PORTABLE math
    * (md5 + integer ops both engines compute bit-identically) rather
    * than [[StubDecoder]]'s FNV, so the DuckDB oracle replays the
    * whole operator and the correctness check is a hash match instead
    * of rows-only. Runs as pure codegen'd expressions (md5 + sequence
    * + explode) — the explode shape, not the hash, is what a real
    * frame sampler keeps.
    */
  def sampleFrames(spark: SparkSession, dir: String, stride: Int = 10): DataFrame =
    Tables
      .documents(spark, dir)
      .filter(col("doc_id") % 3 === 2 && col("text").isNotNull)
      .select(
        col("doc_id"),
        expr("cast(conv(substring(md5(encode(text, 'UTF-8')), 1, 15), 16, 10) as bigint)").as("h60")
      )
      .select(col("doc_id"), col("h60"), (lit(1000L) + col("h60") % 600000L).as("duration_ms")) // stub: 1–601 s
      .select(
        col("doc_id"),
        col("h60"),
        // 25 fps stub → duration/40 frames; stride-sample from 0
        explode(expr(s"sequence(0L, duration_ms div 40 - 1, $stride)")).as("frame_idx")
      )
      .select(col("doc_id"), col("frame_idx"), expr("h60 ^ frame_idx").as("frame_sig"))

  /** SQL-expressible slice of the binary plumbing (oracle-checkable):
    * payload byte length + hex prefix of the payload.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("hex_prefix"),
        (col("doc_id") % 3).cast("int").as("modality")
      )
      .orderBy("doc_id")
}
