package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video carried as opaque
  * `BINARY` columns with typed metadata, processed in partition-batched
  * map stages.
  *
  * The decode step is a clearly-marked STUB (`FakeCodec`): the sandbox
  * has no image/audio libraries, so decode produces a deterministic fake
  * derived from the bytes. Everything around it — the schema, the
  * per-partition batching, the pushdown-friendly projection (metadata
  * jobs must never read the `media` bytes), the feature-vector output
  * shape — is the real, tested Spark plumbing a production codec would
  * slot into (swap [[FakeCodec]] for a JNI/FFI decoder; the operator
  * shape is `mapPartitions` so per-batch codec state is amortized, the
  * analogue of a Pandas-UDF batch in PySpark).
  */
object Multimodal {

  /** STUB codec — deterministic fake decode of a media blob. A real
    * implementation replaces exactly this object. */
  object FakeCodec {
    /** "Decode" → (width, height, nFrames): pure function of the bytes,
      * md5-derived ([[PortableHash]]) so the decoded metadata is
      * verifiable by the DuckDB oracle (`multimodal_decode`). */
    def probe(media: Array[Byte], mediaType: String): (Int, Int, Int) = {
      val hx = PortableHash.md5HexBytes(media)
      val w = 16 + PortableHash.int12(hx, 0) % 1024
      val ht = 16 + PortableHash.int12(hx, 3) % 1024
      val frames = if (mediaType == "video") 1 + PortableHash.int12(hx, 6) % 64 else 1
      (w, ht, frames)
    }

    /** "Feature-extract" → fixed-width embedding (dim 16), deterministic. */
    def features(media: Array[Byte]): Array[Float] = {
      val out = new Array[Float](16)
      var i = 0
      while (i < media.length) {
        out(i % 16) += ((media(i) & 0xff) - 128) / 128.0f
        i += 1
      }
      out
    }

    /** "Frame-sample": every `stride`-th frame index up to nFrames. */
    def sampleFrames(nFrames: Int, stride: Int): Array[Int] =
      (0 until nFrames by stride).toArray
  }

  final case class Asset(asset_id: Long, media_type: String, media: Array[Byte])
  final case class DecodedAsset(asset_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sampled_frames: Array[Int],
      feature: Array[Float])

  /** Synthesize an assets table from the documents table (text bytes as
    * the opaque blob) — deterministic, schema-realistic. */
  def synthAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        Asset(id, kind, t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }.toDF()
  }

  /** Decode + feature-extract + frame-sample, batched per partition.
    * Column pruning matters at scale: this is the ONLY operator allowed
    * to read `media`; metadata consumers read the decoded table. */
  def decodeAll(assets: DataFrame, frameStride: Int = 8): DataFrame = {
    // fail on the driver, not inside executors mid-job: stride 0 would
    // throw from `0 until n by 0` per row; negative would silently
    // sample no frames
    require(frameStride > 0, s"frameStride must be positive, got $frameStride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("media_type"), col("media"))
      .as[Asset]
      .mapPartitions { it =>
        // per-batch codec init would go here (amortized across the partition)
        it.map { a =>
          val (w, h, f) = FakeCodec.probe(a.media, a.media_type)
          DecodedAsset(a.asset_id, a.media_type, a.media.length.toLong, w, h, f,
            FakeCodec.sampleFrames(f, frameStride), FakeCodec.features(a.media))
        }
      }.toDF()
  }
}
