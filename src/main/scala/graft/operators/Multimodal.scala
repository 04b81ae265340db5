package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Multimodal column handling (north-star addition): image/audio/
  * video as opaque `binary` columns + typed metadata, with the
  * decode/feature steps STUBBED behind deterministic fakes (the
  * container has no image/audio libs — see builder brief). The
  * Spark-side plumbing is real: schemas, batch iteration shape,
  * partition behavior, and output contracts are exactly what a
  * JNI/Pandas-UDF decoder would plug into.
  */
object Multimodal {

  /** Typed metadata every asset row carries alongside its bytes. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** Wrap a text corpus as fake binary assets — deterministic bytes
    * so tests are stable. Stands in for `spark.read.format(
    * "binaryFile")` over an object store at scale.
    */
  def syntheticAssets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"),
      (length(col(textCol)) * 100).cast("long").as("duration_ms"))

  /** Metadata extraction over the binary column — real built-ins
    * (octet_length, hashes) that a scan would push down / compute
    * without decoding.
    */
  def describeAssets(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("media_type"),
      octet_length(col("content")).as("n_bytes"),
      xxhash64(col("content")).as("content_hash"),
      col("width"), col("height"), col("duration_ms"))

  /** STUB decoder: a real implementation would JNI into an image
    * library (or arrow-batch into a Python worker via mapInPandas on
    * PySpark). The deterministic fake extracts a fixed-length
    * "feature vector" from the bytes so downstream stages (ANN over
    * image features, dedup by perceptual hash) are fully exercised.
    * A column-level UDF (not an rdd hop) so the frame stays inside
    * Catalyst: upstream filters/projections still push down, column
    * pruning still reaches the scan, and AQE still re-plans around
    * the decode stage — the rdd round-trip severed all three.
    */
  def decodeFeaturesStub(assets: DataFrame, dim: Int = 16): DataFrame = {
    val decode = udf { (bytes: Array[Byte]) =>
      val feat = new Array[Float](dim)
      if (bytes != null) {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= bytes(i).toLong; h *= 0x100000001b3L
          feat(i % dim) += ((h >> 16) & 0xFF).toFloat / 255f
          i += 1
        }
      }
      feat.toSeq
    }
    assets.withColumn("features", decode(col("content")))
  }

  /** STUB resize: contract of an image-resize stage (new dims +
    * re-encoded bytes). Fake keeps a deterministic byte slice.
    *
    * The scale is MATERIALIZED before either dimension is rewritten:
    * a lazy `scale` Column would re-resolve against the already-
    * resized width when computing height (withColumn rebinds by
    * name), silently skipping the height scale for every landscape
    * asset — caught by the mm_resize DuckDB oracle.
    */
  def resizeStub(assets: DataFrame, maxSide: Int): DataFrame =
    assets
      .withColumn("__scale", least(lit(1.0),
        lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("width", (col("width") * col("__scale")).cast("int"))
      .withColumn("height", (col("height") * col("__scale")).cast("int"))
      .withColumn("content",
        substring(col("content"), 1, 4096)) // fake re-encode
      .drop("__scale")

  /** STUB frame sampling for video rows: explode N evenly-spaced
    * "frames" with timestamps — the shape a real ffmpeg-backed
    * sampler produces (one row per frame, frame bytes stubbed as a
    * slice).
    */
  def sampleFramesStub(assets: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"frame interval must be positive, got $everyMs")
    assets.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        // null/negative durations clamp to 0 → exactly the t=0 frame
        // (a null duration silently dropping the asset, or a negative
        // one failing the whole job on sequence() bounds, both hide
        // upstream data problems)
        explode(sequence(lit(0L),
          greatest(coalesce(col("duration_ms"), lit(0L)), lit(0L)), lit(everyMs))))
      .withColumn("frame",
        substring(col("content"),
          (pmod(col("frame_ts_ms"), lit(1024)) + 1).cast("int"), lit(256)))
      .select("asset_id", "frame_ts_ms", "frame")
  }
}
