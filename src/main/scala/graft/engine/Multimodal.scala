package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 Multimodal-column plumbing (SURVEY.md north star): media payloads
  * are opaque `binary` columns with a typed metadata struct; the
  * decode/feature-extract stage is a per-partition batch operator.
  *
  * The actual codec is STUBBED with a deterministic byte-hash "decoder"
  * (no image/audio libraries in this environment — see the builder brief);
  * everything Spark-side is real: binary schema, partition-parallel
  * `mapPartitions` with an explicit row encoder, fixed-width feature
  * output, and metadata that survives the round-trip.
  *
  * Scale posture: decode runs once per partition batch, never on the
  * driver; feature vectors are fixed-width arrays so downstream similarity
  * operators (Vectors.scala) apply unchanged.
  */
object Multimodal {

  val FeatureDim = 8

  /** STUB decoder: stands in for image/audio decode. Deterministic pure
    * function of the payload bytes so results are reproducible and
    * oracle-friendly.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    var h = 1125899906842597L // FNV-ish rolling state
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      acc(i % FeatureDim) += (payload(i) & 0xff)
      i += 1
    }
    val out = new Array[Double](FeatureDim)
    var j = 0
    while (j < FeatureDim) {
      out(j) = (acc(j) % 1000) / 1000.0
      j += 1
    }
    out
  }

  /** Media-shaped frame from the documents fixture: payload bytes (UTF-8 of
    * the text, standing in for encoded media) + typed metadata struct.
    */
  def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("text/plain").as("mime_type"),
        length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Oracle-checked metadata path: binary length + md5 digest.
    "q_multimodal_meta" -> { (s, d) =>
      mediaFrame(s, d).select(
        col("media_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("meta.mime_type").as("mime_type"),
        col("meta.origin").as("origin"))
        .orderBy(col("media_id"))
    },

    // Partition-parallel decode/feature-extract (stubbed codec); rows-only
    // check + ScalaTest determinism assertions.
    "q_multimodal_features" -> { (s, d) =>
      val frame = mediaFrame(s, d)
      val outSchema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("n_bytes", IntegerType),
        StructField("features", ArrayType(DoubleType, containsNull = false))))
      val decoded = frame.select(col("media_id"), col("payload"))
        .mapPartitions { rows =>
          rows.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            Row(r.getLong(0), payload.length, fakeDecodeFeatures(payload).toSeq)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
      decoded
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f1"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6)
            .as("f_sum"))
        .orderBy(col("media_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | md5(text) AS digest,
        | 'text/plain' AS mime_type,
        | source AS origin
        | FROM documents ORDER BY media_id"""
        .stripMargin.replaceAll("\n", " ")
  )
}
