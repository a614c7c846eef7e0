package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** End-to-end EPrints -> Hyku migration pipeline (the reference's declared
  * purpose, /root/reference/README.md:2) composed from engine operators:
  * EP3-shaped XML parse -> creator flattening -> partial-date
  * normalization -> validation split -> Bulkrax-style multi-valued CSV
  * sink -> re-read and assert. Proves the operator surface composes into
  * the actual product workflow, not just per-operator checks.
  */
class MigrationPipelineSpec extends SparkSuite {

  test("eprints xml to bulkrax csv round trip") {
    import spark.implicits._
    val xml = Seq(
      // record with 2 creators, full date
      ("<eprint><eprintid>1</eprintid><title>  Dogs &amp; Cats  </title>" +
        "<date>2003-05-17</date><creators><item><name><family>Doe</family>" +
        "<given>Jan</given></name></item><item><name><family>Roe</family>" +
        "<given>Max</given></name></item></creators></eprint>"),
      // record with year-only date and 1 creator
      ("<eprint><eprintid>2</eprintid><title>Maps</title><date>1999</date>" +
        "<creators><item><name><family>Poe</family><given>Al</given>" +
        "</name></item></creators></eprint>"),
      // invalid record: no creators, no date
      ("<eprint><eprintid>3</eprintid><title>Lost</title>" +
        "<creators></creators></eprint>")
    ).toDF("raw")

    val schema = "eprintid BIGINT, title STRING, date STRING, " +
      "creators STRUCT<item: ARRAY<STRUCT<name: STRUCT<family: STRING, given: STRING>>>>"
    val parsed = xml
      .select(from_xml(col("raw"), lit(schema)).as("e"))
      .select(col("e.eprintid").as("source_identifier"),
        trim(regexp_replace(col("e.title"), "&amp;", "&")).as("title"),
        col("e.date").as("raw_date"),
        transform(col("e.creators.item"),
          c => concat_ws(", ", c.getField("name").getField("family"),
            c.getField("name").getField("given"))).as("creators"))
      .withColumn("date_created", coalesce(
        try_to_timestamp(col("raw_date"), lit("yyyy-MM-dd")),
        try_to_timestamp(col("raw_date"), lit("yyyy-MM")),
        try_to_timestamp(col("raw_date"), lit("yyyy"))).cast("date"))

    // validation split: creators and date required for ingest
    val valid = parsed.filter(size(col("creators")) > 0
      && col("date_created").isNotNull)
    val rejects = parsed.exceptAll(valid)
    assert(valid.count() === 2)
    assert(rejects.select("source_identifier").as[Long].collect()
      .toSeq === Seq(3L))

    // Bulkrax-style sink: multi-valued creators ';'-joined
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_migration").toString
    valid
      .select(col("source_identifier"), col("title"),
        array_join(col("creators"), ";").as("creator"),
        date_format(col("date_created"), "yyyy-MM-dd").as("date_created"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outDir)

    val back = spark.read
      .schema(StructType.fromDDL(
        "source_identifier BIGINT, title STRING, creator STRING, date_created STRING"))
      .option("header", "true").csv(outDir)
      .orderBy("source_identifier")
      .collect()
    assert(back.length === 2)
    assert(back(0).getString(1) === "Dogs & Cats")
    assert(back(0).getString(2) === "Doe, Jan;Roe, Max")
    assert(back(0).getString(3) === "2003-05-17")
    assert(back(1).getString(2) === "Poe, Al")
    assert(back(1).getString(3) === "1999-01-01") // year-precision -> Jan 1
  }
}
