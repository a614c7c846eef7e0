package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** §2.8 Scalar function coverage (SURVEY.md): strings, regex, dates
  * (including EPrints-style partial-date normalization), math, arrays,
  * higher-order lambdas, maps, JSON, the UDF surface, and generators.
  *
  * Scale posture: everything here is a per-row projection — fully
  * codegen'd, no shuffle; the single Scala UDF (q_udf_scalar) documents
  * its cost (opaque to Catalyst, breaks whole-stage codegen at that
  * expression) and the same logic is expressible with built-ins.
  */
object Scalar {
  import Fx._

  /** DOI normalizer: the one deliberate Scala-UDF demo (EPrints metadata
    * cleanup shape). Prefer built-ins everywhere else — a UDF is opaque to
    * Catalyst (no pushdown through it, no codegen).
    */
  private val normalizeDoi: String => String = s =>
    if (s == null) null
    else s.trim.toLowerCase.replaceFirst("^https?://(dx\\.)?doi\\.org/", "")

  private def try_cast_int(c: org.apache.spark.sql.Column) =
    c.try_cast(org.apache.spark.sql.types.IntegerType)

  private def entityClean(c: org.apache.spark.sql.Column) =
    Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'")
      .foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DataFrameNaFunctions surface (na.fill / na.replace / na.drop) —
    // the null-repair toolkit every ingest layer leans on: nulls are
    // PLANTED deterministically (key arithmetic), filled with sentinels,
    // one value renamed via na.replace, and the na.drop("any") survivor
    // count rides along as a broadcast scalar. Map-side repairs + one
    // small aggregate; the oracle replays them as CASE/COALESCE.
    "q_fn_na" -> { (s, d) =>
      val base = Tables.customer(s, d).select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(7)) === 3,
          lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"),
        when(pmod(col("c_custkey"), lit(11)) === 5,
          lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"))
      val dropped = base.na.drop("any", Seq("seg", "bal"))
        .agg(count(lit(1)).as("n_complete"))
      base.na.fill(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
        .na.replace("seg", Map("MACHINERY" -> "MACHINES"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), Fx.dsum(col("bal")).as("bal_sum"))
        .crossJoin(broadcast(dropped))
        .orderBy(col("seg"))
    },

    "q_fn_string" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
        substring(col("c_name"), 1, 8).as("sub8"),
        lpad(col("c_name"), 25, "*").as("padded"),
        regexp_replace(col("c_name"), lit("Customer"), lit("Cust"))
          .as("replaced"),
        split(col("c_name"), "#").getItem(1).as("num_part"),
        length(col("c_name")).as("len"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("lev"),
        initcap(lower(col("c_mktsegment"))).as("segcap"),
        // EPrints-title-style HTML-entity cleanup (SURVEY §1.2): decode
        // the common entities via a replace chain (identical both engines)
        entityClean(concat(col("c_name"), lit(" &amp; Co &lt;2024&gt;")))
          .as("entity_clean"))
        .orderBy(col("c_custkey"))
    },

    "q_fn_regex" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast(IntegerType)
          .as("extracted_id"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        col("c_name").rlike("\\d{9}$").as("ends_9digits"))
        .orderBy(col("c_custkey"))
    },

    // Partial-date normalization (EPrints `YYYY`|`YYYY-MM`|`YYYY-MM-DD`,
    // SURVEY §1.2): format o_orderdate at 3 precisions cycling by key,
    // then parse back with a try_to_date coalesce chain.
    // Collation surface (Spark 4 COLLATE) — case-insensitive equality,
    // prefix, and containment under UNICODE_CI, the engine-level
    // spelling of comparisons every migration otherwise scatters
    // lower() calls over. The oracle replays with lower() twins (for
    // the ASCII fixture domain the two are semantically identical);
    // what the row pins is that the COLLATE path — a different
    // comparator in codegen, not a rewrite to lower() — produces the
    // same verdicts. Map-only.
    "q_fn_collation" -> { (s, d) =>
      val ci = collate(col("c_mktsegment"), "UNICODE_CI")
      val nameCi = collate(col("c_name"), "UNICODE_CI")
      Tables.customer(s, d)
        .filter(col("c_custkey") < 1000)
        .select(col("c_custkey"),
          (ci === lit("building")).as("seg_is_building"),
          startswith(nameCi, lit("CUSTOMER#")).as("name_prefix_ci"),
          contains(nameCi, lit("#00000000")).as("name_contains_ci"),
          (ci >= lit("furniture") && ci <= lit("machinery"))
            .as("seg_in_range_ci"))
        .orderBy(col("c_custkey"))
    },

    // Timezone surface (convert_timezone / to_utc_timestamp round
    // trip) — the wall-clock shifts a global event pipeline applies at
    // the reporting edge. The fixture spans January 2024 only, so the
    // target zones resolve to FIXED offsets (+05:30 Kolkata, −05:00
    // New York in winter) and the oracle replays them as interval
    // arithmetic; the round-trip equality column guards the conversion
    // against asymmetry (and the law pins it all-true, documenting the
    // no-DST-boundary bound of this fixture). Map-only at any scale.
    "q_fn_tz" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .withColumn("ist",
          convert_timezone(lit("UTC"), lit("Asia/Kolkata"), col("ts")))
        .withColumn("ny",
          convert_timezone(lit("UTC"), lit("America/New_York"), col("ts")))
        .select(col("event_id"), col("ts"), col("ist"), col("ny"),
          hour(col("ist")).as("hour_ist"),
          to_date(col("ny")).as("day_ny"),
          (convert_timezone(lit("Asia/Kolkata"), lit("UTC"), col("ist"))
            === col("ts")).as("roundtrip"))
        .orderBy(col("event_id"))
    },

    "q_fn_date" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .withColumn("partial", when(col("o_orderkey") % 3 === 0,
            date_format(col("o_orderdate"), "yyyy"))
          .when(col("o_orderkey") % 3 === 1,
            date_format(col("o_orderdate"), "yyyy-MM"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dy"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .as("days_since"),
          date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
          ((year(col("o_orderdate")) - 1995) * 12
            + month(col("o_orderdate")) - 1).as("months_since"),
          // built-in partial-month semantics: whole months between, plus
          // (day_a - day_b)/31 for the incomplete month (SURVEY §2.8)
          months_between(to_date(col("o_orderdate")),
            lit("1995-01-01").cast("date")).as("months_bw"),
          col("partial"),
          coalesce(
            try_to_timestamp(col("partial"), lit("yyyy-MM-dd")),
            try_to_timestamp(col("partial"), lit("yyyy-MM")),
            try_to_timestamp(col("partial"), lit("yyyy")))
            .cast("date").as("parsed"))
        .orderBy(col("o_orderkey"))
    },

    // Second date batch: calendar arithmetic (month add with end-of-month
    // clamp, last_day), and the week/quarter/day-of-week calendar fields.
    "q_fn_date2" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          last_day(to_date(col("o_orderdate"))).as("month_end"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow_sun1"))
        .orderBy(col("o_orderkey"))
    },

    "q_fn_math" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 300)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          eround(col("l_extendedprice") / 7, 2).as("div7"),
          abs(col("l_discount") - 0.05).as("absd"),
          ceil(col("l_extendedprice") / 1000).as("ceilp"),
          floor(col("l_extendedprice") / 1000).as("floorp"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          eround(log(col("l_extendedprice")), 6).as("ln_price"),
          eround(exp(col("l_discount")), 6).as("exp_disc"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          pmod(col("l_orderkey") * 7 - 3, lit(5)).as("pm"),
          signum(col("l_discount") - 0.05).as("sg"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("qty_sq"), col("absd"))
    },

    // Geospatial scalar batch: haversine great-circle distance + a
    // bounding-box predicate over deterministic synthetic coordinates
    // derived from the customer key (the fixture has no geo columns).
    // Pure per-row math — embarrassingly parallel; trig goes through
    // libm on both engines, so the distance is epsilon-rounded at 6dp
    // like ln/exp in q_fn_math (every arithmetic step is mirrored
    // operation-for-operation so only the final libm ulp differs).
    "q_fn_geo" -> { (s, d) =>
      val lat = (col("c_custkey") % 170).cast("double") - 85 + 0.5
      val lon = ((col("c_custkey") * 7) % 350).cast("double") - 175 + 0.5
      val p = lit(math.Pi)
      val lat0 = lit(40.44)
      val lon0 = lit(-79.95)
      val sLat = sin((lat - lat0) * p / 180 / 2)
      val sLon = sin((lon - lon0) * p / 180 / 2)
      val a = (sLat * sLat) +
        cos(lat0 * p / 180) * cos(lat * p / 180) * (sLon * sLon)
      Tables.customer(s, d)
        .filter(col("c_custkey") < 500)
        .select(col("c_custkey"), lat.as("lat"), lon.as("lon"),
          eround(asin(sqrt(a)) * 2 * 6371.0, 6).as("dist_km"),
          (lat.between(-10, 60) && lon.between(-100, 50)).as("in_bbox"))
        .orderBy(col("c_custkey"))
    },

    "q_fn_array" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tok"),
          array_contains(col("toks"), "the").as("has_the"),
          size(array_distinct(col("toks"))).as("n_dist"),
          array_join(slice(sort_array(col("toks")), 1, 3), ",").as("first3"),
          element_at(col("toks"), 1).as("tok1"),
          array_join(slice(flatten(array(col("toks"), col("toks"))), 1, 2),
            ",").as("doubled2"))
        .orderBy(col("doc_id"))
    },

    // Second array batch: position/remove/overlap + element-wise
    // min/max over a derived numeric array.
    "q_fn_array2" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("lens", transform(col("toks"), t => length(t)))
        .select(
          col("doc_id"),
          array_position(col("toks"), "the").as("pos_the"),
          size(array_remove(col("toks"), "the")).as("n_no_the"),
          arrays_overlap(col("toks"),
            array(lit("the"), lit("a"))).as("has_stop"),
          array_max(col("lens")).as("max_len"),
          array_min(col("lens")).as("min_len"))
        .orderBy(col("doc_id"))
    },

    // explode/posexplode = the Generator (UDTF) surface over real arrays.
    "q_fn_explode" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .orderBy(col("doc_id"), col("pos"))
    },

    // Null-preserving generator: explode_outer keeps rows whose array is
    // empty (emitting NULL) — the semantics an unnest-with-left-join needs;
    // plain explode would silently drop those parents.
    "q_fn_explode_outer" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          explode_outer(slice(sequence(lit(1), lit(3)), lit(1),
            pmod(col("o_orderkey"), lit(3)).cast("int"))).as("i"))
        .orderBy(col("o_orderkey"), col("i"))
    },

    "q_fn_higher_order" -> { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
        .select(
          col("vec_id"),
          eround(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x), 6)
            .as("sum_elems"),
          size(filter(col("vd"), x => x > 0)).as("n_pos"),
          eround(aggregate(zip_with(col("vd"), col("vd"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x), 6).as("dot_self"),
          eround(element_at(transform(col("vd"), x => x * 2), 1), 6)
            .as("first_x2"))
        .orderBy(col("vec_id"))
    },

    "q_fn_map" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .withColumn("m", from_json(col("props"), lit("map<string,int>")))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).as("n_keys"),
          // value at the lexicographically-smallest key — well-defined for
          // any key set (map/JSON iteration order is engine-specific, so
          // "first value" would silently break if a second key appeared)
          element_at(col("m"), array_min(map_keys(col("m")))).as("v1"))
        .orderBy(col("event_id"))
    },

    "q_fn_json" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("gj"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("fj"),
          json_tuple(col("props"), "k"))
        .withColumnRenamed("c0", "jt")
        .withColumn("jt", col("jt").cast(IntegerType))
        .orderBy(col("event_id"))
    },

    // Spark 4 VARIANT path: parse_json shreds into the binary variant
    // encoding once, then typed variant_get extraction — the modern
    // semi-structured column type (vs the per-access string re-parse of
    // get_json_object in q_fn_json).
    "q_fn_variant" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k_val"))
        .withColumn("k_sq", col("k_val") * col("k_val"))
        .orderBy(col("event_id"))
    },

    // Struct pack / field access / struct-ordered array sort: argmax via
    // sort_array over struct(price, key) — struct comparison is
    // field-order lexicographic on both engines, and the unique key makes
    // the ordering total.
    "q_fn_struct" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(struct(
          col("o_totalprice").as("price"),
          col("o_orderkey").as("key")))).as("arr"))
        .select(col("o_custkey"), size(col("arr")).as("n"),
          element_at(col("arr"), -1).getField("key").as("top_key"),
          element_at(col("arr"), -1).getField("price").as("top_price"),
          element_at(col("arr"), 1).getField("price").as("min_price"))
        .orderBy(col("o_custkey"))
    },

    // ANSI-safe error handling (SURVEY §7.4): Spark 4 runs ANSI-on, so
    // fallible casts/divisions in ETL flows go through try_* variants,
    // which yield NULL instead of failing the job.
    "q_fn_try" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .withColumn("raw", when(col("o_orderkey") % 5 === 0, lit("bad"))
          .otherwise((lit(1900) + col("o_orderkey") % 200).cast("string")))
        .select(
          col("o_orderkey"),
          try_divide(col("o_totalprice"), col("o_orderkey") % 3).as("td"),
          try_cast_int(col("raw")).as("tc"),
          try_to_timestamp(col("raw"), lit("yyyy")).isNotNull.as("tt_ok"))
        .orderBy(col("o_orderkey"))
    },

    // Decimal money arithmetic: exact cents, scale changes, banker-free
    // HALF_UP rounding — the currency discipline an ETL load step needs.
    "q_fn_decimal" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .withColumn("price_dec", col("o_totalprice").cast(DecimalType(18, 2)))
        .select(
          col("o_orderkey"),
          // arithmetic stays exact in DECIMAL; final outputs are cast to
          // DOUBLE/BIGINT so both engines emit the same canonical form
          // (DECIMAL trailing-zero strings hash-differ from floats)
          col("price_dec").cast("double").as("price_dec"),
          (col("price_dec") * 2).cast(DecimalType(18, 2))
            .cast("double").as("doubled"),
          (col("price_dec") + lit(0.005).cast(DecimalType(18, 3)))
            .cast(DecimalType(18, 3)).cast("double").as("plus_half_cent"),
          // floor, not a scale-reducing cast: Spark rounds HALF_UP on
          // decimal downscale while DuckDB truncates
          floor(col("price_dec")).cast("bigint").as("whole"),
          (col("price_dec") % 100).cast(DecimalType(18, 2))
            .cast("double").as("mod100"))
        .orderBy(col("o_orderkey"))
    },

    // PII masking (builtin): upper->X, lower->x, digit->n, punctuation
    // preserved — the redaction primitive for sharing migration reports.
    "q_fn_mask" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          mask(col("c_name")).as("masked"),
          base64(col("c_name").cast("binary")).as("b64"),
          unbase64(base64(col("c_name").cast("binary"))).cast("string")
            .as("b64_roundtrip"))
        .orderBy(col("c_custkey"))
    },

    // Embedded-CSV cell parsing: from_csv round-trips a delimiter-joined
    // line back into typed fields (the Bulkrax multi-value cell reality).
    // Only parsed fields are output — parse(format(x)) == x, so the
    // engines' float-formatting differences never surface.
    "q_fn_csv" -> { (s, d) =>
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("seg", StringType),
        StructField("bal", DoubleType)))
      Tables.customer(s, d)
        .withColumn("line", concat_ws(",", col("c_custkey"),
          col("c_mktsegment"), col("c_acctbal")))
        .withColumn("p", from_csv(col("line"), schema,
          Map.empty[String, String]))
        .select(col("c_custkey"), col("p.k").as("k"),
          col("p.seg").as("seg"), col("p.bal").as("bal"))
        .orderBy(col("c_custkey"))
    },

    // URL dissection: host/path/query-parameter extraction (repository
    // link hygiene in metadata cleanup).
    "q_fn_url" -> { (s, d) =>
      Tables.customer(s, d)
        .withColumn("url", concat(lit("https://repo.example.edu/works/"),
          col("c_custkey"), lit("?seg="), col("c_mktsegment")))
        .select(col("c_custkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg_param"))
        .orderBy(col("c_custkey"))
    },

    // Extended string surface: split_part, translate, repeat, reverse,
    // strpos, left/right — the field-mapping workhorses.
    "q_fn_string2" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          split_part(col("c_name"), lit("#"), lit(1)).as("name_prefix"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_digits"),
          translate(col("c_name"), "0#", "_-").as("translated"),
          repeat(substring(col("c_mktsegment"), 1, 2), 3).as("seg_repeat"),
          reverse(col("c_name")).as("rev"),
          instr(col("c_name"), "9").as("pos_nine"),
          expr("left(c_name, 10)").as("l10"),
          expr("right(c_name, 4)").as("r4"))
        .orderBy(col("c_custkey"))
    },

    // Conditional scalar surface: coalesce/nullif/nvl, greatest/least —
    // the null-taming combinators every mapping step leans on.
    "q_fn_conditional" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_or_open"),
          nvl(nullif(col("o_orderpriority"), col("o_orderpriority")),
            lit("none")).as("always_none"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_100k"),
          least(col("o_totalprice"), lit(100000.0)).as("cap_100k"),
          when(col("o_totalprice") > 200000, "big")
            .otherwise("small").as("size_class"))
        .orderBy(col("o_orderkey"))
    },

    // Cryptographic digests — the content-addressing primitives a dedup /
    // provenance pipeline keys on (hex output matches DuckDB's).
    "q_fn_hash" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          md5(col("c_name").cast("binary")).as("h_md5"),
          sha2(col("c_name").cast("binary"), 256).as("h_sha256"))
        .orderBy(col("c_custkey"))
    },

    // Bitwise surface: and/or/xor, popcount, shifts — the key-hashing /
    // bitmap-index primitives (all codegen'd builtins).
    "q_fn_bitwise" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("b_and"),
          col("o_orderkey").bitwiseOR(lit(16L)).as("b_or"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("b_xor"),
          bit_count(col("o_orderkey")).as("b_cnt"),
          shiftleft(col("o_orderkey"), 3).as("b_shl"),
          shiftright(col("o_orderkey"), 2).as("b_shr"))
        .orderBy(col("o_orderkey"))
    },

    "q_udf_scalar" -> { (s, d) =>
      val doiUdf = udf(normalizeDoi)
      Tables.customer(s, d)
        .withColumn("raw_doi",
          concat(lit("https://DOI.org/10.5555/"), col("c_custkey")))
        .select(col("c_custkey"), col("raw_doi"),
          doiUdf(col("raw_doi")).as("doi"))
        .orderBy(col("c_custkey"))
    },

    // Generator surface: one row -> N rows from a computed sequence.
    "q_udtf_generator" -> { (s, d) =>
      Tables.region(s, d)
        .select(col("r_name"),
          explode(sequence(lit(0), col("r_regionkey"))).as("i"))
        .orderBy(col("r_name"), col("i"))
    }
  )

  val oracle: Map[String, String] = Map(
    // the planted nulls, fill, replace, and drop-count all replay as
    // CASE/COALESCE/FILTER over the same key arithmetic
    "q_fn_na" ->
      s"""WITH base AS (SELECT c_custkey,
         |   CASE WHEN c_custkey % 7 = 3 THEN NULL
         |    ELSE c_mktsegment END AS seg,
         |   CASE WHEN c_custkey % 11 = 5 THEN NULL
         |    ELSE c_acctbal END AS bal
         |  FROM customer),
         | dropped AS (SELECT CAST(count(*) AS BIGINT) AS n_complete
         |  FROM base WHERE seg IS NOT NULL AND bal IS NOT NULL),
         | filled AS (SELECT
         |   CASE WHEN coalesce(seg, 'UNKNOWN') = 'MACHINERY'
         |    THEN 'MACHINES' ELSE coalesce(seg, 'UNKNOWN') END AS seg,
         |   coalesce(bal, 0.0) AS bal FROM base)
         | SELECT seg, CAST(count(*) AS BIGINT) AS n,
         |  ${Fx.oSum("bal")} AS bal_sum, n_complete
         | FROM filled CROSS JOIN dropped
         | GROUP BY seg, n_complete ORDER BY seg"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_string" ->
      """SELECT c_custkey,
        | concat_ws('-', c_mktsegment, c_name) AS joined,
        | upper(c_name) AS up,
        | lower(c_mktsegment) AS lo,
        | trim('  ' || c_name || '  ') AS trimmed,
        | substring(c_name, 1, 8) AS sub8,
        | lpad(c_name, 25, '*') AS padded,
        | replace(c_name, 'Customer', 'Cust') AS replaced,
        | string_split(c_name, '#')[2] AS num_part,
        | length(c_name) AS len,
        | levenshtein(c_name, 'Customer#000000000') AS lev,
        | upper(substring(lower(c_mktsegment), 1, 1))
        |   || lower(substring(lower(c_mktsegment), 2)) AS segcap,
        | replace(replace(replace(replace(replace(
        |   c_name || ' &amp; Co &lt;2024&gt;',
        |   '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |   '&#39;', '''') AS entity_clean
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_regex" ->
      """SELECT c_custkey,
        | CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS INT) AS extracted_id,
        | regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        | regexp_matches(c_name, '\d{9}$') AS ends_9digits
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    // lower() twins — semantically identical to UNICODE_CI on the
    // ASCII fixture domain; range compare lowers both bounds.
    "q_fn_collation" ->
      """SELECT c_custkey,
        | lower(c_mktsegment) = 'building' AS seg_is_building,
        | starts_with(lower(c_name), lower('CUSTOMER#'))
        |  AS name_prefix_ci,
        | contains(lower(c_name), lower('#00000000'))
        |  AS name_contains_ci,
        | lower(c_mktsegment) >= 'furniture'
        |  AND lower(c_mktsegment) <= 'machinery' AS seg_in_range_ci
        | FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    // January-2024 fixture ⇒ fixed winter offsets; the engine side
    // resolves them through the tz database, the oracle replays them
    // as interval arithmetic (the round-trip column guards symmetry).
    "q_fn_tz" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        | CAST(ts AS TIMESTAMP) + INTERVAL 330 MINUTE AS ist,
        | CAST(ts AS TIMESTAMP) - INTERVAL 300 MINUTE AS ny,
        | hour(CAST(ts AS TIMESTAMP) + INTERVAL 330 MINUTE) AS hour_ist,
        | CAST(CAST(ts AS TIMESTAMP) - INTERVAL 300 MINUTE AS DATE)
        |  AS day_ny,
        | true AS roundtrip
        | FROM events WHERE event_id < 500 ORDER BY event_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_date" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS y, month(o_orderdate) AS m,
        | day(o_orderdate) AS dy,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        | CAST(o_orderdate AS DATE) + 30 AS d_plus30,
        | (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since,
        | round((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
        |   + (day(o_orderdate) - 1) / 31.0, 8) AS months_bw,
        | partial,
        | CAST(coalesce(try_strptime(partial, '%Y-%m-%d'),
        |   try_strptime(partial, '%Y-%m'),
        |   try_strptime(partial, '%Y')) AS DATE) AS parsed
        | FROM (SELECT *, CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |   WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |   ELSE strftime(o_orderdate, '%Y-%m-%d') END AS partial
        |  FROM orders WHERE o_orderkey < 2000)
        | ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_date2" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(week(o_orderdate) AS INT) AS iso_week,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1
        | FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        | round(l_extendedprice / 7 + 5e-10, 2) AS div7,
        | abs(l_discount - 0.05) AS absd,
        | CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceilp,
        | CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floorp,
        | pow(l_quantity, 2) AS qty_sq,
        | round(ln(l_extendedprice) + 5e-10, 6) AS ln_price,
        | round(exp(l_discount) + 5e-10, 6) AS exp_disc,
        | sqrt(l_quantity) AS sqrt_qty,
        | ((CAST(l_orderkey * 7 - 3 AS BIGINT) % 5) + 5) % 5 AS pm,
        | CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
        | FROM lineitem WHERE l_orderkey < 300
        | ORDER BY l_orderkey, l_linenumber, l_extendedprice, qty_sq, absd"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_geo" ->
      """WITH g AS (SELECT c_custkey,
        |  CAST(c_custkey % 170 AS DOUBLE) - 85 + 0.5 AS lat,
        |  CAST((c_custkey * 7) % 350 AS DOUBLE) - 175 + 0.5 AS lon
        | FROM customer WHERE c_custkey < 500)
        | SELECT c_custkey, lat, lon,
        |  round(asin(sqrt(
        |    sin((lat - 40.44) * pi() / 180 / 2)
        |     * sin((lat - 40.44) * pi() / 180 / 2)
        |    + cos(40.44 * pi() / 180) * cos(lat * pi() / 180)
        |     * (sin((lon - -79.95) * pi() / 180 / 2)
        |        * sin((lon - -79.95) * pi() / 180 / 2))
        |  )) * 2 * 6371.0 + 5e-10, 6) AS dist_km,
        |  (lat BETWEEN -10 AND 60 AND lon BETWEEN -100 AND 50) AS in_bbox
        | FROM g ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_array" ->
      """SELECT doc_id,
        | len(toks) AS n_tok,
        | list_contains(toks, 'the') AS has_the,
        | len(list_distinct(toks)) AS n_dist,
        | array_to_string(list_sort(toks)[1:3], ',') AS first3,
        | toks[1] AS tok1,
        | array_to_string(list_concat(toks, toks)[1:2], ',') AS doubled2
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        | ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_array2" ->
      """SELECT doc_id,
        | CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
        | len(list_filter(toks, x -> x <> 'the')) AS n_no_the,
        | len(list_intersect(toks, ['the', 'a'])) > 0 AS has_stop,
        | list_max(list_transform(toks, x -> length(x))) AS max_len,
        | list_min(list_transform(toks, x -> length(x))) AS min_len
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        | ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_explode" ->
      """SELECT doc_id, i - 1 AS pos, toks[i] AS tok
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |   FROM documents WHERE doc_id < 20) t,
        | LATERAL unnest(generate_series(1, len(toks))) u(i)
        | ORDER BY doc_id, pos"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_explode_outer" ->
      """SELECT o.o_orderkey, u.i
        | FROM (SELECT o_orderkey,
        |   list_slice([1, 2, 3], 1, o_orderkey % 3) AS l
        |  FROM orders WHERE o_orderkey < 300) o
        | LEFT JOIN LATERAL (SELECT unnest(o.l) AS i) u ON true
        | ORDER BY o_orderkey, i"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_higher_order" ->
      """SELECT vec_id,
        | round(list_reduce(vd, (a, x) -> a + x) + 5e-10, 6) AS sum_elems,
        | len(list_filter(vd, x -> x > 0)) AS n_pos,
        | round(list_reduce(list_transform(vd, x -> x * x), (a, x) -> a + x)
        |   + 5e-10, 6) AS dot_self,
        | round(vd[1] * 2 + 5e-10, 6) AS first_x2
        | FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |   FROM embeddings WHERE vec_id < 50)
        | ORDER BY vec_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_map" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        | len(json_keys(props)) AS n_keys,
        | CAST(json_extract_string(props, '$.' || list_min(json_keys(props))) AS INT) AS v1
        | FROM events WHERE event_id < 200 ORDER BY event_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_json" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS gj,
        | CAST(json_extract_string(props, '$.k') AS INT) AS fj,
        | CAST(json_extract_string(props, '$.k') AS INT) AS jt
        | FROM events WHERE event_id < 200 ORDER BY event_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        | CAST(json_extract_string(props, '$.k') AS INT)
        |   * CAST(json_extract_string(props, '$.k') AS INT) AS k_sq
        | FROM events ORDER BY event_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_struct" ->
      """WITH g AS (SELECT o_custkey,
        |  list_sort(list(struct_pack(price := o_totalprice,
        |    key := o_orderkey))) AS arr
        | FROM orders GROUP BY o_custkey)
        | SELECT o_custkey, len(arr) AS n,
        |  arr[len(arr)].key AS top_key,
        |  arr[len(arr)].price AS top_price,
        |  arr[1].price AS min_price
        | FROM g ORDER BY o_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_try" ->
      """SELECT o_orderkey,
        | o_totalprice / nullif(o_orderkey % 3, 0) AS td,
        | TRY_CAST(raw AS INT) AS tc,
        | try_strptime(raw, '%Y') IS NOT NULL AS tt_ok
        | FROM (SELECT *, CASE WHEN o_orderkey % 5 = 0 THEN 'bad'
        |   ELSE CAST(1900 + o_orderkey % 200 AS VARCHAR) END AS raw
        |  FROM orders WHERE o_orderkey < 1000)
        | ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_decimal" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        | CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS DOUBLE) AS doubled,
        | CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(0.005 AS DECIMAL(18,3)) AS DECIMAL(18,3)) AS DOUBLE) AS plus_half_cent,
        | CAST(floor(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) AS whole,
        | CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 100 AS DECIMAL(18,2)) AS DOUBLE) AS mod100
        | FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_mask" ->
      """SELECT c_custkey,
        | regexp_replace(regexp_replace(regexp_replace(c_name,
        |   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
        | to_base64(CAST(c_name AS BLOB)) AS b64,
        | c_name AS b64_roundtrip
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_csv" ->
      """SELECT c_custkey, c_custkey AS k, c_mktsegment AS seg,
        | c_acctbal AS bal
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_url" ->
      """SELECT c_custkey,
        | 'repo.example.edu' AS host,
        | '/works/' || c_custkey AS path,
        | c_mktsegment AS seg_param
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_string2" ->
      """SELECT c_custkey,
        | split_part(c_name, '#', 1) AS name_prefix,
        | split_part(c_name, '#', 2) AS name_digits,
        | translate(c_name, '0#', '_-') AS translated,
        | repeat(substring(c_mktsegment, 1, 2), 3) AS seg_repeat,
        | reverse(c_name) AS rev,
        | strpos(c_name, '9') AS pos_nine,
        | left(c_name, 10) AS l10,
        | right(c_name, 4) AS r4
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_conditional" ->
      """SELECT o_orderkey,
        | coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        | ifnull(nullif(o_orderpriority, o_orderpriority), 'none') AS always_none,
        | greatest(o_totalprice, 100000.0) AS floor_100k,
        | least(o_totalprice, 100000.0) AS cap_100k,
        | CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
        | FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_hash" ->
      """SELECT c_custkey,
        | md5(c_name) AS h_md5,
        | sha256(c_name) AS h_sha256
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS b_and,
        | o_orderkey | 16 AS b_or,
        | xor(o_orderkey, o_custkey) AS b_xor,
        | bit_count(o_orderkey) AS b_cnt,
        | o_orderkey << 3 AS b_shl,
        | o_orderkey >> 2 AS b_shr
        | FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_udf_scalar" ->
      """SELECT c_custkey,
        | 'https://DOI.org/10.5555/' || c_custkey AS raw_doi,
        | lower(regexp_replace(trim('https://DOI.org/10.5555/' || c_custkey),
        |   '^(?i)https?://(dx\.)?doi\.org/', '')) AS doi
        | FROM customer ORDER BY c_custkey"""
        .stripMargin.replaceAll("\n", " "),

    "q_udtf_generator" ->
      """SELECT r_name, unnest(generate_series(0, r_regionkey)) AS i
        | FROM region ORDER BY r_name, i"""
        .stripMargin.replaceAll("\n", " ")
  )
}
