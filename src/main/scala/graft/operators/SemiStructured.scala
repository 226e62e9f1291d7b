package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured layer — SURVEY.md §2B Q30–Q32: arrays (embeddings),
  * maps, JSON. All higher-order functions (`aggregate`, `transform`,
  * element access) run inside codegen over the array values — no explode
  * unless the query's shape genuinely needs one row per element.
  *
  * Scale notes: array scalar ops are map-only (no shuffle); the explode
  * variant multiplies rows ×dim — at 100 TB that is only done after
  * slicing to the needed prefix; map construction aggregates per key with
  * map-side partial aggregation first.
  */
object SemiStructured {

  // Q30a `array_funcs` — scalar array ops: size / element_at / min / max /
  // sequential sum over a slice (functions.aggregate — deterministic
  // left-to-right fold, matching DuckDB's list_sum over the same slice;
  // both accumulate in double).
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(element_at(col("embedding"), -1).cast("double"), 4).as("last_val"),
        round(array_max(col("embedding")).cast("double"), 4).as("max_val"),
        round(array_min(col("embedding")).cast("double"), 4).as("min_val"),
        round(
          aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x.cast("double")), 4).as("sum_first8"))
      .orderBy("vec_id")

  // Q30b `array_explode` — posexplode (generator / UDTF category):
  // one row per (vector, position) for the first 8 positions.
  def arrayExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .filter(col("pos") < 8)
      .select(
        col("vec_id"),
        col("pos").cast("long").as("pos"),
        round(col("val").cast("double"), 4).as("val"))
      .orderBy("vec_id", "pos")

  // `array_funcs2` — second array suite: set algebra over arrays
  // (union/intersect/except on embedding prefixes treated as element
  // sets), sort, flatten, and zip_with element arithmetic — all
  // evaluated inside codegen'd higher-order builtins, map-only.
  def arrayFuncs2(spark: SparkSession, dir: String): DataFrame = {
    // floor-quantize (not round: the engines' round-half conventions
    // differ; floor is identical everywhere)
    val a = transform(slice(col("embedding"), 1, 6),
      x => floor(x.cast("double") * 10).cast("long"))
    val b = transform(slice(col("embedding"), 5, 6),
      x => floor(x.cast("double") * 10).cast("long"))
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        concat_ws(",", array_sort(array_union(a, b))).as("a_union"),
        concat_ws(",", array_sort(array_intersect(a, b))).as("a_intersect"),
        concat_ws(",", array_sort(array_except(a, b))).as("a_except"),
        concat_ws(",", flatten(array(a, b))).as("a_flat"),
        round(aggregate(zip_with(a, b, (x, y) => x + y), lit(0L), _ + _)
          .cast("double"), 4).as("zip_sum"))
      .orderBy("vec_id")
  }

  // Q31 `map_funcs` — build a per-user map event_type→count
  // (map_from_entries over a sorted entry list, so construction order is
  // deterministic), then read it back with element_at / size. The oracle
  // expresses the same result with FILTER counts — the map is the
  // Spark-side representation under test.
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), "view"), lit(0L)).as("views"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
        size(col("m")).cast("long").as("n_types"))
      .orderBy("user_id")

  // `map_hof` — map higher-order functions (transform_values /
  // map_filter / map_zip_with), the in-place lambda surface over map
  // columns: per-entry rescaling, entry-level filtering, and keyed
  // two-map combination WITHOUT exploding to rows and re-aggregating —
  // at 100 TB the explode→group round trip is a full extra shuffle per
  // transformation, while the HOF runs inside codegen on the already-
  // materialized map value. Maps build once from sorted entries
  // (map_from_entries over sort_array — insertion order is render
  // order, which makes to_json deterministic and DuckDB-replayable);
  // every downstream HOF preserves that order. map_zip_with(m,
  // doubled, sum) yields 3v per key — the keyed-combine shape feature
  // stores run when merging two feature maps.
  def mapHof(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("n")))))
        .as("m"))
      .select(
        col("user_id"),
        to_json(col("m")).as("m_json"),
        to_json(expr("transform_values(m, (k, v) -> v * 2)"))
          .as("doubled_json"),
        to_json(expr("map_filter(m, (k, v) -> v >= 2)"))
          .as("filtered_json"),
        to_json(expr(
          "map_zip_with(m, transform_values(m, (k, v) -> v * 2), " +
            "(k, a, b) -> a + b)")).as("tripled_json"),
        size(col("m")).cast("long").as("n_keys"))
      .orderBy("user_id")

  // Q32 `json_funcs` — JSON path extraction from events.props, both the
  // path form (get_json_object) and the schema form (from_json).
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    // narrow sort first, interpreted JSON work above it (the
    // variant_explode/json_variant lesson: get_json_object/from_json
    // are CodegenFallback, and under the sort the range-partitioner
    // sample pass evaluates them twice)
    Tables.wideSorted(spark, dir, "events",
      Tables.events(spark, dir)
        .select(col("event_id"), col("props")),
      col("event_id"))
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
          .getField("k").as("k_schema"))

  // `json_variant` — Spark 4's VARIANT type (the flagship
  // semi-structured feature): parse_json materializes a binary
  // variant ONCE, then every path extraction reads the variant's
  // internal encoding instead of re-parsing text — the reason VARIANT
  // replaces get_json_object chains at scale (json_funcs re-parses the
  // string per path; N variant_get calls re-parse zero times). The
  // demo parses events.props AND a constructed nested document
  // (object > array, object > object paths), extracts typed paths,
  // and surfaces schema_of_variant's inferred type string. Output
  // columns are all plain types — the variant itself stays internal,
  // so the oracle replays with ordinary JSON path extraction.
  def jsonVariant(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k")
    // {"arr":[k,2k],"meta":{"t":"<event_type>"},"nil":null}
    val nestedJson = concat(
      lit("{\"arr\":["), k, lit(","),
      (k.cast("long") * 2).cast("string"),
      lit("],\"meta\":{\"t\":\""), col("event_type"),
      lit("\"},\"nil\":null}"))
    // Narrow sort FIRST, interpreted variant work ABOVE it (the r13
    // variant_explode lesson, applied here in r14: orderBy's
    // range-partitioner SAMPLES its child plan, so the two parse_json
    // + five variant consumers — none codegen-able yet — executed
    // twice when they sat under the sort; a Project above Sort
    // preserves ordering, no exchange between them).
    Tables.wideSorted(spark, dir, "events",
      Tables.events(spark, dir)
        .select(col("event_id"), col("props"), col("event_type")),
      col("event_id"))
      .select(col("event_id"),
        parse_json(col("props")).as("v"),
        parse_json(nestedJson).as("nested"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.k", "long").as("k"),
        schema_of_variant(col("v")).as("v_schema"),
        variant_get(col("nested"), "$.arr[1]", "long").as("arr_1"),
        variant_get(col("nested"), "$.meta.t", "string").as("meta_t"),
        // VARIANT distinguishes an explicit JSON null from an absent
        // path: $.nil is a variant-NULL (true), not a SQL NULL
        is_variant_null(variant_get(col("nested"), "$.nil", "variant"))
          .as("nil_is_null"))
    // no terminal orderBy: the pre-projection sort's order flows
    // through the order-preserving Projects (no exchange above it)
  }

  // `url_funcs` — URL parsing (`parse_url` + `url_decode`), the
  // field-extraction surface every web-crawl pipeline runs before
  // anything else: per-domain grouping (dedup scopes, rate stats,
  // robots policy) needs HOST; canonicalization needs PATH with the
  // fragment dropped; tracking-parameter handling needs single-key
  // QUERY extraction; percent-encoded params need url_decode. URLs are
  // constructed deterministically from event columns (the jsonVariant
  // pattern — the oracle recomputes every field from the same base
  // columns rather than re-implementing a parser in SQL), then pulled
  // apart with the real parser, including the registrable-domain slice
  // off HOST. Scale: map-only projection, no shuffle before the
  // contract sort; parse_url is codegen'd, one parse per field group.
  // `variant_explode` — the VARIANT table function (Spark 4, the
  // lateral sibling of Q140 json_variant's path access): unnest a
  // variant ARRAY into (pos, value) rows where the element type is
  // only known per-element at runtime — the semi-structured ingest
  // reality (a props array mixing numbers and strings) that a typed
  // array<T> column cannot hold at all. The fixture array [k, 2k,
  // event_type] is deliberately HETEROGENEOUS; elements surface as
  // variant values and each consumer casts its own way: to_json for
  // the lossless render, try_cast-style typed access (`::BIGINT` via
  // variant_get semantics) nulls on the string element — the same
  // per-row error-tolerance story as ansi_try_funcs. One parse per
  // row, explode ×3, map-only before the contract sort.
  def variantExplode(spark: SparkSession, dir: String): DataFrame = {
    // r19: the interpreted parse chain (get_json_object → parse_json →
    // variant_explode) below the sort ran single-core on the
    // unsplittable fixture scan — fan the events out first (guide
    // §2.5; no-op on splittable production inputs).
    Tables.fannedEvents(spark, dir).createOrReplaceTempView("vex_events")
    // Three verdict fixes, all measured (sf0.1, 32 threads, best-of-3):
    //  - props parses ONCE (hoisted k projection) — VARIANT's whole
    //    point is parse-once (r12);
    //  - the interpreted consumers (to_json, try_variant_get — no
    //    codegen for variant eval yet) are computed ABOVE the global
    //    sort, not below it: orderBy's range-partitioner SAMPLES the
    //    child plan, so any projection under the sort executes twice.
    //    Consumers-below-sort measured 3.7 s; above 1.6 s (r12);
    //  - positions whose element type is KNOWN at plan time (0 and 1
    //    are numeric by construction of the fixture array) take a
    //    typed fast path off the carried `kk` column — the lazy CASE
    //    branches confine the interpreted variant eval to position 2,
    //    the one element whose type is genuinely runtime-mixed (r16
    //    item: 2.2 s → the ≤1.0 s bar; variant eval volume drops 3×).
    //    Same bytes by construction: to_json of an int64 variant IS
    //    the decimal render of kk, and try_variant_get('$','bigint')
    //    of it IS kk — the oracle hash is unchanged.
    // A Project above Sort preserves ordering (no exchange between
    // them — plan shape pinned in PlanSpec).
    val exploded = spark.sql(
      """SELECT e.event_id, e.kk, v.pos, v.value AS item
        |FROM (SELECT event_id, kk,
        |        parse_json(concat(
        |          '[', CAST(kk AS STRING), ',',
        |          CAST(kk * 2 AS STRING),
        |          ',"', event_type, '"]')) AS arr
        |      FROM (SELECT event_id, event_type,
        |              CAST(get_json_object(props, '$.k') AS BIGINT)
        |                AS kk
        |            FROM vex_events)) e,
        |LATERAL variant_explode(e.arr) v""".stripMargin)
    // contract sort via wideSorted (r20): the interpreted consumers
    // above ran on the AQE byte-floor's cores/4 partitions; an explicit
    // cores-wide range sort (fixture regime only — see Tables
    // .wideSorted) spreads them machine-wide with the identical total
    // order.
    Tables.wideSorted(spark, dir, "events", exploded,
      col("event_id"), col("pos"))
      .selectExpr("event_id", "pos",
        """CASE WHEN pos = 0 THEN CAST(kk AS STRING)
          |     WHEN pos = 1 THEN CAST(kk * 2 AS STRING)
          |     ELSE to_json(item) END AS item_json""".stripMargin,
        """CASE WHEN pos = 0 THEN kk
          |     WHEN pos = 1 THEN kk * 2
          |     ELSE try_variant_get(item, '$', 'bigint') END
          |  AS item_num""".stripMargin)
  }

  def urlFuncs(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    val url = concat(
      lit("https://"), col("event_type"), lit(".example.com/d/"),
      pmod(col("event_id"), lit(50)).cast("string"), lit("/page?q="),
      k.cast("string"), lit("&lang=en&t=a%20b%2Fc#s"),
      pmod(col("event_id"), lit(7)).cast("string"))
    // ONE parse per row (native UrlParts struct expression; codegen
    // CSE evaluates it once and the field reads are GetStructFields),
    // replacing the six independent parse_url regex runs the r12 plan
    // audit flagged; single-key query params come from one
    // str_to_map over the already-extracted query string.
    // narrow sort first, the whole build+parse chain above it (the
    // json_variant lesson: the chain starts with an interpreted
    // get_json_object, and under the sort the range-partitioner
    // sample pass evaluated all of it twice)
    Tables.wideSorted(spark, dir, "events",
      Tables.events(spark, dir)
        .select(col("event_id"), col("props"), col("event_type")),
      col("event_id"))
      .select(col("event_id"), url.as("url"))
      .select(col("event_id"),
        graft.functions.UrlParts.urlParts(col("url")).as("u"))
      .select(
        col("event_id"),
        col("u.protocol").as("proto"),
        col("u.host").as("host"),
        col("u.path").as("path"),
        element_at(str_to_map(col("u.query"), lit("&"), lit("=")), "q")
          .cast("long").as("q_param"),
        url_decode(element_at(
          str_to_map(col("u.query"), lit("&"), lit("=")), "t"))
          .as("t_decoded"),
        col("u.ref").as("fragment"),
        // registrable-domain slice: drop the subdomain label
        element_at(split(col("u.host"), "\\."), 2).as("domain"))
  }
}
