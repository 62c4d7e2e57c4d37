package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalar-function pack: string / date / math / json / array — the
  * generalization of the reference's only scalar logic: the
  * `logStreamPrefix` derivation `'/'.join(logStream.split('/')[0:2])`
  * (`kinesis-to-humio.py:137,163`, replicated here Spark-natively as
  * `concat_ws("/", slice(split(path, "/"), 1, 2))`, with the same
  * leniency for <2-segment inputs), the JSON decode
  * (`kinesis-to-humio.py:131` → `get_json_object`), and the raw
  * epoch-millis timestamps it passes through (`:147`).
  *
  * All functions here are built-in codegen'd Catalyst expressions —
  * no UDFs — so each query is a single WholeStageCodegen scan span.
  */
object ScalarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R11 prefix derivation + substr/upper/regexp over documents.
    "q_str_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("path",
          concat_ws("/", col("source"), col("lang"), col("doc_id")))
        .select(col("doc_id"),
          col("path"),
          concat_ws("/", slice(split(col("path"), "/"), 1, 2)).as("prefix2"),
          upper(col("lang")).as("up_lang"),
          substring(col("text"), 1, 20).as("snippet"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          length(col("text")).cast("int").as("n_len"))
        .orderBy("doc_id")),

    "q_date_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          date_trunc("month", col("l_shipdate")).as("ship_month"),
          year(col("l_shipdate")).cast("int").as("ship_year"),
          month(col("l_shipdate")).cast("int").as("ship_mon"),
          dayofmonth(col("l_shipdate")).cast("int").as("ship_day"),
          to_date(col("l_shipdate")).as("ship_date"))
        // ship_date breaks (l_orderkey, l_linenumber) ties — the pair
        // is NOT unique in this data; remaining ties are identical
        // rows (every output is a function of these three).
        .orderBy("l_orderkey", "l_linenumber", "ship_date")),

    // Date arithmetic: datediff / date_add / last_day over DATE
    // values (tz-free on both engines).
    "q_date_arith" -> ((s, d) => {
      val ship = to_date(col("l_shipdate"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(ship, lit("1995-01-01").cast("date"))
            .cast("int").as("days_since_95"),
          date_add(ship, 30).as("ship_plus_30"),
          last_day(ship).as("month_end"))
        .orderBy("l_orderkey", "l_linenumber", "days_since_95")
    }),

    "q_math_funcs" -> ((s, d) => {
      val p = col("p_retailprice").cast(DecimalType(18, 2))
      Tables.part(s, d)
        .select(col("p_partkey"),
          // Decimal rounding/abs are exact; double only on the output
          // surface (decimal outputs fail the driver's pandas hash).
          round(p, 1).cast("double").as("r1"),
          abs(p - 1000).cast("double").as("dist_1000"),
          least(col("p_size"), lit(25)).as("lo_size"),
          greatest(col("p_size"), lit(25)).as("hi_size"),
          sqrt(col("p_retailprice")).as("root_price"),
          floor(col("p_retailprice")).cast("long").as("floor_price"),
          ceil(col("p_retailprice")).cast("long").as("ceil_price"))
        .orderBy("p_partkey")
    }),

    // Null-handling scalar surface: COALESCE / NULLIF / CASE /
    // IS NULL — exercised through a derived nullable column.
    "q_null_funcs" -> ((s, d) => {
      val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
      Tables.customer(s, d)
        .select(col("c_custkey"),
          coalesce(seg, lit("(none)")).as("seg_or_none"),
          seg.isNull.cast("int").as("was_building"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") > 5000, "high")
            .otherwise("mid").as("bal_band"))
        .orderBy("c_custkey")
    }),

    // Second string pack: padding/reverse/repeat/replace/translate —
    // the remaining per-row string surface, one codegen span.
    "q_str_funcs2" -> ((s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          lpad(col("n_name"), 12, ".").as("padded"),
          rpad(col("n_name"), 12, "-").as("rpadded"),
          reverse(col("n_name")).as("rev"),
          repeat(substring(col("n_name"), 1, 2), 3).as("rep"),
          regexp_replace(col("n_name"), "[AEIOU]", "_").as("novowel"),
          translate(col("n_name"), "AEI", "xyz").as("xlate"),
          left(col("n_name"), lit(3)).as("l3"),
          right(col("n_name"), lit(3)).as("r3"))
        .orderBy("n_nationkey")),

    // Bitwise scalar surface over integer keys.
    "q_bitwise" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          col("c_custkey").bitwiseAND(lit(255L)).as("b_and"),
          col("c_custkey").bitwiseOR(lit(16L)).as("b_or"),
          col("c_custkey").bitwiseXOR(lit(85L)).as("b_xor"),
          shiftleft(col("c_custkey"), 2).cast("long").as("b_shl"),
          shiftright(col("c_custkey"), 3).cast("long").as("b_shr"))
        .orderBy("c_custkey")),

    "q_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          col("event_type"))
        .orderBy("event_id")),

    // Robust JSON decode: a deterministically-corrupted props column
    // (every 7th event truncated) parsed permissively — invalid
    // documents yield NULL instead of failing the job, the engine's
    // log-and-continue contract (reference: kinesis-to-humio.py
    // :154-158 logs and drops). Output: validity flag + extracted
    // field, NULL-safe.
    "q_json_robust" -> ((s, d) => {
      val corrupted = when(col("event_id") % 7 === 0,
        substring(col("props"), 1, 3)).otherwise(col("props"))
      Tables.events(s, d)
        .withColumn("p", corrupted)
        .select(col("event_id"),
          get_json_object(col("p"), "$.k").isNotNull.cast("int")
            .as("is_valid"),
          get_json_object(col("p"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    }),

    // Standalone generator: posexplode over a bounded array slice —
    // one output row per (vector, position). The dim-≥4 guard keeps
    // Spark (emits existing elements) and the oracle's
    // generate_series cross join (always 4 rows) aligned even if the
    // corpus ever contains short or null vectors.
    "q_explode" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(size(col("embedding")) >= 4)
        .select(col("vec_id"),
          posexplode(slice(col("embedding"), 1, 4)).as(Seq("idx0", "val")))
        .select(col("vec_id"), (col("idx0") + 1).cast("int").as("idx"),
          col("val"))
        .orderBy("vec_id", "idx")),

    // Second array pack: membership / position / extrema / sorted
    // selection — scalar outputs only (raw arrays are unhashable in
    // the driver gate).
    "q_array_funcs2" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          array_contains(col("embedding"), lit(0.0f)).as("has_zero"),
          array_position(col("embedding"),
            element_at(col("embedding"), 1)).cast("long").as("pos_first"),
          array_max(col("embedding")).as("vmax"),
          array_min(col("embedding")).as("vmin"),
          element_at(array_sort(col("embedding")), 1).as("sorted_first"),
          element_at(array_sort(col("embedding")), -1).as("sorted_last"))
        .orderBy("vec_id")),

    "q_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).cast("int").as("dim"),
          element_at(col("embedding"), 1).as("first_elem"),
          element_at(col("embedding"), -1).as("last_elem"),
          // Head-of-vector as scalar columns, not an array: the
          // driver's pandas row-sorter cannot hash numpy arrays, so a
          // raw ARRAY output column errors the whole comparison.
          element_at(col("embedding"), 2).as("h2"),
          element_at(col("embedding"), 3).as("h3"),
          element_at(col("embedding"), 4).as("h4"),
          round(
            aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double")), 4).as("sum4"))
        .orderBy("vec_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT doc_id, path,
        |  array_to_string((string_split(path, '/'))[1:2], '/') AS prefix2,
        |  upper(lang) AS up_lang,
        |  substring(text, 1, 20) AS snippet,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  CAST(length(text) AS INT) AS n_len
        |FROM (SELECT *, concat_ws('/', source, lang, doc_id) AS path
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_date_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
        |  CAST(year(l_shipdate) AS INT) AS ship_year,
        |  CAST(month(l_shipdate) AS INT) AS ship_mon,
        |  CAST(day(l_shipdate) AS INT) AS ship_day,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ship_date""".stripMargin,
    "q_date_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |                 CAST(l_shipdate AS DATE)) AS INT)
        |    AS days_since_95,
        |  CAST(l_shipdate AS DATE) + 30 AS ship_plus_30,
        |  last_day(CAST(l_shipdate AS DATE)) AS month_end
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, days_since_95""".stripMargin,
    "q_math_funcs" ->
      """SELECT p_partkey,
        |  CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  CAST(abs(CAST(p_retailprice AS DECIMAL(18,2)) - 1000)
        |       AS DOUBLE) AS dist_1000,
        |  least(p_size, 25) AS lo_size,
        |  greatest(p_size, 25) AS hi_size,
        |  sqrt(p_retailprice) AS root_price,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_null_funcs" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)')
        |    AS seg_or_none,
        |  CAST(NULLIF(c_mktsegment, 'BUILDING') IS NULL AS INT)
        |    AS was_building,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal > 5000 THEN 'high'
        |       ELSE 'mid' END AS bal_band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_str_funcs2" ->
      """SELECT n_nationkey,
        |  lpad(n_name, 12, '.') AS padded,
        |  rpad(n_name, 12, '-') AS rpadded,
        |  reverse(n_name) AS rev,
        |  repeat(substring(n_name, 1, 2), 3) AS rep,
        |  regexp_replace(n_name, '[AEIOU]', '_', 'g') AS novowel,
        |  translate(n_name, 'AEI', 'xyz') AS xlate,
        |  left(n_name, 3) AS l3,
        |  right(n_name, 3) AS r3
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_bitwise" ->
      """SELECT c_custkey,
        |  c_custkey & 255 AS b_and,
        |  c_custkey | 16 AS b_or,
        |  xor(c_custkey, 85) AS b_xor,
        |  c_custkey << 2 AS b_shl,
        |  c_custkey >> 3 AS b_shr
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_robust" ->
      """SELECT event_id,
        |  CAST(k_str IS NOT NULL AS INT) AS is_valid,
        |  CAST(k_str AS INT) AS k_val
        |FROM (
        |  SELECT event_id,
        |    CASE WHEN json_valid(p) THEN json_extract_string(p, '$.k')
        |         ELSE NULL END AS k_str
        |  FROM (SELECT event_id,
        |          CASE WHEN event_id % 7 = 0 THEN substring(props, 1, 3)
        |               ELSE props END AS p
        |        FROM events))
        |ORDER BY event_id""".stripMargin,
    "q_explode" ->
      """SELECT vec_id, CAST(i AS INT) AS idx,
        |  embedding[CAST(i AS INT)] AS val
        |FROM embeddings CROSS JOIN generate_series(1, 4) t(i)
        |WHERE len(embedding) >= 4
        |ORDER BY vec_id, idx""".stripMargin,
    "q_array_funcs2" ->
      """SELECT vec_id,
        |  list_contains(embedding, 0.0) AS has_zero,
        |  CAST(list_position(embedding, embedding[1]) AS BIGINT)
        |    AS pos_first,
        |  list_max(embedding) AS vmax,
        |  list_min(embedding) AS vmin,
        |  list_sort(embedding)[1] AS sorted_first,
        |  list_sort(embedding)[-1] AS sorted_last
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_elem,
        |  embedding[-1] AS last_elem,
        |  embedding[2] AS h2,
        |  embedding[3] AS h3,
        |  embedding[4] AS h4,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum4
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
