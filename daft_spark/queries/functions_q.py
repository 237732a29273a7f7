"""Scalar-function batteries — SURVEY §2.6 (reference
``daft/functions/{str,datetime,numeric,list,struct,binary,bitwise,url,
misc}.py``). Each battery is one query whose DuckDB oracle recomputes
every column, so a single driver slot hash-verifies a whole function
family. Batteries over the same table/filter are merged (round 2) so
the full §2.6 surface fits the driver's correctness window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.queries import register


@register(
    "fn_strings_regex",
    """
    SELECT doc_id,
           upper(source) AS up,
           lower(source) AS lo,
           length(text) AS n,
           substring(text, 1, 20) AS prefix,
           reverse(source) AS rev,
           lpad(source, 8, '_') AS padded,
           left(text, 5) AS l5,
           right(text, 5) AS r5,
           concat_ws('|', lang, source) AS tagged,
           replace(source, 'src', 'S') AS repl,
           levenshtein(lang, 'en') AS lev,
           regexp_extract(substring(text, 1, 60), '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(substring(text, 1, 60), 'scan')) AS INT) AS n_scan,
           regexp_replace(substring(text, 1, 60), '[aeiou]', '_', 'g') AS devowel_prefix,
           regexp_matches(substring(text, 1, 60), 'join.*scan') AS has_join_scan
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def fn_strings_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regex families (reference daft/functions/str.py:369-1965:
    upper/lower/length/substr/reverse/pad/left/right/concat_ws/replace/
    levenshtein/regexp_extract/count/replace/rlike)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.substring("text", 1, 60)
    return d.select(
        "doc_id",
        F.upper("source").alias("up"),
        F.lower("source").alias("lo"),
        F.length("text").alias("n"),
        F.substring("text", 1, 20).alias("prefix"),
        F.reverse("source").alias("rev"),
        F.lpad("source", 8, "_").alias("padded"),
        F.left("text", F.lit(5)).alias("l5"),
        F.right("text", F.lit(5)).alias("r5"),
        F.concat_ws("|", "lang", "source").alias("tagged"),
        F.replace("source", F.lit("src"), F.lit("S")).alias("repl"),
        F.levenshtein("lang", F.lit("en")).alias("lev"),
        F.regexp_extract(t, "([a-z]+)", 1).alias("first_word"),
        F.regexp_count(t, F.lit("scan")).alias("n_scan"),
        F.regexp_replace(t, "[aeiou]", "_").alias("devowel_prefix"),
        t.rlike("join.*scan").alias("has_join_scan"),
    ).orderBy("doc_id")


@register(
    "fn_datetime_numeric",
    """
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi,
           CAST(second(ts) AS INT) AS s,
           CAST(quarter(ts) AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(weekofyear(ts) AS INT) AS woy,
           CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_hour,
           CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE) AS plus7,
           CAST(last_day(CAST(ts AS DATE)) AS DATE) AS eom,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           round(value, 1) AS r1,
           floor(value) AS fl,
           ceil(value) AS ce,
           sqrt(abs(value)) AS sq,
           pow(value, 2) AS p2,
           CASE WHEN value > 0 THEN ln(value) END AS lnv,
           CAST(sign(value - 100) AS DOUBLE) AS sg,
           CAST(CAST(event_id AS BIGINT) % 7 AS BIGINT) AS m7,
           greatest(value, 50.0) AS gr,
           least(value, 50.0) AS le
    FROM events WHERE value IS NOT NULL AND event_id < 500 ORDER BY event_id
    """,
)
def fn_datetime_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime + numeric families (reference daft/functions/datetime.py,
    numeric.py:10-422). iso_dow remaps Spark's Sunday=1 dayofweek to the
    ISO Monday=1..Sunday=7 convention."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("event_id") < 500)
    )
    ts, v = F.col("ts"), F.col("value")
    return e.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        F.quarter(ts).alias("q"),
        F.dayofyear(ts).alias("doy"),
        F.weekofyear(ts).alias("woy"),
        (((F.dayofweek(ts) + 5) % 7) + 1).alias("iso_dow"),
        F.date_trunc("hour", ts).cast("timestamp_ntz").alias("ts_hour"),
        F.date_add(ts.cast("date"), 7).alias("plus7"),
        F.last_day(ts.cast("date")).alias("eom"),
        F.unix_micros(ts.cast("timestamp")).alias("us"),
        F.round(v, 1).alias("r1"),
        F.floor(v).cast("double").alias("fl"),
        F.ceil(v).cast("double").alias("ce"),
        F.sqrt(F.abs(v)).alias("sq"),
        F.pow(v, 2).alias("p2"),
        F.when(v > 0, F.log(v)).alias("lnv"),
        F.signum(v - 100).alias("sg"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("m7"),
        F.greatest(v, F.lit(50.0)).alias("gr"),
        F.least(v, F.lit(50.0)).alias("le"),
    ).orderBy("event_id")


@register(
    "fn_datetime_arith",
    """
    SELECT o_orderkey,
           CAST(make_date(2020, CAST(month(o_orderdate) AS INT), 15) AS DATE) AS md,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
           CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS mstart,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS unix_s
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime arithmetic family: make_date, add_months, datediff,
    date_trunc, unix epoch (reference datetime.py:13-1815)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(F.lit(2020), F.month(d), F.lit(15)).alias("md"),
        F.add_months(d.cast("date"), 3).alias("plus3mo"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_trunc("month", d).cast("date").alias("mstart"),
        F.unix_timestamp(d.cast("timestamp")).alias("unix_s"),
    ).orderBy("o_orderkey")


@register(
    "fn_json_bitwise",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_struct,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           json_extract_string('{"a": {"b": [1, 2, 3]}}', '$.a.b[1]') AS nested,
           CAST(event_id & 255 AS BIGINT) AS b_and,
           CAST(event_id | 15 AS BIGINT) AS b_or,
           CAST(xor(event_id, 255) AS BIGINT) AS b_xor,
           CAST(event_id << 2 AS BIGINT) AS b_shl,
           CAST(event_id >> 1 AS BIGINT) AS b_shr,
           CAST(bit_count(event_id) AS INT) AS b_cnt
    FROM events WHERE event_id < 300 ORDER BY event_id
    """,
)
def fn_json_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON (get_json_object + from_json typed struct; reference
    str.py:13-175 serialize/deserialize/jq) + bitwise families
    (reference daft/functions/bitwise.py:8-41)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    parsed = F.from_json("props", "k INT")
    c = F.col("event_id")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_struct"),
        F.from_json("props", "k INT").isNotNull().alias("is_valid"),
        F.get_json_object(F.lit('{"a": {"b": [1, 2, 3]}}'), "$.a.b[1]").alias("nested"),
        c.bitwiseAND(F.lit(255)).alias("b_and"),
        c.bitwiseOR(F.lit(15)).alias("b_or"),
        c.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.shiftleft(c, 2).alias("b_shl"),
        F.shiftright(c, 1).alias("b_shr"),
        F.bit_count(c).alias("b_cnt"),
    ).orderBy("event_id")


@register(
    "fn_list_binary_url",
    """
    WITH t AS (SELECT doc_id, source, lang, text, string_split(text, ' ') AS toks,
                      concat('https://', source, '.example.com/docs/',
                             CAST(doc_id AS VARCHAR), '?lang=', lang) AS url
               FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
           array_to_string(toks[1:3], '-') AS first3,
           list_contains(toks, 'scan') AS has_scan,
           toks[2] AS second_tok,
           list_sort(list_distinct(toks[1:3]))[1] AS min_tok,
           to_base64(encode(source)) AS b64,
           CAST(decode(from_base64(to_base64(encode(source)))) AS VARCHAR) AS roundtrip,
           lower(hex(encode(source))) AS hx,
           octet_length(encode(text)) AS nbytes,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query
    FROM t ORDER BY doc_id
    """,
)
def fn_list_binary_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List (reference daft/functions/list.py:11-586), binary
    (binary.py:14-172) and URL-parsing (url.py:149 parse_url — the
    oracle recomputes the parts with regexes, DuckDB has no parse_url)
    families."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    enc = F.encode("source", "UTF-8")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
        F.array_contains(toks, "scan").alias("has_scan"),
        F.get(toks, 1).alias("second_tok"),
        F.element_at(F.array_sort(F.array_distinct(F.slice(toks, 1, 3))), 1).alias("min_tok"),
        F.base64(enc).alias("b64"),
        F.unbase64(F.base64(enc)).cast("string").alias("roundtrip"),
        F.lower(F.hex(enc)).alias("hx"),
        F.octet_length(F.encode("text", "UTF-8")).alias("nbytes"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    ).orderBy("doc_id")


@register(
    "fn_conditional_struct",
    """
    SELECT event_id,
           CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'mid'
                ELSE 'low' END AS bucket,
           coalesce(value, -1.0) AS v_filled,
           nullif(event_type, 'error') AS et_nn,
           CASE WHEN value IS NULL THEN 0.0 ELSE value END AS v_zero,
           struct_extract({u: user_id, t: event_type}, 'u') AS u_back,
           struct_extract({u: user_id, t: event_type}, 't') AS t_back,
           map(['a','b'], [value, value * 2])['b'][1] AS map_b
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
)
def fn_conditional_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, fill_null (reference
    misc.py:242-339, :905 WhenExpr) + struct/map construction and access
    (struct.py:8-38, misc.py:658-814)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.col("value")
    st = F.struct(F.col("user_id").alias("u"), F.col("event_type").alias("t"))
    m = F.create_map(F.lit("a"), F.col("value"), F.lit("b"), F.col("value") * 2)
    return e.select(
        "event_id",
        F.when(v >= 100, "high").when(v >= 50, "mid").otherwise("low").alias("bucket"),
        F.coalesce(v, F.lit(-1.0)).alias("v_filled"),
        F.nullif("event_type", F.lit("error")).alias("et_nn"),
        F.when(v.isNull(), 0.0).otherwise(v).alias("v_zero"),
        st.getField("u").alias("u_back"),
        st.getField("t").alias("t_back"),
        F.element_at(m, "b").alias("map_b"),
    ).orderBy("event_id")


@register(
    "fn_hash_invariant",
    """
    SELECT count(*) AS n, count(*) AS n_hashes
    FROM (SELECT DISTINCT text FROM documents)
    """,
)
def fn_hash_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 (reference misc.py:388): engine-specific values, so the
    oracle checks the collision-free invariant over distinct texts."""
    d = load_table(spark, sf_dir, "documents").select("text").distinct()
    return d.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.xxhash64("text")).alias("n_hashes"),
    )

@register(
    "fn_horizontal_partitioning",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity + l_discount + l_tax AS DOUBLE) AS row_sum,
           CAST((l_quantity + l_discount + l_tax) / 3 AS DOUBLE) AS row_mean,
           CAST(least(l_quantity, l_discount, l_tax) AS DOUBLE) AS row_min,
           CAST(greatest(l_quantity, l_discount, l_tax) AS DOUBLE) AS row_max,
           CAST(l_shipdate AS DATE) AS ship_day,
           strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           l_orderkey - (l_orderkey % 100) AS okey_bucket100,
           substring(l_returnflag, 1, 1) AS rf_trunc
    FROM lineitem WHERE l_orderkey < 1000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_horizontal_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal (row-wise) reductions (reference daft/functions/
    columnar.py: columns_sum/mean/min/max) + partitioning transforms
    (reference daft/functions/partitioning.py:8-121: days/months/years,
    iceberg_truncate) in one oracled frame. lineitem's measure columns
    are non-null, so the null-skipping semantics reduce to the plain
    arithmetic the oracle states; iceberg_bucket is excluded (Spark's
    murmur3 seed is not reproducible in DuckDB — covered by pytest)."""
    from daft_spark.functions.columnar import (
        columns_max,
        columns_mean,
        columns_min,
        columns_sum,
    )
    from daft_spark.functions.partitioning import (
        days,
        iceberg_truncate,
        months,
        years,
    )

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    m = ["l_quantity", "l_discount", "l_tax"]
    return l.select(
        "l_orderkey",
        "l_linenumber",
        columns_sum(*m).alias("row_sum"),
        columns_mean(*m).alias("row_mean"),
        columns_min(*m).cast("double").alias("row_min"),
        columns_max(*m).cast("double").alias("row_max"),
        days("l_shipdate").alias("ship_day"),
        months("l_shipdate").alias("ship_month"),
        years("l_shipdate").alias("ship_year"),
        iceberg_truncate("l_orderkey", 100, dtype="long").alias("okey_bucket100"),
        iceberg_truncate("l_returnflag", 1).alias("rf_trunc"),
    ).orderBy("l_orderkey", "l_linenumber")

@register(
    "fn_files_tokenize",
    """
    SELECT doc_id,
           '/data/' || source || '/' || CAST(doc_id AS VARCHAR) ||
             (CASE WHEN lang = 'en' THEN '.txt' WHEN lang = 'de' THEN '.json'
                   WHEN lang = 'fr' THEN '.csv' ELSE '.html' END) AS path,
           (CASE WHEN lang = 'en' THEN 'text/plain'
                 WHEN lang = 'de' THEN 'application/json'
                 WHEN lang = 'fr' THEN 'text/csv' ELSE 'text/html' END) AS mime,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_tok,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS INT)
             AS n_distinct_tok
    FROM documents WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def fn_files_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE helpers (reference daft/functions/files.py: guess_mime_type
    over a path column) + dependency-free token-id encoding (reference
    tokenize_encode, daft/functions/str.py) in one oracled frame: the
    mime guess is restated as the extension CASE, the token-id ARRAY is
    checked through its length and distinct-cardinality (hashed ids are
    not SQL-reproducible, but |ids| and |distinct ids| equal the word
    counts up to a negligible 32-bit collision)."""
    from daft_spark.functions.files import guess_mime_type
    from daft_spark.functions.text import tokenize_encode

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ext = (
        F.when(F.col("lang") == "en", ".txt")
        .when(F.col("lang") == "de", ".json")
        .when(F.col("lang") == "fr", ".csv")
        .otherwise(".html")
    )
    path = F.concat(
        F.lit("/data/"), F.col("source"), F.lit("/"),
        F.col("doc_id").cast("string"), ext,
    )
    ids = tokenize_encode(F.col("text"), "ws")
    return d.select(
        "doc_id",
        path.alias("path"),
        guess_mime_type(path).alias("mime"),
        F.size(ids).alias("n_tok"),
        F.size(F.array_distinct(ids)).alias("n_distinct_tok"),
    ).orderBy("doc_id")


@register(
    "fn_udf_scalar_batch",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST((o_orderkey * 3 + 1) % 7 AS BIGINT) AS scalar_out,
           CAST(round(o_totalprice * 2 + 1, 2) AS DOUBLE) AS batch_out
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def fn_udf_scalar_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """@func (Arrow-optimized row-wise scalar UDF) and @func.batch
    (pandas Series->Series) — SURVEY §2.9 (reference @daft.func,
    daft/udf/udf_v2.py). The oracle restates both functions as plain
    SQL arithmetic, so a type coercion or Arrow transfer bug in the
    UDF plumbing mismatches."""
    from daft_spark.udf import func

    @func(return_dtype="long")
    def scalar_fn(x: int) -> int:
        return (x * 3 + 1) % 7

    @func.batch(return_dtype="double")
    def batch_fn(s):
        return (s * 2 + 1).round(2)

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (
        o.select(
            F.col("o_orderkey"),
            scalar_fn(F.col("o_orderkey")).alias("scalar_out"),
            batch_fn(F.col("o_totalprice")).alias("batch_out"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_udtf_lateral",
    """
    SELECT CAST(range AS BIGINT) AS i,
           CAST(range * range AS BIGINT) AS sq
    FROM range(0, 60)
    ORDER BY i
    """,
)
def fn_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 @udtf table function (SURVEY §2.9; the reference's
    generator @daft.func used as a UDTF, udf_v2.py:55): eval() yields
    one row per element of an integer range; the oracle recomputes the
    table with DuckDB's range() table function."""
    from daft_spark.udf import udtf

    @udtf(return_schema="i bigint, sq bigint")
    class SquareRange:
        def eval(self, start: int, end: int):
            for i in range(start, end):
                yield (i, i * i)

    return SquareRange(F.lit(0), F.lit(60)).orderBy("i")


@register(
    "fn_url_parse_struct",
    """
    WITH t AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://u' || CAST(doc_id AS VARCHAR) || ':pw@'
                 || source || '.example.com:8443/a/b?x=' || lang || '#frag'
               WHEN 1 THEN 'http://' || source || '.example.com/plain'
               WHEN 2 THEN 'https://u' || CAST(doc_id AS VARCHAR) || '@'
                 || source || '.example.com/auth?q=1'
               ELSE 'ftp://' || source || '.example.com:21/data/'
                 || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents WHERE doc_id < 240)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           CASE WHEN regexp_matches(url, '://[^/@]*@')
                THEN regexp_extract(url, '://([^/:@]+)(:[^/@]*)?@', 1) END
             AS username,
           CASE WHEN regexp_matches(url, '://[^/@]*:[^/@]*@')
                THEN regexp_extract(url, '://[^/:@]+:([^/@]*)@', 1) END
             AS password,
           regexp_extract(url, '://(?:[^/@]*@)?([^/:?#]+)', 1) AS host,
           CASE WHEN regexp_matches(url, '://(?:[^/@]*@)?[^/:?#]+:[0-9]+')
                THEN CAST(regexp_extract(url,
                     '://(?:[^/@]*@)?[^/:?#]+:([0-9]+)', 1) AS INT) END
             AS port,
           regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1) AS path,
           CASE WHEN regexp_matches(url, '\\?')
                THEN regexp_extract(url, '\\?([^#]*)', 1) END AS query,
           CASE WHEN regexp_matches(url, '#')
                THEN regexp_extract(url, '#(.*)$', 1) END AS fragment
    FROM t ORDER BY doc_id
    """,
)
def fn_url_parse_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url STRUCT parity (reference url.py:149: scheme, username,
    password, host, port, path, query, fragment as one struct): four
    URL shapes — credentials + port + query + fragment, bare, user
    without password, non-default scheme with port — built identically
    in both engines; the oracle re-derives every component with
    regexes (DuckDB has no parse_url). The struct is flattened so each
    component is value-checked."""
    from daft_spark.functions.misc import parse_url

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("https://u"), F.col("doc_id").cast("string"), F.lit(":pw@"),
                F.col("source"), F.lit(".example.com:8443/a/b?x="),
                F.col("lang"), F.lit("#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://"), F.col("source"), F.lit(".example.com/plain")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://u"), F.col("doc_id").cast("string"), F.lit("@"),
                F.col("source"), F.lit(".example.com/auth?q=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("ftp://"), F.col("source"), F.lit(".example.com:21/data/"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    p = parse_url(url)
    return d.select(
        "doc_id",
        p["scheme"].alias("scheme"),
        p["username"].alias("username"),
        p["password"].alias("password"),
        p["host"].alias("host"),
        p["port"].alias("port"),
        p["path"].alias("path"),
        p["query"].alias("query"),
        p["fragment"].alias("fragment"),
    ).orderBy("doc_id")


@register(
    "fn_bpe_file_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS all_roundtrip,
           TRUE AS all_nonempty
    FROM documents WHERE doc_id < 200
    """,
    comparable=False,
)
def fn_bpe_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-python .tiktoken-file BPE (functions/text.py
    tokenize_encode/decode over the reference's real tokens_5k
    vocabulary + p50k split pattern) driven end-to-end on the corpus:
    every document must encode -> decode back to its EXACT text, with
    a non-empty id sequence. The merge loop itself is validated against
    the reference's published expected ids in
    tests/test_tokenize_file.py; this row keeps the whole executor-side
    path (pattern compile, ranks broadcast-by-closure, pandas UDF) on
    the driver's radar. Invariant oracle: BPE is not SQL-expressible."""
    from daft_spark.functions.text import tokenize_decode, tokenize_encode

    # resolve the interop fixture from a configurable root (r10 advice)
    ref_root = os.environ.get("DAFT_SPARK_REFERENCE_ROOT", "/root/reference")
    tok = os.path.join(ref_root, "tests/assets/tokens/tokens_5k.tiktoken")
    if not os.path.exists(tok):
        # self-contained fallback vocabulary (byte-level: all 256 single
        # bytes, base64 'token rank' lines) — same code path, no
        # external fixture needed. Written atomically (temp file +
        # os.replace) so a concurrent run can never read a half-written
        # vocabulary (r10 advice).
        import base64 as _b64
        import tempfile as _tf

        tok = os.path.join(_tf.gettempdir(), "daft_spark_bytes.tiktoken")
        if not os.path.exists(tok):
            fd, tmp = _tf.mkstemp(
                dir=_tf.gettempdir(), suffix=".tiktoken.partial"
            )
            with os.fdopen(fd, "wb") as f:
                for i in range(256):
                    f.write(_b64.b64encode(bytes([i])) + b" %d\n" % i)
            os.replace(tmp, tok)
    pat = (
        "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
        "|\\s+(?!\\S)|\\s+"
    )
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ids = tokenize_encode(F.col("text"), tok, pattern=pat)
    out = d.select(
        "text",
        ids.alias("ids"),
        tokenize_decode(ids, tok, pattern=pat).alias("back"),
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.bool_and(F.col("back") == F.col("text")), F.lit(True)).alias(
            "all_roundtrip"
        ),
        F.coalesce(F.bool_and(F.size("ids") > 0), F.lit(True)).alias("all_nonempty"),
    )
