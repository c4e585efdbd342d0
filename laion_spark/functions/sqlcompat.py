"""ClickHouse-compatible SQL function layer (switch-and-run surface).

A user of the reference writes ClickHouse SQL — ``L2Distance(emb,
[...])``, ``toYear(ts)``, ``JSONExtractString(exif, 'Model')``
(reference search.py:20-26 generates exactly such SQL). This module
registers those names as Spark **SQL UDFs** (``CREATE TEMPORARY
FUNCTION ... RETURN <expr>``), which Catalyst inlines into the plan —
pure JVM expressions, no Python boundary, fully optimizable
(pushdown/codegen apply as if the user had written the Spark builtin).

Coverage: the function classes the reference exercises (SURVEY.md §2.7
F1-F6 + the §2.3 vector class) plus the everyday ClickHouse names a
LAION-table user reaches for. Names that collide with Spark builtins of
identical semantics (``round``, ``sqrt``, ``lower``, ``concat``) are
not re-registered.

Limitations: ClickHouse lambda combinators (``arrayMap(x -> ..., a)``)
are syntax, not a function — users rewrite them as Spark's
``transform(a, x -> ...)`` (same semantics, argument order swapped).
"""

from __future__ import annotations

#: name -> (typed arg list, return type, body expression)
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # --- vector distances (§2.3; reference search.py:23) ------------------
    "L2Distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "L2SquaredDistance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "L1Distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "LinfDistance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "array_max(zip_with(a, b, (x, y) -> abs(x - y)))",
    ),
    "dotProduct": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "L2Norm": (
        "a ARRAY<DOUBLE>",
        "DOUBLE",
        "sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))",
    ),
    "cosineDistance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "1.0 - aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / (sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"
        " * sqrt(aggregate(b, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)))",
    ),
    # --- array helpers ----------------------------------------------------
    "arraySum": ("a ARRAY<DOUBLE>", "DOUBLE", "aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    "arrayAvg": (
        "a ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / size(a)",
    ),
    "arrayMin": ("a ARRAY<DOUBLE>", "DOUBLE", "array_min(a)"),
    "arrayMax": ("a ARRAY<DOUBLE>", "DOUBLE", "array_max(a)"),
    "arrayElement": ("a ARRAY<DOUBLE>, i INT", "DOUBLE", "element_at(a, i)"),
    "has": ("a ARRAY<STRING>, x STRING", "BOOLEAN", "array_contains(a, x)"),
    "indexOf": ("a ARRAY<STRING>, x STRING", "INT", "CAST(array_position(a, x) AS INT)"),
    # --- date/time (toYear-family) ----------------------------------------
    "toYear": ("t TIMESTAMP", "INT", "year(t)"),
    "toMonth": ("t TIMESTAMP", "INT", "month(t)"),
    "toDayOfMonth": ("t TIMESTAMP", "INT", "day(t)"),
    "toHour": ("t TIMESTAMP", "INT", "hour(t)"),
    "toDate": ("t TIMESTAMP", "DATE", "CAST(t AS DATE)"),
    "toStartOfDay": ("t TIMESTAMP", "TIMESTAMP", "date_trunc('day', t)"),
    "toStartOfMonth": ("t TIMESTAMP", "DATE", "CAST(date_trunc('month', t) AS DATE)"),
    "toStartOfHour": ("t TIMESTAMP", "TIMESTAMP", "date_trunc('hour', t)"),
    # --- arithmetic -------------------------------------------------------
    # floor division in exact integer arithmetic (a DIV b truncates;
    # correct it toward -inf when signs differ and there is a remainder)
    "intDiv": ("a BIGINT, b BIGINT", "BIGINT", "a DIV b - CAST(((a % b) != 0 AND ((a < 0) != (b < 0))) AS BIGINT)"),
    "modulo": ("a BIGINT, b BIGINT", "BIGINT", "a % b"),
    "plus": ("a DOUBLE, b DOUBLE", "DOUBLE", "a + b"),
    "minus": ("a DOUBLE, b DOUBLE", "DOUBLE", "a - b"),
    "multiply": ("a DOUBLE, b DOUBLE", "DOUBLE", "a * b"),
    "divide": ("a DOUBLE, b DOUBLE", "DOUBLE", "a / b"),
    # --- strings (F4) -----------------------------------------------------
    "replaceAll": ("s STRING, f STRING, r STRING", "STRING", "replace(s, f, r)"),
    "replaceRegexpAll": ("s STRING, p STRING, r STRING", "STRING", "regexp_replace(s, p, r)"),
    "empty": ("s STRING", "BOOLEAN", "s IS NULL OR length(s) = 0"),
    "notEmpty": ("s STRING", "BOOLEAN", "s IS NOT NULL AND length(s) > 0"),
    "lengthUTF8": ("s STRING", "INT", "length(s)"),
    "toString": ("x DOUBLE", "STRING", "CAST(x AS STRING)"),
    "lowerUTF8": ("s STRING", "STRING", "lower(s)"),
    "upperUTF8": ("s STRING", "STRING", "upper(s)"),
    "substringUTF8": ("s STRING, o INT, l INT", "STRING", "substring(s, o, l)"),
    # NOTE: ClickHouse position(haystack, needle) cannot be provided —
    # Spark has a builtin `position(substr, str)` (reversed args) that
    # SQL UDFs may not replace; users keep Spark's instr(h, n).
    "arrayStringConcat": ("a ARRAY<STRING>, sep STRING", "STRING", "array_join(a, sep)"),
    "splitByChar": ("sep STRING, s STRING", "ARRAY<STRING>", r"split(s, concat('\\Q', sep, '\\E'))"),
    "trimBoth": ("s STRING", "STRING", "trim(s)"),
    # --- bit / time scalars ----------------------------------------------
    "bitCount": ("x BIGINT", "INT", "bit_count(x)"),
    # ClickHouse toDayOfWeek: Monday=1..Sunday=7; Spark dayofweek: Sunday=1
    "toDayOfWeek": ("d DATE", "INT", "((dayofweek(d) + 5) % 7) + 1"),
    "toUnixTimestamp": ("t TIMESTAMP", "BIGINT", "unix_seconds(t)"),
    # --- casts ------------------------------------------------------------
    "toInt32": ("x STRING", "INT", "CAST(x AS INT)"),
    "toInt64": ("x STRING", "BIGINT", "CAST(x AS BIGINT)"),
    "toFloat32": ("x STRING", "FLOAT", "CAST(x AS FLOAT)"),
    "toFloat64": ("x STRING", "DOUBLE", "CAST(x AS DOUBLE)"),
    # --- JSON (F5; reference process.py:76 exif) --------------------------
    "JSONExtractString": ("j STRING, k STRING", "STRING", "get_json_object(j, concat('$.', k))"),
    "JSONExtractInt": ("j STRING, k STRING", "BIGINT", "CAST(get_json_object(j, concat('$.', k)) AS BIGINT)"),
    "JSONExtractFloat": ("j STRING, k STRING", "DOUBLE", "CAST(get_json_object(j, concat('$.', k)) AS DOUBLE)"),
    "JSONHas": ("j STRING, k STRING", "BOOLEAN", "get_json_object(j, concat('$.', k)) IS NOT NULL"),
    # --- URL functions (ClickHouse URL family; all JVM parse_url) ---------
    "protocol": ("u STRING", "STRING", "parse_url(u, 'PROTOCOL')"),
    "domain": ("u STRING", "STRING", "parse_url(u, 'HOST')"),
    "domainWithoutWWW": (
        "u STRING",
        "STRING",
        "regexp_replace(parse_url(u, 'HOST'), '^www\\\\.', '')",
    ),
    "topLevelDomain": (
        "u STRING",
        "STRING",
        "regexp_extract(parse_url(u, 'HOST'), '\\\\.([a-zA-Z0-9-]+)$', 1)",
    ),
    "path": ("u STRING", "STRING", "parse_url(u, 'PATH')"),
    "queryString": ("u STRING", "STRING", "parse_url(u, 'QUERY')"),
    "extractURLParameter": (
        "u STRING, p STRING",
        "STRING",
        "parse_url(u, 'QUERY', p)",
    ),
    "cutQueryString": ("u STRING", "STRING", "regexp_replace(u, '\\\\?.*$', '')"),
    # --- date sugar -------------------------------------------------------
    "toQuarter": ("t TIMESTAMP", "INT", "quarter(t)"),
    "toYYYYMM": ("t TIMESTAMP", "INT", "year(t) * 100 + month(t)"),
    # --- IP functions -----------------------------------------------------
    "IPv4NumToString": (
        "n BIGINT",
        "STRING",
        "concat(CAST(n div 16777216 % 256 AS STRING), '.', "
        "CAST(n div 65536 % 256 AS STRING), '.', "
        "CAST(n div 256 % 256 AS STRING), '.', CAST(n % 256 AS STRING))",
    ),
    "IPv4StringToNum": (
        "s STRING",
        "BIGINT",
        "CAST(split(s, '\\\\.')[0] AS BIGINT) * 16777216 + "
        "CAST(split(s, '\\\\.')[1] AS BIGINT) * 65536 + "
        "CAST(split(s, '\\\\.')[2] AS BIGINT) * 256 + CAST(split(s, '\\\\.')[3] AS BIGINT)",
    ),
    # --- display helpers (clickhouse-client conveniences) -----------------
    "bar": (
        "x DOUBLE, lo DOUBLE, hi DOUBLE, w DOUBLE",
        "STRING",
        "repeat('#', CAST(greatest(least(round((x - lo) / (hi - lo) * w), w), 0) AS INT))",
    ),
    "formatReadableSize": (
        "x DOUBLE",
        "STRING",
        "CASE WHEN x >= 1073741824 THEN concat(CAST(round(x / 1073741824, 2) AS STRING), ' GiB') "
        "WHEN x >= 1048576 THEN concat(CAST(round(x / 1048576, 2) AS STRING), ' MiB') "
        "WHEN x >= 1024 THEN concat(CAST(round(x / 1024, 2) AS STRING), ' KiB') "
        "ELSE concat(CAST(round(x, 2) AS STRING), ' B') END",
    ),
    # --- array membership (ClickHouse array family; "has" itself is
    # registered once, up with the array accessors) ------------------------
    "hasAny": (
        "a ARRAY<STRING>, b ARRAY<STRING>",
        "BOOLEAN",
        "arrays_overlap(a, b)",
    ),
    "hasAll": (
        "a ARRAY<STRING>, b ARRAY<STRING>",
        "BOOLEAN",
        "size(array_except(b, a)) = 0",
    ),
    "multiSearchAny": (
        "s STRING, pats ARRAY<STRING>",
        "BOOLEAN",
        "exists(pats, p -> contains(s, p))",
    ),
    # --- geo scalars (ClickHouse geo family; haversine, mean Earth radius
    #     6371 km — ClickHouse's greatCircleDistance sphere model) --------
    "greatCircleDistance": (
        "lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE",
        "DOUBLE",
        "2.0 * 6371000.0 * asin(sqrt("
        "power(sin(radians(lat2 - lat1) / 2), 2) "
        "+ cos(radians(lat1)) * cos(radians(lat2)) "
        "* power(sin(radians(lon2 - lon1) / 2), 2)))",
    ),
    "greatCircleAngle": (
        "lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE",
        "DOUBLE",
        "degrees(2.0 * asin(sqrt("
        "power(sin(radians(lat2 - lat1) / 2), 2) "
        "+ cos(radians(lat1)) * cos(radians(lat2)) "
        "* power(sin(radians(lon2 - lon1) / 2), 2))))",
    ),
}


def register_clickhouse_sql(spark) -> list[str]:
    """Register the ClickHouse-name SQL functions on ``spark``;
    returns the registered names. Idempotent (CREATE OR REPLACE)."""
    for name, (args, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS {ret} RETURN {body}"
        )
    return list(_FUNCTIONS)
