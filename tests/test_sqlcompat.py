"""ClickHouse-name SQL function layer: a reference user's SQL runs
verbatim on the engine, inlined to JVM expressions (no Python node)."""

import math

import pytest

from laion_spark.functions.sqlcompat import register_clickhouse_sql


@pytest.fixture(scope="module", autouse=True)
def compat(spark):
    register_clickhouse_sql(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_vector_distances(spark):
    assert one(spark, "L2Distance(array(1.0d,2.0d), array(4.0d,6.0d))") == 5.0
    assert one(spark, "L2SquaredDistance(array(0.0d,0.0d), array(3.0d,4.0d))") == 25.0
    assert one(spark, "L1Distance(array(1.0d,2.0d), array(4.0d,6.0d))") == 7.0
    assert one(spark, "LinfDistance(array(1.0d,2.0d), array(4.0d,6.0d))") == 4.0
    assert one(spark, "dotProduct(array(1.0d,2.0d), array(3.0d,4.0d))") == 11.0
    assert one(spark, "L2Norm(array(3.0d,4.0d))") == 5.0
    assert one(spark, "cosineDistance(array(1.0d,0.0d), array(1.0d,0.0d))") == pytest.approx(0.0)
    assert one(spark, "cosineDistance(array(1.0d,0.0d), array(0.0d,1.0d))") == pytest.approx(1.0)


def test_reference_canonical_query_shape(spark, sf_dir):
    """The reference's generated SQL (search.py:20-26) runs as-is, with
    the float embedding column implicitly cast to the DOUBLE params."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView("laion")
    q = ", ".join(str(round(((j * 37) % 19 - 9) / 10.0, 1)) for j in range(64))
    rows = spark.sql(
        f"SELECT vec_id, L2Distance(embedding, array({q})) AS score "
        "FROM laion ORDER BY score ASC, vec_id LIMIT 5"
    ).collect()
    assert len(rows) == 5
    scores = [r.score for r in rows]
    assert scores == sorted(scores)
    # matches the engine's knn operator
    from laion_spark.operators.knn import knn_search

    QVEC = [round(((j * 37) % 19 - 9) / 10.0, 1) for j in range(64)]
    want = knn_search(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), QVEC, k=5,
        vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"],
    ).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in rows] == [(r.vec_id, round(r.score, 6)) for r in want]


def test_sql_udfs_stay_jvm_side(spark):
    plan = (
        spark.sql("SELECT L2Distance(array(1.0d), array(2.0d)) AS v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_dates_and_arithmetic(spark):
    assert one(spark, "toYear(TIMESTAMP '2024-03-05 10:11:12')") == 2024
    assert one(spark, "toMonth(TIMESTAMP '2024-03-05 10:11:12')") == 3
    assert one(spark, "toDayOfMonth(TIMESTAMP '2024-03-05 10:11:12')") == 5
    assert str(one(spark, "toStartOfMonth(TIMESTAMP '2024-03-05 10:11:12')")) == "2024-03-01"
    assert one(spark, "intDiv(7, 2)") == 3
    assert one(spark, "intDiv(-7, 2)") == -4  # floor, not truncate
    assert one(spark, "modulo(7, 3)") == 1
    assert one(spark, "divide(7.0, 2.0)") == 3.5


def test_strings_and_json(spark):
    assert one(spark, "replaceAll('a-b-c', '-', '+')") == "a+b+c"
    assert one(spark, "replaceRegexpAll('a1b22c', '[0-9]+', '#')") == "a#b#c"
    assert one(spark, "empty('')") is True
    assert one(spark, "notEmpty('x')") is True
    assert one(spark, """JSONExtractString('{"Model":"iPhone"}', 'Model')""") == "iPhone"
    assert one(spark, """JSONExtractInt('{"w": 512}', 'w')""") == 512
    assert one(spark, """JSONExtractFloat('{"f": 2.5}', 'f')""") == 2.5
    assert one(spark, """JSONHas('{"a":1}', 'b')""") is False


def test_string_helpers_and_casts(spark):
    assert one(spark, "lowerUTF8('AbC')") == "abc"
    assert one(spark, "substringUTF8('hello', 2, 3)") == "ell"
    assert one(spark, "arrayStringConcat(array('a','b','c'), '-')") == "a-b-c"
    assert one(spark, "splitByChar('.', 'a.b.c')") == ["a", "b", "c"]
    assert one(spark, "splitByChar('|', 'a|b')") == ["a", "b"]  # regex metachar escaped
    assert one(spark, "toInt64('42')") == 42
    assert one(spark, "toFloat64('2.5')") == 2.5


def test_math_consistency_with_python(spark):
    got = one(spark, "L2Norm(array(1.0d, 2.0d, 3.0d))")
    assert got == pytest.approx(math.sqrt(14.0))


def test_bit_and_time_scalars(spark):
    assert one(spark, "bitCount(7)") == 3
    assert one(spark, "trimBoth('  x  ')") == "x"
    # 2024-01-01 is a Monday: ClickHouse numbering says 1
    assert one(spark, "toDayOfWeek(DATE '2024-01-01')") == 1
    assert one(spark, "toDayOfWeek(DATE '2024-01-07')") == 7  # Sunday
    assert one(spark, "toUnixTimestamp(TIMESTAMP '1970-01-01 00:01:00')") == 60


def test_url_functions(spark):
    u = "'https://www.sub.example.com/a/b?lang=en&x=1'"
    assert one(spark, f"protocol({u})") == "https"
    assert one(spark, f"domain({u})") == "www.sub.example.com"
    assert one(spark, f"domainWithoutWWW({u})") == "sub.example.com"
    assert one(spark, f"topLevelDomain({u})") == "com"
    assert one(spark, f"path({u})") == "/a/b"
    assert one(spark, f"queryString({u})") == "lang=en&x=1"
    assert one(spark, f"extractURLParameter({u}, 'lang')") == "en"
    assert one(spark, f"cutQueryString({u})") == "https://www.sub.example.com/a/b"


def test_date_sugar_and_display(spark):
    assert one(spark, "toQuarter(TIMESTAMP '2024-05-01 00:00:00')") == 2
    assert one(spark, "toYYYYMM(TIMESTAMP '2024-05-01 00:00:00')") == 202405
    assert one(spark, "bar(5.0d, 0.0d, 10.0d, 10.0d)") == "#####"
    assert one(spark, "bar(-1.0d, 0.0d, 10.0d, 10.0d)") == ""
    assert one(spark, "formatReadableSize(1536.0d)") == "1.5 KiB"
    assert one(spark, "formatReadableSize(3.0d)") == "3.0 B"
    assert one(spark, "formatReadableSize(2147483648.0d)") == "2.0 GiB"


def test_url_functions_stay_jvm_side(spark):
    """The compat layer must inline to Catalyst expressions — no Python
    evaluation node may appear in the plan."""
    df = spark.sql(
        "SELECT domain(u) AS d FROM (SELECT 'https://example.com/x' AS u)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ipv4_roundtrip(spark):
    assert one(spark, "IPv4NumToString(3232235777)") == "192.168.1.1"
    assert one(spark, "IPv4StringToNum('192.168.1.1')") == 3232235777
    assert one(spark, "IPv4NumToString(IPv4StringToNum('10.0.255.7'))") == "10.0.255.7"
    assert one(spark, "IPv4NumToString(0)") == "0.0.0.0"


def test_great_circle_distance(spark):
    # Paris (2.3522E, 48.8566N) -> London (-0.1276E, 51.5072N): ~343.5 km
    # on the 6371 km sphere; equator quarter-turn is exactly pi/2 * R.
    d = one(
        spark,
        "greatCircleDistance(2.3522d, 48.8566d, -0.1276d, 51.5072d)",
    )
    assert abs(d - 343_500) < 1_500
    q = one(spark, "greatCircleDistance(0.0d, 0.0d, 90.0d, 0.0d)")
    assert abs(q - 6371000.0 * 3.141592653589793 / 2) < 1e-3
    a = one(spark, "greatCircleAngle(0.0d, 0.0d, 90.0d, 0.0d)")
    assert abs(a - 90.0) < 1e-9
    assert one(spark, "greatCircleDistance(13.0d, 52.0d, 13.0d, 52.0d)") == 0.0


def test_array_membership_family(spark):
    assert one(spark, "has(array('a','b'), 'b')") is True
    assert one(spark, "has(array('a','b'), 'z')") is False
    assert one(spark, "hasAny(array('a','b'), array('z','b'))") is True
    assert one(spark, "hasAny(array('a','b'), array('z'))") is False
    assert one(spark, "hasAll(array('a','b','c'), array('a','c'))") is True
    assert one(spark, "hasAll(array('a','b'), array('a','z'))") is False
    assert one(spark, "multiSearchAny('hello world', array('xyz', 'wor'))") is True
    assert one(spark, "multiSearchAny('hello world', array('xyz'))") is False
