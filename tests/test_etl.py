"""ETL golden test (FIXTURES.md §2): running the engine's ETL over the
reference-layout shards must reproduce laion_mini exactly, except
shard-1 text_embedding = zeros (the deliberately missing matrix)."""

import pytest
from pyspark.sql import functions as F

from laion_spark.schema import LAION_SCHEMA, validate_embeddings
from laion_spark.sources.npy import discover_shards, etl_shards, shard_report
from tests.fixtures_gen import ensure_fixtures


@pytest.fixture(scope="module")
def fixtures():
    return ensure_fixtures()


def test_discover(fixtures):
    shards = discover_shards(f"{fixtures}/etl_input")
    assert [s.shard_id for s in shards] == [0, 1]
    assert shards[0].text_emb_path is not None
    assert shards[1].text_emb_path is None  # missing -> zero-fill


def test_etl_golden_assembly(spark, fixtures):
    got = etl_shards(spark, f"{fixtures}/etl_input", dim=8)
    assert got.schema == LAION_SCHEMA
    got_rows = {r.key: r for r in got.collect()}
    want_rows = {r.key: r for r in spark.read.parquet(f"{fixtures}/laion_mini.parquet").collect()}
    assert len(got_rows) == len(want_rows) == 1000
    n_quote_cleaned = 0
    for key, want in want_rows.items():
        g = got_rows[key]
        assert g.url == want.url
        # caption curly quotes cleaned (P5): fixture rows i%50==0 carry one
        if "’" in want.caption:
            n_quote_cleaned += 1
            assert "’" not in g.caption
            assert g.caption == want.caption.replace("’", " ")
        else:
            assert g.caption == want.caption
        assert g.similarity == want.similarity
        assert (g.width, g.height, g.status, g.nsfw) == (want.width, want.height, want.status, want.nsfw)
        assert g.exif == want.exif  # P6 json -> map
        assert g.image_embedding == pytest.approx(want.image_embedding)
        if int(key) < 500:
            assert g.text_embedding == pytest.approx(want.text_embedding)
        else:
            assert g.text_embedding == [0.0] * 8  # S4 zero-fill
    assert n_quote_cleaned == 20


def test_shard_report_ledger(spark, fixtures, tmp_path):
    rep = {r.shard_id: r for r in shard_report(spark, f"{fixtures}/etl_input", dim=8).collect()}
    assert rep[0].success and rep[0].rows == 500
    assert rep[1].success and rep[1].rows == 500

    # corrupt shard -> error row, not job failure (X3)
    import shutil

    bad = tmp_path / "etl_bad"
    shutil.copytree(f"{fixtures}/etl_input", bad)
    (bad / "metadata" / "metadata_1.parquet").write_bytes(b"not a parquet file")
    rep2 = {r.shard_id: r for r in shard_report(spark, str(bad), dim=8).collect()}
    assert rep2[0].success
    assert not rep2[1].success and rep2[1].error


def test_validate_embeddings(spark, fixtures):
    df = spark.read.parquet(f"{fixtures}/laion_mini.parquet")
    ok = validate_embeddings(df, dim=8)
    assert ok.count() == 1000  # all rows pass the dim check
    bad = spark.createDataFrame([("k", [1.0, 2.0])], "key string, text_embedding array<float>")
    with pytest.raises(Exception, match="bad text_embedding dim"):
        validate_embeddings(bad, cols=("text_embedding",), dim=8).collect()


def test_roundtrip_write_read(spark, fixtures, tmp_path):
    from laion_spark.sources.npy import write_fact_table

    df = etl_shards(spark, f"{fixtures}/etl_input", dim=8)
    out = str(tmp_path / "fact.parquet")
    write_fact_table(df, out)
    back = spark.read.parquet(out)
    assert back.schema == LAION_SCHEMA
    assert back.count() == 1000


def test_etl_direct_sink_matches_generic_sink(spark, fixtures, tmp_path):
    """etl_shards_to_parquet (writer inside the task, process.py parity)
    must produce byte-equivalent CONTENT to the generic JVM sink: same
    rows, same values, one file per shard."""
    from laion_spark.sources.npy import etl_shards, etl_shards_to_parquet

    out = str(tmp_path / "direct")
    res = etl_shards_to_parquet(spark, f"{fixtures}/etl_input", out, dim=8).collect()
    assert len(res) == len({r.path for r in res})  # one file per shard
    direct = spark.read.parquet(out)
    generic = etl_shards(spark, f"{fixtures}/etl_input", dim=8)
    assert direct.count() == sum(r.rows for r in res) == generic.count()
    cols = [c for c in generic.columns if c != "exif"]  # map compares poorly in sets
    a = {tuple(str(v) for v in r) for r in direct.select(cols).collect()}
    b = {tuple(str(v) for v in r) for r in generic.select(cols).collect()}
    assert a == b
    # exif maps compare row-aligned by key
    ea = {r.key: sorted((r.exif or {}).items()) for r in direct.select("key", "exif").collect()}
    eb = {r.key: sorted((r.exif or {}).items()) for r in generic.select("key", "exif").collect()}
    assert ea == eb
