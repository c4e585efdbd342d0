"""CLI end-to-end smoke (VERDICT r1 missing #1): the reference's
search / concept_math / generate command surface driving the engine
on the sf fixture, in-process (get_session reuses the test session)."""

import ast

from laion_spark.cli import main
from tests.conftest import SF_DIR


def run(capsys, *argv):
    assert main(list(argv)) == 0
    return capsys.readouterr().out.strip().splitlines()


def test_cli_search_text(spark, capsys, tmp_path):
    html = str(tmp_path / "results.html")
    out = run(
        capsys,
        "search", "--text", "a sleepy ridgeback dog",
        "--table", "embeddings", "--data-dir", SF_DIR,
        "--limit", "3", "--select", "vec_id", "--html", html,
    )
    header, rows = out[0], out[1:4]
    assert header.split()[0] == "vec_id"
    assert len(rows) == 3
    stats = out[4]
    assert "query_time" in stats and "generation_time" in stats
    assert "wrote" in out[-1]
    content = open(html).read()
    assert "query_time" in content and "score" in content


def test_cli_scan_and_codegen_impls_agree(spark, capsys):
    """--impl auto routes unfiltered text search to the scan scorer;
    results must equal the codegen path."""
    args = [
        "search", "--text", "same query", "--table", "embeddings",
        "--data-dir", SF_DIR, "--limit", "4", "--select", "vec_id",
    ]
    scan_out = run(capsys, *args, "--impl", "scan")
    code_out = run(capsys, *args, "--impl", "codegen")
    assert scan_out[1:5] == code_out[1:5]


def test_cli_scan_with_filter_is_rejected(spark, capsys):
    """--impl scan silently ignoring --filter would return wrong rows;
    it must exit with a clear error instead."""
    import pytest

    with pytest.raises(SystemExit, match="filter"):
        main([
            "search", "--text", "x", "--table", "embeddings", "--data-dir", SF_DIR,
            "--filter", "label = 3", "--impl", "scan",
        ])


def test_cli_search_with_filter(spark, capsys):
    out = run(
        capsys,
        "search", "--text", "x", "--table", "embeddings", "--data-dir", SF_DIR,
        "--limit", "5", "--filter", "label = 3", "--select", "vec_id,label",
    )
    for line in out[1:6]:
        assert line.split()[1] == "3"


def test_cli_concept_math(spark, capsys):
    out = run(
        capsys,
        "concept_math", "--text", "('berlin' - 'germany') + 'bridge'",
        "--table", "embeddings", "--data-dir", SF_DIR, "--limit", "2", "--select", "vec_id",
    )
    assert len(out) == 4  # header + 2 rows + stats


def test_cli_sql_with_clickhouse_functions(spark, capsys):
    """The sql subcommand registers data-dir tables and the ClickHouse
    function names — a reference user's SQL runs verbatim."""
    out = run(
        capsys,
        "sql",
        "SELECT vec_id, round(L2Distance(embedding, transform(embedding, x -> CAST(0.0 AS DOUBLE))), 4) AS nrm "
        "FROM embeddings ORDER BY vec_id LIMIT 3",
        "--data-dir", SF_DIR,
    )
    assert out[0].split() == ["vec_id", "nrm"]
    assert len(out) == 4


def test_cli_sql_json_mode(spark, capsys):
    import json

    out = run(
        capsys,
        "sql", "SELECT count(*) AS n FROM orders", "--data-dir", SF_DIR, "--json",
    )
    assert json.loads(out[0])["n"] > 0


def test_cli_generate_text(capsys):
    out = run(capsys, "generate", "--text", "hello world", "--dim", "8")
    vec = ast.literal_eval(out[0])
    assert len(vec) == 8 and all(isinstance(x, float) for x in vec)


def test_cli_generate_file(spark, capsys, tmp_path):
    src = tmp_path / "concepts.txt"
    src.write_text("picasso\nmonet\nkahlo\n")
    dst = str(tmp_path / "out")
    out = run(capsys, "generate", "--file", str(src), "--output", dst, "--dim", "4")
    assert out[-1].startswith("3 embeddings generated")
    import glob

    lines = []
    for f in glob.glob(f"{dst}/part-*"):
        lines += [ln for ln in open(f).read().splitlines() if ln]
    assert len(lines) == 3
    assert all(len(ast.literal_eval(ln)) == 4 for ln in lines)


def test_cli_resolves_catalog_table(spark, sf_dir, tmp_path, capsys):
    """S6 round-trip through the CLI: a save_as_table-registered name
    is queried by NAME (reference --table semantics), not a path."""
    from laion_spark.cli import _resolve_source
    from laion_spark.sources.npy import save_as_table

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    save_as_table(emb, "cli_s6_emb", path=str(tmp_path / "cli_s6_emb"))
    df, path = _resolve_source(spark, "cli_s6_emb", str(tmp_path))
    assert path is None  # catalog lane
    assert df.count() == emb.count()
    # bare name not in catalog still resolves under data_dir
    df2, path2 = _resolve_source(spark, "embeddings", sf_dir)
    assert path2 == f"{sf_dir}/embeddings.parquet"
    assert df2.count() == emb.count()
