import math

import pytest

from laion_spark.functions.encoder import HashEncoder, hash_embed
from laion_spark.plans.concept import (
    ConceptParseError,
    compile_concept,
    eval_concept,
    parse_concept,
)

ENC = HashEncoder(8)


def test_hash_embed_spec():
    # FIXTURES.md §3: sha256-derived, [-1, 1), 6 dp, deterministic
    v = hash_embed("dog")
    assert len(v) == 8
    assert v == hash_embed("dog")
    assert all(-1.0 <= x < 1.0 for x in v)
    assert all(round(x, 6) == x for x in v)
    assert hash_embed("dog") != hash_embed("cat")
    # dim extension keeps the base-8 prefix
    assert hash_embed("dog", 64)[:8] == v


def test_parse_precedence_left_assoc():
    # * binds tighter than +; left-assoc (reference search.py:125-143)
    ast = parse_concept("a + b * c")
    assert ast == ("binop", "+", ("leaf", "a"), ("binop", "*", ("leaf", "b"), ("leaf", "c")))
    ast = parse_concept("a - b + c")
    assert ast == ("binop", "+", ("binop", "-", ("leaf", "a"), ("leaf", "b")), ("leaf", "c"))


def test_parse_quoted_and_nesting():
    ast = parse_concept("(berlin - germany) + ('united kingdom' + bridge)")
    assert ast[1] == "+"
    assert ast[3] == ("binop", "+", ("leaf", "united kingdom"), ("leaf", "bridge"))


def test_eval_binary_and_scalar():
    dog, cat = ENC.encode("dog"), ENC.encode("cat")
    assert eval_concept("dog + cat", ENC) == pytest.approx([a + b for a, b in zip(dog, cat)])
    assert eval_concept("(dog + cat) / 2", ENC) == pytest.approx(
        [(a + b) / 2 for a, b in zip(dog, cat)]
    )
    # V4 fix: scalar on the LEFT works (reference raises)
    assert eval_concept("2 * dog", ENC) == pytest.approx([2 * a for a in dog])
    assert eval_concept("dog * 2", ENC) == pytest.approx([2 * a for a in dog])


def test_eval_published_examples():
    # the two published composite expressions (SURVEY.md §2.4)
    v1 = eval_concept("(Cubism + Surrealism) / 2", ENC)
    cu, su = ENC.encode("Cubism"), ENC.encode("Surrealism")
    assert v1 == pytest.approx([(a + b) / 2 for a, b in zip(cu, su)])
    v2 = eval_concept("(berlin - germany) + ('united kingdom' + bridge)", ENC)
    be, ge = ENC.encode("berlin"), ENC.encode("germany")
    uk, br = ENC.encode("united kingdom"), ENC.encode("bridge")
    assert v2 == pytest.approx([(a - b) + (c + d) for a, b, c, d in zip(be, ge, uk, br)])


def test_parse_errors_are_real_exceptions():
    for bad in ["dog %", "dog +", "(dog + cat", "", "  ", "+ dog"]:
        with pytest.raises(ConceptParseError):
            eval_concept(bad, ENC)
    with pytest.raises(ConceptParseError):
        eval_concept("2 * 3", ENC)  # scalar-only result rejected


def test_compile_literal_folds(spark):
    col = compile_concept("(dog + cat) / 2", ENC)
    got = spark.range(1).select(col.alias("v")).collect()[0].v
    assert got == pytest.approx(eval_concept("(dog + cat) / 2", ENC))


def test_compile_with_column_leaf(spark):
    df = spark.createDataFrame([([1.0] * 8,)], "emb array<double>")
    col = compile_concept("emb * 2 + dog", ENC, columns={"emb": df.emb})
    got = df.select(col.alias("v")).collect()[0].v
    dog = ENC.encode("dog")
    assert got == pytest.approx([2.0 + d for d in dog])


def test_search_api(spark, sf_dir):
    from laion_spark.operators.search import search_concept, search_text

    enc = HashEncoder(64)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    r = search_text(
        emb, "a sleepy ridgeback dog", enc, k=5, vector_col="embedding",
        select=["vec_id"], tiebreak=["vec_id"],
    )
    assert len(r.rows) == 5 and r.query_time >= 0 and r.generation_time >= 0
    scores = [row.score for row in r.rows]
    assert scores == sorted(scores)
    r2 = search_concept(
        emb, "('sleepy dog' - cat) + 1", enc, k=3, vector_col="embedding",
        select=["vec_id"], tiebreak=["vec_id"],
    )
    assert len(r2.rows) == 3
    assert r2.to_dicts()[0]["score"] == round(r2.rows[0].score, 3)


def test_html_sink_and_stats(spark, sf_dir):
    """S8: rows + the reference's stat fields land in the rendered
    HTML (results.html:176-188)."""
    from laion_spark.functions.encoder import HashEncoder
    from laion_spark.operators.search import render_results_html, search_text

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed("vec_id", "url")
    res = search_text(emb, "a sleepy ridgeback dog", HashEncoder(64), k=3,
                      vector_col="embedding", select=["url"], tiebreak=["url"])
    html = render_results_html(res, table="embeddings", query="a sleepy ridgeback dog")
    assert "query_time" in html and "generation_time" in html
    assert html.count('class="cell"') == 3


def test_embed_lines_golden_pair(spark, tmp_path):
    """§3.4: the concepts.txt -> output.txt contract with the
    deterministic encoder — one list literal per input line, values
    equal to the driver-side encoder output."""
    from laion_spark.functions.encoder import HashEncoder
    from laion_spark.operators.search import embed_lines

    inp = tmp_path / "concepts_mini.txt"
    lines = ["a red bridge", "berlin at night", "cubism"]
    inp.write_text("\n".join(lines))
    out_dir = str(tmp_path / "out")
    n = embed_lines(spark, str(inp), out_dir, kind="hash", dim=8)
    assert n == 3
    import glob

    outfile = glob.glob(out_dir + "/part-*")[0]
    got = sorted(open(outfile).read().strip().splitlines())
    enc = HashEncoder(8)
    want = sorted("[" + ", ".join(str(float(x)) for x in enc.encode(s)) + "]" for s in lines)
    assert got == want
