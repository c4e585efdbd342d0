"""Deduplication operators (north star Q24/Q25 — LLM-data-pipeline).

Five strategies, all shuffle-conscious:

  - ``exact_dedup``      — deterministic survivor per key. Default
                           shape projects (keys, order) FIRST: the
                           survivor pick is a map-side-combined
                           aggregate over narrow rows and only the
                           join-back moves payloads — the scale-safe
                           plan at 100 TB (wide rows never enter a
                           window sort).
  - ``fingerprint``      — md5/xxhash fingerprint column for exact
                           content dedup at the cost of one scan.
  - ``jaccard_similar_pairs`` — exact token/n-gram Jaccard self-join:
                           explode shingles -> equi-join on shingle ->
                           count intersections. This is the *verify*
                           stage used after LSH candidate generation.
  - ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash + banded
                           LSH: candidate pairs meet in band buckets
                           (equi-join on (band, hash)), so the self-join
                           never goes quadratic; candidates are then
                           verified with exact Jaccard.
  - ``simhash`` — 64-bit SimHash fingerprint; near-dups differ in few
                           bits (hamming-distance filter on candidates
                           from identical high-order bands).

Scale notes: the quadratic step only ever runs on LSH bucket
collisions. Band hashing uses Spark's murmur3 ``hash`` (JVM-side,
codegen). Shingling/minhashing is pure HOF expressions — no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Mersenne prime 2^31-1 for minhash universal hashing: with x,a,b < 2^31
# every intermediate product stays under 2^62, inside int64 even with
# ANSI overflow checking on (Spark 4 default)
_MERSENNE = (1 << 31) - 1


def exact_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    count_col: str | None = None,
    project_first: bool = True,
) -> DataFrame:
    """Keep exactly one row per key group — the first under
    ``order_by`` — deterministically (unlike ``dropDuplicates``, whose
    survivor depends on partitioning).

    ``project_first`` (the default) is the scale-safe shape: only
    ``keys + order_by`` enter the survivor-pick shuffle — as a hash
    AGGREGATE (``min(struct(order_by))``, map-side partial combine, so
    the exchange carries ~one narrow row per distinct key per task) —
    and full payload rows are then joined back on the surviving
    ``keys + order_by`` tuple. At 100 TB the wide rows never pass
    through a window SORT; the join-back is the only full-row exchange
    and AQE is free to broadcast the survivor side when the key space
    is small. Contract: ``order_by`` must be a total tiebreak within a
    key group (it already must be for the survivor to be well-defined)
    and the ordering columns non-null; under ties the join-back would
    return every tied first row where the window form picks one
    arbitrarily. ``project_first=False`` keeps the single-window form
    (useful when ``df`` is already narrow or the plan must stay a
    one-pass window). Key columns MAY be null: the join-back uses
    null-safe equality (``<=>``), so a null-key group keeps one
    survivor exactly like the window form (``<=>`` is still an
    equi-join key for Spark's hash joins).
    """
    keys, order_by = list(keys), list(order_by)
    if not project_first:
        w = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
        out = df.withColumn("_rn", F.row_number().over(w))
        if count_col:
            out = out.withColumn(count_col, F.count("*").over(W.partitionBy(*keys)))
        return out.filter(F.col("_rn") == 1).drop("_rn")

    order_only = [c for c in order_by if c not in keys]
    if not order_only:
        # the ordering adds nothing beyond the keys, so a join-back on
        # keys alone would return every row — survivor pick must stay
        # a window
        return exact_dedup(df, keys, order_by, count_col, project_first=False)
    aggs = [F.min(F.struct(*[F.col(c) for c in order_only])).alias("_surv")]
    if count_col:
        aggs.append(F.count("*").alias(count_col))
    surv = (
        df.select(*keys, *order_only)
        .groupBy(*keys)
        .agg(*aggs)
        .select(
            *keys,
            *[F.col(f"_surv.{c}").alias(c) for c in order_only],
            *([count_col] if count_col else []),
        )
    )
    # Null-safe join-back: plain `on=names` equality would silently
    # drop rows whose key is NULL (ADVICE r7). `<=>` keeps them and
    # remains a hash-join equi-key. Alias the survivor side so the
    # self-join lineage stays unambiguous.
    on = keys + order_only
    surv = surv.select(
        *[F.col(c).alias(f"_surv_{c}") for c in on],
        *([count_col] if count_col else []),
    )
    cond = None
    for c in on:
        clause = F.col(c).eqNullSafe(F.col(f"_surv_{c}"))
        cond = clause if cond is None else cond & clause
    if count_col:
        return df.join(surv, on=cond, how="inner").drop(*[f"_surv_{c}" for c in on])
    return df.join(surv, on=cond, how="left_semi")


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fp", algo: str = "md5") -> DataFrame:
    """Content fingerprint column (md5 is engine-portable; xxhash64 is
    the cheaper Spark-native choice for internal dedup)."""
    c = F.col(text_col).cast("binary")
    if algo == "md5":
        return df.withColumn(out_col, F.md5(c))
    if algo == "sha256":
        return df.withColumn(out_col, F.sha2(c, 256))
    if algo == "xxhash64":
        return df.withColumn(out_col, F.xxhash64(F.col(text_col)))
    raise ValueError(f"unknown fingerprint algo {algo!r}")


def tokens(text_col: str | Column, lowercase: bool = True) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def shingles(text_col: str | Column, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct word n-gram set as an array column (pure HOFs).

    The token array is bound ONCE as a lambda variable via a
    single-element outer ``transform``: referencing the ``split(...)``
    expression directly inside the index-mapping lambda would inline it
    into the lambda body, where the HOF re-evaluates it once PER SHINGLE
    INDEX (~n_tokens splits per row — measured 13.5 s of the 1M-doc
    dedup run, >10x the actual shingling work; the same
    recompute-inside-HOF class as the r1 ``_mh_base`` fix)."""
    from laion_spark.functions.text import _bind_tokens

    if n == 1:
        return F.array_distinct(tokens(text_col, lowercase))

    def from_tokens(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        # concat_ws over element_at, NOT array_join(slice(..)): slice
        # allocates an intermediate array PER SHINGLE, 6x slower in the
        # interpreted HOF evaluator (measured 7.6 s -> 1.2 s at 1M
        # docs); identical strings (both skip NULLs, none occur after
        # split). i + n - 1 <= size(t) by construction, so element_at
        # never faults under ANSI.
        grams = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]))
        )
        # shorter-than-n documents have no shingles (sequence(1, m<1)
        # would count DOWN)
        return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))

    return _bind_tokens(text_col, from_tokens, lowercase)


def hashed_shingles(
    text_col: str | Column,
    n: int = 3,
    lowercase: bool = True,
    distinct: bool = True,
    post=None,
) -> Column:
    """int64-hashed word n-gram set WITHOUT materializing shingle
    strings (r15, guide §4.2 "do less per element"): hash every token
    once, then hash the n consecutive token-hashes per shingle —
    ``xxhash64(h_i, .., h_{i+n-1})`` instead of
    ``xxhash64(concat_ws(" ", w_i, .., w_{i+n-1}))``. The concat_ws
    allocated a fresh UTF8String per shingle per row inside the
    interpreted HOF evaluator; hashing n longs allocates nothing.

    Set semantics are preserved: tokens contain no whitespace (they
    come from ``split(text, r"\\s+")``), so two shingle strings are
    equal iff their token n-tuples are equal iff their hash n-tuples
    are equal (up to the same ~2^-64 xxhash64 collision risk the
    MinHash verify stage already declares). For ``n == 1`` the value
    is ``xxhash64(token)`` — bit-identical to hashing the string
    shingle, so unigram consumers (the d04 catalog entry) see exactly
    the values they always saw.

    ``distinct=False`` skips the dedupe pass for consumers that are
    duplicate-insensitive (MinHash takes a min over the multiset).
    ``post`` (Column -> Column) is applied to each hash INSIDE the
    per-shingle lambda — one fused pass instead of a separate
    per-element transform downstream (MinHash's pmod lives here);
    combine with ``distinct=True`` only when ``post`` is injective.
    """
    from laion_spark.functions.text import _bind_tokens

    post = post or (lambda h: h)
    if n == 1:
        tok = tokens(text_col, lowercase)
        if distinct:
            tok = F.array_distinct(tok)
        return F.transform(tok, lambda w: post(F.xxhash64(w)))

    def from_tokens(t: Column) -> Column:
        # bind the token-hash array ONCE (the same recompute-inside-HOF
        # trap _bind_tokens exists for, one level down)
        th_expr = F.transform(t, lambda w: F.xxhash64(w))

        def from_th(th: Column) -> Column:
            idx = F.sequence(F.lit(1), F.size(th) - (n - 1))
            grams = F.transform(
                idx, lambda i: post(F.xxhash64(*[F.element_at(th, i + j) for j in range(n)]))
            )
            if distinct:
                grams = F.array_distinct(grams)
            return F.when(F.size(th) >= n, grams).otherwise(F.array().cast("array<bigint>"))

        return F.element_at(F.transform(F.array(th_expr), from_th), 1)

    return _bind_tokens(text_col, from_tokens, lowercase)


def jaccard_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 1,
    threshold: float | None = None,
    top: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over shingle sets, as a relational plan:

        explode(shingles) -> self equi-join on shingle (id_a < id_b)
        -> count intersection -> |A∪B| = |A|+|B|-|A∩B|

    The equi-join on the shingle keeps this far from an all-pairs cross
    join: only documents sharing at least one shingle ever meet.
    Output: (da, db, jaccard) ordered by jaccard desc.

    ``max_df`` is the corpus-scale guard (VERDICT r1 #4): a shingle
    present in more than ``max_df`` documents (a stopword at ngram=1)
    makes the self-join near-quadratic in that shingle's document
    frequency. When set, such shingles are dropped from the VOCABULARY
    — both intersections and set sizes — so the result is exact Jaccard
    over the capped vocabulary (the standard stopword-removal
    semantics), and join fan-out is bounded by max_df² per shingle.
    Default None keeps the fully exact semantics for bounded verify
    use (the d03 oracle path).
    """
    sh = df.select(F.col(id_col).alias("_id"), F.explode(shingles(text_col, ngram)).alias("_sh"))
    if max_df is not None:
        # shingles are distinct per document, so count(*) = document freq
        keep = sh.groupBy("_sh").agg(F.count("*").alias("_df")).filter(F.col("_df") <= max_df)
        sh = sh.join(keep.select("_sh"), "_sh")
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    a = sh.select(F.col("_id").alias("da"), "_sh")
    b = sh.select(F.col("_id").alias("db"), "_sh")
    inter = (
        a.join(b, ["_sh"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("_i"))
    )
    sa = sizes.select(F.col("_id").alias("da"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("db"), F.col("_n").alias("_nb"))
    jac = F.col("_i").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_i"))
    out = inter.join(sa, "da").join(sb, "db").select("da", "db", jac.alias("_jac"))
    if threshold is not None:
        out = out.filter(F.col("_jac") >= threshold)
    out = out.orderBy(F.col("_jac").desc(), "da", "db")
    if top is not None:
        out = out.limit(top)
    return out.select("da", "db", F.round("_jac", 6).alias("jaccard"))


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 1,
    threshold: float | None = None,
    top: int | None = None,
    max_df: int | None = None,
    hash_shingles: bool = False,
    expand_buckets: bool = False,
) -> DataFrame:
    """Asymmetric shingle containment C(a→b) = |A∩B| / |A| — the
    sub-document duplication detector Jaccard misses: a short doc fully
    copied into a much longer one has low Jaccard (the union is huge)
    but containment ≈ 1 from the short side. Standard companion to
    Jaccard in web-corpus dedup (Broder's resemblance/containment
    pair, syntactic-clustering line of work).

    Same relational skeleton as :func:`jaccard_similar_pairs` (explode →
    shingle equi-join → intersection counts), but ORDERED pairs: ``da``
    is the contained (smaller-side) document, and both directions of
    each colliding pair are scored. ``max_df`` caps join fan-out as in
    the Jaccard path. Output (da, db, containment) — the ratio of
    small integer counts is exactly representable or far from decimal
    ties, so the 6 dp rounding is engine-identical.

    ``hash_shingles=True`` replaces each shingle string with its
    xxhash64 BEFORE the self-join — the corpus-scale form (the same
    int64-set trick as the MinHash verify stage): the shuffle moves
    8-byte longs instead of n-gram strings, at a vanishing 64-bit
    collision risk. Keep it False for oracle-exact string semantics
    (the d12 path).

    ``expand_buckets=True`` swaps the shingle self-join for the
    group-and-expand shape :func:`shared_window_pairs` uses: ONE
    groupBy collects each shingle's (capped) id set, ordered pairs
    stream out of the buckets via ``_expand_bucket_pairs``, and both
    orientations are derived from the one undirected intersection
    count — the exploded shingle stream is shuffled once instead of
    joined against itself (measured ~2x at 1M docs). Identical
    results (unit-pinned); requires ``max_df`` so no bucket is
    unbounded.
    """
    if hash_shingles and ngram >= 2:
        # r15: hash the token n-tuples directly — the shingle strings
        # the old path built (concat per shingle, inside the
        # interpreted HOF evaluator) existed only to be hashed on the
        # next line. Identical counts up to the same declared 64-bit
        # collision risk; see hashed_shingles. The n==1 / string path
        # below is byte-for-byte the d12 oracle semantics.
        sh = df.select(
            F.col(id_col).alias("_id"),
            F.explode(hashed_shingles(text_col, ngram)).alias("_sh"),
        )
    else:
        sh = df.select(F.col(id_col).alias("_id"), F.explode(shingles(text_col, ngram)).alias("_sh"))
        if hash_shingles:
            sh = sh.select("_id", F.xxhash64("_sh").alias("_sh"))
    if expand_buckets:
        if max_df is None:
            raise ValueError("expand_buckets requires max_df (bounds every bucket)")
        grouped = sh.groupBy("_sh").agg(F.sort_array(F.collect_set("_id")).alias("ids"))
        grouped = grouped.filter(F.size("ids") <= max_df)
        sizes = (
            grouped.select(F.explode("ids").alias("_id"))
            .groupBy("_id")
            .agg(F.count("*").alias("_n"))
        )
        und = _expand_bucket_pairs(grouped).groupBy("da", "db").agg(F.count("*").alias("_i"))
        inter = und.unionByName(
            und.select(F.col("db").alias("da"), F.col("da").alias("db"), "_i")
        )
        sa = sizes.select(F.col("_id").alias("da"), F.col("_n").alias("_na"))
        cont = F.col("_i").cast("double") / F.col("_na")
        out = inter.join(sa, "da").select("da", "db", cont.alias("_c"))
        if threshold is not None:
            out = out.filter(F.col("_c") >= threshold)
        out = out.orderBy(F.col("_c").desc(), "da", "db")
        if top is not None:
            out = out.limit(top)
        return out.select("da", "db", F.round("_c", 6).alias("containment"))
    if max_df is not None:
        keep = sh.groupBy("_sh").agg(F.count("*").alias("_df")).filter(F.col("_df") <= max_df)
        sh = sh.join(keep.select("_sh"), "_sh")
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    a = sh.select(F.col("_id").alias("da"), "_sh")
    b = sh.select(F.col("_id").alias("db"), "_sh")
    inter = (
        a.join(b, ["_sh"])
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("_i"))
    )
    sa = sizes.select(F.col("_id").alias("da"), F.col("_n").alias("_na"))
    cont = F.col("_i").cast("double") / F.col("_na")
    out = inter.join(sa, "da").select("da", "db", cont.alias("_c"))
    if threshold is not None:
        out = out.filter(F.col("_c") >= threshold)
    out = out.orderBy(F.col("_c").desc(), "da", "db")
    if top is not None:
        out = out.limit(top)
    return out.select("da", "db", F.round("_c", 6).alias("containment"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    ngram: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature column: for each of ``num_hashes`` universal
    hash functions h_i, the min over the document's shingle set.

    All JVM-side: hashed shingle -> (a_i*x + b_i) mod p -> running min.
    At 100 TB this is one scan, no shuffle; the signature (64 longs)
    replaces the full shingle set downstream.

    r15 cost structure (guide §1.2 "per-task work", §4.2): HOF lambdas
    run in the INTERPRETED evaluator, so this operator's cost is
    (elements x per-element ops). Three cuts, none changing a unigram
    signature bit:

    - the base array is ``hashed_shingles`` with the pmod fused into
      the shingle lambda — no shingle strings, no second per-element
      pmod pass ((pmod(h,M)*a+b) % M == ((h mod M)*a+b) % M);
    - duplicates are kept (``distinct=False`` for n >= 2): a min over
      the multiset equals the min over the set, and the distinct pass
      was pure overhead;
    - each hash function is ONE ``aggregate`` traversal with a
      running ``least`` — the old transform+array_min allocated an
      intermediate array per hash function per row (num_hashes x rows
      allocations) and traversed twice.

    For ``ngram == 1`` (the d04 catalog entry) the signature values
    are bit-identical to every prior round; for n >= 2 the hash basis
    is the token-hash tuple (see ``hashed_shingles``), an equally
    uniform family — consumers are the bench's LSH rows, whose output
    pairs are verified by exact Jaccard either way.
    """
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]

    # Materialize the shingle-hash array ONCE behind a Project boundary:
    # inlining it into all num_hashes min-hash expressions would reshingle
    # and rehash the document per hash function (measured 41x slower at
    # sf0.1 — VERDICT r1 #5). CollapseProject keeps the boundary because
    # the alias is non-cheap and referenced num_hashes times.
    base_df = df.select(
        df["*"],
        hashed_shingles(
            text_col,
            ngram,
            distinct=(ngram == 1),
            post=lambda h: F.pmod(h, F.lit(_MERSENNE)),
        ).alias("_mh_base"),
    )

    # The (num_hashes x |shingles|) multiply-add-mod-min inner loop runs
    # in numpy inside ONE mapInArrow pass (guide §4.2): at the 10M-doc
    # bench shape that is ~12G int64 ops the interpreted HOF evaluator
    # priced at ~45 s and numpy does in ~1 s of vectorized CPU. Only
    # (id, _mh_base) cross the Python boundary (guide §4.1 column rule).
    # The arithmetic is bit-identical in int64 — h < M and a,b < M keep
    # every product under 2^62 — so signature VALUES match the JVM
    # expression form for every ngram, and an empty/NULL shingle array
    # yields a NULL-element signature exactly as array_min produced.
    narrow = base_df.select(F.col(id_col).alias("id"), F.col("_mh_base"))
    id_type = narrow.schema["id"].dataType.simpleString()
    a_arr = [a for a, _ in coeffs]
    b_arr = [b for _, b in coeffs]
    n_funcs, mprime = num_hashes, _MERSENNE

    def _sig_batches(batches):
        import numpy as np
        import pyarrow as pa

        A = np.asarray(a_arr, dtype=np.int64)
        B = np.asarray(b_arr, dtype=np.int64)
        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            n = len(col)
            if n == 0:
                continue
            if col.null_count:
                # rare path (NULL text reaching a standalone caller):
                # row-wise, preserving the NULL-element signature shape
                rows = col.to_pylist()
                out = pa.array(
                    [
                        [int(((np.asarray(r, np.int64) * A[j] + B[j]) % mprime).min())
                         for j in range(n_funcs)]
                        if r else [None] * n_funcs
                        for r in rows
                    ],
                    type=pa.list_(pa.int64()),
                )
            else:
                offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
                starts, ends = offs[:-1], offs[1:]
                valid = ends > starts
                sigs = np.empty((n, n_funcs), dtype=np.int64)
                if len(vals):
                    # reduceat segment-min per hash function; an empty
                    # segment yields a garbage identity element that the
                    # validity mask below nulls out
                    idx = np.minimum(starts, len(vals) - 1)
                    for j in range(n_funcs):
                        hv = (vals * A[j] + B[j]) % mprime
                        sigs[:, j] = np.minimum.reduceat(hv, idx)
                else:
                    valid[:] = False
                data = pa.array(
                    sigs.ravel(),
                    type=pa.int64(),
                    mask=np.repeat(~valid, n_funcs),
                )
                out = pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (n + 1) * n_funcs, n_funcs, dtype=np.int32),
                        type=pa.int32(),
                    ),
                    data,
                )
            yield pa.RecordBatch.from_arrays([ids, out], ["id", "signature"])

    return narrow.mapInArrow(_sig_batches, f"id {id_type}, signature array<bigint>")


def _expand_bucket_pairs(grouped: DataFrame) -> DataFrame:
    """Ordered (da, db) id pairs from a grouped frame carrying a
    sorted-array ``ids`` column — one output row per (bucket, pair),
    so multiplicity across buckets is preserved for shared-count
    consumers.

    Two chained generators, NOT one in-array combos build: posexplode
    yields (position, da) rows still carrying the ids array, then a
    second explode emits da's ordered partners from slice(ids, i+2).
    Peak per-row memory is O(bucket size) — a degenerate bucket (all
    empty docs in one LSH bucket, a boilerplate window) streams its
    m^2/2 pairs row-at-a-time instead of materializing them inside ONE
    m^2-element aggregation cell and OOMing the executor. No join, so
    the upstream aggregate is computed exactly once.
    """
    step = grouped.filter(F.size("ids") >= 2).select(
        "ids", F.posexplode("ids").alias("_i", "da")
    )
    return step.select(
        "da", F.explode(F.slice("ids", F.col("_i") + 2, F.size("ids"))).alias("db")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified with exact
    Jaccard >= threshold.

    Plan shape (the 100 TB path):
      signatures (scan, no shuffle)
      -> explode bands -> hash(band slice) -> shuffle on (band, hash)
      -> bucket self-join => candidate pairs (only colliding docs meet)
      -> dedup candidates -> exact-Jaccard verify on the candidates only
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    # Documents with NO shingles (< ngram tokens, empty/NULL text) have
    # all-NULL signatures; every band hash degenerates to xxhash64("")
    # so ALL such docs would collide into one bucket per band — a k^2
    # candidate blowup whose verify then computes 0/0 = NaN, and NaN
    # compares ABOVE the threshold under Spark's NaN-largest semantics,
    # ranking garbage pairs first. MinHash is undefined on the empty
    # set: exclude those docs BEFORE the signature stage, on a cheap
    # token-count predicate. (Filtering the computed signature column
    # instead re-inlines the whole minhash expression into the pushed
    # predicate and destroys the _mh_base compute-once boundary —
    # measured 5x slower end-to-end.)
    df = df.filter(F.size(tokens(text_col)) >= ngram)
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, ngram, seed)
    # Band hashes as UNROLLED per-band expressions, NOT a transform over
    # sequence(0, bands-1): inside a higher-order function `signature`
    # appears once textually, so CollapseProject inlines the whole
    # minhash array computation into the lambda body — which the HOF
    # then re-evaluates once PER BAND (measured: 8x recompute, 17 s of
    # the 1M-doc run; the same bug class as the r1 `_mh_base` 41x fix,
    # one level up). With `signature` referenced `bands` times textually
    # the Project boundary survives and the signature is computed once.
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(F.slice("signature", b * rows_per_band + 1, rows_per_band), ",")
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # Candidate pairs WITHOUT a self-join: a (band, bucket) self-join
    # evaluates the whole signature pipeline on BOTH join inputs and
    # shuffle-sorts the banded stream twice (measured: 18 s of the 1M-doc
    # run's 28 s — the pipeline's actual hot spot once the verify was
    # fixed). One groupBy instead: collect each bucket's id set, expand
    # ordered pairs via _expand_bucket_pairs (in-array for normal
    # buckets, spillable within-bucket join for degenerate ones). Same
    # output cardinality as the join, one shuffle, signatures computed
    # once.
    grouped = banded.groupBy("band", "bucket").agg(F.sort_array(F.collect_set("id")).alias("ids"))
    cands = _expand_bucket_pairs(grouped).distinct()
    # Verify candidates with exact Jaccard over HASHED shingle sets
    # (VERDICT r4 #4: the verify join was the dedup1m hot spot).  Two
    # cost cuts, both semantics-preserving:
    #   * int64 xxhash64(shingle) arrays instead of string arrays —
    #     shingles are distinct per document, so |A∩B| / |A∪B| over the
    #     hashes equals Jaccard over the shingles (a cross-document
    #     xxhash64 collision is ~2^-64 per pair — negligible, and d04 is
    #     declared approximate anyway).  ~3x fewer bytes per array, and
    #     the expression is the SAME hashed-shingle base the signature
    #     stage computes, so nothing new is invented.
    #   * only documents that appear in some candidate pair ever ship
    #     their array through the verify shuffle: an id-only semi-join
    #     prunes the other (typically vast) majority of the corpus.
    cand_ids = (
        cands.select(F.col("da").alias("_id")).union(cands.select(F.col("db").alias("_id"))).distinct()
    )
    # Semi-join BEFORE the shingle transform (r15, guide §2.3/§1.2):
    # computing the hashed-shingle array for all N docs and then
    # semi-joining threw away the (typically vast) non-candidate
    # majority's arrays AFTER paying the tokenize+shingle+hash cost for
    # them — the single most expensive expression in the pipeline,
    # evaluated a second time here (measured: the shingle-hash pass
    # alone is ~40% of dedup10m). Joining the raw (id, text) first
    # shuffles the same order of bytes (text ~ hash array width) but
    # evaluates the transform only for documents some candidate pair
    # references. Values are identical: the transform is a pure
    # per-row function and the semi-join only drops rows.
    sh = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_mh_txt"))
        .join(cand_ids, "_id", "left_semi")
        .select("_id", hashed_shingles("_mh_txt", ngram).alias("_set"))
    )
    sa = sh.select(F.col("_id").alias("da"), F.col("_set").alias("_sa"))
    sb = sh.select(F.col("_id").alias("db"), F.col("_set").alias("_sb"))
    jac = (
        F.size(F.array_intersect("_sa", "_sb")).cast("double")
        / F.size(F.array_union("_sa", "_sb"))
    )
    return (
        cands.join(sa, "da")
        .join(sb, "db")
        .select("da", "db", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.col("jaccard").desc(), "da", "db")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "da",
    b_col: str = "db",
    max_iters: int = 25,
) -> DataFrame:
    """Near-duplicate pairs -> dedup CLUSTERS: (id, component) for every
    id in the pair list, component = the minimum id reachable through
    the pair graph. The step every dedup pipeline needs after candidate
    pairs — "drop all but one per group" is exact_dedup on ``component``.

    Algorithm: min-label propagation to fixpoint — each round every node
    takes min(own label, neighbors' labels); the component minimum
    floods the component in O(graph diameter) rounds. Near-dup clusters
    are shallow (diameter ~ handful), so this is a few E-sized
    shuffle-joins; per-round ``localCheckpoint`` truncates the plan so
    lineage doesn't grow with iterations. Deterministic: the fixpoint is
    unique regardless of partitioning or join order.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).cache()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        new = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                labels.id,
                F.least(labels.comp, F.coalesce(F.col("ncomp"), labels.comp)).alias("comp"),
            )
        ).localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iterations")
    edges.unpersist()
    return labels.orderBy("id")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 63, ngram: int = 2) -> DataFrame:
    """SimHash fingerprint (63-bit, sign bit unused so the result stays
    a non-negative long): sign-sum of per-shingle hash bits.

    Single-pass HOF construction: one ``aggregate`` over the shingle
    hashes maintains a 63-wide vote vector (``zip_with`` add), then one
    final fold packs majority bits into a long. Near-duplicate docs get
    fingerprints within a small hamming distance.
    """
    if not 0 < bits <= 63:
        raise ValueError("bits must be in 1..63")
    sh = shingles(text_col, ngram)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def bitvotes(h: Column) -> Column:
        return F.array(
            *[F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1) for i in range(bits)]
        )

    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0)] * bits),
        lambda acc, h: F.zip_with(acc, bitvotes(h), lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    fp = F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Popcount of XOR — distance between two simhash fingerprints."""
    x = (F.col(a) if isinstance(a, str) else a).bitwiseXOR(F.col(b) if isinstance(b, str) else b)
    return F.bit_count(x)


def shared_window_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 5,
    min_shared: int = 2,
    max_df: int | None = None,
    hashed: bool = True,
) -> DataFrame:
    """Substring-level overlap pairs (winnowing-style): documents
    sharing >= ``min_shared`` DISTINCT ``window``-token runs — the
    quotation / boilerplate / partial-copy detector that set-level
    Jaccard misses (a 5-token verbatim run is strong evidence of
    copying even when the documents' overall vocabularies differ;
    cf. Schleimer et al., SIGMOD'03 winnowing).

    Plan: per-doc distinct windows -> explode -> group by window ->
    drop buckets above ``max_df`` (windows are distinct per doc, so the
    bucket's id count IS the window's document frequency — the cap is a
    filter on the one aggregate, no second pass over the corpus; same
    guard role as ``jaccard_similar_pairs.max_df``) -> expand ordered
    pairs via ``_expand_bucket_pairs`` (in-array normally, spillable
    join for degenerate buckets) -> count shared windows per pair.
    ``hashed=True`` shuffles xxhash64(window) int64s instead of window
    strings (~4x fewer bytes; a cross-document collision altering a
    count is ~2^-64 per window pair). Output: (da, db, shared),
    ordered by shared desc.
    """
    win = shingles(text_col, window)
    if hashed:
        win = F.transform(win, lambda s: F.xxhash64(s))
    ex = df.select(F.col(id_col).alias("_id"), F.explode(win).alias("_w"))
    grouped = ex.groupBy("_w").agg(F.sort_array(F.collect_set("_id")).alias("ids"))
    if max_df is not None:
        grouped = grouped.filter(F.size("ids") <= max_df)
    return (
        _expand_bucket_pairs(grouped)
        .groupBy("da", "db")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .orderBy(F.col("shared").desc(), "da", "db")
    )


def resolve_entities(
    vocab: DataFrame,
    word_col: str = "w",
    freq_col: str = "freq",
    threshold: float = 0.9,
    len_band: int = 2,
    max_iters: int = 25,
) -> DataFrame:
    """End-to-end entity resolution over a vocabulary/entity table —
    the record-linkage composite (VERDICT r11 #7 capstone) built from
    three independently-verified stages:

      1. BLOCKING (q147's shape): candidate pairs must share a Soundex
         code (JVM builtin — pure Catalyst) and sit within ``len_band``
         of each other's length, so candidate generation is an
         equi-join on the phonetic key with a cheap range residual —
         never all-pairs. Zipf bounds the input: the vocabulary is
         orders of magnitude smaller than the corpus it came from.
      2. SCORING (q146's shape): Jaro-Winkler over the blocked
         candidates only, via the Arrow pandas UDF pinned bit-identical
         to DuckDB's builtin (tests/test_fuzzy.py), so a ``>=
         threshold`` gate can never straddle engines. Matches become
         undirected edges.
      3. CLUSTER + SURVIVOR (d11's shape): min-label propagation
         (``connected_components``) groups transitive matches, then one
         ``min(struct(-freq, word))`` aggregate per component picks the
         canonical surface form — highest corpus frequency, ties to the
         lexicographically smallest word — with no window over the
         corpus and no self-join.

    Input: one row per distinct entity string with its corpus
    frequency. Output: one row per entity that matched ANYTHING
    (members of size->=2 clusters): (word, comp, canon, is_canon,
    freq), ordered by word. Unmatched entities are their own canon by
    definition and are left out — callers union them back if needed.

    100 TB shape: every stage is vocabulary-sized. The corpus is
    touched once (upstream, to build the frequency table); blocking
    fan-out is bounded by the Soundex bucket sizes (q147 reports the
    n(n-1)/2 cost metric for exactly this decision); the JW UDF sees
    only blocked candidates; components iterate on match edges (dup
    clusters are shallow, O(diameter) rounds).
    """
    from laion_spark.functions.fuzzy import jaro_winkler_similarity

    sdx = vocab.select(
        F.col(word_col).alias("_w"),
        F.col(freq_col).alias("_f"),
        F.soundex(word_col).alias("_code"),
        F.length(word_col).alias("_ln"),
    )
    a, b = sdx.alias("a"), sdx.alias("b")
    cand = a.join(
        b,
        (F.col("a._code") == F.col("b._code"))
        & (F.col("a._w") < F.col("b._w"))
        & (F.abs(F.col("a._ln") - F.col("b._ln")) <= len_band),
    )
    edges = cand.filter(
        jaro_winkler_similarity(F.col("a._w"), F.col("b._w")) >= threshold
    ).select(F.col("a._w").alias("wa"), F.col("b._w").alias("wb"))
    comps = connected_components(edges, "wa", "wb", max_iters=max_iters)
    labeled = comps.join(
        vocab.select(F.col(word_col).alias("_w"), F.col(freq_col).alias("_f")),
        comps.id == F.col("_w"),
    ).select(F.col("_w").alias(word_col), "comp", F.col("_f").alias(freq_col))
    surv = labeled.groupBy("comp").agg(
        F.min(
            F.struct((-F.col(freq_col)).alias("nf"), F.col(word_col).alias("w"))
        ).alias("s")
    )
    return (
        labeled.join(surv, "comp")
        .select(
            word_col,
            "comp",
            F.col("s.w").alias("canon"),
            (F.col(word_col) == F.col("s.w")).cast("int").alias("is_canon"),
            F.col(freq_col),
        )
        .orderBy(word_col)
    )
