"""Deterministic laion-shaped fixtures (FIXTURES.md §1-§2, seed 42).

Generated on demand under /tmp/laion_fixtures (marker-file guarded) so
tests and benches share them without committing binaries:

  laion_mini.parquet   — 1000-row fact table, dim-8 hash embeddings
  etl_input/           — the same content in the reference's raw shard
                         layout (metadata parquet + row-aligned .npy),
                         with shard 1's text_emb DELIBERATELY ABSENT
                         (exercises the S4 zero-fill path)
"""

from __future__ import annotations

import json
import os

import numpy as np

from laion_spark.functions.encoder import hash_embed

ROOT = os.environ.get("LAION_FIXTURES_DIR", "/tmp/laion_fixtures")
WORDS = (
    "dog cat ridgeback lion safari bridge berlin london paris tokyo "
    "cubism surrealism painting photo sunset mountain river ocean forest city "
    "red blue green vintage modern abstract portrait landscape macro night "
    "winter summer"
).split()  # 32 words
assert len(WORDS) == 32


def build_rows(n: int = 1000, dim: int = 8) -> list[dict]:
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        caption = f"{WORDS[i % 32]} {WORDS[(i * 7) % 32]} number {i}"
        if i % 50 == 0:
            caption += " it’s"
        url = f"https://example.com/img/{i % 800}.jpg"
        width = 256 + (i % 16) * 64
        height = 256 + ((i * 3) % 16) * 64
        rows.append(
            {
                "key": f"{i:09d}",
                "url": url,
                "caption": caption,
                "similarity": round(float(rng.uniform(0.2, 0.5)), 6),
                "width": width,
                "height": height,
                "original_width": width * 2,
                "original_height": height * 2,
                "status": "failed" if i % 97 == 0 else "success",
                "nsfw": "NSFW" if i % 131 == 0 else ("UNSURE" if i % 13 == 0 else "UNLIKELY"),
                "exif": {} if i % 3 == 0 else {"Make": f"cam{i % 5}", "Orientation": str(i % 8)},
                "text_embedding": [np.float32(x) for x in hash_embed(caption, dim)],
                "image_embedding": [np.float32(x) for x in hash_embed(url, dim)],
            }
        )
    return rows


def ensure_fixtures(spark=None) -> str:
    """Idempotently materialize fixtures; returns ROOT."""
    marker = os.path.join(ROOT, "_COMPLETE")
    if os.path.exists(marker):
        return ROOT
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ROOT, exist_ok=True)
    rows = build_rows()

    schema = pa.schema(
        [
            ("key", pa.string()),
            ("url", pa.string()),
            ("caption", pa.string()),
            ("similarity", pa.float64()),
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("original_width", pa.int64()),
            ("original_height", pa.int64()),
            ("status", pa.string()),
            ("nsfw", pa.string()),
            ("exif", pa.map_(pa.string(), pa.string())),
            ("text_embedding", pa.list_(pa.float32())),
            ("image_embedding", pa.list_(pa.float32())),
        ]
    )
    cols = {name: [r[name] for r in rows] for name in schema.names}
    cols["exif"] = [list(r["exif"].items()) for r in rows]
    pq.write_table(
        pa.table(cols, schema=schema), os.path.join(ROOT, "laion_mini.parquet"), compression="zstd"
    )

    # ETL input layout: 2 shards of 500, exif as JSON string, no embedding cols
    for d in ("metadata", "img_emb", "text_emb"):
        os.makedirs(os.path.join(ROOT, "etl_input", d), exist_ok=True)
    meta_schema = pa.schema(
        [(n, t) for n, t in zip(schema.names, schema.types) if n not in ("exif", "text_embedding", "image_embedding")]
        + [("exif_json", pa.string())]
    )
    for sid in (0, 1):
        part = rows[sid * 500 : (sid + 1) * 500]
        mcols = {n: [r[n] for r in part] for n in meta_schema.names if n != "exif_json"}
        mcols["exif_json"] = [json.dumps(r["exif"]) for r in part]
        pq.write_table(
            pa.table(mcols, schema=meta_schema),
            os.path.join(ROOT, "etl_input", "metadata", f"metadata_{sid}.parquet"),
        )
        img = np.array([r["image_embedding"] for r in part], dtype=np.float32)
        np.save(os.path.join(ROOT, "etl_input", "img_emb", f"img_emb_{sid}.npy"), img)
        if sid == 0:  # text_emb_1.npy deliberately absent (S4)
            txt = np.array([r["text_embedding"] for r in part], dtype=np.float32)
            np.save(os.path.join(ROOT, "etl_input", "text_emb", f"text_emb_{sid}.npy"), txt)

    with open(marker, "w") as f:
        f.write("ok")
    return ROOT
