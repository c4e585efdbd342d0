import os

import pytest
from pyspark.sql import functions as F

from laion_spark.sources.multimodal import (
    decode_images,
    read_binary,
    sample_frames,
    sniff_format,
)


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    (d / "a.jpg").write_bytes(bytes.fromhex("FFD8FF") + b"fakejpegbody" * 10)
    (d / "b.png").write_bytes(bytes.fromhex("89504E47") + b"fakepngbody" * 20)
    (d / "c.gif").write_bytes(bytes.fromhex("47494638") + b"gifgif")
    (d / "d.bin").write_bytes(b"\x00\x01\x02 not an image")
    return str(d)


def test_binary_source_and_sniff(spark, bin_dir):
    df = read_binary(spark, bin_dir)
    assert df.count() == 4
    got = {
        os.path.basename(r.path): r.fmt
        for r in df.select("path", sniff_format().alias("fmt")).collect()
    }
    assert got == {"a.jpg": "jpeg", "b.png": "png", "c.gif": "gif", "d.bin": "unknown"}


def test_decode_fake_backend(spark, bin_dir):
    df = read_binary(spark, bin_dir)
    meta = decode_images(df, decode_backend="fake")
    rows = {os.path.basename(r.path): r for r in meta.collect()}
    assert len(rows) == 4
    jpg = rows["a.jpg"]
    assert jpg.fmt == "jpeg" and jpg.n_bytes == 3 + 120
    assert 64 <= jpg.width < 256 and 64 <= jpg.height < 256 and jpg.channels == 3
    # deterministic: same bytes -> same fake stats
    again = {os.path.basename(r.path): r for r in decode_images(df, decode_backend="fake").collect()}
    assert again["a.jpg"] == jpg


def test_decode_pil_backend_is_marked_stub(spark, bin_dir):
    df = read_binary(spark, bin_dir)
    try:
        import PIL  # type: ignore # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="(?i)pillow|NotImplemented"):
        decode_images(df, decode_backend="pil").collect()


def test_decode_auto_without_pil_falls_back_to_fake(spark, bin_dir):
    """``auto`` must resolve to the deterministic fake backend when
    Pillow is absent — identical rows, no error."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; fallback path not reachable")
    except ImportError:
        pass
    df = read_binary(spark, bin_dir)
    auto = {os.path.basename(r.path): r for r in decode_images(df, decode_backend="auto").collect()}
    fake = {os.path.basename(r.path): r for r in decode_images(df, decode_backend="fake").collect()}
    assert auto == fake


def test_decode_auto_with_pil_decodes_real_png(spark, tmp_path):
    """With Pillow present, ``auto`` takes the real decode path: a
    genuine 3x2 PNG must come back with its true dimensions, not the
    sha256-derived fake ones."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (3, 2), color=(10, 20, 30)).save(buf, format="PNG")
    (tmp_path / "real.png").write_bytes(buf.getvalue())
    meta = decode_images(read_binary(spark, str(tmp_path)), decode_backend="auto").collect()
    assert len(meta) == 1
    r = meta[0]
    assert (r.width, r.height, r.channels, r.fmt) == (3, 2, 3, "png")
    assert abs(r.mean_pixel - (10 + 20 + 30) / 3) < 1e-6


def test_sample_frames(spark, bin_dir):
    df = read_binary(spark, bin_dir)
    frames = sample_frames(df, every_n=30)
    rows = frames.collect()
    assert len(rows) >= 4  # at least one frame per file
    assert all(r.frame_idx >= 0 for r in rows)


def test_content_pruned_before_shuffle(spark, bin_dir):
    # the decode output carries no binary column -> joins/aggs after it
    # never shuffle payload bytes
    meta = decode_images(read_binary(spark, bin_dir))
    assert "content" not in meta.columns
