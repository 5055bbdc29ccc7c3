"""Real-file binary ingest (mm_binary_file_ingest).

The entry's whole point is reading bytes the job did not synthesize
in-kernel (VERDICT r08 #2), so the tests pin exactly that boundary:
the committed fixture files are byte-identical to the deterministic
writer's output, foreign stdlib readers can parse them (they are REAL
tar/gzip/BMP, not look-alikes), the strict decoders reject corrupted
bytes rather than misparse, and the Spark entry ingests the directory
through the binaryFile source with every row decoded.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import tarfile
import wave


from coviddatapipeline_spark.operators.multimodal import (
    FIXTURE_SHARDS,
    _fixture_dir,
    binary_fixture_files,
    ensure_binary_fixtures,
    make_png_decoder,
    make_tar_decoder,
    make_warc_decoder,
)
from coviddatapipeline_spark.queries.catalog import all_queries


def test_committed_fixtures_match_writer_bytes():
    """The committed dir IS the writer's deterministic output — a
    writer edit without a fixture regen (or a hand-edited fixture)
    fails here before it can skew the oracle."""
    d = ensure_binary_fixtures()
    spec = dict(binary_fixture_files())
    on_disk = sorted(os.listdir(d))
    assert on_disk == sorted(spec), "fixture dir has missing/extra files"
    for name in on_disk:
        with open(os.path.join(d, name), "rb") as f:
            assert f.read() == spec[name], f"{name} drifted from the writer"


def test_fixture_count_and_kinds():
    spec = binary_fixture_files()
    assert len(spec) == 7 * FIXTURE_SHARDS
    exts = {n.rsplit(".", 1)[-1] if not n.endswith(".warc.gz") else "warc.gz"
            for n, _ in spec}
    assert exts == {"tar", "warc.gz", "bmp", "png", "gif", "wav", "zip"}


def test_fixtures_are_foreign_readable():
    """stdlib tarfile / gzip — readers this repo did not write — parse
    every container fixture, proving the files are spec-real."""
    d = ensure_binary_fixtures()
    for s in range(FIXTURE_SHARDS):
        with tarfile.open(os.path.join(d, f"shard_{s:02d}.tar")) as tf:
            names = [m.name for m in tf.getmembers()]
            assert names == ["page.html", f"data_{s}.txt"]
            page = tf.extractfile("page.html").read()
            assert page.startswith(b"<html>")
        raw = open(os.path.join(d, f"crawl_{s:02d}.warc.gz"), "rb").read()
        # two concatenated gzip members; gzip.decompress handles the
        # concatenation, the record text must be WARC/1.0
        both = gzip.decompress(raw)
        assert both.startswith(b"WARC/1.0\r\n")
        assert both.count(b"WARC/1.0\r\n") == 2
        # stdlib wave — a PCM reader this repo did not write
        with wave.open(os.path.join(d, f"audio_{s:02d}.wav")) as wf:
            assert (wf.getnchannels(), wf.getsampwidth()) == (1, 2)
            assert wf.getframerate() == 8000 << (s % 3)
            assert wf.getnframes() == 64 + s * 7
        # stdlib zipfile — central directory, CRCs, and deflate all
        # validated by a reader this repo did not write
        import zipfile

        with zipfile.ZipFile(os.path.join(d, f"pack_{s:02d}.zip")) as zf:
            assert zf.testzip() is None
            assert zf.namelist() == ["page.html", f"data_{s}.txt"]
            assert zf.read("page.html").startswith(b"<html>")


def test_strict_decoders_reject_corrupted_fixture_bytes():
    """Flipping one payload byte must flip the tar checksum / gzip CRC
    path into a rejection (None) — never a silently-wrong parse."""
    d = ensure_binary_fixtures()
    tar_d, warc_d = make_tar_decoder(), make_warc_decoder()
    blob = bytearray(open(os.path.join(d, "shard_00.tar"), "rb").read())
    assert tar_d(bytes(blob)) is not None
    blob[0] ^= 0xFF  # corrupt the first header byte -> checksum breaks
    assert tar_d(bytes(blob)) is None
    wb = bytearray(open(os.path.join(d, "crawl_00.warc.gz"), "rb").read())
    assert warc_d(bytes(wb)) is not None
    wb[-5] ^= 0xFF  # inside the trailing CRC/ISIZE -> member CRC fails
    assert warc_d(bytes(wb)) is None
    png_d = make_png_decoder()
    pb = bytearray(open(os.path.join(d, "pic_00.png"), "rb").read())
    assert png_d(bytes(pb)) is not None
    pb[30] ^= 0xFF  # inside a chunk body -> CRC32 mismatch
    assert png_d(bytes(pb)) is None
    from coviddatapipeline_spark.operators.multimodal import make_zip_decoder

    zip_d = make_zip_decoder()
    zb = bytearray(open(os.path.join(d, "pack_00.zip"), "rb").read())
    assert zip_d(bytes(zb)) is not None
    zb[35] ^= 0xFF  # inside the member name/data run -> reject
    assert zip_d(bytes(zb)) is None


def test_binary_file_ingest_spark(spark, parity_sf_dir):
    rows = all_queries()["mm_binary_file_ingest"].fn(spark, parity_sf_dir).collect()
    assert len(rows) == 7 * FIXTURE_SHARDS
    by_kind = {}
    for r in rows:
        assert r.decoded, f"{r.file_name} failed to decode"
        assert r.file_bytes == os.path.getsize(
            os.path.join(_fixture_dir(), r.file_name)
        )
        by_kind.setdefault(r.kind, []).append(r)
    assert {k: len(v) for k, v in by_kind.items()} == {
        k: FIXTURE_SHARDS
        for k in ("tar", "zip", "warc", "bmp", "png", "gif", "wav")
    }
    # spot-check one parse-derived value against an independent reader
    with tarfile.open(os.path.join(_fixture_dir(), "shard_05.tar")) as tf:
        page = tf.extractfile("page.html").read()
    tar5 = next(r for r in by_kind["tar"] if r.file_name == "shard_05.tar")
    assert tar5.detail_md5 == hashlib.md5(page).hexdigest()
    assert tar5.n_records == 2
