"""Archive expansion: zip/tar members as rows."""

import io
import tarfile
import zipfile


def _zip_bytes(files):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in files:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(files, mode="w:gz"):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in files:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


FILES = [("a/doc1.html", b"<main>one</main>"), ("doc2.txt", b"two bytes")]


def test_expand_archives_zip_and_tar(spark):
    """Zip (deflate) and tar.gz payloads in the same batch expand to
    one row per member with names and bytes intact; a malformed
    payload drops under skip and fails under raise."""
    import pytest as _pytest

    from tl_spark.operators.archives import expand_archives

    rows = [
        (1, bytearray(_zip_bytes(FILES))),
        (2, bytearray(_tar_bytes(FILES))),
        (3, bytearray(b"not an archive at all")),
    ]
    df = spark.createDataFrame(rows, "archive_id long, payload binary")
    got = {
        (r["archive_id"], r["member_name"]): (
            r["member_idx"], bytes(r["member_bytes"])
        )
        for r in expand_archives(df).collect()
    }
    assert len(got) == 4
    for aid in (1, 2):
        for j, (name, data) in enumerate(FILES):
            assert got[(aid, name)] == (j, data)
    with _pytest.raises(Exception):
        expand_archives(df, on_error="raise").collect()


def test_expand_archives_bomb_defense(spark):
    """A member above max_member_bytes drops the archive under skip
    (bomb defense) and raises under raise."""
    import pytest as _pytest

    from tl_spark.operators.archives import expand_archives

    big = _zip_bytes([("bomb.bin", b"\x00" * 4096)])
    df = spark.createDataFrame(
        [(1, bytearray(big))], "archive_id long, payload binary"
    )
    assert expand_archives(df, max_member_bytes=100).count() == 0
    assert expand_archives(df, max_member_bytes=10000).count() == 1
    with _pytest.raises(Exception, match="exceeds"):
        expand_archives(df, on_error="raise", max_member_bytes=100).collect()


def test_expand_archives_feeds_extraction(spark):
    """Archive members flow into the extraction kernel: html members
    decode and extract; the composed shape mirrors the WARC path."""
    import pyspark.sql.functions as F

    from tl_spark.functions.extract import extract_main_content
    from tl_spark.operators.archives import expand_archives

    html = b"<html><nav>chrome</nav><main><p>payload text</p></main></html>"
    df = spark.createDataFrame(
        [(7, bytearray(_tar_bytes([("x.html", html)])))],
        "archive_id long, payload binary",
    )
    members = expand_archives(df).filter(
        F.col("member_name").endswith(".html")
    ).withColumn("text", F.decode(F.col("member_bytes"), "UTF-8"))
    out = extract_main_content(
        members, text_col="text",
        passthrough=["archive_id", "member_name"],
    ).collect()
    assert len(out) == 1
    assert "payload text" in out[0]["extracted_text"]
    assert "chrome" not in out[0]["extracted_text"]


def test_mutated_zip_raises_valueerror_only():
    """Stdlib zipfile raises NotImplementedError/RuntimeError/EOFError
    on mutated members (found by fuzzing); iter_archive_members must
    normalize every failure to its documented ValueError."""
    import io
    import random
    import zipfile

    from tl_spark.operators.archives import iter_archive_members

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a.txt", b"member data here")
    zips = zbuf.getvalue()
    rng = random.Random(20)
    escapes = []
    for _ in range(800):
        b = bytearray(zips)
        n = rng.randrange(1, 60)
        pos = rng.randrange(0, len(b) - n)
        b[pos : pos + n] = bytes(rng.randrange(256) for _ in range(n))
        try:
            list(iter_archive_members(bytes(b), 1 << 20))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the point of the test
            escapes.append(type(e).__name__)
    assert not escapes, escapes[:5]
