"""Archive payload expansion: zip/tar members as rows.

Corpus ingestion shape: datasets frequently arrive as archives of
documents (a zip of HTML files, a tar.gz of JSON shards). This op
turns a binary archive column into one row per member — stdlib
``zipfile``/``tarfile`` over in-memory buffers, no external deps.

Scale shape: row-expanding mapInArrow, map-only; one task handles one
archive payload (like the WARC source, the archive is the unit of
parallelism — repartition upstream if archives are few and huge).
Malformed archives follow the ``on_error`` skip/raise posture;
decompression-bomb defense via ``max_member_bytes`` (oversized
members are dropped with on_error="skip", fatal under "raise").
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame


def iter_archive_members(payload: bytes, max_member_bytes: int):
    """Yield (member_name, member_bytes) from a zip / tar / tar.gz /
    tar.bz2 / tar.xz payload (directories skipped). Raises ValueError
    on unrecognized or malformed archives, and on members exceeding
    ``max_member_bytes`` (the caller decides skip-vs-raise)."""
    buf = io.BytesIO(payload)
    if zipfile.is_zipfile(buf):
        buf.seek(0)
        try:
            with zipfile.ZipFile(buf) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if info.file_size > max_member_bytes:
                        raise ValueError(
                            f"zip member {info.filename!r} exceeds "
                            f"{max_member_bytes} bytes"
                        )
                    yield info.filename, zf.read(info)
        except ValueError:
            raise
        except Exception as exc:
            # zipfile raises BadZipFile but also NotImplementedError /
            # RuntimeError / EOFError / zlib.error on mutated members
            # (found by fuzzing) — normalize to the documented
            # ValueError contract
            raise ValueError(f"malformed zip: {exc}") from exc
        return
    buf.seek(0)
    try:
        with tarfile.open(fileobj=buf, mode="r:*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                if member.size > max_member_bytes:
                    raise ValueError(
                        f"tar member {member.name!r} exceeds "
                        f"{max_member_bytes} bytes"
                    )
                f = tf.extractfile(member)
                if f is not None:
                    yield member.name, f.read()
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"not a zip or tar archive: {exc}") from exc


def expand_archives(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "archive_id",
    on_error: str = "skip",
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """(id, member_name, member_idx, member_bytes) — one row per file
    inside each archive payload. ``on_error="skip"`` drops the whole
    archive on malformed input or an oversized member (bomb defense);
    "raise" fails the task."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            out_ids, names, idxs, blobs = [], [], [], []
            for i, p in zip(ids, payloads):
                try:
                    members = list(
                        iter_archive_members(bytes(p or b""), max_member_bytes)
                    )
                except Exception as exc:  # noqa: BLE001 — untrusted bytes
                    if on_error == "raise":
                        if isinstance(exc, ValueError):
                            raise
                        raise ValueError(
                            f"malformed archive: {exc!r}"
                        ) from exc
                    continue
                for j, (name, blob) in enumerate(members):
                    out_ids.append(i)
                    names.append(name)
                    idxs.append(j)
                    blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=pa.int64()),
                    pa.array(names, type=pa.string()),
                    pa.array(idxs, type=pa.int32()),
                    pa.array(blobs, type=pa.binary()),
                ],
                names=[id_col, "member_name", "member_idx", "member_bytes"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn,
        f"{id_col} long, member_name string, member_idx int, "
        "member_bytes binary",
    )
