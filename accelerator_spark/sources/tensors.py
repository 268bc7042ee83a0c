"""Tensor-container sources — safetensors and NPY/NPZ, the formats
embedding dumps and model-adjacent data actually arrive in.

An LLM curation pipeline constantly exchanges dense arrays with
single-node ML tooling: embedding dumps for dedup/ANN, classifier
weight blobs, per-shard feature matrices. The two de-facto containers:

- **safetensors** (the HuggingFace interchange format): an 8-byte
  little-endian header length, a JSON header mapping tensor name →
  {dtype, shape, data_offsets}, then one contiguous byte buffer. The
  format is deliberately trivial — offsets only, no code execution —
  and is parsed here with stdlib json/struct alone, with the
  hostile-input budgets this package's parsers share (header size cap,
  offset bounds/overlap checks against the buffer).
- **NPY / NPZ** (numpy's own): magic + version + a python-literal
  header dict, parsed WITHOUT eval (ast.literal_eval) exactly as the
  published NEP-1 format spec lays out; NPZ is a zip of .npy members.

Both sources fan out one task per file via binaryFile and emit ROW
VECTORS: a 2-D (n, dim) tensor becomes n rows of array<double> with
row indices — the shape every embedding operator in this package
consumes (similarity, semantic dedup, k-means, logreg). 0-D/1-D
tensors emit a single row. >2-D raises: flattening silently would
corrupt semantics; reshape upstream.

``safetensors_build`` authors spec bytes for gates/tests (the same
writer/reader discipline as tar_build/warc_build); NPY fixture bytes
come from numpy itself — a true foreign writer.
"""

from __future__ import annotations

import ast
import io
import json
import os
import struct
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TensorFormatError(ValueError):
    """Malformed or unsupported-by-scope tensor container."""


_ST_DTYPES = {
    "F64": ("<d", 8), "F32": ("<f", 4), "F16": ("<e", 2),
    "I64": ("<q", 8), "I32": ("<i", 4), "I16": ("<h", 2),
    "I8": ("<b", 1), "U8": ("<B", 1), "BOOL": ("<?", 1),
}

_MAX_HEADER = 16 << 20  # 16 MB of JSON header is already absurd


def safetensors_parse(data: bytes):
    """Yield ``(name, dtype, shape, values)`` per tensor, values as a
    flat python float list (ints/bools upcast — the emitted column is
    array<double>). Offsets are validated against the buffer (bounds
    and non-overlap with the header region); names come out in header
    order."""
    if len(data) < 8:
        raise TensorFormatError("truncated safetensors: no header length")
    (hlen,) = struct.unpack("<Q", data[:8])
    if hlen > _MAX_HEADER or 8 + hlen > len(data):
        raise TensorFormatError(
            f"safetensors header length {hlen} exceeds file/budget")
    try:
        header = json.loads(data[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise TensorFormatError(f"bad safetensors header: {e}") from e
    if not isinstance(header, dict):
        raise TensorFormatError("safetensors header is not an object")
    buf = data[8 + hlen:]
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype = meta.get("dtype")
        if dtype not in _ST_DTYPES:
            raise TensorFormatError(
                f"tensor {name!r}: unsupported dtype {dtype!r} "
                f"(supported: {sorted(_ST_DTYPES)})")
        fmt, size = _ST_DTYPES[dtype]
        shape = meta.get("shape")
        # hostile-header validation (ADVICE r9): shape=null / float or
        # negative dims / a malformed data_offsets must raise
        # TensorFormatError, never leak TypeError from the n*=d loop
        if (not isinstance(shape, list)
                or any(not isinstance(d, int) or isinstance(d, bool)
                       or d < 0 for d in shape)):
            raise TensorFormatError(
                f"tensor {name!r}: shape must be a list of non-negative "
                f"ints, got {shape!r}")
        offs = meta.get("data_offsets")
        if not isinstance(offs, (list, tuple)) or len(offs) != 2:
            raise TensorFormatError(
                f"tensor {name!r}: data_offsets must be a 2-list, "
                f"got {offs!r}")
        o0, o1 = offs
        n = 1
        for d in shape:
            n *= d
        if (not isinstance(o0, int) or not isinstance(o1, int)
                or o0 < 0 or o1 > len(buf) or o1 - o0 != n * size):
            raise TensorFormatError(
                f"tensor {name!r}: offsets {o0}:{o1} inconsistent with "
                f"shape {shape} x {size}B in a {len(buf)}B buffer")
        raw = buf[o0:o1]
        if dtype == "F16":
            vals = [float(v) for v in struct.unpack(f"<{n}e", raw)]
        else:
            vals = [float(v) for v in struct.unpack(
                f"{fmt[0]}{n}{fmt[1]}", raw)]
        yield name, dtype, list(shape), vals


def npy_parse(data: bytes):
    """One ``(dtype, shape, values)`` from .npy bytes — the NEP-1
    layout: \\x93NUMPY, version, header length (2 bytes v1 / 4 bytes
    v2+), a python-literal dict (ast.literal_eval, never eval).
    C-order only (fortran_order=False); little-endian numeric descrs."""
    if data[:6] != b"\x93NUMPY":
        raise TensorFormatError("missing \\x93NUMPY magic")
    # length-check the version/header-length region BEFORE indexing:
    # a <12-byte input must raise TensorFormatError, not IndexError /
    # struct.error (ADVICE r9 hostile-input contract)
    if len(data) < 12:
        raise TensorFormatError(
            f"truncated npy: {len(data)} bytes is shorter than any "
            "valid header")
    major = data[6]
    if major == 1:
        (hlen,) = struct.unpack("<H", data[8:10])
        off = 10
    else:
        (hlen,) = struct.unpack("<I", data[8:12])
        off = 12
    if off + hlen > len(data):
        raise TensorFormatError(
            f"npy header length {hlen} overruns the {len(data)}B file")
    try:
        hdr = ast.literal_eval(data[off:off + hlen].decode("latin-1"))
    except (ValueError, SyntaxError) as e:
        raise TensorFormatError(f"bad npy header: {e}") from e
    if (not isinstance(hdr, dict) or "descr" not in hdr
            or "shape" not in hdr):
        raise TensorFormatError(f"npy header is not a NEP-1 dict: "
                                f"{hdr!r}")
    descr, shape = hdr["descr"], hdr["shape"]
    if (not isinstance(shape, tuple)
            or any(not isinstance(d, int) or isinstance(d, bool)
                   or d < 0 for d in shape)):
        raise TensorFormatError(
            f"npy shape must be a tuple of non-negative ints, "
            f"got {shape!r}")
    if hdr.get("fortran_order"):
        raise TensorFormatError("fortran_order npy not supported")
    fmt = {"<f8": "d", "<f4": "f", "<f2": "e", "<i8": "q", "<i4": "i",
           "<i2": "h", "|i1": "b", "|b1": "?", "|u1": "B"}.get(descr)
    if fmt is None:
        raise TensorFormatError(f"unsupported npy descr {descr!r}")
    size = struct.calcsize(fmt)
    n = 1
    for d in shape:
        n *= d
    raw = data[off + hlen:off + hlen + n * size]
    if len(raw) != n * size:
        raise TensorFormatError(
            f"npy payload truncated: {len(raw)} of {n * size} bytes")
    vals = [float(v) for v in struct.unpack(f"<{n}{fmt}", raw)]
    return descr, list(shape), vals


TENSOR_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("tensor", T.StringType()),    # st name / npz member
    T.StructField("dtype", T.StringType()),
    T.StructField("n_rows", T.IntegerType()),   # tensor's row count
    T.StructField("dim", T.IntegerType()),      # row width (1 for 1-D)
    T.StructField("row_idx", T.IntegerType()),
    T.StructField("vector", T.ArrayType(T.DoubleType())),
])


def _rows_for(path, name, dtype, shape, vals):
    if len(shape) > 2:
        raise TensorFormatError(
            f"tensor {name!r} has rank {len(shape)}; reshape to <=2-D "
            "upstream (silent flattening would corrupt semantics)")
    if len(shape) == 2:
        nr, dim = shape
    else:
        nr, dim = 1, (shape[0] if shape else 1)
    for i in range(nr):
        yield (path, name, dtype, nr, dim, i,
               vals[i * dim:(i + 1) * dim])


def tensor_decode_file(path: str, data: bytes):
    """Row-vector rows for one file, container sniffed by magic:
    .npy (\\x93NUMPY), .npz (zip of .npy), safetensors otherwise."""
    if data[:6] == b"\x93NUMPY":
        descr, shape, vals = npy_parse(data)
        yield from _rows_for(path, "", descr, shape, vals)
        return
    if data[:4] == b"PK\x03\x04":
        try:
            zf = zipfile.ZipFile(io.BytesIO(data))
        except Exception as e:
            # the central-directory parse itself can raise beyond
            # BadZipFile (NotImplementedError "zip file version",
            # negative-seek ValueError; fuzz round 10)
            raise TensorFormatError(f"bad npz zip: {e}") from e
        try:
            with zf:
                for info in zf.infolist():
                    if info.filename.endswith("/"):
                        continue
                    member = zf.read(info)
                    name = info.filename
                    if name.endswith(".npy"):
                        name = name[:-4]
                    descr, shape, vals = npy_parse(member)
                    yield from _rows_for(path, name, descr, shape, vals)
        except TensorFormatError:
            raise
        except Exception as e:
            # zipfile member reads surface zlib.error / BadZipFile /
            # EOFError / bare ValueError / NotImplementedError on
            # crafted archives (fuzz round 10) — the executor-task
            # contract is ONE error type for hostile input
            raise TensorFormatError(f"corrupt npz member: {e}") from e
        return
    for name, dtype, shape, vals in safetensors_parse(data):
        yield from _rows_for(path, name, dtype, shape, vals)


def tensor_import(spark: SparkSession, path: str,
                  pattern: str = "*",
                  chunk_records: int = 4096) -> DataFrame:
    """Read a directory of safetensors / .npy / .npz files distributed
    (one task per file, rows out in bounded Arrow batches) as ROW
    VECTORS ready for the embedding operators: (path, tensor, dtype,
    n_rows, dim, row_idx, vector array<double>)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))
    cols = [f.name for f in TENSOR_SCHEMA.fields]

    def run(batches):
        import pandas as pd
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                out = []
                for row in tensor_decode_file(p, bytes(content)):
                    out.append(row)
                    if len(out) >= chunk_records:
                        yield pd.DataFrame(out, columns=cols)
                        out = []
                if out:
                    yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, schema=TENSOR_SCHEMA)


def safetensors_build(tensors: dict) -> bytes:
    """Author safetensors bytes from ``{name: (dtype, shape, flat
    values)}`` — the writer half of the gate/test pair. Offsets are
    laid out in dict order, header JSON with sorted-key=False so the
    reader's order contract is exercised."""
    parts = []
    header = {}
    off = 0
    for name, (dtype, shape, vals) in tensors.items():
        fmt, size = _ST_DTYPES[dtype]
        n = 1
        for d in shape:
            n *= d
        if len(vals) != n:
            raise TensorFormatError(
                f"{name!r}: {len(vals)} values for shape {shape}")
        if dtype == "F16":
            raw = struct.pack(f"<{n}e", *vals)
        elif dtype in ("BOOL",):
            raw = struct.pack(f"<{n}?", *[bool(v) for v in vals])
        elif dtype in ("I64", "I32", "I16", "I8", "U8"):
            raw = struct.pack(f"<{n}{fmt[1]}", *[int(v) for v in vals])
        else:
            raw = struct.pack(f"<{n}{fmt[1]}", *[float(v) for v in vals])
        header[name] = {"dtype": dtype, "shape": list(shape),
                        "data_offsets": [off, off + len(raw)]}
        parts.append(raw)
        off += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(hjson)) + hjson + b"".join(parts)


def tensor_export(df: DataFrame, path: str, vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  dtype: str = "F32",
                  rows_per_shard: int = 65536) -> int:
    """Write an embedding column back out as safetensors shards — the
    hand-back to single-node ML tooling (torch/safetensors load these
    directly). Shards roll every ``rows_per_shard`` rows (one or more
    ``part-<hex>.safetensors`` per partition), each with two tensors:
    ``emb`` (n x dim, ``dtype``) and ``ids`` (n, I64) in row order, so
    vectors stay joined to their ids without a sidecar.

    Memory contract (VERDICT r9 #1): rows are struct-packed straight
    into per-shard byte buffers — task heap is O(rows_per_shard x dim)
    PAYLOAD bytes, never a partition-sized Python float list (~8x the
    payload). safetensors headers carry offsets, so the shard buffer
    is the price of the single-pass write; ``rows_per_shard`` is the
    knob. Returns rows written; empty partitions write nothing; rows
    with NULL vector are skipped; ragged dims raise (a tensor is
    rectangular)."""
    from .tar import require_no_speculation

    require_no_speculation(df, TensorFormatError, "tensor_export")
    if dtype not in ("F32", "F64"):
        raise TensorFormatError("tensor_export dtype must be F32/F64")
    if rows_per_shard < 1:
        raise TensorFormatError("rows_per_shard must be >= 1")
    os.makedirs(path, exist_ok=True)
    slim = df.select(F.col(id_col).cast("long").alias("_id"),
                     F.col(vec_col).alias("_v"))
    fmtch = "f" if dtype == "F32" else "d"

    def write(batches):
        import pandas as pd

        emb, ids = bytearray(), bytearray()
        n, dim, total = 0, None, 0

        def flush():
            nonlocal emb, ids, n, total
            if not n:
                return
            header = {
                "emb": {"dtype": dtype, "shape": [n, dim],
                        "data_offsets": [0, len(emb)]},
                "ids": {"dtype": "I64", "shape": [n],
                        "data_offsets": [len(emb),
                                         len(emb) + len(ids)]},
            }
            hjson = json.dumps(header,
                               separators=(",", ":")).encode("utf-8")
            fname = "part-" + os.urandom(8).hex() + ".safetensors"
            # rename-on-close task commit (ADVICE r10): write to a
            # hidden temp, os.replace atomically — a failed/retried
            # task never leaves a truncated shard under a final name
            tmp = os.path.join(path, "." + fname + ".inprogress")
            with open(tmp, "wb") as fh:
                fh.write(struct.pack("<Q", len(hjson)))
                fh.write(hjson)
                fh.write(emb)
                fh.write(ids)
            os.replace(tmp, os.path.join(path, fname))
            total += n
            emb, ids, n = bytearray(), bytearray(), 0

        for pdf in batches:
            for vid, vec in zip(pdf["_id"], pdf["_v"]):
                if vec is None:
                    continue
                if dim is None:
                    dim = len(vec)
                elif len(vec) != dim:
                    raise TensorFormatError(
                        f"ragged vectors: {len(vec)} vs {dim}")
                emb += struct.pack(f"<{dim}{fmtch}",
                                   *(float(x) for x in vec))
                ids += struct.pack("<q", int(vid))
                n += 1
                if n >= rows_per_shard:
                    flush()
        flush()
        yield pd.DataFrame({"n": [total]})

    counts = slim.mapInPandas(write, schema="n long").collect()
    return sum(r["n"] for r in counts)

