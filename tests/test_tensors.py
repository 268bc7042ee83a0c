"""Tensor-container source tests (sources/tensors.py): safetensors
writer/reader pair over every dtype, numpy as the FOREIGN npy/npz
writer, row-vector emission, hostile inputs, the distributed import."""

import io

import numpy as np
import pytest

from accelerator_spark.sources.tensors import (
    TensorFormatError, npy_parse, safetensors_build, safetensors_parse,
    tensor_decode_file, tensor_import)


def test_safetensors_all_dtypes_roundtrip():
    spec = {
        "f64": ("F64", [2, 2], [1.5, -2.5, 0.0, 1e100]),
        "f32": ("F32", [3], [0.25, -0.5, 2.0]),
        "f16": ("F16", [2], [0.5, -2.0]),
        "i64": ("I64", [2], [-(2 ** 62), 2 ** 62]),
        "i32": ("I32", [2], [-2147483648, 2147483647]),
        "i16": ("I16", [1], [-32768]),
        "i8": ("I8", [1], [-128]),
        "u8": ("U8", [2], [0, 255]),
        "bool": ("BOOL", [2], [1, 0]),
    }
    got = {n: (d, s, v) for n, d, s, v in
           safetensors_parse(safetensors_build(spec))}
    for name, (dtype, shape, vals) in spec.items():
        gd, gs, gv = got[name]
        assert (gd, gs) == (dtype, shape)
        assert gv == [float(x) for x in vals]


def test_safetensors_hostile():
    good = safetensors_build({"t": ("F32", [2], [1.0, 2.0])})
    with pytest.raises(TensorFormatError):
        safetensors_parse(b"\x00" * 4).__next__()          # truncated
    with pytest.raises(TensorFormatError):
        list(safetensors_parse(
            b"\xff\xff\xff\xff\xff\xff\xff\xff" + good[8:]))  # hlen bomb
    # offsets past the buffer
    import json as j, struct as st
    hdr = j.dumps({"t": {"dtype": "F32", "shape": [4],
                         "data_offsets": [0, 16]}}).encode()
    bad = st.pack("<Q", len(hdr)) + hdr + b"\x00" * 8
    with pytest.raises(TensorFormatError):
        list(safetensors_parse(bad))
    with pytest.raises(TensorFormatError):
        list(safetensors_parse(good[:8] + b"not json" + good[16:]))


def test_npy_foreign_writer_and_scope():
    for arr in (np.arange(6, dtype="<f8").reshape(2, 3),
                np.array([1, 2, 3], dtype="<i4"),
                np.array(7.5, dtype="<f4")):
        buf = io.BytesIO()
        np.save(buf, arr)
        descr, shape, vals = npy_parse(buf.getvalue())
        assert shape == list(arr.shape)
        assert vals == [float(x) for x in arr.ravel()]
    buf = io.BytesIO()
    np.save(buf, np.asfortranarray(np.ones((2, 2))))
    with pytest.raises(TensorFormatError):
        npy_parse(buf.getvalue())
    buf = io.BytesIO()
    np.save(buf, np.array(["s"], dtype="<U1"))
    with pytest.raises(TensorFormatError):
        npy_parse(buf.getvalue())


def test_rank_guard_and_row_vectors():
    st = safetensors_build({"t3": ("F32", [2, 2, 2], [0.0] * 8)})
    with pytest.raises(TensorFormatError):
        list(tensor_decode_file("p", st))
    st1 = safetensors_build({"v": ("F32", [3], [1.0, 2.0, 3.0])})
    rows = list(tensor_decode_file("p", st1))
    assert rows == [("p", "v", "F32", 1, 3, 0, [1.0, 2.0, 3.0])]


def test_tensor_import(spark, tmp_path):
    (tmp_path / "a.safetensors").write_bytes(safetensors_build(
        {"emb": ("F32", [3, 2], [float(i) for i in range(6)])}))
    buf = io.BytesIO()
    np.savez(buf, w=np.arange(4, dtype="<f8").reshape(2, 2))
    (tmp_path / "b.npz").write_bytes(buf.getvalue())
    df = tensor_import(spark, str(tmp_path))
    rows = {(r.path.rsplit("/", 1)[-1], r.tensor, r.row_idx):
            (r.dim, list(r.vector)) for r in df.collect()}
    assert rows[("a.safetensors", "emb", 1)] == (2, [2.0, 3.0])
    assert rows[("b.npz", "w", 0)] == (2, [0.0, 1.0])
    assert len(rows) == 5


def test_tensor_export_roundtrip(spark, tmp_path):
    """embeddings -> safetensors shards -> re-import: ids stay joined
    to vectors, F32 quantizes, F64 is exact; NULL vectors skipped."""
    import pyspark.sql.functions as F

    from accelerator_spark.sources.tensors import tensor_export

    rows = [(i, [float(i), i + 0.25]) for i in range(9)] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = str(tmp_path / "st")
    assert tensor_export(df.repartition(3), out, dtype="F64") == 9
    back = tensor_import(spark, out)
    emb = {(r.path, r.row_idx): list(r.vector)
           for r in back.filter("tensor = 'emb'").collect()}
    ids = {r.path: list(r.vector)
           for r in back.filter("tensor = 'ids'").collect()}
    # per shard: ids[k] is the vec_id of emb row k (row order preserved)
    seen = {}
    for (p, ridx), v in emb.items():
        seen[int(ids[p][ridx])] = v
    assert seen == {i: [float(i), i + 0.25] for i in range(9)}
    with pytest.raises(TensorFormatError):
        tensor_export(df, out, dtype="I64")
    ragged = spark.createDataFrame(
        [(1, [1.0]), (2, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        tensor_export(ragged.coalesce(1), str(tmp_path / "r"))


def test_bpe_save_load(tmp_path):
    from accelerator_spark.operators.bpe import bpe_load, bpe_save

    merges = [("a", "b"), ("ab", "</w>"), ("é", "ü")]
    p = str(tmp_path / "merges.json")
    bpe_save(merges, p)
    assert bpe_load(p) == merges
    (tmp_path / "bad.json").write_text('{"not": "a list"}')
    with pytest.raises(ValueError):
        bpe_load(str(tmp_path / "bad.json"))


def test_hostile_headers_raise_tensor_format_error():
    """ADVICE r9: malformed headers must raise TensorFormatError,
    never leak TypeError/IndexError/struct.error from executor
    tasks."""
    import json
    import struct

    def st(meta: dict, buf: bytes = b"") -> bytes:
        h = json.dumps(meta).encode()
        return struct.pack("<Q", len(h)) + h + buf

    for meta in (
        {"t": {"dtype": "F32", "shape": None,
               "data_offsets": [0, 0]}},            # shape null
        {"t": {"dtype": "F32", "shape": [1, 2.5],
               "data_offsets": [0, 12]}},           # float dim
        {"t": {"dtype": "F32", "shape": [-1],
               "data_offsets": [0, 4]}},            # negative dim
        {"t": {"dtype": "F32", "shape": [1],
               "data_offsets": 4}},                 # scalar offsets
        {"t": {"dtype": "F32", "shape": [1],
               "data_offsets": [0]}},               # 1-elt offsets
    ):
        with pytest.raises(TensorFormatError):
            list(safetensors_parse(st(meta, b"\0" * 16)))
    # npy: every truncation length down to the magic alone
    good = b"\x93NUMPY\x01\x00"
    for end in range(6, 12):
        with pytest.raises(TensorFormatError):
            npy_parse(good[:end] + b"\xff" * max(0, end - len(good)))
    # header length overrunning the file; non-dict header; bad shape
    with pytest.raises(TensorFormatError):
        npy_parse(good + struct.pack("<H", 500) + b"{}")
    hdr = b"[1, 2]"
    with pytest.raises(TensorFormatError):
        npy_parse(good + struct.pack("<H", len(hdr)) + hdr)
    hdr = b"{'descr': '<f8', 'fortran_order': False, 'shape': (1.5,)}"
    with pytest.raises(TensorFormatError):
        npy_parse(good + struct.pack("<H", len(hdr)) + hdr)


def test_tensor_export_rolls_shards_bounded(spark, tmp_path):
    """VERDICT r9 #1: one 350-row partition with rows_per_shard=100
    lands 4 shards (100/100/100/50), every shard's emb tensor row
    count <= the bound, and the re-import is value-complete."""
    from accelerator_spark.sources.tensors import (
        safetensors_parse, tensor_export)

    rows = [(i, [i + 0.5, 2.0 * i]) for i in range(350)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    out = tmp_path / "rolled"
    assert tensor_export(df.coalesce(1), str(out), dtype="F64",
                         rows_per_shard=100) == 350
    shards = sorted(out.iterdir())
    assert len(shards) == 4
    sizes = []
    seen = {}
    for p in shards:
        tensors = dict((n, (d, s, v)) for n, d, s, v
                       in safetensors_parse(p.read_bytes()))
        n_rows = tensors["emb"][1][0]
        sizes.append(n_rows)
        assert n_rows <= 100
        ids = tensors["ids"][2]
        for k in range(n_rows):
            seen[int(ids[k])] = tensors["emb"][2][2 * k:2 * k + 2]
    assert sorted(sizes) == [50, 100, 100, 100]
    assert seen == {i: [i + 0.5, 2.0 * i] for i in range(350)}
    with pytest.raises(TensorFormatError):
        tensor_export(df, str(out), rows_per_shard=0)
