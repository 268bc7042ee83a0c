"""Deterministic Bloom filter tests (operators/sketches.py): python
reference agreement (positions + membership), no-false-negative
property, NULL semantics, parameter validation."""

import hashlib

import pytest

from accelerator_spark.operators.sketches import (
    BloomFilter, bloom_build, bloom_prefilter)


def _ref_positions(key, m_bits, n_hashes):
    h = hashlib.md5(str(key).encode()).hexdigest()
    return [int(h[8 * j:8 * j + 8], 16) % m_bits for j in range(n_hashes)]


def test_validation():
    with pytest.raises(ValueError):
        BloomFilter(0, 30, 2, 0)       # not a multiple of 4
    with pytest.raises(ValueError):
        BloomFilter(0, 64, 5, 0)       # md5 has 4 lanes
    with pytest.raises(ValueError):
        BloomFilter(0, 8, 2, 0)        # too small


def test_build_matches_python_reference(spark):
    keys = [3, 17, 99, 1234, 567890]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bf = bloom_build(df, "k", m_bits=256, n_hashes=3)
    bits = 0
    for k in keys:
        for p in _ref_positions(k, 256, 3):
            bits |= 1 << p
    assert bf.bits == bits
    assert bf.n_keys == 5
    # hex layout: char i holds bits [4i, 4i+4), lowest bit first
    hx = bf.hex_bitset
    assert len(hx) == 64
    assert sum(int(hx[i], 16) << (4 * i) for i in range(64)) == bits


def test_membership_no_false_negatives_and_ref_fp(spark):
    keys = list(range(0, 400, 7))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bf = bloom_build(df, "k", m_bits=512, n_hashes=2)
    probe = spark.createDataFrame([(k,) for k in range(400)], "k long")
    got = {r.k for r in bloom_prefilter(probe, bf, "k").collect()}
    assert set(keys) <= got                      # no false negatives
    # spark's maybe-set equals the python reference's, FPs included
    ref = {k for k in range(400)
           if all(bf.bits >> p & 1
                  for p in _ref_positions(k, 512, 2))}
    assert got == ref


def test_null_keys(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    bf = bloom_build(df, "k", m_bits=64, n_hashes=2)
    assert bf.n_keys == 1
    probe = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    kept = {r.k for r in bloom_prefilter(probe, bf, "k").collect()}
    assert 1 in kept and None not in kept        # NULL never matches


def test_fp_rate_formula():
    bf = BloomFilter(0, 1024, 3, 100)
    assert 0.01 < bf.fp_rate() < 0.05
