"""Content-defined chunking (operators/multimodal.content_defined_chunks):
sequential byte-at-a-time model equivalence, boundary semantics, and the
shift-resynchronization property that is the whole point of CDC."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.multimodal import (
    cdc_chunk_dedup_report,
    content_defined_chunks,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)

_GEAR = [
    int(hashlib.md5(f"gear{b}".encode()).hexdigest()[:16], 16) for b in range(256)
]
_M64 = (1 << 64) - 1


def model_chunks(payload: bytes, min_size=48, mask_bits=6, max_size=512):
    """Sequential reference: the documented contract, byte at a time."""
    mask = (1 << mask_bits) - 1
    h, cands = 0, []
    for i, b in enumerate(payload, 1):
        h = ((h << 1) + _GEAR[b]) & _M64
        if h & mask == 0:
            cands.append(i)
    n, last, out = len(payload), 0, []
    while n - last > 0:
        nxt = next((c for c in cands if c - last >= min_size), None)
        if nxt is not None and nxt - last <= max_size:
            cut = nxt
        elif n - last > max_size:
            cut = last + max_size
        else:
            cut = n
        out.append(
            (len(out), last, cut - last, hashlib.md5(payload[last:cut]).hexdigest())
        )
        last = cut
    return out


def _spark_chunks(spark, payloads, **kw):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], SCHEMA
    )
    rows = content_defined_chunks(df, **kw).collect()
    out: dict[int, list] = {i: [] for i in range(len(payloads))}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        out[r["doc_id"]].append(
            (r["chunk_idx"], r["offset"], r["length"], r["chunk_md5"])
        )
    return out


def test_model_equivalence_random_payloads(spark):
    rng = random.Random(7)
    payloads = [
        bytes(rng.randrange(256) for _ in range(n))
        for n in (0, 1, 47, 48, 200, 1000, 4096)
    ]
    got = _spark_chunks(spark, payloads)
    for i, p in enumerate(payloads):
        assert got[i] == model_chunks(p), f"payload {i} (len {len(p)})"
        # chunks tile the payload exactly
        assert sum(c[2] for c in got[i]) == len(p)


def test_no_candidates_forces_max_size_tiling(spark):
    # mask_bits=63 -> a boundary is essentially impossible: every chunk
    # is a forced max_size cut plus the remainder
    p = bytes(range(256)) * 4  # 1024 bytes
    got = _spark_chunks(spark, [p], min_size=16, mask_bits=63, max_size=100)[0]
    assert [c[2] for c in got] == [100] * 10 + [24]
    assert got == model_chunks(p, min_size=16, mask_bits=63, max_size=100)


def test_null_and_empty_payloads_emit_nothing(spark):
    df = spark.createDataFrame([(0, None), (1, b"")], SCHEMA)
    assert content_defined_chunks(df).count() == 0


def test_shift_resynchronization_beats_fixed_chunking(spark):
    """Prepend 100 bytes: gear boundaries resynchronize, so most of the
    original chunk hashes survive; fixed-size tiling shares ~none."""
    rng = random.Random(11)
    a = bytes(rng.randrange(256) for _ in range(4096))
    b = bytes(rng.randrange(256) for _ in range(100)) + a
    got = _spark_chunks(spark, [a, b])
    ha = {c[3] for c in got[0]}
    hb = {c[3] for c in got[1]}
    shared = len(ha & hb) / len(ha)
    assert shared >= 0.8, f"CDC resync too weak: {shared:.2f}"
    # fixed 64-byte tiling of the same pair shares nothing (the 100-byte
    # shift misaligns every block)
    fixed_a = {a[i : i + 64] for i in range(0, len(a), 64)}
    fixed_b = {b[i : i + 64] for i in range(0, len(b), 64)}
    assert len(fixed_a & fixed_b) == 0


def test_dedup_report_counts_and_savings(spark):
    p = bytes(range(200)) * 3  # internal repetition across one payload
    df = spark.createDataFrame([(0, p), (1, p)], SCHEMA)
    chunks = content_defined_chunks(df)
    rep = {r["chunk_md5"]: r for r in cdc_chunk_dedup_report(chunks).collect()}
    # identical payloads -> every chunk of doc 0 recurs in doc 1
    assert rep and all(r["n_copies"] >= 2 for r in rep.values())
    for r in rep.values():
        assert r["saved_bytes"] == (r["n_copies"] - 1) * r["chunk_bytes"]


def test_min_size_respected_except_final_remainder(spark):
    rng = random.Random(3)
    p = bytes(rng.randrange(256) for _ in range(2000))
    got = _spark_chunks(spark, [p], min_size=48, mask_bits=4, max_size=512)[0]
    assert all(c[2] >= 48 for c in got[:-1])
    assert all(c[2] <= 512 for c in got)
