"""Bit-exact parity of the vectorized rolling z-score scan
(`streaming.stateful._anomaly_scan`) against the sequential reference
loop it replaced (r9-opt change: the per-row Python loop was ~5 us/row
of interpreter cost — guide §4).  The reference below is the replaced
code verbatim; every output (flag set, rounded z, state buffer) must be
IDENTICAL, including across micro-batch boundaries and at rounding-edge
z values."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from ingest_fast_spark.streaming.stateful import (
    _Z_MIN_PRIOR,
    _Z_THR,
    _Z_WINDOW,
    _anomaly_scan,
)


def reference_scan(buf, vals):
    """The replaced sequential loop, verbatim semantics.

    Platform note: the hex-exact variance parity relies on libm
    ``pow(x, 2.0)`` (what CPython's ``(x - m) ** 2`` calls) being
    correctly rounded and therefore equal to the vectorized scan's
    ``t * t`` — true on glibc >= 2.28 (this image), but a libm with a
    non-correctly-rounded pow could fail the .hex() assertions below
    without either implementation being wrong at the 6-dp output level.
    """
    buf = list(buf)
    out_idx, out_z = [], []
    for i, v in enumerate(vals):
        prior = buf[-_Z_WINDOW:]
        c = len(prior)
        if c >= _Z_MIN_PRIOR:
            m = sum(prior) / c
            s = math.sqrt(sum((x - m) ** 2 for x in prior) / (c - 1))
            if s > 0:
                z = round((float(v) - m) / s, 6)
                if abs(z) > _Z_THR:
                    out_idx.append(i)
                    out_z.append(z)
        buf.append(float(v))
        if len(buf) > _Z_WINDOW:
            buf = buf[-_Z_WINDOW:]
    return out_idx, out_z, buf


def assert_parity(buf, vals):
    vals = np.asarray(vals, dtype=np.float64)
    ref = reference_scan(buf, vals)
    got = _anomaly_scan(list(buf), vals)
    assert got[0] == ref[0], f"flag sets differ: {got[0]} vs {ref[0]}"
    assert got[1] == ref[1], f"z values differ: {got[1]} vs {ref[1]}"
    assert got[2] == ref[2], f"state buffers differ"
    # bitwise, not just ==
    assert [v.hex() for v in got[1]] == [v.hex() for v in ref[1]]
    assert [v.hex() for v in got[2]] == [v.hex() for v in ref[2]]


def test_random_streams_parity():
    rng = random.Random(7)
    for trial in range(50):
        buf = [rng.uniform(-5, 5) for _ in range(rng.randrange(0, _Z_WINDOW + 1))]
        vals = [rng.uniform(-5, 5) for _ in range(rng.randrange(0, 200))]
        # plant occasional spikes so flags actually fire
        for _ in range(len(vals) // 10):
            vals[rng.randrange(len(vals))] *= 50
        assert_parity(buf, vals)


def test_short_prior_and_empty():
    assert_parity([], [])
    assert_parity([], [1.0, 2.0, 3.0])                      # under MIN_PRIOR
    assert_parity([1.0] * (_Z_MIN_PRIOR - 1), [100.0])      # c one short
    assert_parity([1.0] * _Z_MIN_PRIOR, [100.0])            # c exactly enough
    assert_parity([2.0] * _Z_WINDOW, [2.0, 50.0])           # s == 0 guard


def test_state_carry_across_batches_matches_single_stream():
    rng = random.Random(11)
    vals = [rng.uniform(-3, 3) for _ in range(300)]
    for i in range(0, 300, 29):
        vals[i] *= 40
    # one shot
    ref = reference_scan([], np.asarray(vals))
    # chunked with state carry
    buf, idx_all, z_all, off = [], [], [], 0
    for lo in range(0, 300, 37):
        chunk = np.asarray(vals[lo : lo + 37], dtype=np.float64)
        idx, zs, buf = _anomaly_scan(buf, chunk)
        idx_all += [lo + i for i in idx]
        z_all += zs
    assert idx_all == ref[0]
    assert z_all == ref[1]
    assert buf == ref[2]


def test_rounding_boundary_candidates():
    """Construct z values that land within 1e-6 of the 3.0 threshold so
    the candidate margin + Python-round path is exercised."""
    base = [float(x) for x in range(1, _Z_WINDOW + 1)]
    m = sum(base) / len(base)
    s = math.sqrt(sum((x - m) ** 2 for x in base) / (len(base) - 1))
    for eps in (-2e-6, -1e-6, -4.9e-7, 0.0, 4.9e-7, 1e-6, 2e-6):
        v = m + (3.0 + eps) * s
        assert_parity(base, [v])
        assert_parity(base, [2 * m - v])  # negative-z mirror


def test_nan_free_contract():
    # The handler does NOT filter NaN before the scan (only nulls, via
    # pdf["value"].notna() — pandas notna treats NaN as null so true NaN
    # rows are dropped there; any NaN that DID reach the scan would
    # poison its window identically in both implementations without ever
    # flagging, because NaN satisfies no flag predicate in either). Here:
    # finite-but-huge input must yield finite state (the buffer carries
    # raw values, not squared terms).
    idx, zs, buf = _anomaly_scan([0.5] * _Z_WINDOW, np.array([1e308, -1e308]))
    assert all(math.isfinite(b) for b in buf)
