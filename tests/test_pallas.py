"""Pallas kernel validation (interpret mode on CPU; the same kernel is
validated compiled on real TPU by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddb_tpu.ops import pallas_agg as P


def test_q1_fused_aggregate_interpret():
    n = 4096
    rng = np.random.default_rng(3)
    args = [rng.integers(100, 5100, n).astype(np.int32),
            rng.integers(90000, 520000000, n).astype(np.int32),
            rng.integers(0, 11, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate(
        *(jnp.asarray(x) for x in args), 10471, n_rows=n, interpret=True))
    want = P.reference_sums(*args, 10471)
    assert np.array_equal(got, want)


def test_q1_limb_reconstruction():
    sums = np.arange(P.GROUPS * P.PAYLOADS, dtype=np.int64).reshape(
        P.GROUPS, P.PAYLOADS)
    r = P.q1_results_from_sums(sums)
    assert r["sum_disc_price"][0] == 4 * (1 << 16) + 5
    assert r["count"][1] == sums[1, 3]


def test_q1_fused_aggregate_v3_interpret():
    n = 8192
    rng = np.random.default_rng(5)
    args = [rng.integers(100, 5100, n).astype(np.int32),
            rng.integers(90000, 520000000, n).astype(np.int32),
            rng.integers(0, 11, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate_v3(
        *(jnp.asarray(x) for x in args), 10471, n_rows=n,
        interpret=True))
    want = P.reference_sums(*args, 10471)
    assert np.array_equal(got, want)


def test_q1_v3_extreme_bounds_interpret():
    # contract edges: disc=100 (m=0), tax=8, ext near 2^31, qty large
    n = 2048
    rng = np.random.default_rng(6)
    args = [rng.integers(0, 1 << 20, n).astype(np.int32),
            rng.integers(0, (1 << 31) - 1, n).astype(np.int32),
            rng.integers(0, 101, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate_v3(
        *(jnp.asarray(x) for x in args), 9000, n_rows=n,
        interpret=True))
    want = P.reference_sums(*args, 9000)
    assert np.array_equal(got, want)


def test_q1_fused_aggregate_v4_interpret():
    n = 8192
    rng = np.random.default_rng(7)
    args = [rng.integers(100, 5100, n).astype(np.int32),
            rng.integers(90000, 520000000, n).astype(np.int32),
            rng.integers(0, 11, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate_v4(
        *(jnp.asarray(x) for x in args), 10471, n_rows=n,
        interpret=True))
    want = P.reference_sums(*args, 10471)
    assert np.array_equal(got, want)


def test_q1_v4_extreme_bounds_interpret():
    # contract edges: disc=100 (m=0), tax=8, ext near 2^31, qty large
    n = 2048
    rng = np.random.default_rng(8)
    args = [rng.integers(0, 1 << 20, n).astype(np.int32),
            rng.integers(0, (1 << 31) - 1, n).astype(np.int32),
            rng.integers(0, 101, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate_v4(
        *(jnp.asarray(x) for x in args), 9000, n_rows=n,
        interpret=True))
    want = P.reference_sums(*args, 9000)
    assert np.array_equal(got, want)


def test_q1_fused_aggregate_v7_interpret():
    n = 8192
    rng = np.random.default_rng(9)
    args = [rng.integers(100, 5100, n).astype(np.int32),
            rng.integers(90000, 520000000, n).astype(np.int32),
            rng.integers(0, 11, n).astype(np.int32),
            rng.integers(0, 9, n).astype(np.int32),
            rng.integers(8000, 10600, n).astype(np.int32),
            rng.integers(0, 6, n).astype(np.int32)]
    got = np.asarray(P.q1_fused_aggregate_v7(
        *(jnp.asarray(x) for x in args), 10471, n_rows=n,
        interpret=True))
    want = P.reference_sums(*args, 10471)
    assert np.array_equal(got, want)


def test_q6_fused_filter_sum_interpret():
    n = 64 * 1024
    rng = np.random.default_rng(9)
    qty = rng.integers(1, 51, n).astype(np.int32)
    ext = rng.integers(90000, 520000000, n).astype(np.int32)
    dc = rng.integers(0, 11, n).astype(np.int32)
    sd = rng.integers(8000, 10600, n).astype(np.int32)
    got = int(P.q6_fused_filter_sum(
        jnp.asarray(qty), jnp.asarray(ext), jnp.asarray(dc),
        jnp.asarray(sd), 8766, n_rows=n, interpret=True))
    assert got == P.q6_reference(qty, ext, dc, sd, 8766)


def test_q6_spill_cadence_exact():
    # enough steps to force multiple limb spills at max-magnitude rows
    n = 256 * 1024
    qty = np.zeros(n, np.int32)               # always < 24
    ext = np.full(n, (1 << 31) - 1, np.int32)
    dc = np.full(n, 7, np.int32)
    sd = np.full(n, 8800, np.int32)
    got = int(P.q6_fused_filter_sum(
        jnp.asarray(qty), jnp.asarray(ext), jnp.asarray(dc),
        jnp.asarray(sd), 8766, n_rows=n, interpret=True,
        tile_sublanes=64))
    assert got == P.q6_reference(qty, ext, dc, sd, 8766)
