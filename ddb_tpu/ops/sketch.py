"""Approximate aggregation sketches: HyperLogLog + quantile digest.

Parity targets: the reference's HyperLogLog behind
approx_count_distinct (reference: third_party/hyperloglog/,
src/core_functions/aggregate/distributive/approx_count.cpp) and the
t-digest behind approx_quantile (third_party/tdigest/).

TPU-native design notes:
  * HLL registers build with the engine's scatter-free substrate: sort
    rows by register index, segmented max of ranks, then ONE small
    scatter into the dense 2^p register file (16K elements — scatter at
    this size costs microseconds; the no-scatter rule is about
    million-row operands).
  * registers are MERGEABLE by elementwise max — the distributed
    executor can psum-style combine per-shard sketches over ICI
    instead of re-exchanging rows.
  * the quantile digest is a weighted compressed CDF (sorted centroid/
    weight pairs, KLL-style), mergeable by concat + re-compress; exact
    sorts build it since sorting IS this engine's cheapest primitive.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from . import hashing

HLL_P = 14                       # 2^14 = 16384 registers (reference: 2^14)
HLL_M = 1 << HLL_P


def hll_registers(values: jax.Array, sel: jax.Array,
                  nulls=None) -> jax.Array:
    """Dense (HLL_M,) int32 register file for the live values."""
    live = sel if nulls is None else (sel & ~nulls)
    h = hashing.hash64(values.astype(jnp.int64))
    bucket = (h >> jnp.uint64(64 - HLL_P)).astype(jnp.int32)
    rest = (h << jnp.uint64(HLL_P)) | jnp.uint64(1)   # sentinel stops clz
    rank = (lax.clz(rest.astype(jnp.int64)) + 1).astype(jnp.int32)
    rank = jnp.where(live, rank, 0)
    bucket = jnp.where(live, bucket, HLL_M)           # dead rows sort last
    # grouped max by bucket: sort + segmented max + one 16K scatter
    sb, sr = lax.sort([bucket, rank], num_keys=1, is_stable=False)
    from .aggregate import _seg_minmax_scan
    boundary = jnp.concatenate([jnp.ones(1, dtype=bool),
                                sb[1:] != sb[:-1]])
    run_max = _seg_minmax_scan(boundary, sr, is_min=False)
    is_last = jnp.concatenate([sb[1:] != sb[:-1],
                               jnp.ones(1, dtype=bool)])
    idx = jnp.where(is_last & (sb < HLL_M), sb, HLL_M)
    regs = jnp.zeros(HLL_M + 1, jnp.int32).at[idx].max(
        jnp.where(is_last, run_max, 0))
    return regs[:HLL_M]


def hll_merge(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.maximum(a, b)


def hll_estimate(regs: jax.Array) -> jax.Array:
    """Bias-corrected cardinality estimate (Flajolet et al. 2007 with
    the small-range linear-counting correction the reference's
    implementation also applies)."""
    m = jnp.float64(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = jnp.sum(jnp.exp2(-regs.astype(jnp.float64)))
    raw = alpha * m * m / inv
    zeros = jnp.sum(regs == 0).astype(jnp.float64)
    linear = m * jnp.log(m / jnp.maximum(zeros, 1.0))
    small = raw <= 2.5 * m
    est = jnp.where(small & (zeros > 0), linear, raw)
    return jnp.round(est).astype(jnp.int64)


def hll_count_distinct(values: jax.Array, sel: jax.Array,
                       nulls=None) -> jax.Array:
    return hll_estimate(hll_registers(values, sel, nulls))


# ---------------------------------------------------------------------------
# mergeable quantile digest (KLL-style compressed CDF)
# ---------------------------------------------------------------------------

DIGEST_K = 256


def quantile_digest(values: jax.Array, sel: jax.Array, nulls=None,
                    k: int = DIGEST_K):
    """(centroids[k] float64, weights[k] float64): a compressed CDF.
    Built from a full sort (sorting is this engine's cheapest
    primitive); each centroid is the mean of an equal-count run."""
    live = sel if nulls is None else (sel & ~nulls)
    n = values.shape[0]
    big = jnp.inf
    v = jnp.where(live, values.astype(jnp.float64), big)
    (sv,) = lax.sort([v], num_keys=1)
    cnt = live.astype(jnp.int64).sum()
    # bucket of sorted position i: floor(i * k / cnt)
    pos = lax.broadcasted_iota(jnp.int64, (n,), 0)
    denom = jnp.maximum(cnt, 1)
    bucket = jnp.clip(pos * k // denom, 0, k - 1).astype(jnp.int32)
    inb = pos < cnt
    sums = jnp.zeros(k, jnp.float64).at[
        jnp.where(inb, bucket, k - 1)].add(jnp.where(inb, sv, 0.0))
    cnts = jnp.zeros(k, jnp.float64).at[
        jnp.where(inb, bucket, k - 1)].add(inb.astype(jnp.float64))
    centroids = sums / jnp.maximum(cnts, 1.0)
    return centroids, cnts


def digest_merge(c1, w1, c2, w2, k: int = DIGEST_K):
    """Merge two digests: weighted concat, sort, recompress to k."""
    c = jnp.concatenate([c1, c2])
    w = jnp.concatenate([w1, w2])
    sc, sw = lax.sort([c, w], num_keys=1)
    total = jnp.sum(sw)
    cum = jnp.cumsum(sw) - sw          # exclusive prefix weight
    bucket = jnp.clip((cum * k / jnp.maximum(total, 1.0))
                      .astype(jnp.int32), 0, k - 1)
    sums = jnp.zeros(k, jnp.float64).at[bucket].add(sc * sw)
    cnts = jnp.zeros(k, jnp.float64).at[bucket].add(sw)
    return sums / jnp.maximum(cnts, 1.0), cnts


def digest_quantile(centroids, weights, q: float) -> jax.Array:
    """Approximate q-quantile from a digest (linear interpolation over
    cumulative centroid weights)."""
    total = jnp.sum(weights)
    target = q * jnp.maximum(total - 1.0, 0.0)
    cum = jnp.cumsum(weights) - weights / 2.0
    # piecewise-linear CDF inversion without searchsorted: index =
    # count of midpoints <= target
    idx = jnp.sum((cum <= target).astype(jnp.int32)) - 1
    i0 = jnp.clip(idx, 0, centroids.shape[0] - 1)
    i1 = jnp.clip(idx + 1, 0, centroids.shape[0] - 1)
    c0, c1 = centroids[i0], centroids[i1]
    m0, m1 = cum[i0], cum[i1]
    frac = jnp.where(m1 > m0, (target - m0) / jnp.maximum(m1 - m0,
                                                          1e-300), 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)
    return c0 + (c1 - c0) * frac
