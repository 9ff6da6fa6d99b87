"""Differential tests for the merge-probe join kernels (ops/join.py)
against brute-force numpy semantics.

These kernels replace the reference's JoinHashTable
(reference: src/execution/join_hashtable.cpp probe :250-390) with
sort + masked-cummax forward fills; the cummax rewrite (round 5) must
preserve exact (lo, count) semantics including NULL keys, masked rows
and empty ranges.
"""

import operator

import jax.numpy as jnp
import numpy as np
import pytest

from ddb_tpu.ops import join as J


@pytest.mark.parametrize("seed", [7, 11, 23])
def test_probe_range_expand_differential(seed):
    rng = np.random.default_rng(seed)
    nb, npr = rng.integers(3, 200, 2)
    bk = rng.integers(0, 30, nb).astype(np.int64)
    bsel = rng.random(nb) > 0.2
    bnull = rng.random(nb) > 0.8
    pk = rng.integers(0, 30, npr).astype(np.int64)
    psel = rng.random(npr) > 0.2
    pnull = rng.random(npr) > 0.8
    bt = J.build(jnp.asarray(bk), jnp.asarray(bnull), jnp.asarray(bsel))
    lo, cnt = J.probe_ranges(bt, jnp.asarray(pk), jnp.asarray(pnull),
                             jnp.asarray(psel))
    lo, cnt = np.asarray(lo), np.asarray(cnt)
    skey = np.asarray(bt.skey)
    for i in range(npr):
        if not psel[i] or pnull[i]:
            assert cnt[i] == 0
            continue
        exp = int(((bk == pk[i]) & bsel & ~bnull).sum())
        assert cnt[i] == exp
        if exp:
            assert (skey[lo[i]:lo[i] + exp] == pk[i]).all()

    ops = {"<": operator.lt, "<=": operator.le,
           ">": operator.gt, ">=": operator.ge}
    for op, f in ops.items():
        lo2, cnt2 = J.range_probe(bt, jnp.asarray(pk), jnp.asarray(pnull),
                                  jnp.asarray(psel), op)
        cnt2 = np.asarray(cnt2)
        for i in range(npr):
            if not psel[i] or pnull[i]:
                continue
            exp = int((f(pk[i], bk) & bsel & ~bnull).sum())
            assert cnt2[i] == exp

    total = int(cnt.sum())
    cap = max(total + 3, 8)
    pi, bpos, valid = J.expand(jnp.asarray(lo), jnp.asarray(cnt), cap)
    pi, bpos, valid = np.asarray(pi), np.asarray(bpos), np.asarray(valid)
    assert valid.sum() == total
    pairs = {(int(pi[j]), int(bpos[j])) for j in range(cap) if valid[j]}
    exp_pairs = {(i, s) for i in range(npr)
                 for s in range(lo[i], lo[i] + cnt[i])}
    assert pairs == exp_pairs


@pytest.mark.parametrize("seed", [3, 19])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_differential(seed, strict):
    rng = np.random.default_rng(seed)
    nb, npr = rng.integers(3, 150, 2)
    rk = rng.integers(0, 10, nb).astype(np.int64)
    rt = rng.integers(0, 50, nb).astype(np.int64)
    rlive = rng.random(nb) > 0.2
    lk = rng.integers(0, 10, npr).astype(np.int64)
    lt = rng.integers(0, 50, npr).astype(np.int64)
    llive = rng.random(npr) > 0.2
    bt, lo, found = J.asof_probe(
        jnp.asarray(rk), jnp.asarray(rt), jnp.asarray(rlive),
        jnp.asarray(lk), jnp.asarray(lt), jnp.asarray(llive), strict)
    lo, found = np.asarray(lo), np.asarray(found)
    srow = np.asarray(bt.srow)
    for i in range(npr):
        if not llive[i]:
            assert not found[i]
            continue
        mask = rlive & (rk == lk[i]) & \
            ((rt < lt[i]) if strict else (rt <= lt[i]))
        if not mask.any():
            assert not found[i]
        else:
            assert found[i]
            cand = np.where(mask)[0]
            best = cand[np.argmax(rt[cand])]
            got = srow[lo[i]]
            assert rt[got] == rt[best] and rk[got] == lk[i]
