"""Distributed operator tests on a virtual 8-device CPU mesh
(the reference has no multi-node tests — SURVEY.md section 4; this is the
TPU-native equivalent of its intraquery parallelism tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh(eight_devices):
    from ddb_tpu.parallel.mesh import make_mesh
    return make_mesh(8)


def test_dist_groupby_sum(mesh):
    from ddb_tpu.parallel.dist import dist_groupby_sum
    rng = np.random.default_rng(0)
    n = 8 * 256
    keys = rng.integers(0, 37, n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int64)
    valid = np.ones(n, dtype=bool)
    gk, gs, gc, gv, of = dist_groupby_sum(
        mesh, jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(valid),
        group_cap=128, exchange_cap=64)
    assert int(jnp.sum(of)) == 0
    gk = np.asarray(gk).reshape(-1)
    gs = np.asarray(gs).reshape(-1)
    gc = np.asarray(gc).reshape(-1)
    gv = np.asarray(gv).reshape(-1)
    got = {}
    for k, s, c, v in zip(gk, gs, gc, gv):
        if v:
            assert k not in got, "key appeared on two shards"
            got[int(k)] = (int(s), int(c))
    import collections
    want_s = collections.defaultdict(int)
    want_c = collections.defaultdict(int)
    for k, v in zip(keys, vals):
        want_s[int(k)] += int(v)
        want_c[int(k)] += 1
    assert got == {k: (want_s[k], want_c[k]) for k in want_s}


def test_dist_groupby_skew(mesh):
    """90% of rows hit one key — local pre-agg must absorb the skew."""
    from ddb_tpu.parallel.dist import dist_groupby_sum
    rng = np.random.default_rng(1)
    n = 8 * 512
    keys = np.where(rng.random(n) < 0.9, 7,
                    rng.integers(0, 1000, n)).astype(np.int64)
    vals = np.ones(n, dtype=np.int64)
    gk, gs, gc, gv, of = dist_groupby_sum(
        mesh, jnp.asarray(keys), jnp.asarray(vals),
        jnp.asarray(np.ones(n, dtype=bool)),
        group_cap=1024, exchange_cap=600)
    assert int(jnp.sum(of)) == 0
    gk = np.asarray(gk).reshape(-1)
    gs = np.asarray(gs).reshape(-1)
    gv = np.asarray(gv).reshape(-1)
    hot = {int(k): int(s) for k, s, v in zip(gk, gs, gv) if v}[7]
    assert hot == int((keys == 7).sum())


def test_dist_join_groupby(mesh):
    from ddb_tpu.parallel.dist import dist_join_groupby_step
    rng = np.random.default_rng(2)
    n = 8 * 128
    lk = rng.integers(0, 50, n).astype(np.int64)
    lv = rng.integers(1, 10, n).astype(np.int64)
    rk = np.arange(50, dtype=np.int64)
    rv = rng.integers(1, 5, 50).astype(np.int64)
    rk_pad = np.zeros(n, dtype=np.int64)
    rv_pad = np.zeros(n, dtype=np.int64)
    rvalid = np.zeros(n, dtype=bool)
    rk_pad[:50] = rk
    rv_pad[:50] = rv
    rvalid[:50] = True
    gk, gs, gc, gv = dist_join_groupby_step(
        mesh,
        lkey=jnp.asarray(lk), lval=jnp.asarray(lv),
        lvalid=jnp.asarray(np.ones(n, dtype=bool)),
        rkey=jnp.asarray(rk_pad), rval=jnp.asarray(rv_pad),
        rvalid=jnp.asarray(rvalid),
        exchange_cap=512, out_cap=4096, group_cap=256)
    gk = np.asarray(gk).reshape(-1)
    gs = np.asarray(gs).reshape(-1)
    gv = np.asarray(gv).reshape(-1)
    got = {int(k): int(s) for k, s, v in zip(gk, gs, gv) if v}
    import collections
    want = collections.defaultdict(int)
    rmap = dict(zip(rk.tolist(), rv.tolist()))
    for k, v in zip(lk, lv):
        want[int(k)] += int(v) * rmap[int(k)]
    assert got == dict(want)


def test_two_level_exchange(eight_devices):
    """Hierarchical (hosts x chips) shuffle: ICI within host, DCN
    across hosts (SURVEY section 7 step 8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ddb_tpu.parallel.mesh import shard_map
    from ddb_tpu.parallel.exchange import all_to_all_exchange_2level

    n_hosts, n_chips = 2, 4
    devs = np.array(jax.devices()[:8]).reshape(n_hosts, n_chips)
    mesh = Mesh(devs, ("h", "d"))
    n_global = 8 * 64
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1000, n_global)
                       .astype(np.int64))
    pids = jnp.asarray(rng.integers(0, 8, n_global).astype(np.int32))
    ones = jnp.asarray(np.ones(n_global, dtype=bool))
    sh = NamedSharding(mesh, P(("h", "d")))
    vals, pids, ones = (jax.device_put(x, sh)
                        for x in (vals, pids, ones))

    cap = 64

    def kern(v, p, ok):
        out, valid, ovf = all_to_all_exchange_2level(
            [v, p.astype(jnp.int64)], ok, p, n_hosts, n_chips, cap)
        # every received row's pid must equal MY global shard id
        me = (jax.lax.axis_index("h") * n_chips
              + jax.lax.axis_index("d")).astype(jnp.int64)
        good = jnp.where(valid, (out[1] == me).astype(jnp.int32),
                         1).all()
        s = jnp.where(valid, out[0], 0).sum()
        c = valid.astype(jnp.int32).sum()
        return (s[None], c[None], good[None], ovf[None])

    fn = shard_map(kern, mesh=mesh,
                   in_specs=(P(("h", "d")), P(("h", "d")),
                             P(("h", "d"))),
                   out_specs=P(("h", "d")))
    s, c, good, ovf = jax.jit(fn)(vals, pids, ones)
    assert int(jnp.sum(ovf)) == 0
    assert bool(jnp.all(good))
    assert int(jnp.sum(c)) == n_global           # every row arrived
    assert int(jnp.sum(s)) == int(np.sum(np.asarray(vals)))
