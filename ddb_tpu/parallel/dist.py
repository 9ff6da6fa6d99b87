"""Distributed relational operators over a device mesh.

Composes the local kernels (ops/aggregate.py, ops/join.py) with the
hash-partition exchange (parallel/exchange.py) inside shard_map — the TPU
analog of the reference's partitioned-sink + per-partition-finalize design
(reference: src/execution/radix_partitioned_hashtable.cpp finalize,
physical_hash_join.cpp:542 HashJoinFinalizeEvent).

Pattern per operator:
  groupby:  local pre-aggregate (absorbs skew)  -> exchange by key hash
            -> final local aggregate per shard
  join:     exchange both sides by key hash -> local sorted-probe join
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import aggregate as agg_ops
from ..ops import join as join_ops
from .exchange import exchange_by_key
from .mesh import AXIS, make_mesh, shard_map


def dist_groupby_sum(mesh, keys, vals, valid, *, group_cap: int,
                     exchange_cap: int):
    """Distributed SELECT key, sum(val), count(*) GROUP BY key.

    keys/vals: [n_global] int64 arrays sharded over mesh axis d;
    valid: [n_global] bool.  Returns per-shard dense group tables
    (gkey, gsum, gcount, gvalid) each [n_shards, group_cap] stacked."""
    n_shards = mesh.shape[AXIS]

    def shard_fn(keys, vals, valid):
        k = keys.reshape(-1)
        v = vals.reshape(-1)
        sel = valid.reshape(-1)
        # 1. local pre-aggregate (sort+segment) — absorbs key skew
        key_ops = [k]
        payloads = [agg_ops.AggPayload("sum", v, None),
                    agg_ops.AggPayload("count_star", None, None)]
        cap = k.shape[0]
        gcols, aggs, gsel, ng = agg_ops.group_and_aggregate(
            key_ops, [(k, None)], payloads, sel, cap)
        gk = gcols[0][0]
        gsum = aggs[0][0]
        gcnt = aggs[1][0]
        # 2. exchange partial groups by key hash
        (ek, esum, ecnt), evalid, overflow = exchange_by_key(
            gk, [gk, gsum, gcnt], gsel, n_shards, exchange_cap)
        # 3. final aggregate of partials
        payloads2 = [agg_ops.AggPayload("sum", esum, None),
                     agg_ops.AggPayload("sum", ecnt, None)]
        gcols2, aggs2, gsel2, ng2 = agg_ops.group_and_aggregate(
            [ek], [(ek, None)], payloads2, evalid, group_cap)
        out_k = gcols2[0][0]
        out_sum = aggs2[0][0]
        out_cnt = aggs2[1][0]
        return (out_k[None], out_sum[None], out_cnt[None], gsel2[None],
                overflow[None])

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)))
    return fn(keys, vals, valid)


def dist_join_inner(mesh, lkey, lval, lvalid, rkey, rval, rvalid, *,
                    exchange_cap: int, out_cap: int):
    """Distributed inner equi-join: returns per-shard matched pairs
    (lkey, lval, rval, valid) with fixed per-shard output capacity."""
    n_shards = mesh.shape[AXIS]

    def shard_fn(lkey, lval, lvalid, rkey, rval, rvalid):
        lk, lv, lsel = lkey.reshape(-1), lval.reshape(-1), lvalid.reshape(-1)
        rk, rv, rsel = rkey.reshape(-1), rval.reshape(-1), rvalid.reshape(-1)
        (elk, elv), elsel, lof = exchange_by_key(
            lk, [lk, lv], lsel, n_shards, exchange_cap)
        (erk, erv), ersel, rof = exchange_by_key(
            rk, [rk, rv], rsel, n_shards, exchange_cap)
        bt = join_ops.build(erk, None, ersel)
        lo, cnt = join_ops.probe_ranges(bt, elk, None, elsel)
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]
        return (elk[pi][None], elv[pi][None], erv[brow][None],
                valid[None], (lof + rof)[None])

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(AXIS),) * 6,
                   out_specs=(P(AXIS),) * 5)
    return fn(lkey, lval, lvalid, rkey, rval, rvalid)


def dist_join_groupby_step(mesh, *, lkey, lval, lvalid, rkey, rval, rvalid,
                           exchange_cap: int, out_cap: int, group_cap: int):
    """A full distributed pipeline step: join two sharded relations on key,
    then group the join result by key and sum lval*rval — the shape of
    TPC-H Q3-style join+aggregate pipelines.  Jittable end-to-end."""
    n_shards = mesh.shape[AXIS]

    def shard_fn(lkey, lval, lvalid, rkey, rval, rvalid):
        lk, lv, lsel = lkey.reshape(-1), lval.reshape(-1), lvalid.reshape(-1)
        rk, rv, rsel = rkey.reshape(-1), rval.reshape(-1), rvalid.reshape(-1)
        (elk, elv), elsel, _ = exchange_by_key(
            lk, [lk, lv], lsel, n_shards, exchange_cap)
        (erk, erv), ersel, _ = exchange_by_key(
            rk, [rk, rv], rsel, n_shards, exchange_cap)
        bt = join_ops.build(erk, None, ersel)
        lo, cnt = join_ops.probe_ranges(bt, elk, None, elsel)
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]
        jk = elk[pi]
        jprod = elv[pi] * erv[brow]
        # keys are already co-partitioned: local groupby is final
        payloads = [agg_ops.AggPayload("sum", jprod, None),
                    agg_ops.AggPayload("count_star", None, None)]
        gcols, aggs, gsel, ng = agg_ops.group_and_aggregate(
            [jk], [(jk, None)], payloads, valid, group_cap)
        return (gcols[0][0][None], aggs[0][0][None], aggs[1][0][None],
                gsel[None])

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(AXIS),) * 6,
                   out_specs=(P(AXIS),) * 4)
    return fn(lkey, lval, lvalid, rkey, rval, rvalid)
