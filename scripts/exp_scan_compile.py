#!/usr/bin/env python
"""Which primitive blows up the remote compiler in the join graph?
Times COMPILE of candidate sub-graphs at probe scale (7.3M)."""
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.lax as lax
    import jax.numpy as jnp

    n = 7 * 1024 * 1024
    rng = np.random.default_rng(0)
    flag = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    v1 = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v2 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    v3 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        _ = np.asarray(jax.jit(fn)(*args))
        print(f"{name:24s} compile+run {time.perf_counter()-t0:7.1f}s",
              flush=True)

    # 1. builtin cummax
    timed("cummax", lambda a: lax.cummax(a).sum(), v1)

    # 2. associative_scan, single carrier
    timed("ascan_1", lambda a: lax.associative_scan(
        jnp.maximum, a).sum(), v1)

    # 3. associative_scan, 4-tuple custom op (the _forward_fill shape)
    def ff(f, a, b, c):
        def op(x, y):
            fx, ax, bx, cx = x
            fy, ay, by, cy = y
            return (fx | fy, jnp.where(fy, ay, ax),
                    jnp.where(fy, by, bx), jnp.where(fy, cy, cx))
        r = lax.associative_scan(op, (f, a, b, c))
        return r[1].sum() + r[2].sum().astype(jnp.int64) \
            + r[3].sum().astype(jnp.int64)
    timed("ascan_4tuple", ff, flag, v1, v2, v3)

    # 4. 6-operand sort
    timed("sort6", lambda a, b, c: lax.sort(
        [a, b.astype(jnp.int64), c, a, b, c], num_keys=2)[2].sum(),
        v1, v2, v3)


if __name__ == "__main__":
    main()
