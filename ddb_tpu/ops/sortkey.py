"""Order-preserving key encoding for sort/group/join kernels.

TPU-native analog of the reference's byte-comparable sort-key encoding
(reference: src/common/sorting/sort.cpp:16-75 create_sort_key).  Every key
column is encoded into operands whose unsigned/signed order equals the SQL
order (including NULL placement and ASC/DESC), so a single multi-operand
`lax.sort(..., num_keys=k)` realizes any ORDER BY — fully vectorized, no
comparator interpretation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..types import DataType, TypeId


def encode_key(data, nulls, dtype: DataType, *, desc: bool = False,
               nulls_last: bool = True):
    """Returns list of operand arrays (most-significant first) whose
    lexicographic ascending order == requested SQL order."""
    ops = []
    cap = data.shape[0]
    # null placement operand: 0 sorts before 1
    if nulls is not None:
        nl = nulls_last != desc  # after desc flip, where do nulls go
        nullkey = jnp.where(nulls, np.int32(1 if nulls_last else 0),
                            np.int32(0 if nulls_last else 1))
        ops.append(nullkey)
    v = _orderable(data, dtype)
    if desc:
        v = _invert(v)
    if nulls is not None:
        # neutralize payload for null rows so they compare equal
        v = jnp.where(nulls, jnp.zeros_like(v), v)
    ops.append(v)
    return ops


def _orderable(data, dtype: DataType):
    """Map to a dtype where the natural (signed) order == value order."""
    if dtype.id in (TypeId.FLOAT, TypeId.DOUBLE):
        # IEEE trick for SIGNED comparisons: positive floats' bit patterns
        # already order correctly as signed ints; negative floats keep the
        # sign bit (staying below positives) but need their magnitude bits
        # flipped so more-negative sorts lower
        if data.dtype == jnp.float32:
            bits = jax_bitcast(data, jnp.int32)
            return jnp.where(bits < 0, bits ^ np.int32(2**31 - 1), bits)
        bits = jax_bitcast(data.astype(jnp.float64), jnp.int64)
        return jnp.where(bits < 0, bits ^ np.int64(2**63 - 1), bits)
    if data.dtype == jnp.bool_:
        return data.astype(jnp.int32)
    return data  # signed ints/dates/decimals order naturally


def _invert(v):
    """Reverse order: bitwise-not preserves total order reversal for ints."""
    return ~v


def jax_bitcast(x, dt):
    import jax.lax as lax
    return lax.bitcast_convert_type(x, dt)


def sentinel_last(dtype) -> int:
    """A value sorting after all real values of an int operand dtype."""
    return np.iinfo(np.dtype(dtype)).max
