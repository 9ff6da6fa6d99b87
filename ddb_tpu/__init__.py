"""ddb_tpu: a TPU-native vectorized query-execution framework.

Built from scratch against the capability surface of the reference engine
(a DuckDB fork; see SURVEY.md): columnar execution over fixed-shape jnp
batches, sort/segment-based aggregation and joins, multi-key vectorized
sorting, SQL frontend, and mesh-sharded distributed execution via
shard_map + ICI collectives.
"""

import jax

# Exact int64 arithmetic (decimals, sums) requires x64.
jax.config.update("jax_enable_x64", True)

from .api import Connection, connect  # noqa: E402,F401

__version__ = "0.1.0"
