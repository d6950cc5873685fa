"""Multi-host initialization (SURVEY.md §2.3: jax.distributed + ICI/DCN).

Single-process multi-device needs nothing: ``HPF(mesh=...)`` over
``jax.devices()``.  Multi-host SPMD (one process per host, e.g. a v5e-16
pod slice) needs ``jax.distributed.initialize`` before first device use;
this module wraps that and builds the global mesh.

Usage (same script on every host)::

    from hpfrec_tpu.parallel import distributed
    mesh = distributed.initialize()          # env-driven (TPU pods: automatic)
    model = HPF(k=30, mesh=mesh, shard_tables=True)
    model.fit(counts_df)                     # same data on every host

Every host must run identical code with identical data; the blocked /
ELL layouts are deterministic functions of the input, so device_put of
the globally-sharded arrays places only each host's addressable shards.
"""

from __future__ import annotations

from typing import Optional

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op if already initialized or single
    process) and return the global 1-D data mesh over all devices."""
    import jax

    if num_processes is None and coordinator_address is None:
        # TPU pods: jax.distributed.initialize() autodetects from the
        # metadata server; elsewhere, a single process needs nothing.
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh(jax.devices())
