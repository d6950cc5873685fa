"""Benchmark: CAVI nonzeros/sec/chip on synthetic TasteProfile-like data.

Prints ONE JSON line:
  {"metric": "nonzeros_per_sec_per_chip", "value": N, "unit": "nnz/s",
   "vs_baseline": N / 1.85e9}

Baseline: the reference's implied aggregate throughput on the MillionSong
TasteProfile run — 38.7M nonzeros x 110 iterations / 2298 s ≈ 1.85e9
nonzero-updates/s on a 24-core Skylake at k=50 (BASELINE.md).  We report
per-chip throughput of the fused phi/segment-sum CAVI iteration at the same
k on data with a power-law item popularity profile like real count data.
"""

import json
import os
import time

import numpy as np


def synth_powerlaw(nU, nI, nnz, seed=0, dtype=np.float32):
    """User-sorted COO with Zipf-ish item popularity (matches the skewed
    degree profile of TasteProfile/MovieLens better than uniform)."""
    rng = np.random.default_rng(seed)
    iu = np.sort(rng.integers(0, nU, nnz)).astype(np.int32)
    # item popularity ~ 1/rank
    ranks = np.arange(1, nI + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    ii = rng.choice(nI, size=nnz, p=p).astype(np.int32)
    y = (rng.poisson(2.0, nnz) + 1).astype(dtype)
    return y, iu, ii


def main():
    nU = int(os.environ.get("BENCH_NUSERS", 200_000))
    nI = int(os.environ.get("BENCH_NITEMS", 40_000))
    nnz = int(os.environ.get("BENCH_NNZ", 10_000_000))
    k = int(os.environ.get("BENCH_K", 50))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    import jax
    import jax.numpy as jnp

    from hpfrec_tpu.models.state import Hyperparams, initialize_state
    from hpfrec_tpu.ops.cavi import BlockedCOO, run_cavi_block
    from hpfrec_tpu.utils.data import block_coo

    hp = Hyperparams(k=k)
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    blk = block_coo(y, iu, ii)
    data = BlockedCOO(jnp.asarray(blk.y), jnp.asarray(blk.ix_u), jnp.asarray(blk.ix_i))
    state = initialize_state(nU, nI, hp, 123)

    # warmup/compile
    state = run_cavi_block(state, data, jnp.asarray(2, jnp.int32), hp)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    state = run_cavi_block(state, data, jnp.asarray(iters, jnp.int32), hp)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    # correctness guard: the timed state must be finite and positive
    theta = np.asarray(state.G_shp) / np.asarray(state.G_rte)
    assert np.isfinite(theta).all() and (theta >= 0).all(), "bench produced invalid state"

    value = nnz * iters / dt
    baseline = 1.85e9
    print(json.dumps({
        "metric": "nonzeros_per_sec_per_chip",
        "value": value,
        "unit": "nnz/s",
        "vs_baseline": value / baseline,
    }))


if __name__ == "__main__":
    main()
