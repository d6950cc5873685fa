"""Same-session A/B of the ELL CAVI step variants at a given scale.

Round-4 engine work: ``run_cavi_block_ell`` switched from re-deriving the
exp tables + Beta colsum every iteration (``legacy``, the round-3 step —
reconstructed here from the still-exported single-step ``cavi_step_ell``)
to carrying them across iterations (``carried``,
``cavi_step_ell_carried``).  Session throughput drifts +-15% here, so the
two variants are timed back-to-back in ONE process with paired
differentials, alternating the order.

Run (real chip):  python scripts/measure_step_variants.py
Env: BENCH_SCALE / BENCH_NUSERS / ... (same knobs as bench.py),
     BENCH_REPEATS (default 4 pairs per variant).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import SCALES, synth_powerlaw  # noqa: E402


def main():
    scale = os.environ.get("BENCH_SCALE", "millionsong")
    cfg = SCALES[scale]
    nU = int(os.environ.get("BENCH_NUSERS", cfg["nU"]))
    nI = int(os.environ.get("BENCH_NITEMS", cfg["nI"]))
    nnz = int(os.environ.get("BENCH_NNZ", cfg["nnz"]))
    k = int(os.environ.get("BENCH_K", cfg["k"]))
    iters = int(os.environ.get("BENCH_ITERS", cfg["iters"]))
    repeats = int(os.environ.get("BENCH_REPEATS", 4))

    import jax
    import jax.numpy as jnp

    from hpfrec_tpu.models.hpf import _dispatch_cap_from_samples
    from hpfrec_tpu.models.state import Hyperparams, initialize_state
    from hpfrec_tpu.ops.ell import (build_ell, cavi_step_ell, device_ell,
                                    gather_table_dtype, layout_slots,
                                    plan_col_tiling, run_cavi_block_ell)
    from hpfrec_tpu.utils.data import build_csr
    from hpfrec_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    hp = Hyperparams(k=k)
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    gd = gather_table_dtype(max(nU, nI), k)
    g_item = 2 if gd is not None else 4
    indptr_u, ind_u, dat_u = build_csr(iu, ii, y, nU, nI)
    indptr_i, ind_i, dat_i = build_csr(ii, iu, y, nI, nU)
    ell_u = device_ell(build_ell(indptr_u, ind_u, dat_u, nU,
                                 col_chunk_rows=plan_col_tiling(nI, k, g_item),
                                 n_cols=nI))
    ell_i = device_ell(build_ell(indptr_i, ind_i, dat_i, nI,
                                 col_chunk_rows=plan_col_tiling(nU, k, g_item),
                                 n_cols=nU))
    slots = layout_slots(ell_u) + layout_slots(ell_i)

    def legacy_block(state, lu, li, niter, hp, gather_dtype=None):
        def body(_, st):
            return cavi_step_ell(st, lu, li, hp, gather_dtype=gather_dtype)
        return jax.lax.fori_loop(0, niter, body, state)

    jit_kw = dict(static_argnames=("hp", "gather_dtype"))
    runners = {
        "carried": jax.jit(
            lambda st, n: run_cavi_block_ell(st, ell_u, ell_i, n, hp=hp,
                                             gather_dtype=gd)),
        "legacy": jax.jit(
            lambda st, n: legacy_block(st, ell_u, ell_i, n, hp, gd)),
    }
    del jit_kw

    budget = float(os.environ.get("HPFREC_TPU_DISPATCH_BUDGET_S", "30"))
    caps = {}
    for name, run in runners.items():
        st = run(initialize_state(nU, nI, hp, 123), jnp.asarray(2, jnp.int32))
        float(jnp.sum(st.k_rte))  # compile + warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            st = run(st, jnp.asarray(1, jnp.int32))
            float(jnp.sum(st.k_rte))
            samples.append(max(time.perf_counter() - t0, 1e-6))
        caps[name] = _dispatch_cap_from_samples(samples, budget)
        print("# %s compiled; cap=%d iters/dispatch" % (name, caps[name]),
              file=sys.stderr)

    def timed(name, n):
        st = initialize_state(nU, nI, hp, 123)
        run, cap = runners[name], caps[name]
        t0 = time.perf_counter()
        done = 0
        while done < n:
            m = min(cap, n - done)
            st = run(st, jnp.asarray(m, jnp.int32))
            done += m
        checksum = float(jnp.sum(st.k_rte))
        assert np.isfinite(checksum)
        return time.perf_counter() - t0, checksum

    # trajectory identity check: same checksum after `iters` iterations
    _, c_new = timed("carried", 4)
    _, c_old = timed("legacy", 4)
    rel = abs(c_new - c_old) / abs(c_old)
    print("# checksum carried=%.10g legacy=%.10g rel=%.2e"
          % (c_new, c_old, rel), file=sys.stderr)

    results = {name: [] for name in runners}
    for r in range(repeats):
        for name in (("carried", "legacy") if r % 2 == 0
                     else ("legacy", "carried")):
            ts, _ = timed(name, 2)
            tb, _ = timed(name, 2 + iters)
            results[name].append((tb - ts) / iters)
    for name, pairs in results.items():
        med = float(np.median(pairs))
        print(json.dumps({
            "variant": name,
            "iter_s": round(med, 4),
            "mnnz_per_s": round(nnz / med / 1e6, 1),
            "slots_per_iter": slots,
            "implied_mslots_per_s": round(slots / med / 1e6, 1),
            "pairs_iter_s": [round(p, 4) for p in pairs],
            "config": "%s nU=%d nI=%d nnz=%d k=%d" % (scale, nU, nI, nnz, k),
        }))


if __name__ == "__main__":
    main()
