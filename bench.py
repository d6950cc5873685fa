"""Benchmark: CAVI nonzeros/sec/chip on synthetic TasteProfile-like data.

Prints ONE JSON line:
  {"metric": "nonzeros_per_sec_per_chip", "value": N, "unit": "nnz/s",
   "vs_baseline": N / 1.85e6}

Baseline: the reference's aggregate throughput on the MillionSong
TasteProfile run — 38.7M nonzeros x 110 iterations / 2298 s ≈ 1.85e6
nonzero-updates/s on a 24-core Skylake at k=50 (BASELINE.md; note the
original BASELINE.md figure "1.85 G" was a 1000x arithmetic slip —
4.26e9 total updates over 2298 s is 1.85e6/s).

Timing method: this environment's TPU runtime acknowledges work before it
finishes, so ``block_until_ready`` under-reports.  We therefore time runs
of different iteration counts with a forced host readback and report a
differential — pure steady-state device time per iteration, with no
dispatch, transfer, or compile overhead on either side.

Statistic (round-4 hardening): session throughput drifts +-15-50%
run-to-run here, so small/big runs are measured back-to-back as PAIRS
(the drift hits both runs of a pair roughly equally) and the reported
per-iteration time is the MEDIAN of >=5 paired differentials.  The
earlier min(big) - min(small) over independent repeats let one
lucky-fast big run pair with a slow-floor small run — BENCH_r03's
134.8 Mnnz/s was a 2x inflation produced exactly that way.  As a hard
cross-check, the result is compared to the engine's own slot count: the
fused gather rate ceiling is ~204-220 M slots/s on this chip, so any
pair implying more than SOL_SLOTS_PER_S is physically impossible and is
dropped (reported in the JSON); if every pair is impossible the value is
clamped to the speed-of-light bound and flagged.
"""

import json
import os
import time

import numpy as np

# Measured fused gather+phi ceiling on this chip: flat 204-220 M slots/s
# for any 2-40 MB operand (PERFORMANCE.md).  A differential implying more
# than this rate is a timing artifact, not a measurement.
SOL_SLOTS_PER_S = 230e6


def synth_powerlaw(nU, nI, nnz, seed=0, dtype=np.float32):
    """User-sorted COO with Zipf-ish item popularity (matches the skewed
    degree profile of TasteProfile/MovieLens better than uniform)."""
    rng = np.random.default_rng(seed)
    iu = np.sort(rng.integers(0, nU, nnz)).astype(np.int32)
    ranks = np.arange(1, nI + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    ii = rng.choice(nI, size=nnz, p=p).astype(np.int32)
    y = (rng.poisson(2.0, nnz) + 1).astype(dtype)
    return y, iu, ii


def warm_and_calibrate(runner, state, budget):
    """Compile+warm ``runner`` with one 2-iteration dispatch, then time two
    compile-free single iterations (forced readback) and return the
    iterations-per-dispatch cap from the shared noise-robust rule
    (``hpf._dispatch_cap_from_samples``: max of samples + 1.5x margin).

    Shared by ``bench.py`` and ``scripts/measure_step_variants.py``; the
    in-fit twin is ``HPF._capped_runner``, which interleaves the same
    protocol with its first real iterations (it cannot afford separate
    warm-up iterations, so the loops differ — the RULE is shared)."""
    import jax.numpy as jnp

    from hpfrec_tpu.models.hpf import _dispatch_cap_from_samples

    st = runner(state, jnp.asarray(2, jnp.int32))
    float(jnp.sum(st.k_rte))  # compile + warm
    if budget <= 0:
        return 10 ** 9
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        st = runner(st, jnp.asarray(1, jnp.int32))
        float(jnp.sum(st.k_rte))
        samples.append(max(time.perf_counter() - t0, 1e-6))
    return _dispatch_cap_from_samples(samples, budget)


SCALES = {
    # headline: the reference's own MillionSong TasteProfile shape
    # (notebook cell 10: 1,019,318 users x 376,768 items, 38.7M train
    # nonzeros, k=50) — the config where the user table (204 MB f32)
    # leaves the fast-gather window, so column tiling + bfloat16 gather
    # tables are actually engaged (PERFORMANCE.md "MillionSong scale")
    # iters=60 (round-5): the paired differential's signal is iters x
    # per-iteration time against a fixed ~20 s small-run noise floor, and
    # at 20 iters the two were the same order (BENCH_r04 kept-pair spread
    # 2.8x).  60 iterations triple the signal at the same per-pair noise;
    # capped-dispatch chaining keeps every dispatch watchdog-safe.
    "millionsong": dict(nU=1_019_318, nI=376_768, nnz=38_700_000, k=50,
                        iters=60),
    # secondary: both tables inside the fast-gather window (r1 headline)
    "medium": dict(nU=200_000, nI=40_000, nnz=10_000_000, k=50, iters=30),
}


def main():
    scale = os.environ.get("BENCH_SCALE", "millionsong")
    cfg = SCALES[scale]
    nU = int(os.environ.get("BENCH_NUSERS", cfg["nU"]))
    nI = int(os.environ.get("BENCH_NITEMS", cfg["nI"]))
    nnz = int(os.environ.get("BENCH_NNZ", cfg["nnz"]))
    k = int(os.environ.get("BENCH_K", cfg["k"]))
    iters = int(os.environ.get("BENCH_ITERS", cfg["iters"]))
    engine = os.environ.get("BENCH_ENGINE", "auto")
    if engine not in ("auto", "ell", "table", "coo"):
        raise SystemExit("BENCH_ENGINE must be one of auto|ell|table|coo, "
                         "got %r" % engine)

    import contextlib

    import jax
    import jax.numpy as jnp

    from hpfrec_tpu.models.state import Hyperparams, initialize_state
    from hpfrec_tpu.utils.profiling import enable_compilation_cache

    # compile at catalog scale runs minutes through this environment's
    # remote-compile tunnel; the persistent cache makes repeat runs warm
    enable_compilation_cache()

    # Mesh honesty (round-5): this is a SINGLE-CHIP statistic.  The
    # ell/auto/coo engines jit unsharded — on a multi-device machine they
    # would land on one device while the config implies the whole machine,
    # silently reporting 1/Nth of it.  Pin them to device 0 explicitly and
    # say so in the JSON; the table engine is the one mode that spreads
    # over the mesh (its slot accounting divides the ceiling per chip).
    flags = []
    n_avail = len(jax.devices())
    pin_ctx = contextlib.nullcontext()
    if n_avail > 1 and engine != "table":
        pin_ctx = jax.default_device(jax.devices()[0])
        flags.append("%d devices present; %s engine pinned to device 0 — "
                     "single-chip statistic, not a machine measurement"
                     % (n_avail, engine))

    hp = Hyperparams(k=k)
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    prep = lambda st: st  # noqa: E731 — engine-space transform (table mode)

    slots_per_iter = None  # both E-step sides' gather slots (None: COO)
    table_ndev = 1  # devices executing in parallel (table engine only)
    if engine == "table":
        # the model-parallel engine on a mesh over the available devices
        # (on the single bench chip the ppermute ring degenerates, so this
        # measures the per-device compute path — sub-tiled fast-window
        # gathers + masked updates — not ICI exchange)
        from hpfrec_tpu.ops.ell import gather_table_dtype, layout_slots
        from hpfrec_tpu.parallel import make_mesh
        from hpfrec_tpu.parallel.table_sharded import (
            make_table_sharded_step, pad_state, permute_state,
            prepare_table_sharded)
        from hpfrec_tpu.utils.data import build_csr

        mesh = make_mesh()
        ndev = table_ndev = len(mesh.devices.ravel())
        gd = gather_table_dtype(max(nU, nI), k,
                                mode=os.environ.get("BENCH_GATHER_DTYPE", "auto"))
        g_item = 2 if gd is not None else 4
        indptr_u, ind_u, dat_u = build_csr(iu, ii, y, nU, nI)
        indptr_i, ind_i, dat_i = build_csr(ii, iu, y, nI, nU)
        se_u, se_i, plan_u, plan_i, perm_u, perm_i = prepare_table_sharded(
            indptr_u, ind_u, dat_u, indptr_i, ind_i, dat_i, nU, nI, k,
            ndev, g_item)
        nU_p, nI_p = plan_u[0], plan_i[0]
        slots_per_iter = layout_slots(se_u) + layout_slots(se_i)
        runner = make_table_sharded_step(mesh, se_u, se_i, hp, nU, nI,
                                         gather_dtype=gd,
                                         row_ids_u=perm_u, row_ids_i=perm_i)
        # one-time move of a fresh state into the padded+permuted engine
        # space (a shape test cannot detect the permuted space, so this is
        # explicit rather than inferred per call)
        prep = lambda st: permute_state(  # noqa: E731
            pad_state(st, nU_p, nI_p), perm_u, perm_i)
    elif engine in ("auto", "ell"):
        from hpfrec_tpu.ops.ell import (build_ell, device_ell, gather_table_dtype,
                                        layout_slots, plan_col_tiling,
                                        run_cavi_block_ell)
        from hpfrec_tpu.utils.data import build_csr

        pin_ctx.__enter__()  # device pin for the staging + jit below
        gd = gather_table_dtype(max(nU, nI), k,
                                mode=os.environ.get("BENCH_GATHER_DTYPE", "auto"))
        g_item = 2 if gd is not None else 4
        indptr_u, ind_u, dat_u = build_csr(iu, ii, y, nU, nI)
        indptr_i, ind_i, dat_i = build_csr(ii, iu, y, nI, nU)
        ell_u = device_ell(build_ell(indptr_u, ind_u, dat_u, nU,
                                     col_chunk_rows=plan_col_tiling(nI, k, g_item),
                                     n_cols=nI))
        ell_i = device_ell(build_ell(indptr_i, ind_i, dat_i, nI,
                                     col_chunk_rows=plan_col_tiling(nU, k, g_item),
                                     n_cols=nU))
        slots_per_iter = layout_slots(ell_u) + layout_slots(ell_i)
        # optional interleaved two-side chain (same switch as
        # HPF._make_runner; off by default — the three-session A/B was
        # sign-flipping, PERFORMANCE.md round-5)
        pair_fn = None
        if os.environ.get("HPFREC_TPU_ELL_INTERLEAVE", "0") == "1":
            from hpfrec_tpu.ops.ell import ell_phi_sums_interleaved
            pair_fn = ell_phi_sums_interleaved
        # layouts as jit args (not closures) so they are buffers, not
        # embedded HLO constants
        jitted = jax.jit(run_cavi_block_ell,
                         static_argnames=("hp", "phi_sums_fn", "gather_dtype",
                                          "phi_pair_fn"))
        runner = lambda st, n: jitted(st, ell_u, ell_i, n, hp=hp,  # noqa: E731
                                      gather_dtype=gd, phi_pair_fn=pair_fn)
    else:
        from hpfrec_tpu.ops.cavi import BlockedCOO, run_cavi_block
        from hpfrec_tpu.utils.data import block_coo

        pin_ctx.__enter__()  # device pin for the staging + jit below
        blk = block_coo(y, iu, ii)
        data = BlockedCOO(jnp.asarray(blk.y), jnp.asarray(blk.ix_u),
                          jnp.asarray(blk.ix_i))
        # physics floor for the COO engine too (round-5): the fused phi
        # block gathers TWO table rows per (padded) nonzero per iteration,
        # and the scatter on top is strictly slower — so a pair implying
        # more than 2*nnz_padded gather slots at the ceiling is an
        # artifact regardless of engine
        slots_per_iter = 2 * int(np.prod(blk.y.shape))
        runner = lambda st, n: run_cavi_block(st, data, n, hp)  # noqa: E731

    # Calibrate a per-dispatch iteration cap: a single dispatch running
    # >~60 s can crash the TPU worker (RPC watchdog), so long runs are
    # chained as short dispatches (measured overhead <10%, and it biases
    # the reported throughput DOWN — conservative).
    budget = float(os.environ.get("HPFREC_TPU_DISPATCH_BUDGET_S", "30"))
    cap = warm_and_calibrate(runner, prep(initialize_state(nU, nI, hp, 123)),
                             budget)

    def timed(n):
        st = prep(initialize_state(nU, nI, hp, 123))
        t0 = time.perf_counter()
        done = 0
        while done < n:
            m = min(cap, n - done)
            st = runner(st, jnp.asarray(m, jnp.int32))
            done += m
        checksum = float(jnp.sum(st.k_rte))  # host readback forces completion
        assert np.isfinite(checksum), "bench produced invalid state"
        return time.perf_counter() - t0

    # PAIRED differentials: each repeat runs small then big back-to-back,
    # so the session-level throughput drift (measured +-15-50% here)
    # cancels within a pair; the statistic is the median pair.  The
    # pre-round-4 min(big)-min(small) over independent runs could marry a
    # lucky-fast big to a slow-floor small with nothing to catch it
    # (BENCH_r03: 134.8 Mnnz/s — above the engine's own slot-count
    # speed-of-light; the builder's same-config measurement was 71.9).
    repeats = int(os.environ.get("BENCH_REPEATS", 5))
    t_small, t_big, pairs = [], [], []
    for _ in range(repeats):
        ts = timed(2)
        tb = timed(2 + iters)
        t_small.append(ts)
        t_big.append(tb)
        pairs.append((tb - ts) / iters)

    # physics cross-check: drop pairs implying more gather slots/s than
    # the measured hardware ceiling (those are timing artifacts by
    # construction); if nothing survives, clamp to the bound and say so
    kept = pairs
    if slots_per_iter is not None:
        # The ceiling is per chip.  Only the table engine spreads its
        # slots over the mesh (its layout_slots already counts every
        # device's copy of the common frame); the ell/auto engine here is
        # jitted unsharded on ONE device, so multiplying by device_count
        # for it would set the floor ndev x too low and wave through
        # exactly the artifacts this filter exists to drop.
        n_exec = table_ndev if engine == "table" else 1
        sol = SOL_SLOTS_PER_S * max(1, n_exec)
        floor_s = slots_per_iter / sol  # fastest possible iteration
        kept = [p for p in pairs if p >= floor_s]
        n_dropped = len(pairs) - len(kept)
        if n_dropped:
            flags.append("dropped %d/%d pairs implying > %.0fM slots/s"
                         % (n_dropped, len(pairs), sol / 1e6))
        if not kept:
            kept = [floor_s]
            flags.append("all pairs physically impossible; value clamped "
                         "to the slot-count speed-of-light bound")
    per_iter = float(np.median(kept))

    value = nnz / per_iter
    baseline = 1.85e6
    # kept-pair interquartile range: the statistic's own error bar
    # (round-5; BENCH_r04's kept pairs spread 2.8x with no spread field)
    q25, q75 = (float(np.percentile(kept, 25)), float(np.percentile(kept, 75)))
    out = {
        "metric": "nonzeros_per_sec_per_chip",
        "value": value,
        "unit": "nnz/s",
        "vs_baseline": value / baseline,
        # auditability: raw paired timings, the engine's slot count, and
        # the implied sustained slot rate so the number can be checked
        # against the 204-220 M slots/s gather ceiling at a glance
        "config": "%s nU=%d nI=%d nnz=%d k=%d iters=%d" % (
            scale, nU, nI, nnz, k, iters),
        "repeats_small_s": [round(t, 3) for t in t_small],
        "repeats_big_s": [round(t, 3) for t in t_big],
        "pair_iter_s": [round(p, 4) for p in pairs],
        "kept_pair_iqr_s": [round(q25, 4), round(q75, 4)],
        "kept_pair_iqr_rel": round((q75 - q25) / per_iter, 3),
    }
    if slots_per_iter is not None:
        out["slots_per_iter"] = slots_per_iter
        out["implied_slots_per_s"] = round(slots_per_iter / per_iter)
    if flags:
        out["sanity_flags"] = flags
    print(json.dumps(out))


if __name__ == "__main__":
    main()
