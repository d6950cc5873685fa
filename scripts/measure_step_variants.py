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
from bench import SCALES, synth_powerlaw, warm_and_calibrate  # noqa: E402


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

    from hpfrec_tpu.models.state import Hyperparams, initialize_state
    from hpfrec_tpu.ops.ell import (build_ell, cavi_step_ell, device_ell,
                                    gather_table_dtype, layout_slots,
                                    plan_col_tiling, run_cavi_block_ell)
    from hpfrec_tpu.utils.data import build_csr
    from hpfrec_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    hp = Hyperparams(k=k)
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    if os.environ.get("MEASURE_USER_ZIPF") == "1":
        # realistic variant: user activity heavy-tailed too (the stock
        # synth has near-uniform user degrees), with ids RANDOMLY
        # permuted like pd.factorize's first-appearance order — the
        # regime the degsort locality experiment is about
        rng = np.random.default_rng(5)
        w_u = np.arange(1, nU + 1, dtype=np.float64) ** -0.8
        p_u = w_u / w_u.sum()
        iu = rng.choice(nU, size=nnz, p=p_u)
        iu = rng.permutation(nU)[iu].astype(np.int32)
        order = np.argsort(iu, kind="stable")
        iu, ii, y = iu[order], ii[order], y[order]
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

    # layouts as jit ARGUMENTS — closing over device arrays embeds them as
    # HLO constants and overflows the remote-compile payload at this scale
    from hpfrec_tpu.ops.ell import ell_phi_sums

    def partial_sums_fn(use_user, use_item):
        """phi_sums_fn that swaps the disabled side's E-step for zeros —
        the per-iteration cost decomposes same-session as
        table_work = tables_only; su = user_only - tables_only;
        si = carried - user_only (state feedback through the carry keeps
        the loop body live, so nothing hoists)."""
        def fn(t_self, t_other, layout, side="user"):
            if (side == "user" and use_user) or (side == "item" and use_item):
                return ell_phi_sums(t_self, t_other, layout, side=side)
            return jnp.zeros((layout.n_rows, k), jnp.float32)
        return fn

    jit_carried = jax.jit(run_cavi_block_ell,
                          static_argnames=("hp", "phi_sums_fn",
                                           "gather_dtype", "phi_pair_fn"))
    jit_legacy = jax.jit(legacy_block,
                         static_argnames=("hp", "gather_dtype"))
    def slots_fn(target):
        """phi_sums_fn pinning the per-op slot target (A/B of the
        TARGET_SLOTS fusion-size constant without a code change)."""
        def fn(t_self, t_other, layout, side="user"):
            return ell_phi_sums(t_self, t_other, layout,
                                target_slots=target, side=side)
        return fn

    def stride_fn(stride):
        """phi_sums_fn pinning the barrier dep-stride (how many chunk ops
        may overlap; 1 = round-3 strict serialization)."""
        def fn(t_self, t_other, layout, side="user"):
            return ell_phi_sums(t_self, t_other, layout, side=side,
                                dep_stride=stride)
        return fn

    def minirow_fn(on):
        """phi_sums_fn pinning the mini-row reshape (round-5: every
        width-divisible-by-8 bucket computed as (c*w/8, 8) mini-rows)."""
        def fn(t_self, t_other, layout, side="user"):
            return ell_phi_sums(t_self, t_other, layout, side=side,
                                minirow=on)
        return fn

    minirow_on_fn = minirow_fn(True)
    minirow_off_fn = minirow_fn(False)
    user_only_fn = partial_sums_fn(True, False)
    tables_only_fn = partial_sums_fn(False, False)
    stride2_fn = stride_fn(2)
    stride3_fn = stride_fn(3)
    stride4_fn = stride_fn(4)
    slots4m_fn = slots_fn(4 << 20)   # hoisted: a fresh fn per call would
    slots12m_fn = slots_fn(12 << 20)  # defeat the jit cache (static arg)
    slots16m_fn = slots_fn(16 << 20)
    all_runners = {
        "carried": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             gather_dtype=gd),
        "legacy": lambda st, n: jit_legacy(st, ell_u, ell_i, n, hp=hp,
                                           gather_dtype=gd),
        "user_only": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                               phi_sums_fn=user_only_fn,
                                               gather_dtype=gd),
        "tables_only": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                                 phi_sums_fn=tables_only_fn,
                                                 gather_dtype=gd),
        "slots4m": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             phi_sums_fn=slots4m_fn,
                                             gather_dtype=gd),
        "slots12m": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                              phi_sums_fn=slots12m_fn,
                                              gather_dtype=gd),
        "slots16m": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                              phi_sums_fn=slots16m_fn,
                                              gather_dtype=gd),
        "stride2": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             phi_sums_fn=stride2_fn,
                                             gather_dtype=gd),
        "stride3": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             phi_sums_fn=stride3_fn,
                                             gather_dtype=gd),
        "stride4": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             phi_sums_fn=stride4_fn,
                                             gather_dtype=gd),
        "minirow": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                             phi_sums_fn=minirow_on_fn,
                                             gather_dtype=gd),
        "minirow_off": lambda st, n: jit_carried(st, ell_u, ell_i, n, hp=hp,
                                                 phi_sums_fn=minirow_off_fn,
                                                 gather_dtype=gd),
    }
    if "degsort" in os.environ.get("MEASURE_VARIANTS", ""):
        all_runners["degsort"] = lambda st, n: jit_carried(
            st, lu_d, li_d, n, hp=hp, gather_dtype=gd)
    # per-variant slot counts (layout-changing variants differ)
    slots_by = {}

    if "degsort" in os.environ.get("MEASURE_VARIANTS", ""):
        # round-5 locality experiment: relabel USERS by degree rank
        # (hot rows first) so the item side's user-table gathers hit a
        # clustered hot region; degrees (hence bucket shapes and slot
        # counts) are unchanged — only gather-target locality moves.
        # The synthetic items are already popularity-ordered (the
        # favorable case); real pd.factorize data is random on both
        # axes, which the user axis models here.
        deg_u = np.bincount(iu, minlength=nU)
        rank_u = np.empty(nU, dtype=np.int32)
        rank_u[np.argsort(-deg_u, kind="stable")] = np.arange(nU,
                                                              dtype=np.int32)
        iu_d = rank_u[iu]
        ip_u, in_u, da_u = build_csr(iu_d, ii, y, nU, nI)
        ip_i, in_i, da_i = build_csr(ii, iu_d, y, nI, nU)
        lu_d = device_ell(build_ell(ip_u, in_u, da_u, nU,
                                    col_chunk_rows=plan_col_tiling(nI, k, g_item),
                                    n_cols=nI))
        li_d = device_ell(build_ell(ip_i, in_i, da_i, nI,
                                    col_chunk_rows=plan_col_tiling(nU, k, g_item),
                                    n_cols=nU))

    # round-5 experiments (verdict item 4): op-count / op-order variants
    names = os.environ.get("MEASURE_VARIANTS", "carried,legacy").split(",")
    if "interleaved" in names:
        # user/item op chains alternated under one shared dep chain
        from hpfrec_tpu.ops.ell import ell_phi_sums_interleaved

        all_runners["interleaved"] = lambda st, n: jit_carried(
            st, ell_u, ell_i, n, hp=hp, gather_dtype=gd,
            phi_pair_fn=ell_phi_sums_interleaved)
    for name in names:
        if name.startswith("merge"):
            # fewer, fatter bucket ops at slightly more padded slots (the
            # round-3 merge table: 2^20 -> ~46 ops / +9% slots)
            lg = name[len("merge"):]
            os.environ["HPFREC_TPU_ELL_MERGE_LOG2"] = lg
            lu_m = device_ell(build_ell(
                indptr_u, ind_u, dat_u, nU,
                col_chunk_rows=plan_col_tiling(nI, k, g_item), n_cols=nI))
            li_m = device_ell(build_ell(
                indptr_i, ind_i, dat_i, nI,
                col_chunk_rows=plan_col_tiling(nU, k, g_item), n_cols=nU))
            del os.environ["HPFREC_TPU_ELL_MERGE_LOG2"]
            slots_by[name] = layout_slots(lu_m) + layout_slots(li_m)
            # MEASURE_MERGE_INTERLEAVE=1 composes the merged layout with
            # the interleaved two-side chain (round-5 session 3)
            ppf = None
            if os.environ.get("MEASURE_MERGE_INTERLEAVE") == "1":
                from hpfrec_tpu.ops.ell import ell_phi_sums_interleaved
                ppf = ell_phi_sums_interleaved
            all_runners[name] = (
                lambda st, n, lu=lu_m, li=li_m, ppf=ppf: jit_carried(
                    st, lu, li, n, hp=hp, gather_dtype=gd,
                    phi_pair_fn=ppf))
        elif name.startswith("tile") and name.endswith("x"):
            # wider column tiles on the tiled side(s): halves the
            # cross-tile bucket split (fewer ops) at the cost of gather
            # operands beyond the fast window (verdict item 4 experiment
            # b — same-width concat across adjacent tiles is exactly a
            # tile of twice the span)
            mult = float(name[len("tile"):-1])
            cu = plan_col_tiling(nI, k, g_item)
            ci = plan_col_tiling(nU, k, g_item)
            lu_t = device_ell(build_ell(
                indptr_u, ind_u, dat_u, nU,
                col_chunk_rows=None if cu is None else int(cu * mult),
                n_cols=nI))
            li_t = device_ell(build_ell(
                indptr_i, ind_i, dat_i, nI,
                col_chunk_rows=None if ci is None else int(ci * mult),
                n_cols=nU))
            slots_by[name] = layout_slots(lu_t) + layout_slots(li_t)
            all_runners[name] = (
                lambda st, n, lu=lu_t, li=li_t: jit_carried(
                    st, lu, li, n, hp=hp, gather_dtype=gd))
    preps = {}
    if "table" in names:
        # the model-parallel ring engine (same carried-tables step since
        # round 4), for same-session engine-ratio measurements; on one
        # chip the ring degenerates and this isolates the per-device
        # compute path (PERFORMANCE.md "table-sharded row balancing")
        from hpfrec_tpu.parallel import make_mesh
        from hpfrec_tpu.parallel.table_sharded import (
            make_table_sharded_step, pad_state, permute_state,
            prepare_table_sharded)

        mesh = make_mesh()
        ndev = len(mesh.devices.ravel())
        se_u, se_i, plan_u, plan_i, perm_u, perm_i = prepare_table_sharded(
            indptr_u, ind_u, dat_u, indptr_i, ind_i, dat_i, nU, nI, k,
            ndev, 2 if gd is not None else 4)
        t_step = make_table_sharded_step(mesh, se_u, se_i, hp, nU, nI,
                                         gather_dtype=gd,
                                         row_ids_u=perm_u, row_ids_i=perm_i)
        nU_p, nI_p = plan_u[0], plan_i[0]
        all_runners["table"] = t_step
        # one-time move into the padded+permuted engine space per run —
        # NOT per dispatch (re-permuting an already-permuted state would
        # scramble it)
        preps["table"] = lambda st: permute_state(
            pad_state(st, nU_p, nI_p), perm_u, perm_i)
    runners = {n_: all_runners[n_] for n_ in names}

    budget = float(os.environ.get("HPFREC_TPU_DISPATCH_BUDGET_S", "30"))
    caps = {}
    for name, run in runners.items():
        prep = preps.get(name, lambda s: s)
        caps[name] = warm_and_calibrate(
            run, prep(initialize_state(nU, nI, hp, 123)), budget)
        print("# %s compiled; cap=%d iters/dispatch" % (name, caps[name]),
              file=sys.stderr)

    def timed(name, n):
        st = preps.get(name, lambda s: s)(initialize_state(nU, nI, hp, 123))
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

    # trajectory identity check: same checksum after a few iterations
    if {"carried", "legacy"} <= set(runners):
        _, c_new = timed("carried", 4)
        _, c_old = timed("legacy", 4)
        rel = abs(c_new - c_old) / max(abs(c_old), 1e-30)
        print("# checksum carried=%.10g legacy=%.10g rel=%.2e"
              % (c_new, c_old, rel), file=sys.stderr)

    from bench import SOL_SLOTS_PER_S

    order = list(runners)
    results = {name: [] for name in runners}
    for r in range(repeats):
        for name in order[r % len(order):] + order[:r % len(order)]:
            ts, _ = timed(name, 2)
            tb, _ = timed(name, 2 + iters)
            results[name].append((tb - ts) / iters)
    for name, pairs in results.items():
        v_slots = slots_by.get(name, slots)
        floor_s = v_slots / SOL_SLOTS_PER_S  # same physics filter as bench.py
        kept = [p for p in pairs if p >= floor_s] or [floor_s]
        med = float(np.median(kept))
        print(json.dumps({
            "variant": name,
            "iter_s": round(med, 4),
            "mnnz_per_s": round(nnz / med / 1e6, 1),
            "slots_per_iter": v_slots,
            "implied_mslots_per_s": round(v_slots / med / 1e6, 1),
            "pairs_iter_s": [round(p, 4) for p in pairs],
            "n_dropped_impossible": len(pairs) - len([p for p in pairs
                                                      if p >= floor_s]),
            "config": "%s nU=%d nI=%d nnz=%d k=%d" % (scale, nU, nI, nnz, k),
        }))


if __name__ == "__main__":
    main()
