"""Localize the E-step's residual vs the gather ceiling (verdict item 4).

The engine sustains ~125-160 M slots/s at the MillionSong shape against a
measured 204-220 M slots/s single-op gather ceiling.  The residual was
attributed to the ~120-op unroll; this script measures that directly:

1. **Op-size rate curve (the per-op floor):** ONE fused
   gather+multiply+reduce op of S slots, iterated inside a
   ``fori_loop`` whose carry forces sequential execution (the engine's
   own dispatch pattern), for S from 128K to 8M slots.  The sustained
   slots/s at each S is the per-op rate CURVE; evaluated at the real
   layout's per-op sizes it says how much of the residual is small-op
   floor rather than gather work.
2. **Real-layout census:** builds the shipped MillionSong layouts and
   reports per-side op counts / slots / per-op sizes so (1) can be
   applied op by op.
3. Optionally (``PROFILE_TRACE=1``) wraps two real iterations in
   ``jax.profiler.trace`` and reports where the trace landed.

Run (real chip):  python scripts/profile_estep.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from bench import SCALES, synth_powerlaw  # noqa: E402


def count_ops(layout, target_slots):
    """Number of fused chunk ops the engine will emit for a layout (the
    unroll in ``_bucket_phi_sums``: one op per ceil(m*w / target) chunk)."""
    n = 0
    for b in layout.buckets:
        m, w = b.cols.shape
        if m * w <= target_slots:
            n += 1
        else:
            c = max(1, target_slots // w)
            n += -(-m // c)
    return n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hpfrec_tpu.ops.ell import (TARGET_SLOTS, build_ell,
                                    gather_table_dtype, layout_slots,
                                    plan_col_tiling)
    from hpfrec_tpu.utils.data import build_csr
    from hpfrec_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    scale = os.environ.get("BENCH_SCALE", "millionsong")
    cfg = SCALES[scale]
    nU, nI, nnz, k = cfg["nU"], cfg["nI"], cfg["nnz"], cfg["k"]

    # ---- 2. real-layout census (host only) ----
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    gd = gather_table_dtype(max(nU, nI), k)
    g_item = 2 if gd is not None else 4
    indptr_u, ind_u, dat_u = build_csr(iu, ii, y, nU, nI)
    indptr_i, ind_i, dat_i = build_csr(ii, iu, y, nI, nU)
    ell_u = build_ell(indptr_u, ind_u, dat_u, nU,
                      col_chunk_rows=plan_col_tiling(nI, k, g_item), n_cols=nI)
    ell_i = build_ell(indptr_i, ind_i, dat_i, nI,
                      col_chunk_rows=plan_col_tiling(nU, k, g_item), n_cols=nU)
    ops_u, ops_i = count_ops(ell_u, TARGET_SLOTS), count_ops(ell_i, TARGET_SLOTS)

    def op_sizes(layout):
        sizes = []
        for b in layout.buckets:
            m, w_ = b.cols.shape
            if m * w_ <= TARGET_SLOTS:
                sizes.append(m * w_)
            else:
                c = max(1, TARGET_SLOTS // w_)
                for st_ in range(0, m, c):
                    sizes.append(min(c, m - st_) * w_)
        return sizes

    sizes_u, sizes_i = op_sizes(ell_u), op_sizes(ell_i)
    census = {
        "ops_user_side": ops_u, "ops_item_side": ops_i,
        "ops_total": ops_u + ops_i,
        "slots_user_side": layout_slots(ell_u),
        "slots_item_side": layout_slots(ell_i),
        "buckets_user_side": len(ell_u.buckets),
        "buckets_item_side": len(ell_i.buckets),
        "median_op_slots_user": int(np.median(sizes_u)),
        "median_op_slots_item": int(np.median(sizes_i)),
    }
    print("# census: %s" % json.dumps(census), file=sys.stderr)

    # ---- 1. op-size rate curve ----
    # one engine-shaped fused op (gather both sides, multiply, k-reduce,
    # einsum) of S slots, sequentially iterated in a fori_loop whose
    # carry feeds the next iteration (the engine's own structure, so one
    # op's temporaries are live at a time); differential timing removes
    # dispatch/compile like bench.py
    w = 512
    n_rows_tab = 384 * 1024  # 384K x 50 x 2B = 38 MB — the tiled operand size
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((n_rows_tab, k), np.float32),
                      dtype=jnp.bfloat16 if gd is not None else jnp.float32)

    def make_looped(slots):
        c = max(1, slots // w)

        def run(tself, cols, vals, n):
            def body(_, carry):
                ts_c, acc = carry
                p = (ts_c[:, None, :].astype(jnp.float32)
                     * tab[cols].astype(jnp.float32))
                denom = jnp.sum(p, axis=-1)
                scale_ = jnp.where(denom > 0, vals / denom, 0.0)
                out = jnp.einsum("cw,cwk->ck", scale_, p,
                                 preferred_element_type=jnp.float32)
                # feed a vanishing function of the output back into the
                # next iteration's gather-side operand: a real data
                # dependency (iterations can't fuse/overlap), value-inert
                ts_next = ts_c + (out[0, 0] * 1e-30).astype(ts_c.dtype)
                return ts_next, acc + out[0, 0]
            ts0 = tself[:c].astype(tab.dtype)
            _, acc = lax.fori_loop(0, n, body, (ts0, jnp.float32(0)))
            return acc

        return jax.jit(run, static_argnames=())

    ladder_sizes = [128 * 1024, 256 * 1024, 512 * 1024, 1 << 20, 2 << 20,
                    4 << 20, 8 << 20]
    cmax = max(s // w for s in ladder_sizes)
    tself_all = jnp.asarray(rng.random((cmax, k), np.float32))
    cols_all = rng.integers(0, n_rows_tab, (cmax, w)).astype(np.int32)
    vals_all = rng.random((cmax, w), np.float32)

    reps = int(os.environ.get("PROFILE_REPS", 3))
    results = []
    for slots in ladder_sizes:
        c = slots // w
        fn = make_looped(slots)
        cols = jnp.asarray(cols_all[:c])
        vals = jnp.asarray(vals_all[:c])
        # iteration counts sized for ~1.5G slots of work per timed run
        n_big = max(8, int(1.5e9 / slots))
        n_small = max(1, n_big // 8)
        float(fn(tself_all, cols, vals, jnp.asarray(n_small, jnp.int32)))
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(tself_all, cols, vals, jnp.asarray(n_small, jnp.int32)))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn(tself_all, cols, vals, jnp.asarray(n_big, jnp.int32)))
            t_big = time.perf_counter() - t0
            rates.append((n_big - n_small) * slots
                         / max(t_big - t_small, 1e-9))
        med = float(np.median(rates))
        results.append({"slots_per_op": slots,
                        "mslots_per_s": round(med / 1e6, 1),
                        "reps_mslots_per_s": [round(r / 1e6, 1)
                                              for r in rates]})
        print("# ladder: %s" % json.dumps(results[-1]), file=sys.stderr)

    # apply the measured curve to the real layout's per-op sizes: expected
    # per-iteration E-step time if every op ran at its size's rate
    curve_x = np.array([r["slots_per_op"] for r in results], np.float64)
    curve_y = np.array([r["mslots_per_s"] for r in results], np.float64) * 1e6

    def expected_side_s(sizes):
        rates_ = np.interp(np.asarray(sizes, np.float64), curve_x, curve_y)
        return float(np.sum(np.asarray(sizes, np.float64) / rates_))

    summary = {
        "census": census,
        "rate_curve": results,
        "expected_user_side_s": round(expected_side_s(sizes_u), 4),
        "expected_item_side_s": round(expected_side_s(sizes_i), 4),
        "expected_estep_s": round(expected_side_s(sizes_u)
                                  + expected_side_s(sizes_i), 4),
        "flat_ceiling_estep_s": round(
            (census["slots_user_side"] + census["slots_item_side"])
            / float(curve_y.max()), 4),
    }

    if os.environ.get("PROFILE_TRACE") == "1":
        # a real-engine trace for offline inspection
        from hpfrec_tpu.models.state import Hyperparams, initialize_state
        from hpfrec_tpu.ops.ell import device_ell, run_cavi_block_ell

        hp = Hyperparams(k=k)
        lu, li = device_ell(ell_u), device_ell(ell_i)
        jit_step = jax.jit(run_cavi_block_ell,
                           static_argnames=("hp", "phi_sums_fn",
                                            "gather_dtype"))
        st = initialize_state(nU, nI, hp, 123)
        st = jit_step(st, lu, li, jnp.asarray(1, jnp.int32), hp=hp,
                      gather_dtype=gd)
        float(jnp.sum(st.k_rte))
        tdir = os.path.join(REPO, "profiles", "estep_trace")
        with jax.profiler.trace(tdir):
            st = jit_step(st, lu, li, jnp.asarray(2, jnp.int32), hp=hp,
                          gather_dtype=gd)
            float(jnp.sum(st.k_rte))
        summary["trace_dir"] = tdir
        print("# trace written to %s" % tdir, file=sys.stderr)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
