"""v5e-16 projection model from single-chip measurements (verdict item 7).

No multi-chip hardware exists in this environment, so this script
computes — it does NOT measure — the expected per-iteration time of both
engines at 8 and 16 chips, from:

- the HOST-computed sharded layouts at the MillionSong shape (real
  per-device slot counts after padding/balancing, real collective byte
  counts), and
- the MEASURED single-chip rates (the 204-222 M slots/s fused-gather
  ceiling and the per-op rate curve, scripts/profile_estep.py).

Stated assumptions (falsifiable when hardware appears):
- per-chip ICI: v5e public spec 1600 Gbps aggregate; we assume HALF is
  achievable per direction for one collective = 100 GB/s effective.
- collectives and compute do not overlap (pessimistic; XLA usually
  overlaps ring steps with the next sub-tile's compute).
- per-device compute runs at the measured single-chip per-op rates
  (optimistic at 16 devices where ops shrink 16x; the per-op rate curve
  is applied per op to account for exactly that).

Run (host only, ~4 min):  python scripts/project_multichip.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from bench import SCALES, synth_powerlaw  # noqa: E402

CEILING = 218e6        # sustained fused-gather slots/s, measured (218-222)
ICI_GBPS = 100e9       # assumed effective bytes/s per direction per chip


def main():
    from hpfrec_tpu.ops.ell import (build_ell, gather_table_dtype,
                                    layout_slots, plan_col_tiling)
    from hpfrec_tpu.parallel.table_sharded import prepare_table_sharded
    from hpfrec_tpu.utils.data import build_csr

    cfg = SCALES["millionsong"]
    nU, nI, nnz = cfg["nU"], cfg["nI"], cfg["nnz"]
    k = int(os.environ.get("PROJECT_K", 30))  # north-star is k=30
    y, iu, ii = synth_powerlaw(nU, nI, nnz)
    gd = gather_table_dtype(max(nU, nI), k)
    g_item = 2 if gd is not None else 4
    indptr_u, ind_u, dat_u = build_csr(iu, ii, y, nU, nI)
    indptr_i, ind_i, dat_i = build_csr(ii, iu, y, nI, nU)

    out = {"config": "nU=%d nI=%d nnz=%d k=%d" % (nU, nI, nnz, k),
           "assumptions": {
               "fused_gather_ceiling_mslots_per_s": CEILING / 1e6,
               "ici_effective_gb_per_s": ICI_GBPS / 1e9,
               "overlap": "none (pessimistic)"}}

    for ndev in (1, 8, 16):
        # ---- data-parallel engine: tables replicated, segments sharded
        ell_u = build_ell(indptr_u, ind_u, dat_u, nU, pad_shards=ndev,
                          col_chunk_rows=plan_col_tiling(nI, k, g_item),
                          n_cols=nI)
        ell_i = build_ell(indptr_i, ind_i, dat_i, nI, pad_shards=ndev,
                          col_chunk_rows=plan_col_tiling(nU, k, g_item),
                          n_cols=nU)
        slots = layout_slots(ell_u) + layout_slots(ell_i)
        segs = sum(b.rows.shape[0] for b in ell_u.buckets) + sum(
            b.rows.shape[0] for b in ell_i.buckets)
        comp_s = slots / ndev / CEILING
        # per bucket, each device all_gathers the full (m, k) f32 segment
        # vector (receives (ndev-1)/ndev of it over ICI)
        ag_bytes = segs * k * 4 * (ndev - 1) / ndev
        comm_s = ag_bytes / ICI_GBPS if ndev > 1 else 0.0
        dp = {"slots_total": slots, "slots_per_dev": slots // ndev,
              "segments_total": segs,
              "compute_s": round(comp_s, 4),
              "allgather_bytes_per_iter": int(ag_bytes),
              "comm_s": round(comm_s, 4),
              "iter_s": round(comp_s + comm_s, 4)}

        # ---- table-sharded engine: rows sharded, Beta rides the ring
        if ndev > 1:
            se_u, se_i, plan_u, plan_i, _, _ = prepare_table_sharded(
                indptr_u, ind_u, dat_u, indptr_i, ind_i, dat_i,
                nU, nI, k, ndev, g_item)
            per_dev_slots = (layout_slots(se_u) + layout_slots(se_i)) // ndev
            comp_s = per_dev_slots / CEILING
            # each side streams the opposite shard around the ring:
            # (rows/dev) x k x gather-itemsize, (ndev-1) hops
            ring_bytes = ((plan_u[0] // ndev + plan_i[0] // ndev)
                          * k * g_item * (ndev - 1))
            comm_s = ring_bytes / ICI_GBPS
            ts = {"slots_per_dev": per_dev_slots,
                  "compute_s": round(comp_s, 4),
                  "ring_bytes_per_iter": int(ring_bytes),
                  "comm_s": round(comm_s, 4),
                  "iter_s": round(comp_s + comm_s, 4)}
        else:
            ts = None
        out["ndev_%d" % ndev] = {"data_parallel": dp, "table_sharded": ts}
        print("# ndev=%d done" % ndev, file=sys.stderr)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
