"""Scatter-free segment sums via bucketed ELL layout.

Motivation (measured on v5e): XLA's scatter-add over (nnz, k) rows
serializes and runs at ~40+ ns per nonzero — orders of magnitude below
HBM speed — so the reference's scatter-shaped E-step
(``cython_loops.pxi:594-621``) must not be translated into a scatter at
all.  Instead, rows are grouped by degree into power-of-2-width buckets
(ELL packing):

    bucket w: rows with (padded) degree w, stored as
      rows:  (m, )   table row id per packed row segment
      cols:  (m, w)  opposite-side ids (padding: 0)
      vals:  (m, w)  counts (padding: 0 — inert in every sum)

The per-row phi sums are then *dense* reductions over the w axis — gather
+ softmax + sum, which XLA fuses and the VPU eats at memory speed — and
the per-bucket outputs are reassembled into table order by one inverse
permutation gather.  No scatter appears anywhere.

Rows with degree > ``max_width`` are split into multiple segments; the
segment partials of such rows are summed by a tiny second-level dense
reduction (rare: only catalog-head items at real-data scale).

Both sides (user and item) get their own ELL packing (CSR- and CSC-like);
phi is recomputed in each pass — 2x the transcendental work, a bargain
against serialized scatter.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np


class EllBucket(NamedTuple):
    rows: np.ndarray  # (m,) int32 — table row id of each packed segment
    cols: np.ndarray  # (m, w) int32
    vals: np.ndarray  # (m, w) real


class EllLayout(NamedTuple):
    """Host-side bucketed layout for one side (users or items)."""

    buckets: List[EllBucket]
    # order of concat(bucket.rows) is "segment order"; for non-split rows the
    # inverse permutation maps table row -> its (single) segment position.
    inv_perm: np.ndarray  # (n_rows,) int64 — segment position of each row's
    # first segment
    split_rows: np.ndarray  # (n_split,) int64 — rows with >1 segment
    split_seg_pos: np.ndarray  # (n_split, max_segs) int64 — segment positions
    # of each split row (padded with -1 -> points at a zero row)
    n_rows: int


def build_ell(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
              n_rows: int, min_width: int = 8, max_width: int = 8192,
              dtype=np.float32, pad_shards: int = 1) -> EllLayout:
    """Pack a CSR side into degree buckets (host, O(nnz)).

    ``pad_shards`` pads every bucket's segment count to a multiple of the
    mesh size with inert dummy segments (row 0, zero vals) so the m axis
    shards evenly; segment positions (inv_perm etc.) account for the
    padding."""
    deg = np.diff(indptr).astype(np.int64)

    # segments: (row, start, length<=max_width)
    nseg_per_row = np.maximum(1, -(-deg // max_width))
    seg_row = np.repeat(np.arange(n_rows, dtype=np.int64), nseg_per_row)
    # offset of each segment within its row
    first_seg = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(nseg_per_row, out=first_seg[1:])
    seg_idx_in_row = np.arange(len(seg_row), dtype=np.int64) - first_seg[seg_row]
    seg_start = indptr[seg_row] + seg_idx_in_row * max_width
    seg_len = np.minimum(deg[seg_row] - seg_idx_in_row * max_width, max_width)

    # bucket by next-pow2 width (floor min_width)
    width = np.maximum(min_width, 1 << np.ceil(np.log2(np.maximum(seg_len, 1))).astype(np.int64))

    buckets: List[EllBucket] = []
    seg_positions = np.empty(len(seg_row), dtype=np.int64)
    pos = 0
    order_all = []
    for w in sorted(set(width.tolist())):
        sel = np.nonzero(width == w)[0]
        m = len(sel)
        m_pad = ((m + pad_shards - 1) // pad_shards) * pad_shards
        cols = np.zeros((m_pad, w), dtype=np.int32)
        vals = np.zeros((m_pad, w), dtype=dtype)
        rows_arr = np.zeros(m_pad, dtype=np.int32)
        rows_arr[:m] = seg_row[sel]
        lens = seg_len[sel]
        try:
            from .._native import ell_fill  # parallel C++ fill

            ell_fill(seg_start[sel], lens, indices, data.astype(dtype, copy=False),
                     cols[:m], vals[:m])
        except Exception:
            # vectorized ragged fill (numpy fallback)
            flat_rows = np.repeat(np.arange(m, dtype=np.int64), lens)
            flat_cols = (np.arange(int(lens.sum()), dtype=np.int64)
                         - np.repeat(np.cumsum(lens) - lens, lens))
            src = np.repeat(seg_start[sel], lens) + flat_cols
            cols[flat_rows, flat_cols] = indices[src]
            vals[flat_rows, flat_cols] = data[src]
        buckets.append(EllBucket(rows=rows_arr, cols=cols, vals=vals))
        seg_positions[sel] = pos + np.arange(m, dtype=np.int64)
        order_all.append(sel)
        pos += m_pad

    # inverse permutation: first segment of every row
    inv_perm = seg_positions[first_seg[:-1]]

    # split rows: positions of the segments BEYOND the first (the first is
    # covered by inv_perm); the patch is additive, so padded/unused slots
    # (-1 -> the appended zero row) and even duplicate row ids are inert.
    split = np.nonzero(nseg_per_row > 1)[0]
    if len(split):
        max_segs = int(nseg_per_row[split].max()) - 1
        split_seg_pos = np.full((len(split), max_segs), -1, dtype=np.int64)
        for j, r in enumerate(split):
            sp = seg_positions[first_seg[r] + 1:first_seg[r + 1]]
            split_seg_pos[j, :len(sp)] = sp
    else:
        split_seg_pos = np.zeros((0, 1), dtype=np.int64)

    return EllLayout(buckets=buckets, inv_perm=inv_perm,
                     split_rows=split.astype(np.int64),
                     split_seg_pos=split_seg_pos, n_rows=n_rows)


def device_ell(layout: EllLayout):
    """Move bucket arrays to device (jnp) preserving structure."""
    import jax.numpy as jnp

    return EllLayout(
        buckets=[EllBucket(jnp.asarray(b.rows), jnp.asarray(b.cols),
                           jnp.asarray(b.vals)) for b in layout.buckets],
        inv_perm=jnp.asarray(layout.inv_perm),
        split_rows=jnp.asarray(layout.split_rows),
        split_seg_pos=jnp.asarray(layout.split_seg_pos),
        n_rows=layout.n_rows,
    )


def _bucket_phi_sums(t_self, t_other, rows, cols, vals, row_chunk: int):
    """Per-segment phi sums for one bucket: (m, k) dense reduction.

    phi[r, j, :] = vals[r, j] * (t_self[rows[r]] * t_other[cols[r, j]]) / <t_self[rows[r]], t_other[cols[r, j]]>
    returns sum_j phi[r, j, :].
    Chunked over rows via scan to bound the (chunk, w, k) intermediate.

    ``t_self``/``t_other`` may arrive in a reduced gather dtype (bfloat16 —
    see :func:`gather_table_dtype`); arithmetic always promotes to the
    accumulation dtype right after the gather.
    """
    import jax
    import jax.numpy as jnp

    m, w = cols.shape
    k = t_self.shape[1]
    acc_dt = jnp.float32 if t_self.dtype in (jnp.bfloat16, jnp.float32) else t_self.dtype

    def chunk_sums(rows_c, cols_c, vals_c):
        # factorized phi: p = t_self[row] * t_other[col]; phi = y * p / sum(p)
        p = (t_self[rows_c].astype(acc_dt)[:, None, :]
             * t_other[cols_c].astype(acc_dt))  # (c, w, k)
        denom = jnp.sum(p, axis=-1)  # (c, w)
        scale = jnp.where(denom > 0, vals_c.astype(acc_dt) / denom, 0.0)
        return jnp.einsum("cw,cwk->ck", scale, p,
                          preferred_element_type=acc_dt)

    if m * w <= row_chunk * 1024:  # small bucket: single shot
        return chunk_sums(rows, cols, vals)

    c = max(1, row_chunk * 1024 // w)
    nchunks = -(-m // c)
    pad = nchunks * c - m
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad, w), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, w), vals.dtype)])
    rows = rows.reshape(nchunks, c)
    cols = cols.reshape(nchunks, c, w)
    vals = vals.reshape(nchunks, c, w)

    def body(_, blk):
        return None, chunk_sums(*blk)

    _, out = jax.lax.scan(body, None, (rows, cols, vals))
    out = out.reshape(nchunks * c, k)
    return out[:m]


def gather_table_dtype(n_rows: int, k: int, itemsize: int = 4,
                       mode: str = "auto"):
    """Pick the dtype the expectation tables are *gathered* in.

    Measured on v5e: XLA's row-gather throughput is a function of the
    operand's total BYTES — ~225 M rows/s under ~40 MB, degrading smoothly
    to ~23 M rows/s at >=128 MB (k and index distribution are irrelevant).
    Casting the per-iteration exp tables to bfloat16 halves their bytes and
    roughly doubles gather rate on large tables, while all arithmetic stays
    float32 (cast-up straight after the gather).  ``mode``: 'auto' switches
    to bfloat16 only when the float32 table exceeds the fast-gather window
    (so small/medium problems keep bit-exact float32), 'bfloat16' forces
    it, anything else keeps the compute dtype.
    """
    import jax.numpy as jnp

    if mode == "bfloat16":
        return jnp.bfloat16
    if mode == "auto" and n_rows * k * itemsize > 64 * 1024 * 1024:
        return jnp.bfloat16
    return None


def cavi_step_ell(state, ell_u: EllLayout, ell_i: EllLayout, hp,
                  phi_sums_fn=None, gather_dtype=None):
    """Full-batch CAVI iteration on the bucketed layout (same update order
    as ``cavi.cavi_step`` / reference ``cython_loops.pxi:227-259``), with
    both segment sums computed scatter-free.  phi is evaluated twice (once
    per side) — cheap next to any scatter.  ``phi_sums_fn`` lets the
    sharded engine substitute its shard_map variant.  ``gather_dtype``
    (None | jnp.bfloat16): storage dtype of the gathered exp tables; see
    :func:`gather_table_dtype`."""
    import jax.numpy as jnp

    from ..models.state import VariationalState
    from .cavi import exp_elog_tables

    fn = phi_sums_fn if phi_sums_fn is not None else ell_phi_sums
    t_tab = exp_elog_tables(state.G_shp, state.G_rte)
    b_tab = exp_elog_tables(state.L_shp, state.L_rte)
    if gather_dtype is not None:
        t_tab = t_tab.astype(gather_dtype)
        b_tab = b_tab.astype(gather_dtype)
    su = fn(t_tab, b_tab, ell_u)  # (nU, k)
    si = fn(b_tab, t_tab, ell_i)  # (nI, k) — roles swapped

    Beta_old = state.L_shp / state.L_rte
    G_rte = hp.k_shp / state.k_rte + jnp.sum(Beta_old, axis=0, keepdims=True)
    G_shp = hp.a + su
    Theta = G_shp / G_rte

    L_rte = hp.t_shp / state.t_rte + jnp.sum(Theta, axis=0, keepdims=True)
    L_shp = hp.c + si
    Beta = L_shp / L_rte

    k_rte = hp.add_k_rte + jnp.sum(Theta, axis=1, keepdims=True)
    t_rte = hp.add_t_rte + jnp.sum(Beta, axis=1, keepdims=True)
    return VariationalState(G_shp, G_rte, L_shp, L_rte, k_rte, t_rte)


def run_cavi_block_ell(state, ell_u: EllLayout, ell_i: EllLayout, niter, hp,
                       phi_sums_fn=None, gather_dtype=None):
    """``niter`` ELL CAVI iterations in one XLA program (jit-cached by the
    caller; layouts are pytrees of arrays)."""
    import jax

    def body(_, st):
        return cavi_step_ell(st, ell_u, ell_i, hp, phi_sums_fn=phi_sums_fn,
                             gather_dtype=gather_dtype)

    return jax.lax.fori_loop(0, niter, body, state)


def segment_table_sums(seg, layout: EllLayout):
    """Reassemble per-segment sums (m_total, k) into table order (n_rows, k):
    one inverse-permutation gather (each row's first segment), plus an
    additive patch summing split rows' remaining segments.  Invalid
    positions (-1 / total_segs) hit an appended zero row, so padding — and
    duplicate slot row ids — contribute nothing."""
    import jax.numpy as jnp

    out = seg[layout.inv_perm]
    if layout.split_seg_pos.shape[0]:
        segz = jnp.concatenate([seg, jnp.zeros((1, seg.shape[1]), seg.dtype)], axis=0)
        extra = jnp.sum(segz[layout.split_seg_pos], axis=1)  # (n_split, k)
        out = out.at[layout.split_rows].add(extra, mode="promise_in_bounds")
    return out


def all_bucket_sums(t_self, t_other, buckets, row_chunk: int = 2048):
    """Concatenated per-segment phi sums over all buckets: (m_total, k)."""
    import jax.numpy as jnp

    parts = [
        _bucket_phi_sums(t_self, t_other, b.rows, b.cols, b.vals, row_chunk)
        for b in buckets
    ]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def ell_phi_sums(t_self, t_other, layout: EllLayout, row_chunk: int = 2048):
    """Per-table-row phi sums, shape (n_rows, k).  Scatter-free."""
    return segment_table_sums(
        all_bucket_sums(t_self, t_other, layout.buckets, row_chunk), layout)
