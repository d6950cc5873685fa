"""Fully table-sharded CAVI engine (the model-parallel mode).

The data-parallel engine replicates the factor tables and shards nonzeros.
This engine shards BOTH: user-side tables (G_shp, G_rte, k_rte) are
row-sharded by user, item-side tables by item, and each device owns the
ELL-packed nonzeros of exactly its own rows (both the CSR-side and the
CSC-side packing).  Per iteration the only communication is:

  * two ``all_gather`` of the (rows, k) stabilized exp tables (each device
    needs the full opposite-side table to compute its local phi sums), and
  * two scalar-vector ``psum`` for the colsum terms of the rate updates.

Everything else — phi, segment sums, the Gamma updates — is local.  This
is the distributed analogue SURVEY.md §7.3 calls the core novel
engineering: routing per-nonzero contributions to the owner shard, here
made trivial by partitioning nonzeros BY owner row so contributions never
cross shards.

Padding: user/item counts are padded to a multiple of the mesh size; the
padded rows are forced to zero (Theta/Beta) by row masks inside the step
so they are inert in every colsum.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..models.state import Hyperparams, VariationalState
from ..ops.ell import EllBucket, build_ell
from .mesh import DATA_AXIS


class ShardedEll(NamedTuple):
    """Per-device ELL layouts stacked on a leading device axis.

    Bucket arrays: rows (ndev, m_b) [LOCAL row ids], cols (ndev, m_b, w)
    [GLOBAL opposite-side ids], vals (ndev, m_b, w); inv_perm
    (ndev, rows_per_dev); split info stacked likewise.
    """

    buckets: list
    inv_perm: np.ndarray
    split_rows: np.ndarray
    split_seg_pos: np.ndarray
    rows_per_dev: int


def build_sharded_ell(indptr, indices, data, n_rows_padded, ndev,
                      min_width=8, max_width=8192, dtype=np.float32) -> ShardedEll:
    """Build one ELL layout per device over its contiguous row range, then
    stack them with common bucket widths and padded segment counts."""
    assert n_rows_padded % ndev == 0
    per = n_rows_padded // ndev
    layouts = []
    for d in range(ndev):
        lo, hi = d * per, (d + 1) * per
        # local CSR slice (row ids shifted to local)
        lptr = (indptr[lo:hi + 1] - indptr[lo]).astype(np.int64)
        lind = indices[indptr[lo]:indptr[hi]]
        ldat = data[indptr[lo]:indptr[hi]]
        layouts.append(build_ell(lptr, lind, ldat, per, min_width=min_width,
                                 max_width=max_width, dtype=dtype))

    widths = sorted({b.cols.shape[1] for l in layouts for b in l.buckets})
    # common per-width segment count = max over devices
    m_of = {w: 0 for w in widths}
    for l in layouts:
        for b in l.buckets:
            m_of[b.cols.shape[1]] = max(m_of[b.cols.shape[1]], b.rows.shape[0])

    # Re-place each device's segments into the common padded bucket frame and
    # recompute segment positions in that frame.
    buckets = []
    offsets = {}
    pos = 0
    for w in widths:
        m = m_of[w]
        offsets[w] = pos
        rows = np.zeros((ndev, m), dtype=np.int32)
        cols = np.zeros((ndev, m, w), dtype=np.int32)
        vals = np.zeros((ndev, m, w), dtype=dtype)
        buckets.append(EllBucket(rows=rows, cols=cols, vals=vals))
        pos += m
    total_segs = pos

    inv_perm = np.zeros((ndev, per), dtype=np.int64)
    max_split = max((l.split_seg_pos.shape[0] for l in layouts), default=0)
    max_segs = max((l.split_seg_pos.shape[1] for l in layouts), default=1)
    split_rows = np.zeros((ndev, max(max_split, 1)), dtype=np.int64)
    split_seg_pos = np.full((ndev, max(max_split, 1), max_segs), -1, dtype=np.int64)

    for d, l in enumerate(layouts):
        # map this device's original segment positions -> common-frame positions
        remap_chunks = []
        cursor = 0
        for b in l.buckets:
            w = b.cols.shape[1]
            m_local = b.rows.shape[0]
            tgt = buckets[widths.index(w)]
            tgt.rows[d, :m_local] = b.rows
            tgt.cols[d, :m_local] = b.cols
            tgt.vals[d, :m_local] = b.vals
            remap_chunks.append(offsets[w] + np.arange(m_local, dtype=np.int64))
            cursor += m_local
        remap = np.concatenate(remap_chunks) if remap_chunks else np.zeros(0, np.int64)
        inv_perm[d] = remap[l.inv_perm]
        ns = l.split_rows.shape[0]
        if ns:
            split_rows[d, :ns] = l.split_rows
            sp = l.split_seg_pos
            mapped = np.where(sp >= 0, remap[np.clip(sp, 0, None)], total_segs)
            split_seg_pos[d, :ns, :sp.shape[1]] = mapped
        # unfilled split slots: point rows at row 0's... use an inert scheme:
        # rows default 0 with all seg positions == total_segs (zero row)
    return ShardedEll(buckets=buckets, inv_perm=inv_perm,
                      split_rows=split_rows, split_seg_pos=split_seg_pos,
                      rows_per_dev=per)


def _local_table_sums(t_self_local, t_other_full, se: ShardedEll):
    """Per-local-row phi sums on one device (inside shard_map).  The bucket
    arrays arrive with their leading device axis stripped."""
    import jax.numpy as jnp

    from ..ops.ell import _bucket_phi_sums

    parts = []
    dep = None
    for b in se.buckets:
        out, dep = _bucket_phi_sums(t_self_local, t_other_full,
                                    b.rows, b.cols, b.vals, dep=dep)
        parts.append(out)
    seg = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    out = seg[se.inv_perm]
    # additive split-row patch (remaining segments beyond the first);
    # invalid positions (-1 / total_segs) hit the appended zero row, so
    # padded and unused slots — even with duplicate row ids — add nothing
    segz = jnp.concatenate([seg, jnp.zeros((1, seg.shape[1]), seg.dtype)], axis=0)
    extra = jnp.sum(segz[se.split_seg_pos], axis=1)  # (n_split, k)
    out = out.at[se.split_rows].add(extra, mode="promise_in_bounds")
    return out


def make_table_sharded_step(mesh, ell_u: ShardedEll, ell_i: ShardedEll,
                            hp: Hyperparams, n_users_real: int, n_items_real: int):
    """Build a jitted ``(state_sharded, niter) -> state_sharded`` runner with
    user tables sharded P('d') by row and item tables likewise.

    The reference update order (``cython_loops.pxi:227-259``) is preserved;
    padded rows are masked to keep Theta/Beta zero there.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.cavi import exp_elog_tables

    ndev = len(mesh.devices.ravel())
    per_u = ell_u.rows_per_dev
    per_i = ell_i.rows_per_dev

    def step_local(state, umask, imask):
        G_shp, G_rte, L_shp, L_rte, k_rte, t_rte = state
        t_loc = exp_elog_tables(G_shp, G_rte) * umask
        b_loc = exp_elog_tables(L_shp, L_rte) * imask
        t_full = jax.lax.all_gather(t_loc, DATA_AXIS, axis=0, tiled=True)
        b_full = jax.lax.all_gather(b_loc, DATA_AXIS, axis=0, tiled=True)

        su = _local_table_sums(t_loc, b_full, ell_u_local[0])
        si = _local_table_sums(b_loc, t_full, ell_i_local[0])

        Beta_old = jnp.where(imask, L_shp / L_rte, 0.0)
        beta_colsum = jax.lax.psum(jnp.sum(Beta_old, axis=0, keepdims=True), DATA_AXIS)
        G_rte = hp.k_shp / k_rte + beta_colsum
        G_shp = jnp.where(umask, hp.a + su, 0.0)
        Theta = jnp.where(umask, G_shp / G_rte, 0.0)
        theta_colsum = jax.lax.psum(jnp.sum(Theta, axis=0, keepdims=True), DATA_AXIS)
        L_rte = hp.t_shp / t_rte + theta_colsum
        L_shp = jnp.where(imask, hp.c + si, 0.0)
        Beta = jnp.where(imask, L_shp / L_rte, 0.0)
        k_rte = hp.add_k_rte + jnp.sum(Theta, axis=1, keepdims=True)
        t_rte = hp.add_t_rte + jnp.sum(Beta, axis=1, keepdims=True)
        return (G_shp, G_rte, L_shp, L_rte, k_rte, t_rte)

    # the ELL arrays are closed over via shard_map inputs; build specs
    def flat_bucket_arrays(se: ShardedEll):
        out = []
        for b in se.buckets:
            out += [b.rows, b.cols, b.vals]
        out += [se.inv_perm, se.split_rows, se.split_seg_pos]
        return out

    nb_u = len(ell_u.buckets)
    nb_i = len(ell_i.buckets)
    ell_u_local = []
    ell_i_local = []

    def runner_local(niter, G_shp, G_rte, L_shp, L_rte, k_rte, t_rte, *flat):
        # strip the (length-1) leading device axis shard_map leaves in place
        flat = tuple(a[0] for a in flat)
        fu = flat[: 3 * nb_u + 3]
        fi = flat[3 * nb_u + 3:]
        se_u = ShardedEll(
            buckets=[EllBucket(*fu[3 * i: 3 * i + 3]) for i in range(nb_u)],
            inv_perm=fu[-3], split_rows=fu[-2], split_seg_pos=fu[-1],
            rows_per_dev=per_u)
        se_i = ShardedEll(
            buckets=[EllBucket(*fi[3 * i: 3 * i + 3]) for i in range(nb_i)],
            inv_perm=fi[-3], split_rows=fi[-2], split_seg_pos=fi[-1],
            rows_per_dev=per_i)
        ell_u_local.clear(); ell_u_local.append(se_u)
        ell_i_local.clear(); ell_i_local.append(se_i)

        dev = jax.lax.axis_index(DATA_AXIS)
        urow = dev * per_u + jax.lax.broadcasted_iota(jnp.int32, (per_u, 1), 0)
        irow = dev * per_i + jax.lax.broadcasted_iota(jnp.int32, (per_i, 1), 0)
        umask = (urow < n_users_real).astype(G_shp.dtype)
        imask = (irow < n_items_real).astype(L_shp.dtype)

        def body(_, st):
            return step_local(st, umask, imask)

        return jax.lax.fori_loop(
            0, niter, body, (G_shp, G_rte, L_shp, L_rte, k_rte, t_rte))

    table_u = P(DATA_AXIS, None)
    bucket_specs_u = []
    for _ in range(nb_u):
        bucket_specs_u += [P(DATA_AXIS, None), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)]
    bucket_specs_u += [P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None, None)]
    bucket_specs_i = []
    for _ in range(nb_i):
        bucket_specs_i += [P(DATA_AXIS, None), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)]
    bucket_specs_i += [P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None, None)]

    sharded = jax.shard_map(
        runner_local,
        mesh=mesh,
        in_specs=(P(), table_u, table_u, table_u, table_u, table_u, table_u,
                  *bucket_specs_u, *bucket_specs_i),
        out_specs=(table_u,) * 6,
        check_vma=False,
    )

    # pass the layout arrays as jit ARGUMENTS (closing over device arrays
    # embeds them as HLO constants — payload blow-up at large nnz); place
    # them pre-sharded so calls don't re-transfer
    from jax.sharding import NamedSharding

    def _put(a, spec):
        return jax.device_put(np.asarray(a), NamedSharding(mesh, spec))

    flat_all = []
    for se in (ell_u, ell_i):
        for b in se.buckets:
            flat_all += [_put(b.rows, P(DATA_AXIS, None)),
                         _put(b.cols, P(DATA_AXIS, None, None)),
                         _put(b.vals, P(DATA_AXIS, None, None))]
        flat_all += [_put(se.inv_perm, P(DATA_AXIS, None)),
                     _put(se.split_rows, P(DATA_AXIS, None)),
                     _put(se.split_seg_pos, P(DATA_AXIS, None, None))]

    @jax.jit
    def _run(state: VariationalState, niter, *flat):
        out = sharded(niter, state.G_shp, state.G_rte, state.L_shp, state.L_rte,
                      state.k_rte, state.t_rte, *flat)
        return VariationalState(*out)

    def run(state: VariationalState, niter):
        return _run(state, niter, *flat_all)

    return run


def pad_state(state: VariationalState, n_users_padded, n_items_padded):
    """Grow the state tables to padded row counts.  Shapes pad with zeros
    (so Theta/Beta are exactly zero on pad rows from the start), rates with
    ones (no divide-by-zero)."""
    import jax.numpy as jnp

    def pad_rows(a, n, fill):
        if a.shape[0] == n:
            return a
        extra = jnp.full((n - a.shape[0], a.shape[1]), fill, a.dtype)
        return jnp.concatenate([a, extra], axis=0)

    return VariationalState(
        G_shp=pad_rows(state.G_shp, n_users_padded, 0),
        G_rte=pad_rows(state.G_rte, n_users_padded, 1),
        L_shp=pad_rows(state.L_shp, n_items_padded, 0),
        L_rte=pad_rows(state.L_rte, n_items_padded, 1),
        k_rte=pad_rows(state.k_rte, n_users_padded, 1),
        t_rte=pad_rows(state.t_rte, n_items_padded, 1),
    )
