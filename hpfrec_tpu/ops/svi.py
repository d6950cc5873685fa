"""Stochastic variational inference updates and fold-in inference.

Implements the reference's SVI branch (``cython_loops.pxi:261-377``), its
``partial_fit`` (``pxi:423-473``) and the single-user fold-in
``calc_user_factors`` (``pxi:476-520``) as jitted, mask-based functional
updates.

Variable-size batches meet XLA's static shapes as follows: the batch's
nonzeros are padded (y=0 rows are inert), and the "rows touched by this
batch" sets become full-length boolean masks (nU,1)/(nI,1) built with one
scatter, so every parameter update is a dense ``where`` blend — no dynamic
shapes anywhere.  The natural-gradient blend ``step*new + (1-step)*old``
with the ``n/|batch|`` multiplier follows the reference exactly, including
its asymmetries: local-side shapes are overwritten (not blended), only the
global side is blended, and ``partial_fit`` blends the activity/popularity
scalers on ALL rows while the in-fit SVI blends batch rows only
(``pxi:324-325`` vs ``pxi:472-473``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.state import Hyperparams, VariationalState
from .cavi import _phi_block, exp_elog_tables


def phi_sums_tables(t_tab, b_tab, y, iu, ii):
    """Segment sums of phi over one (padded, flat) batch of nonzeros, given
    the stabilized exp tables.  This is the per-device body of the sharded
    SVI variant (``parallel.engine.make_sharded_svi_phi_sums``)."""
    phi = _phi_block(t_tab, b_tab, y, iu, ii)
    su = jnp.zeros_like(t_tab).at[iu].add(phi, mode="promise_in_bounds")
    si = jnp.zeros_like(b_tab).at[ii].add(phi, mode="promise_in_bounds")
    return su, si


def _batch_phi_sums(state: VariationalState, y, iu, ii, phi_sums_fn=None):
    """Segment sums of phi over one (padded, flat) batch of nonzeros."""
    t_tab = exp_elog_tables(state.G_shp, state.G_rte)
    b_tab = exp_elog_tables(state.L_shp, state.L_rte)
    fn = phi_sums_fn if phi_sums_fn is not None else phi_sums_tables
    return fn(t_tab, b_tab, y, iu, ii)


def _svi_update_math(
    state: VariationalState,
    su: jax.Array,
    si: jax.Array,
    umask: jax.Array,
    imask: jax.Array,
    step: jax.Array,
    mult: jax.Array,
    hp: Hyperparams,
    user_side: bool,
    blend_all_scalers: bool,
) -> VariationalState:
    """The SVI natural-gradient blend given the batch's phi segment sums.

    Shared by the single-batch entry point (:func:`svi_batch_update`, used
    by ``partial_fit``) and the device-resident epoch runner
    (:func:`svi_run_batches`).
    """
    step_prev = 1.0 - step
    G_shp, G_rte = state.G_shp, state.G_rte
    L_shp, L_rte = state.L_shp, state.L_rte
    k_rte, t_rte = state.k_rte, state.t_rte

    # The reference resets the declared batch rows to the prior constant and
    # then scatter-adds phi over ALL rows touched by the triplets
    # (``pxi:304-314``); rows touched but not declared keep the added mass.
    # ``where(mask, prior, old) + segsum`` reproduces that exactly.
    if user_side:
        # Local side: users get full coordinate updates; global side (items)
        # gets the blended natural-gradient step.
        Beta_old = L_shp / L_rte
        G_rte = hp.k_shp / k_rte + jnp.sum(Beta_old, axis=0, keepdims=True)
        G_shp = jnp.where(umask, hp.a, G_shp) + su
        Theta = G_shp / G_rte
        L_shp_scat = jnp.where(imask, hp.c, L_shp) + si
        L_shp = jnp.where(imask, step * mult * L_shp_scat + step_prev * L_shp, L_shp_scat)
        L_rte = jnp.where(
            imask,
            step * (hp.t_shp / t_rte + jnp.sum(Theta, axis=0, keepdims=True))
            + step_prev * L_rte,
            L_rte,
        )
        Beta = L_shp / L_rte
    else:
        Theta_old = G_shp / G_rte
        L_rte = hp.t_shp / t_rte + jnp.sum(Theta_old, axis=0, keepdims=True)
        L_shp = jnp.where(imask, hp.c, L_shp) + si
        G_shp_scat = jnp.where(umask, hp.a, G_shp) + su
        G_shp = jnp.where(umask, step * mult * G_shp_scat + step_prev * G_shp, G_shp_scat)
        Beta = L_shp / L_rte
        G_rte = jnp.where(
            umask,
            step * (hp.k_shp / k_rte + jnp.sum(Beta, axis=0, keepdims=True))
            + step_prev * G_rte,
            G_rte,
        )
        Theta = G_shp / G_rte

    new_k = step * (hp.add_k_rte + jnp.sum(Theta, axis=1, keepdims=True)) + step_prev * k_rte
    new_t = step * (hp.add_t_rte + jnp.sum(Beta, axis=1, keepdims=True)) + step_prev * t_rte
    if blend_all_scalers:
        k_rte, t_rte = new_k, new_t
    else:
        k_rte = jnp.where(umask, new_k, k_rte)
        t_rte = jnp.where(imask, new_t, t_rte)

    return VariationalState(G_shp, G_rte, L_shp, L_rte, k_rte, t_rte)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "user_side", "blend_all_scalers", "phi_sums_fn"),
    donate_argnums=(0,),
)
def svi_batch_update(
    state: VariationalState,
    y: jax.Array,
    iu: jax.Array,
    ii: jax.Array,
    umask: jax.Array,  # (nU, 1) bool — users touched by this batch
    imask: jax.Array,  # (nI, 1) bool — items touched by this batch
    step: jax.Array,
    mult: jax.Array,
    hp: Hyperparams,
    user_side: bool = True,
    blend_all_scalers: bool = False,
    phi_sums_fn=None,  # mesh-parallel phi-sum override (static)
) -> VariationalState:
    """One SVI mini-batch update.

    ``user_side=True`` reproduces the user-epoch update (``pxi:275-325``;
    also ``partial_fit`` with ``batch_type='users'`` when
    ``blend_all_scalers=True``, ``pxi:442-473``); ``user_side=False`` the
    item-epoch (``pxi:327-377``).  ``phi_sums_fn`` (e.g.
    ``parallel.engine.make_sharded_svi_phi_sums``) shards the batch's phi
    segment sums over a mesh; the padded buffers must then divide evenly
    by the mesh size.
    """
    su, si = _batch_phi_sums(state, y, iu, ii, phi_sums_fn=phi_sums_fn)
    return _svi_update_math(
        state, su, si, umask, imask, step, mult, hp, user_side, blend_all_scalers
    )


@functools.partial(jax.jit, static_argnames=("p_cap",))
def build_epoch_buffers(
    y_sorted: jax.Array,  # (nnz,) CSR/CSC-sorted counts (row-major)
    cols_sorted: jax.Array,  # (nnz,) int32 other-side index per nonzero
    indptr: jax.Array,  # (n_rows+1,) int32 row pointers
    perm: jax.Array,  # (NP,) int32 shuffled row ids; entries past n_rows
    #                    are pad duplicates of real rows (counted as zero)
    p_cap: int,  # static per-batch nonzero capacity; buffers get p_cap
    #              inert tail entries so fixed-size slices never clamp
):
    """Materialize one epoch's nonzeros in shuffled-row order, on device.

    This is the device-side replacement for the reference's per-batch
    two-pass host gather (``cython_loops.pxi:27-42, 770-797``): the CSR
    arrays stay resident on the device and the host ships only the (NP,)
    permutation per epoch.  Position ``j`` of the epoch stream belongs to
    the permuted row ``p`` with ``offsets[p] <= j < offsets[p+1]`` (found
    with one vectorized ``searchsorted``), and maps back to CSR slot
    ``indptr[perm[p]] + (j - offsets[p])``.

    Returns ``(e_y, e_row, e_col, offsets)`` where ``offsets`` is the
    (NP+1,) exclusive prefix sum of permuted row degrees — batch ``b`` of
    ``B`` rows spans epoch positions ``[offsets[b*B], offsets[(b+1)*B])``.
    """
    NP = perm.shape[0]
    n_rows = indptr.shape[0] - 1
    nnz = y_sorted.shape[0]
    starts_r = indptr[perm]
    counts = jnp.where(jnp.arange(NP) < n_rows, indptr[perm + 1] - starts_r, 0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), dtype=jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    pos = jnp.arange(nnz + p_cap, dtype=jnp.int32)
    p = jnp.clip(jnp.searchsorted(offsets, pos, side="right") - 1, 0, NP - 1)
    src = jnp.clip(starts_r[p] + (pos - offsets[p]), 0, nnz - 1)
    valid = pos < offsets[-1]
    e_y = jnp.where(valid, y_sorted[src], 0)
    e_row = jnp.where(valid, perm[p], 0).astype(jnp.int32)
    e_col = jnp.where(valid, cols_sorted[src], 0).astype(jnp.int32)
    return e_y, e_row, e_col, offsets


@functools.partial(
    jax.jit,
    static_argnames=("hp", "user_side", "batch_rows", "nb_run", "p_cap",
                     "phi_sums_fn"),
    donate_argnums=(0,),
)
def svi_run_batches(
    state: VariationalState,
    e_y: jax.Array,
    e_row: jax.Array,
    e_col: jax.Array,
    offsets: jax.Array,
    perm: jax.Array,
    mults: jax.Array,  # (nbatches,) natural-gradient multipliers n/|batch|
    step: jax.Array,
    b0: jax.Array,  # first batch index of this dispatch
    nb_real: jax.Array,  # total real batches this epoch (pad batches no-op)
    hp: Hyperparams,
    user_side: bool,
    batch_rows: int,
    nb_run: int,  # static batches per dispatch (dispatch-duration cap)
    p_cap: int,
    phi_sums_fn=None,  # mesh-parallel phi-sum override (static)
) -> VariationalState:
    """Run ``nb_run`` consecutive SVI mini-batches in ONE dispatch.

    Each iteration of the outer ``fori_loop`` accumulates one batch's phi
    segment sums over ``ceil(nnz_b / p_cap)`` fixed-size windows of the
    epoch stream (an inner ``fori_loop`` with a data-dependent trip
    count), masks window tails (y=0 rows are inert in the phi sums),
    rebuilds the touched-row masks on device, and applies the reference's
    blended update (``cython_loops.pxi:277-377``).  The whole epoch
    therefore costs one host->device transfer of the permutation instead
    of per-batch host gathers.

    ``p_cap`` is a CHUNK capacity, not a batch bound: the caller sizes it
    near the mean batch load, so one degree-hot batch (power-law data)
    pays extra chunks for itself instead of setting the padded capacity
    of every batch in the epoch, and — because the mean is
    shuffle-invariant — every epoch reuses one compiled program.  With the
    mesh-parallel ``phi_sums_fn`` each chunk psums its partial tables
    (comm scales with a batch's chunk count); the single-device path
    scatters chunks straight into the carried sums, so per-chunk cost
    stays O(p_cap * k).
    """
    n_users = state.G_shp.shape[0]
    n_items = state.L_shp.shape[0]
    n_local = n_users if user_side else n_items
    n_other = n_items if user_side else n_users

    def upd(b, st):
        r0 = b * batch_rows
        rows_b = jax.lax.dynamic_slice(perm, (r0,), (batch_rows,))
        start = offsets[r0]
        nnz_b = offsets[r0 + batch_rows] - start
        t_tab = exp_elog_tables(st.G_shp, st.G_rte)
        b_tab = exp_elog_tables(st.L_shp, st.L_rte)
        nch = (nnz_b + (p_cap - 1)) // p_cap

        def chunk(c, carry):
            su, si, omask = carry
            s = start + c * p_cap
            yb = jax.lax.dynamic_slice(e_y, (s,), (p_cap,))
            rb = jax.lax.dynamic_slice(e_row, (s,), (p_cap,))
            cb = jax.lax.dynamic_slice(e_col, (s,), (p_cap,))
            vmask = jnp.arange(p_cap, dtype=jnp.int32) < (nnz_b - c * p_cap)
            yb = jnp.where(vmask, yb, 0)
            # route pad slots to the chunk's first real index (duplicate
            # set-True scatters and phi=0 adds are harmless); the loop
            # bound guarantees every chunk has at least one real entry
            cb = jnp.where(vmask, cb, cb[0])
            iu, ii = (rb, cb) if user_side else (cb, rb)
            if phi_sums_fn is None:
                phi = _phi_block(t_tab, b_tab, yb, iu, ii)
                su = su.at[iu].add(phi, mode="promise_in_bounds")
                si = si.at[ii].add(phi, mode="promise_in_bounds")
            else:
                su_c, si_c = phi_sums_fn(t_tab, b_tab, yb, iu, ii)
                su = su + su_c
                si = si + si_c
            omask = omask.at[cb].set(True, mode="promise_in_bounds")
            return su, si, omask

        su, si, omask = jax.lax.fori_loop(
            0, nch, chunk,
            (jnp.zeros_like(t_tab), jnp.zeros_like(b_tab),
             jnp.zeros((n_other, 1), dtype=bool)))
        su = su.astype(st.G_shp.dtype)
        si = si.astype(st.L_shp.dtype)
        lmask = build_row_mask(n_local, rows_b)
        umask, imask = (lmask, omask) if user_side else (omask, lmask)
        return _svi_update_math(
            st, su, si, umask, imask, step, mults[b], hp, user_side, False
        )

    def body(j, st):
        b = b0 + j
        return jax.lax.cond(b < nb_real, lambda s: upd(b, s), lambda s: s, st)

    return jax.lax.fori_loop(0, nb_run, body, state)


def build_row_mask(n_rows: int, rows: jax.Array) -> jax.Array:
    """(n_rows, 1) boolean mask with True at ``rows``.

    ``rows`` may be padded by repeating any of its real entries (duplicates
    are harmless for a set-True scatter).
    """
    return (
        jnp.zeros((n_rows, 1), dtype=bool)
        .at[rows]
        .set(True, mode="promise_in_bounds")
    )


_build_row_mask_jit = jax.jit(build_row_mask, static_argnums=(0,))


@functools.partial(jax.jit, static_argnames=("hp", "maxiter"))
def user_factors_loop(
    y: jax.Array,  # (P,) padded item counts of one user
    elogb_rows: jax.Array,  # (P, k) E[log beta] rows of those items
    beta_colsum: jax.Array,  # (k,)
    Theta0: jax.Array,  # (k,) initial Theta draw (convergence reference point)
    G_shp0: jax.Array,
    G_rte0: jax.Array,
    k_rte0: jax.Array,  # scalar
    hp: Hyperparams,
    maxiter: int,
    stop_thr: jax.Array,
):
    """Fold-in CAVI over a single user's counts with item parameters frozen
    (reference ``calc_user_factors`` loop, ``pxi:504-515``).

    Returns (Theta, G_shp, G_rte, phi_norm, n_iters) where ``phi_norm`` are
    the final multinomial probabilities (reference returns ``phi/Y``,
    ``pxi:518``).
    """

    def cond(carry):
        i, _, _, _, _, done = carry
        return jnp.logical_and(i < maxiter, jnp.logical_not(done))

    def body(carry):
        i, Theta, G_shp, G_rte, k_rte, _ = carry
        logits = (jax.scipy.special.digamma(G_shp) - jnp.log(G_rte))[None, :] + elogb_rows
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        phi = (y / jnp.sum(e, axis=-1))[:, None] * e
        G_rte = hp.k_shp / k_rte + beta_colsum
        G_shp = hp.a + jnp.sum(phi, axis=0)
        Theta_new = G_shp / G_rte
        k_rte = hp.add_k_rte + jnp.sum(Theta_new)
        done = jnp.linalg.norm(Theta_new - Theta) < stop_thr
        return (i + 1, Theta_new, G_shp, G_rte, k_rte, done)

    i, Theta, G_shp, G_rte, k_rte, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0), Theta0, G_shp0, G_rte0, k_rte0, jnp.array(False))
    )
    # Final normalized phi (probabilities) for return_all parity.
    logits = (jax.scipy.special.digamma(G_shp) - jnp.log(G_rte))[None, :] + elogb_rows
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    phi_norm = e / jnp.sum(e, axis=-1, keepdims=True)
    return Theta, G_shp, G_rte, phi_norm, i
