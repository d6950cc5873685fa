"""Serving-side ranking kernels.

The reference serves one user at a time with a host BLAS gemv +
argpartition (``hpfrec/__init__.py:1337-1356``, measured 45.8 ms/user on
its 24-core box for a 376K-item catalog).  The TPU path scores a whole
batch of users as one (b, k) x (k, nI) MXU matmul and takes ``lax.top_k``
on device; seen-item exclusion keeps the reference's oversample-then-
setdiff semantics, vectorized on host.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=1)
def _topn_jit():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def _topn_device(Theta_rows, Beta, n: int):
        scores = jnp.dot(Theta_rows, Beta.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, n)

    return _topn_device


def _topn_device(Theta_rows, Beta, n: int):
    return _topn_jit()(Theta_rows, Beta, n=n)


def topn_batch(Theta, Beta, users, n, seen_indptr=None, seen_indices=None,
               n_seen=None):
    """Top-n item rows for each user row in ``users``.

    With seen-lists given, oversamples by the max seen count in the batch
    and excludes on host (same exclusion semantics as reference ``topN``).
    Returns an (len(users), n) int array of item rows.
    """
    import jax.numpy as jnp

    users = np.asarray(users, dtype=np.int64)
    nI = Beta.shape[0]
    if seen_indptr is None:
        k_eff = min(n, nI)
        _, idx = _topn_device(jnp.asarray(Theta[users]), jnp.asarray(Beta), k_eff)
        return np.asarray(idx)

    max_seen = int(n_seen[users].max()) if len(users) else 0
    k_eff = min(n + max_seen, nI)
    _, idx = _topn_device(jnp.asarray(Theta[users]), jnp.asarray(Beta), k_eff)
    idx = np.asarray(idx)
    out = np.empty((len(users), n), dtype=idx.dtype)
    for j, u in enumerate(users):
        st = seen_indptr[u]
        seen = seen_indices[st:st + n_seen[u]]
        mask = ~np.isin(idx[j], seen, assume_unique=False)
        picked = idx[j][mask][:n]
        if picked.shape[0] < n:  # pathological: user saw nearly everything
            rest = np.setdiff1d(np.arange(nI), np.concatenate([seen, picked]))
            picked = np.concatenate([picked, rest[:n - picked.shape[0]]])
        out[j] = picked
    return out
