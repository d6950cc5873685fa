"""Variational state for Hierarchical Poisson Factorization.

The model (reference: ``hpfrec/cython_loops.pxi:117-143`` for the
initialization semantics, ``README.md:21-31`` of the reference for the
generative story) is:

    ksi_u      ~ Gamma(a_prime, a_prime / b_prime)      (user activity)
    theta_{uk} ~ Gamma(a, ksi_u)                        (user factors)
    eta_i      ~ Gamma(c_prime, c_prime / d_prime)      (item popularity)
    beta_{ik}  ~ Gamma(c, eta_i)                        (item factors)
    y_{ui}     ~ Poisson(theta_u . beta_i)

Mean-field CAVI keeps Gamma variational posteriors, parameterized by
shape/rate pairs: ``Gamma_shp/Gamma_rte`` for theta (per user x factor),
``Lambda_shp/Lambda_rte`` for beta (per item x factor), and scalar-per-row
rates ``k_rte`` (ksi) and ``t_rte`` (eta); the corresponding shapes
``k_shp = a_prime + k*a`` and ``t_shp = c_prime + k*c`` are constants
(``cython_loops.pxi:173-174``).

``Theta``/``Beta`` (posterior means) are derived: shp / rte.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Hyperparams(NamedTuple):
    """Prior hyperparameters. A plain tuple of Python floats so it can be a
    static (hashable) argument to jitted functions and fold into the XLA
    program as compile-time constants."""

    a: float = 0.3
    a_prime: float = 0.3
    b_prime: float = 1.0
    c: float = 0.3
    c_prime: float = 0.3
    d_prime: float = 1.0
    k: int = 30

    @property
    def k_shp(self) -> float:
        return self.a_prime + self.k * self.a

    @property
    def t_shp(self) -> float:
        return self.c_prime + self.k * self.c

    @property
    def add_k_rte(self) -> float:
        return self.a_prime / self.b_prime

    @property
    def add_t_rte(self) -> float:
        return self.c_prime / self.d_prime


class VariationalState(NamedTuple):
    """The six variational arrays (a JAX pytree).

    Shapes: ``G_shp``/``G_rte``: (nU, k); ``L_shp``/``L_rte``: (nI, k);
    ``k_rte``: (nU, 1); ``t_rte``: (nI, 1).

    PADDED-STATE INVARIANT (table-sharded engine): a state that went
    through ``parallel.table_sharded.pad_state`` carries ENGINE-INTERNAL
    garbage on its pad rows — after a step they hold e.g. ``G_shp = a``
    with ``G_rte = +inf`` (so ``shp/rte`` and ``exp(digamma(shp) -
    log(rte))`` are exactly +0.0, which is all the step relies on).  Pad
    rows must never be read directly: every consumer (checkpointing,
    metrics, the final fitted attributes) must go through
    ``HPF._slice_state_real`` / divide shp by rte first.
    """

    G_shp: jax.Array
    G_rte: jax.Array
    L_shp: jax.Array
    L_rte: jax.Array
    k_rte: jax.Array
    t_rte: jax.Array

    @property
    def Theta(self) -> jax.Array:
        return self.G_shp / self.G_rte

    @property
    def Beta(self) -> jax.Array:
        return self.L_shp / self.L_rte

    @property
    def nusers(self) -> int:
        return self.G_shp.shape[0]

    @property
    def nitems(self) -> int:
        return self.L_shp.shape[0]

    @property
    def k(self) -> int:
        return self.G_shp.shape[1]


def initialize_state(
    nusers: int,
    nitems: int,
    hp: Hyperparams,
    random_seed: int | None,
    dtype=np.float32,
) -> VariationalState:
    """Seeded random initialization.

    Reproduces the reference's semantics (``cython_loops.pxi:117-143``)
    exactly, including the MT19937 bitstream and draw order
    (G_rte, L_rte, G_shp, L_shp as ``prior + 0.01*U(0,1)``), so that a run
    with the same seed and dtype starts from bit-identical parameters.
    The draws happen on host (numpy) — a one-time O((nU+nI)k) cost.
    """
    seed = random_seed if (random_seed is not None and random_seed > 0) else None
    rng = np.random.Generator(np.random.MT19937(seed=seed))
    k = hp.k

    k_rte = np.full((nusers, 1), hp.b_prime, dtype=dtype)
    t_rte = np.full((nitems, 1), hp.d_prime, dtype=dtype)

    G_rte = hp.a_prime + 0.01 * rng.random(size=(nusers, k), dtype=dtype)
    L_rte = hp.c_prime + 0.01 * rng.random(size=(nitems, k), dtype=dtype)
    G_shp = hp.a_prime + 0.01 * rng.random(size=(nusers, k), dtype=dtype)
    L_shp = hp.c_prime + 0.01 * rng.random(size=(nitems, k), dtype=dtype)

    return VariationalState(
        G_shp=jnp.asarray(G_shp),
        G_rte=jnp.asarray(G_rte),
        L_shp=jnp.asarray(L_shp),
        L_rte=jnp.asarray(L_rte),
        k_rte=jnp.asarray(k_rte),
        t_rte=jnp.asarray(t_rte),
    )


def initialize_extra_rows(
    n: int, prime: float, scaler_prime: float, k: int, seed: int | None, dtype=np.float32
):
    """New-row initialization for model growth (``partial_fit(new_users=True)``;
    reference ``hpfrec/__init__.py:933-963``): shp/rte ~ prime + 0.01*U(0,1),
    scaler rate = scaler_prime."""
    rng = np.random.default_rng(seed=seed if (seed is not None and seed > 0) else None)
    new_shp = (prime + 0.01 * rng.random(size=(n, k), dtype=dtype)).astype(dtype)
    new_rte = (prime + 0.01 * rng.random(size=(n, k), dtype=dtype)).astype(dtype)
    new_scaler = np.full((n, 1), scaler_prime, dtype=dtype)
    return new_shp, new_rte, new_scaler
