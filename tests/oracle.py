"""Pure-numpy oracle of the HPF CAVI / SVI math.

An independent implementation of the mean-field updates (written from the
model equations, not from either codebase) used to validate the JAX compute
path.  Matches the update ORDER of the reference algorithm
(/root/reference/hpfrec/cython_loops.pxi:227-259 for full-batch,
:275-377 for SVI, :423-473 for partial_fit)."""

import numpy as np
from scipy.special import digamma


class OracleHPF:
    def __init__(self, a, a_prime, b_prime, c, c_prime, d_prime, k):
        self.a, self.a_prime, self.b_prime = a, a_prime, b_prime
        self.c, self.c_prime, self.d_prime = c, c_prime, d_prime
        self.k = k
        self.k_shp = a_prime + k * a
        self.t_shp = c_prime + k * c
        self.add_k_rte = a_prime / b_prime
        self.add_t_rte = c_prime / d_prime

    def init(self, nU, nI, seed, dtype=np.float64):
        rng = np.random.Generator(np.random.MT19937(seed=seed if seed > 0 else None))
        k = self.k
        self.k_rte = np.full((nU, 1), self.b_prime, dtype=dtype)
        self.t_rte = np.full((nI, 1), self.d_prime, dtype=dtype)
        self.G_rte = self.a_prime + 0.01 * rng.random(size=(nU, k), dtype=dtype)
        self.L_rte = self.c_prime + 0.01 * rng.random(size=(nI, k), dtype=dtype)
        self.G_shp = self.a_prime + 0.01 * rng.random(size=(nU, k), dtype=dtype)
        self.L_shp = self.c_prime + 0.01 * rng.random(size=(nI, k), dtype=dtype)
        return self

    @property
    def Theta(self):
        return self.G_shp / self.G_rte

    @property
    def Beta(self):
        return self.L_shp / self.L_rte

    def phi(self, y, iu, ii):
        logits = (digamma(self.G_shp) - np.log(self.G_rte))[iu] + (
            digamma(self.L_shp) - np.log(self.L_rte)
        )[ii]
        m = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - m)
        return y[:, None] * e / e.sum(axis=1, keepdims=True)

    def seg_sums(self, phi, y, iu, ii, nU, nI):
        su = np.zeros((nU, self.k), dtype=phi.dtype)
        si = np.zeros((nI, self.k), dtype=phi.dtype)
        np.add.at(su, iu, phi)
        np.add.at(si, ii, phi)
        return su, si

    def full_step(self, y, iu, ii):
        nU, nI = self.G_shp.shape[0], self.L_shp.shape[0]
        phi = self.phi(y, iu, ii)
        su, si = self.seg_sums(phi, y, iu, ii, nU, nI)
        Beta_old = self.Beta
        self.G_rte = self.k_shp / self.k_rte + Beta_old.sum(axis=0, keepdims=True)
        self.G_shp = self.a + su
        Theta = self.Theta
        self.L_rte = self.t_shp / self.t_rte + Theta.sum(axis=0, keepdims=True)
        self.L_shp = self.c + si
        Beta = self.Beta
        self.k_rte = self.add_k_rte + Theta.sum(axis=1, keepdims=True)
        self.t_rte = self.add_t_rte + Beta.sum(axis=1, keepdims=True)
        return self

    def svi_user_batch(self, y, iu, ii, users_b, items_b, step, mult,
                       blend_all_scalers=False):
        nU, nI = self.G_shp.shape[0], self.L_shp.shape[0]
        phi = self.phi(y, iu, ii)
        su, si = self.seg_sums(phi, y, iu, ii, nU, nI)
        sp = 1.0 - step
        self.G_rte = self.k_shp / self.k_rte + self.Beta.sum(axis=0, keepdims=True)
        L_shp_prev = self.L_shp[items_b].copy()
        self.G_shp[users_b] = self.a
        self.G_shp += su
        self.L_shp[items_b] = self.c
        self.L_shp += si
        self.L_shp[items_b] = step * mult * self.L_shp[items_b] + sp * L_shp_prev
        Theta = self.Theta
        self.L_rte[items_b] = step * (
            self.t_shp / self.t_rte[items_b] + Theta.sum(axis=0, keepdims=False)
        ) + sp * self.L_rte[items_b]
        Beta = self.Beta
        new_k = step * (self.add_k_rte + Theta.sum(axis=1, keepdims=True)) + sp * self.k_rte
        new_t = step * (self.add_t_rte + Beta.sum(axis=1, keepdims=True)) + sp * self.t_rte
        if blend_all_scalers:
            self.k_rte, self.t_rte = new_k, new_t
        else:
            self.k_rte[users_b] = new_k[users_b]
            self.t_rte[items_b] = new_t[items_b]
        return self

    def svi_item_batch(self, y, iu, ii, users_b, items_b, step, mult,
                       blend_all_scalers=False):
        nU, nI = self.G_shp.shape[0], self.L_shp.shape[0]
        phi = self.phi(y, iu, ii)
        su, si = self.seg_sums(phi, y, iu, ii, nU, nI)
        sp = 1.0 - step
        self.L_rte = self.t_shp / self.t_rte + self.Theta.sum(axis=0, keepdims=True)
        G_shp_prev = self.G_shp[users_b].copy()
        self.G_shp[users_b] = self.a
        self.G_shp += su
        self.L_shp[items_b] = self.c
        self.L_shp += si
        self.G_shp[users_b] = step * mult * self.G_shp[users_b] + sp * G_shp_prev
        Beta = self.Beta
        self.G_rte[users_b] = step * (
            self.k_shp / self.k_rte[users_b] + Beta.sum(axis=0, keepdims=False)
        ) + sp * self.G_rte[users_b]
        Theta = self.Theta
        new_k = step * (self.add_k_rte + Theta.sum(axis=1, keepdims=True)) + sp * self.k_rte
        new_t = step * (self.add_t_rte + Beta.sum(axis=1, keepdims=True)) + sp * self.t_rte
        if blend_all_scalers:
            self.k_rte, self.t_rte = new_k, new_t
        else:
            self.k_rte[users_b] = new_k[users_b]
            self.t_rte[items_b] = new_t[items_b]
        return self

    def train_llk(self, y, iu, ii):
        yhat = np.einsum("ij,ij->i", self.Theta[iu], self.Beta[ii])
        return float((y * np.log(yhat)).sum() - self.Theta.sum(0).dot(self.Beta.sum(0)))


def synth_counts(nU=60, nI=45, nnz=800, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    iu = rng.integers(0, nU, nnz)
    ii = rng.integers(0, nI, nnz)
    # dedupe (u, i) pairs, sum counts like a real count matrix
    key = iu * nI + ii
    uniq, inv = np.unique(key, return_inverse=True)
    y = np.zeros(len(uniq))
    np.add.at(y, inv, rng.poisson(3.0, nnz) + 1)
    iu = (uniq // nI).astype(np.int32)
    ii = (uniq % nI).astype(np.int32)
    order = np.argsort(iu, kind="stable")
    return y[order].astype(dtype), iu[order], ii[order]
