"""Full SVI fit through HPF.fit vs an oracle that replays the exact epoch
schedule: same shuffle stream, same batching, same blend order
(reference ``cython_loops.pxi:261-377``)."""

import numpy as np
import pandas as pd

from oracle import OracleHPF, synth_counts


def _run_oracle_svi(oracle, y, iu, ii, nU, nI, users_per_batch, items_per_batch,
                    maxiter, seed, step_size):
    from scipy.sparse import coo_array

    csr = coo_array((y, (iu, ii)), shape=(nU, nI)).tocsr()
    csc = coo_array((y, (iu, ii)), shape=(nU, nI)).tocsc()
    rng = np.random.default_rng(seed if seed > 0 else None)
    users_num = np.arange(nU, dtype=np.int64)
    items_num = np.arange(nI, dtype=np.int64)
    use_users = users_per_batch > 0
    use_items = items_per_batch > 0
    nb_u = int(np.ceil(nU / users_per_batch)) if use_users else 0
    nb_i = int(np.ceil(nI / items_per_batch)) if use_items else 0

    for i in range(maxiter):
        step = float(step_size(i))
        if use_users and use_items:
            user_epoch = ((i + 1) % 2) == 0
        elif use_users:
            user_epoch = True
        else:
            user_epoch = False
        if user_epoch:
            rng.shuffle(users_num)
            for bt in range(nb_u):
                rows = users_num[bt * users_per_batch: min(nU, (bt + 1) * users_per_batch)]
                mult = float(nU) / len(rows)
                yb, iub, iib = [], [], []
                for r in rows:
                    st, en = csr.indptr[r], csr.indptr[r + 1]
                    iib.append(csr.indices[st:en])
                    yb.append(csr.data[st:en])
                    iub.append(np.full(en - st, r))
                yb = np.concatenate(yb); iub = np.concatenate(iub); iib = np.concatenate(iib)
                oracle.svi_user_batch(yb, iub.astype(int), iib.astype(int),
                                      rows, np.unique(iib), step, mult)
        else:
            rng.shuffle(items_num)
            for bt in range(nb_i):
                rows = items_num[bt * items_per_batch: min(nI, (bt + 1) * items_per_batch)]
                mult = float(nI) / len(rows)
                yb, iub, iib = [], [], []
                for r in rows:
                    st, en = csc.indptr[r], csc.indptr[r + 1]
                    iub.append(csc.indices[st:en])
                    yb.append(csc.data[st:en])
                    iib.append(np.full(en - st, r))
                yb = np.concatenate(yb); iub = np.concatenate(iub); iib = np.concatenate(iib)
                oracle.svi_item_batch(yb, iub.astype(int), iib.astype(int),
                                      np.unique(iub), rows, step, mult)
    return oracle


def _parity(users_per_batch, items_per_batch, host_batches=False, mesh=None,
            nU=40, nI=30, nnz=600):
    k, seed = 5, 77
    y, iu, ii = synth_counts(nU, nI, nnz=nnz, seed=4, dtype=np.float64)
    df = pd.DataFrame({"UserId": iu, "ItemId": ii, "Count": y})

    from hpfrec_tpu import HPF

    step_size = lambda x: 1 / np.sqrt(x + 2)  # noqa: E731
    model = HPF(k=k, maxiter=4, check_every=4, stop_crit="maxiter",
                users_per_batch=users_per_batch, items_per_batch=items_per_batch,
                use_float=False, verbose=False, random_seed=seed, reindex=False,
                mesh=mesh)
    import os

    os.environ["HPFREC_TPU_SVI_HOST_BATCHES"] = "1" if host_batches else "0"
    try:
        model.fit(df)
    finally:
        os.environ.pop("HPFREC_TPU_SVI_HOST_BATCHES", None)

    oracle = OracleHPF(0.3, 0.3, 1.0, 0.3, 0.3, 1.0, k).init(nU, nI, seed, np.float64)
    _run_oracle_svi(oracle, y, iu, ii, nU, nI,
                    users_per_batch or 0, items_per_batch or 0, 4, seed, step_size)

    np.testing.assert_allclose(model.Gamma_shp, oracle.G_shp, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model.Lambda_shp, oracle.L_shp, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model.Theta, oracle.Theta, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model.Beta, oracle.Beta, rtol=1e-8, atol=1e-10)


def test_user_epochs_parity():
    _parity(13, None)


def test_item_epochs_parity():
    _parity(None, 11)


def test_alternating_epochs_parity():
    _parity(13, 11)


def test_alternating_epochs_parity_host_fallback():
    """The per-batch host-gather path (HPFREC_TPU_SVI_HOST_BATCHES=1) must
    stay semantically identical to the device-resident epoch runner."""
    _parity(13, 11, host_batches=True)


def test_alternating_epochs_parity_sharded():
    """SVI on an 8-device mesh (batch nonzeros sharded, psum of phi sums)
    must match the single-device run and the oracle."""
    from hpfrec_tpu.parallel import make_mesh

    _parity(13, 11, mesh=make_mesh())


def test_multichunk_batches_parity():
    """Batches larger than the chunk capacity (p_cap floor 1024) must
    accumulate their phi sums over several windows and still match the
    oracle exactly — the degree-hot-batch path of svi_run_batches."""
    _parity(50, None, nU=60, nI=40, nnz=6000)


def test_multichunk_batches_parity_sharded():
    """Multi-chunk accumulation composed with the mesh-parallel phi sums
    (per-chunk psum)."""
    from hpfrec_tpu.parallel import make_mesh

    _parity(50, 35, nU=60, nI=40, nnz=6000, mesh=make_mesh())


def test_svi_ell_metric_no_blocked_coo():
    """Round-2 verdict item 5: SVI fits with the default ELL engine must
    evaluate train metrics on an ELL layout, never a blocked-COO device
    copy (the mode exists for out-of-memory data)."""
    import pandas as pd

    from hpfrec_tpu import HPF

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"UserId": rng.integers(0, 60, 1500),
                       "ItemId": rng.integers(0, 40, 1500),
                       "Count": rng.poisson(2.0, 1500) + 1.0}
                      ).drop_duplicates(["UserId", "ItemId"])
    m = HPF(k=5, maxiter=4, check_every=2, stop_crit="train-llk",
            stop_thr=1e-12, users_per_batch=16, random_seed=6, verbose=False)
    m.fit(df)
    assert m._metric_ell is not None or m._metric_sums_fn is not None
    assert np.isfinite(m.train_llk)

    # a diff-norm SVI fit never reads train metrics -> layout not built
    m2 = HPF(k=5, maxiter=4, check_every=2, stop_crit="diff-norm",
             stop_thr=1e-12, users_per_batch=16, random_seed=6, verbose=False)
    m2.fit(df)
    assert m2._metric_ell is None and m2._metric_sums_fn is None
