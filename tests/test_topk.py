"""Batch topN vs the per-user reference-semantics topN."""

import numpy as np
import pandas as pd
import pytest

from hpfrec_tpu import HPF


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "UserId": rng.integers(80, size=4000),
        "ItemId": rng.integers(60, size=4000),
        "Count": rng.poisson(2, 4000) + 1,
    }).drop_duplicates(["UserId", "ItemId"])
    m = HPF(k=8, maxiter=20, check_every=10, stop_crit="maxiter",
            random_seed=1, verbose=False)
    m.fit(df)
    return m, df


def test_topn_batch_matches_single(fitted):
    m, df = fitted
    users = np.unique(df["UserId"].to_numpy())[:12]
    batch = m.topN_batch(users, n=7, exclude_seen=True)
    assert batch.shape == (12, 7)
    for j, u in enumerate(users):
        single = m.topN(user=u, n=7, exclude_seen=True)
        assert set(batch[j].tolist()) == set(single.tolist()), u


def test_topn_batch_no_exclusion(fitted):
    m, df = fitted
    users = np.unique(df["UserId"].to_numpy())[:5]
    batch = m.topN_batch(users, n=9, exclude_seen=False)
    for j, u in enumerate(users):
        single = m.topN(user=u, n=9, exclude_seen=False)
        np.testing.assert_array_equal(np.sort(batch[j]), np.sort(single))


def test_topn_batch_unknown_user(fitted):
    m, _ = fitted
    with pytest.raises(ValueError):
        m.topN_batch(np.array([999999]), n=5)
