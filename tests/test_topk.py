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


def test_topn_batch_backfill_small_catalog():
    """Users with fewer than n unseen items: output stays rectangular,
    unseen items rank first, the user's best seen items backfill."""
    import numpy as np

    from hpfrec_tpu.ops.topk import topn_batch

    nU, nI, k = 3, 6, 2
    rng = np.random.default_rng(0)
    Theta = rng.random((nU, k)).astype(np.float32)
    Beta = rng.random((nI, k)).astype(np.float32)
    # user 0 saw items 0..4 (only item 5 unseen); user 1 saw nothing
    seen_indices = np.array([0, 1, 2, 3, 4], dtype=np.int32)
    seen_indptr = np.array([0, 5, 5], dtype=np.int64)
    n_seen = np.array([5, 0, 0], dtype=np.int64)

    out = topn_batch(Theta, Beta, np.array([0, 1]), 4,
                     seen_indptr, seen_indices, n_seen)
    assert out.shape == (2, 4)
    assert out[0, 0] == 5  # the single unseen item ranks first
    assert len(set(out[0].tolist())) == 4  # backfilled with distinct items
    # user 1: plain top-4 by score
    ref = np.argsort(-(Theta[1] @ Beta.T))[:4]
    np.testing.assert_array_equal(np.sort(out[1]), np.sort(ref))
