"""AFS transform golden examples (cf. reference tests/test_afs.py)."""

import numpy as np

from phlash_tpu.afs import bws_transform, default_afs_transform, fold_transform, project_transform


def test_fold_even():
    T = fold_transform(4)  # n=4 -> 3 entries -> 2 folded
    afs = np.array([5.0, 3.0, 2.0])
    folded = T @ afs
    np.testing.assert_allclose(folded, [7.0, 3.0])


def test_fold_odd():
    T = fold_transform(5)  # n=5 -> 4 entries -> 2 folded
    afs = np.array([5.0, 3.0, 2.0, 1.0])
    np.testing.assert_allclose(T @ afs, [6.0, 5.0])


def test_fold_is_stochastic():
    for n in [4, 5, 8, 11]:
        T = fold_transform(n)
        np.testing.assert_allclose(T.sum(0), 1.0)


def test_project_substochastic():
    "Columns sum to <= 1: the deficit is mass projected onto monomorphic classes."
    T = project_transform(10, 4)
    s = T.sum(0)
    assert (s <= 1.0 + 1e-12).all() and (s > 0.0).all()
    # middle frequencies rarely project to monomorphic, so retain most mass
    assert s[4] > 0.9


def test_project_identity():
    T = project_transform(5, 5)
    np.testing.assert_allclose(T, np.eye(4), atol=1e-12)


def test_bws_lumps_tail():
    afs = np.array([80.0, 10.0, 5.0, 3.0, 2.0])
    T = bws_transform(afs, alpha=0.1)
    out = T @ afs
    # total mass preserved
    np.testing.assert_allclose(out.sum(), afs.sum())
    assert T.shape[1] == 5
    assert T.shape[0] < 5 or (T == np.eye(5)).all()


def test_default_transform_preserves_mass():
    afs = np.array([100.0, 40.0, 20.0, 10.0, 5.0, 2.0, 1.0])
    T = default_afs_transform(afs)
    np.testing.assert_allclose((T @ afs).sum(), afs.sum())
