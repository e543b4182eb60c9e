"""Jitted Lloyd K-means vs sklearn oracle."""
import numpy as np
import pytest

from vqvae_tpu.ops.kmeans_euclidean import fit_kmeans, kmeans_plus_plus_init


@pytest.fixture
def blobs():
    rng = np.random.RandomState(0)
    centers = rng.randn(5, 8) * 5
    z = np.concatenate([c + rng.randn(60, 8) for c in centers])
    return z.astype(np.float32)


def test_shapes_and_validity(blobs):
    centers, labels, inertia = fit_kmeans(blobs, 5, seed=0)
    assert centers.shape == (5, 8)
    assert labels.shape == (300,)
    assert ((labels >= 0) & (labels < 5)).all()
    assert inertia >= 0


def test_inertia_competitive_with_sklearn(blobs):
    from sklearn.cluster import KMeans

    _, _, ours = fit_kmeans(blobs, 5, seed=0)
    ref = KMeans(n_clusters=5, n_init=1, random_state=0).fit(blobs).inertia_
    # same algorithm family: inertia within 10% of sklearn's single init
    assert ours <= ref * 1.1


def test_deterministic(blobs):
    c1, l1, i1 = fit_kmeans(blobs, 4, seed=3)
    c2, l2, i2 = fit_kmeans(blobs, 4, seed=3)
    np.testing.assert_array_equal(l1, l2)
    assert i1 == i2


def test_kpp_init_distinct(blobs):
    init = kmeans_plus_plus_init(blobs, 8, seed=1)
    assert init.shape == (8, 8)
    assert len(np.unique(init, axis=0)) == 8


def test_recovers_separated_blobs(blobs):
    centers, labels, _ = fit_kmeans(blobs, 5, seed=0)
    # each true blob should map to predominantly one cluster
    purity = 0
    for b in range(5):
        block = labels[b * 60:(b + 1) * 60]
        purity += np.bincount(block).max()
    assert purity / 300 > 0.95
