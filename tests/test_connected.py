"""Device connected-components vs scipy oracle."""
import numpy as np
from scipy.sparse.csgraph import connected_components

from vqvae_tpu.ops import connected_components_device, build_knn_graph


def _same_partition(a, b):
    # component labelings are equivalent up to relabeling
    amap, bmap = {}, {}
    for x, y in zip(a, b):
        if x in amap:
            if amap[x] != y:
                return False
        else:
            amap[x] = y
        if y in bmap:
            if bmap[y] != x:
                return False
        else:
            bmap[y] = x
    return True


def test_disconnected(disconnected_two_lines):
    labels = connected_components_device(disconnected_two_lines)
    _, ref = connected_components(disconnected_two_lines, directed=False)
    assert _same_partition(labels, ref)


def test_fully_connected(line_graph):
    labels = connected_components_device(line_graph)
    assert len(set(labels.tolist())) == 1


def test_random_graph(random_latents):
    W, _ = build_knn_graph(random_latents, k=1, sym="mutual")  # k=1 fragments
    labels = connected_components_device(W)
    n_ref, ref = connected_components(W, directed=False)
    assert len(set(labels.tolist())) == n_ref
    assert _same_partition(labels, ref)
