"""Shortest-path backend dispatch: device relaxation vs native host Dijkstra.

Two first-party backends cover the reference's scipy Dijkstra role:

- ``device``: source-batched Bellman-Ford on the TPU mesh
  (ops.shortest_paths) — wins at scale (large E x K), where the reference's
  sequential Dijkstra is the pipeline bottleneck.
- ``host``: the native C++ multi-threaded binary-heap Dijkstra
  (vqvae_tpu.native) — wins on small graphs where per-call device dispatch
  dominates.

``auto`` picks by estimated work (K * E); both return identical distances
(tested against each other and scipy).
"""
from __future__ import annotations

import os

import numpy as np

from .shortest_paths import EdgeList, multi_source_shortest_paths


def _host_threads() -> int:
    try:
        return max(1, len(os.sched_getaffinity(0)))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


# below this K*E work estimate the threaded host Dijkstra beats device
# dispatch + bucketed-graph conversion + relaxation sweeps. Calibrated on
# v5e vs an 8-thread native Dijkstra (crossover ~1e9 at 49k-196k nodes)
# and scaled by the cores THIS host actually exposes — on a 1-core box the
# same Dijkstra is ~8x slower, and a miscalibrated threshold sent 196k
# kpp rounds to a 58s host solve where the device does them in seconds.
HOST_WORK_THRESHOLD = 1.25e8 * _host_threads()


def multi_source_distances(
    W_or_edges,
    sources: np.ndarray,
    backend: str = "auto",
    d0=None,
    device_out: bool = False,
    mesh=None,
):
    """(N, K) float32 distances from each of K sources to all nodes.

    ``d0``: optional per-entry upper bounds to warm-start the device
    relaxation from (ignored by the host Dijkstra, which is exact from
    scratch). ``device_out``: return the device array instead of numpy so
    callers can chain device-side reductions without a host round-trip.
    """
    from scipy import sparse

    sources = np.asarray(sources)
    is_csr = sparse.issparse(W_or_edges)

    if backend == "auto":
        if is_csr:
            work = float(W_or_edges.nnz) * len(sources)
            backend = "host" if work < HOST_WORK_THRESHOLD and _native_ok() else "device"
        else:
            backend = "device"

    if backend == "host":
        if not is_csr:
            raise ValueError("host backend needs a scipy CSR graph")
        from .. import native

        return native.dijkstra_multi_source(W_or_edges, sources.astype(np.int32)).T.copy()

    from .ell import BucketedGraph, multi_source_shortest_paths_ell

    if isinstance(W_or_edges, BucketedGraph):
        d = multi_source_shortest_paths_ell(W_or_edges, sources, d0=d0,
                                            mesh=mesh)
    elif isinstance(W_or_edges, EdgeList):
        d = multi_source_shortest_paths(W_or_edges, sources, d0=d0)
    else:
        # CSR on device: the scatter-free bucketed engine is the fast path
        # (measured ~1.3x over the segment_min edge-list engine at 196k/K=512)
        d = multi_source_shortest_paths_ell(
            BucketedGraph.from_csr(W_or_edges), sources, d0=d0, mesh=mesh)
    return d if device_out else np.asarray(d)


def _native_ok() -> bool:
    try:
        from .. import native

        return native.available()
    except ImportError:
        return False
