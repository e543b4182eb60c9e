"""Graph-native geodesic K-medoids on TPU (with native-host fallback).

Mirrors the reference algorithm (reference src/geo/kmeans_optimized.py):
k-means++ initialization over graph distances, one-shot assignment via a
multi-source shortest-path pass, and quantization error as the sum of
squared finite geodesic distances. No full N x N matrix is ever formed.

Two initializations:

- ``kpp``: the reference's exact sequential scheme (kmeans_optimized.py:
  14-74) — one single-source pass per new center, d^2-weighted sampling
  with the same disconnected-component guards (inf distances clamped to
  2 x max finite; all-inf fallback to uniform). Deterministic per seed.
- ``kpp_parallel`` (default for large graphs): a k-means||-style batched
  reformulation — R rounds, each sampling a block of centers jointly from
  the current d^2 distribution (Gumbel top-m without replacement) followed
  by ONE multi-source relaxation for the whole block. This collapses the
  reference's 511 sequential Dijkstra chains into ~R source-batched sweeps,
  which is what makes the TPU formulation fast. Statistically equivalent
  (QE parity within tolerance), not bitwise: seeded-determinism holds
  within this framework. Default ``rounds=4``: relaxation time per pass is
  sublinear in source count, so fewer/wider rounds are faster (983k/K=512
  on v5e: 21.3s at 4 rounds vs 52.5s at 8) and QE is flat in the round
  count (QE-parity contract tests at 16k/49k; measured 983k curve in
  docs/benchmarks.md).

Backends (ops.backend): shortest paths run device-side (source-batched
Bellman-Ford over the mesh) at scale, or through the native C++ Dijkstra
(vqvae_tpu.native) when the graph is small; ``backend="auto"`` picks by
estimated work.

Unlike the reference (which runs a *third* full multi-source pass just to
compute QE, kmeans_optimized.py:125-129), assignment and QE come from the
same distance matrix.
"""
from __future__ import annotations

import functools
import os
import time
from typing import List, Tuple, Union

import numpy as np

from .backend import HOST_WORK_THRESHOLD, _native_ok, multi_source_distances
from .shortest_paths import EdgeList

GraphLike = Union["scipy.sparse.spmatrix", EdgeList]  # noqa: F821

# set VQVAE_TPU_KMED_STATS=1 to append one record per fit_kmedoids call:
# where the stage's wall time goes OUTSIDE the ELL solver (BFS reorder,
# device-graph build + H2D, per-pass device dispatch, host d^2 sampling).
# Complements ELL_STATS (in-solver time); bench.py reports the split.
KMED_STATS: list = []


def _kmed_stats_on() -> bool:
    return os.environ.get("VQVAE_TPU_KMED_STATS") == "1"


class GraphHandle:
    """Per-call backend dispatch with cached graph conversions.

    k-means++ rounds relax from a handful of sources (host Dijkstra wins)
    while the final assignment relaxes from all K (device wins) — so the
    backend must be chosen per call by its actual work, not once per fit.
    """

    def __init__(self, W, backend: str = "auto", mesh=None,
                 assume_symmetric: bool = False):
        from scipy import sparse

        from .ell import BucketedGraph

        self._forced = None if backend == "auto" else backend
        self._csr = None
        self._bucketed = None
        self._edges = None
        self.mesh = mesh
        self._assume_sym = assume_symmetric
        if isinstance(W, EdgeList):
            self._edges = W
            self.n_nodes = W.n_nodes
            self.nnz = int(W.src.shape[0])
        elif isinstance(W, BucketedGraph):
            self._bucketed = W
            self.n_nodes = W.n_nodes
            self.nnz = int(sum(b.size for b in W.nbrs))
        elif sparse.issparse(W):
            self._csr = W.tocsr()
            self.n_nodes = W.shape[0]
            self.nnz = int(W.nnz)
        else:
            raise TypeError(f"unsupported graph type {type(W)}")

    def choose(self, k_sources: int) -> str:
        """Backend the next ``distances`` call with k_sources would pick."""
        if self._forced is not None:
            return self._forced
        work = float(self.nnz) * max(k_sources, 1)
        host_ok = self._csr is not None and _native_ok()
        return "host" if (work < HOST_WORK_THRESHOLD and host_ok) else "device"

    def distances(self, sources: np.ndarray, d0=None,
                  device_out: bool = False) -> np.ndarray:
        """(N, K) distances; ``d0`` warm-starts the device relaxation (the
        host Dijkstra ignores it), ``device_out`` skips the host copy."""
        sources = np.asarray(sources)
        backend = self.choose(len(sources))
        if backend == "host":
            if self._csr is None:
                raise ValueError("host backend needs a scipy CSR graph")
            return multi_source_distances(self._csr, sources, "host")
        if self._edges is not None:
            return multi_source_distances(self._edges, sources, "device",
                                          d0=d0, device_out=device_out)
        self.ensure_device_graph()
        return multi_source_distances(self._bucketed, sources, "device",
                                      d0=d0, device_out=device_out,
                                      mesh=self.mesh)

    def ensure_device_graph(self, block: bool = False) -> None:
        """Build the device ELL structure now (it is otherwise built lazily
        inside the first ``distances`` call, hiding its host-assembly +
        H2D cost in that round's timing). ``block`` waits for the device
        transfer so callers can time it truthfully.

        Timing split (read by the KMED_STATS consumer): ``_build_s`` is
        host assembly + async H2D dispatch, ``_xfer_wait_s`` the residual
        wait for the transfer to land on device."""
        if self._bucketed is None and self._csr is not None:
            from .ell import BucketedGraph

            t0 = time.perf_counter()
            self._bucketed = BucketedGraph.from_csr(
                self._csr, assume_symmetric=self._assume_sym)
            self._build_s = time.perf_counter() - t0
        if block and self._bucketed is not None:
            import jax

            t1 = time.perf_counter()
            jax.block_until_ready(self._bucketed.nbrs)
            jax.block_until_ready(self._bucketed.wts)
            self._xfer_wait_s = time.perf_counter() - t1


def _resolve(W: GraphLike, K: int, backend: str) -> Tuple["GraphHandle", str, int]:
    handle = W if isinstance(W, GraphHandle) else GraphHandle(W, backend)
    return handle, backend, handle.n_nodes


def _safe_sq_probs(d_min: np.ndarray, centers: List[int]) -> np.ndarray:
    """d^2 sampling weights with the reference's inf/disconnection guards
    (kmeans_optimized.py:47-58)."""
    finite = np.isfinite(d_min)
    if finite.any():
        max_finite = float(d_min[finite].max())
        safe = np.where(finite, d_min, max_finite * 2.0)
    else:
        safe = np.ones_like(d_min)
    probs = safe.astype(np.float64) ** 2
    probs[np.asarray(centers, dtype=int)] = 0.0
    return probs


def kpp_initialization(W: GraphLike, K: int, seed: int = 42,
                       backend: str = "auto") -> List[int]:
    """Exact sequential graph k-means++ (reference semantics)."""
    graph, backend, n = _resolve(W, 1, backend)
    rng = np.random.default_rng(seed)
    centers = [int(rng.integers(0, n))]
    d_min = np.full(n, np.inf, dtype=np.float32)

    for _ in range(1, K):
        d_new = graph.distances(np.asarray([centers[-1]]))[:, 0]
        d_min = np.minimum(d_min, d_new)
        probs = _safe_sq_probs(d_min, centers)
        total = probs.sum()
        if total > 0:
            probs /= total
            centers.append(int(rng.choice(n, p=probs)))
        else:
            remaining = np.setdiff1d(np.arange(n), np.asarray(centers))
            if remaining.size == 0:
                break
            centers.append(int(rng.choice(remaining)))
    return centers


@functools.lru_cache(maxsize=4)
def _device_round_fns(mesh=None):
    """Jitted device-side helpers for the k-means|| round loop (built
    lazily so importing this module never initializes a jax backend).

    With a >1-device ``mesh`` the (N, K) round state carries the same
    K-axis sharding as the relaxation: ``warm_d0`` emits a K-sharded block
    and ``round_update`` reduces it back to replicated (N,) vectors — so
    rounds never gather the full (N, per_round) block onto one device.
    """
    import jax
    import jax.numpy as jnp

    out_shard = None
    if mesh is not None and len(mesh.devices.ravel()) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        out_shard = NamedSharding(mesh, P(None, DATA_AXIS))

    def warm_d0(d_min, sources):
        # (N, K) upper bounds: every column starts at the running
        # nearest-center distance; each source's own column starts at 0
        k = sources.shape[0]
        d0 = jnp.broadcast_to(d_min[:, None], (d_min.shape[0], k))
        return d0.at[sources, jnp.arange(k)].set(0.0)

    def round_update(d_new, d_min, assign, round_ids):
        best = jnp.min(d_new, axis=1)
        local = jnp.argmin(d_new, axis=1)
        improved = best < d_min
        assign = jnp.where(improved, round_ids[local], assign)
        return jnp.minimum(d_min, best), assign

    warm = (jax.jit(warm_d0, out_shardings=out_shard) if out_shard is not None
            else jax.jit(warm_d0))
    return warm, jax.jit(round_update)


def _warm_d0(d_min, sources, mesh=None):
    if mesh is not None:  # uneven K cannot shard: stay replicated
        n_shards = len(mesh.devices.ravel())
        if n_shards <= 1 or int(sources.shape[0]) % n_shards:
            mesh = None
    return _device_round_fns(mesh)[0](d_min, sources)


def _round_update(d_new, d_min, assign, round_ids):
    return _device_round_fns()[1](d_new, d_min, assign, round_ids)


def _pick_schedule(K: int, width: int, schedule: str) -> List[int]:
    """Per-round pick counts summing to K-1, each <= width.

    ``flat``: width-sized blocks (classic k-means||). ``ramp``: geometric
    doubling 1, 2, 4, ... capped at width — early picks are near-sequential
    (each conditioned on an up-to-date d_min), which is where exact
    k-means++ earns its quality; late blocks are wide, which is where the
    batched relaxation earns its speed.
    """
    rem, sizes = K - 1, []
    b = 1 if schedule == "ramp" else width
    while rem > 0:
        m = min(b, width, rem)
        sizes.append(m)
        rem -= m
        if schedule == "ramp":
            b *= 2
    return sizes


def kpp_parallel_initialization(W: GraphLike, K: int, seed: int = 42,
                                rounds: int = 4,
                                backend: str = "auto",
                                return_assignment: bool = False,
                                schedule: str = "flat",
                                mesh=None):
    """Batched k-means|| initialization: R multi-source passes total.

    With ``return_assignment`` the per-round distance passes double as the
    final assignment: every center's distances are relaxed exactly once
    across the rounds, so tracking the running argmin yields the
    nearest-medoid assignment and distances for free — eliminating the
    reference's separate K-source assignment pass (and its second QE pass,
    kmeans_optimized.py:97-129). Returns (centers, assign, dist).

    Device path optimizations (both exact, not approximations):

    - **Warm starts**: each round's relaxation starts from the running
      nearest-center distances ``d_min`` instead of +inf. For any node v and
      new source s, ``min_u(d_min(u) + dist(u, v)) == d_min(v)`` by the
      triangle inequality, so the warm-started fixed point is exactly
      ``min(dist(s, v), d_min(v))`` — which is all the min/argmin updates
      ever read. Later rounds' improvement regions are small, so sweeps
      drop from graph-radius to the region's hop radius.
    - **Device-resident round state**: d_min/assign stay on device; only
      the (N,) d_min vector is fetched per round for the host-side d^2
      sampling, instead of the full (N, per_round) distance block.
    """
    graph, backend, n = _resolve(W, max(1, (K - 1) // max(rounds, 1)), backend)
    if mesh is not None and graph.mesh is None:
        graph.mesh = mesh
    mesh = graph.mesh
    rng = np.random.default_rng(seed)
    first = int(rng.integers(0, n))
    centers: List[int] = [first]
    d_min = np.full(n, np.inf, dtype=np.float32)
    assign = np.zeros(n, dtype=np.int64)
    rounds = max(1, min(rounds, K - 1)) if K > 1 else 0
    if rounds == 0:
        if return_assignment:
            d0 = graph.distances(np.asarray([first]))[:, 0] if n else d_min
            return centers, assign, d0
        return centers

    # every round relaxes the same number of sources so the relaxation
    # compiles ONCE (shape-stable); short rounds are padded with an existing
    # center, whose column can never strictly improve d_min and is therefore
    # inert for both the min and the argmin updates.
    per_round = int(np.ceil((K - 1) / rounds))
    sizes = _pick_schedule(K, per_round, schedule)
    use_device = graph.choose(per_round) == "device"
    if use_device:
        import jax.numpy as jnp

        d_min_dev = jnp.full((n,), jnp.inf, jnp.float32)
        assign_dev = jnp.zeros((n,), jnp.int32)

    stats = ({"n": int(n), "K": int(K), "passes": 0, "pass_seconds": [],
              "sample_seconds": 0.0}
             if _kmed_stats_on() else None)
    if stats is not None and use_device and isinstance(graph, GraphHandle):
        t0 = time.perf_counter()
        graph.ensure_device_graph(block=True)
        stats["device_graph_seconds"] = time.perf_counter() - t0
        stats["device_graph_build_seconds"] = getattr(graph, "_build_s", 0.0)
        stats["device_graph_wait_seconds"] = getattr(graph, "_xfer_wait_s",
                                                     0.0)

    new_centers = [first] * per_round
    round_ids = np.zeros(per_round, dtype=np.int64)
    r = 0
    while True:
        # relax from the centers added last round (one batched pass)
        t_pass = time.perf_counter() if stats is not None else 0.0
        srcs = np.asarray(new_centers, np.int64)
        if use_device:
            d0 = _warm_d0(d_min_dev, jnp.asarray(srcs, jnp.int32), mesh=mesh)
            d_new_dev = graph.distances(srcs, d0=d0, device_out=True)
            d_min_dev, assign_dev = _round_update(
                d_new_dev, d_min_dev, assign_dev,
                jnp.asarray(round_ids, jnp.int32))
            d_min = np.asarray(d_min_dev)  # full sync: pass ends here
        else:
            d_new = graph.distances(srcs)
            best = d_new.min(axis=1)
            improved = best < d_min
            if return_assignment:
                local = d_new.argmin(axis=1)
                assign = np.where(improved, round_ids[local], assign)
            d_min = np.minimum(d_min, best)

        if stats is not None:
            stats["passes"] += 1
            stats["pass_seconds"].append(time.perf_counter() - t_pass)
        if r >= len(sizes) or len(centers) >= K:
            break
        m = min(sizes[r], K - len(centers))
        r += 1
        t_sample = time.perf_counter() if stats is not None else 0.0
        probs = _safe_sq_probs(d_min, centers)
        total = probs.sum()
        if total <= 0:
            pool = np.setdiff1d(np.arange(n), np.asarray(centers))
            picks = rng.choice(pool, size=min(m, pool.size), replace=False)
        else:
            # Gumbel top-m: m distinct samples ~ probs without replacement
            logp = np.full(n, -np.inf)
            nz = probs > 0
            logp[nz] = np.log(probs[nz])
            gumbel = rng.gumbel(size=n)
            picks = np.argsort(-(logp + gumbel))[:m]
            picks = picks[np.isfinite(logp[picks])]
        new_base = len(centers)
        real = [int(p) for p in picks]
        n_pad = per_round - len(real)
        new_centers = real + [centers[0]] * n_pad
        round_ids = np.concatenate([
            new_base + np.arange(len(real), dtype=np.int64),
            np.zeros(n_pad, dtype=np.int64)])
        centers.extend(real)
        if stats is not None:
            stats["sample_seconds"] += time.perf_counter() - t_sample

    if stats is not None:
        KMED_STATS.append(stats)
    centers = centers[:K]
    if use_device:
        assign = np.asarray(assign_dev).astype(np.int64)
    if return_assignment:
        return centers, assign, d_min
    return centers


def assign_points_to_medoids(W: GraphLike, medoids: np.ndarray,
                             backend: str = "auto"
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """One multi-source pass; returns (assign (N,), dist_to_assigned (N,))."""
    medoids = np.asarray(medoids, np.int64)
    graph, backend, _ = _resolve(W, len(medoids), backend)
    d = graph.distances(medoids)  # (N, K)
    assign = d.argmin(axis=1)
    dist = d[np.arange(d.shape[0]), assign]
    return assign.astype(np.int64), dist


def compute_quantization_error(dist_to_assigned: np.ndarray) -> float:
    """Sum of squared finite geodesic distances (kmeans_optimized.py:109-138)."""
    finite = np.isfinite(dist_to_assigned)
    if finite.any():
        return float(np.sum(dist_to_assigned[finite].astype(np.float64) ** 2))
    return float("inf")


def fit_kmedoids(
    W: GraphLike,
    K: int = 512,
    init: str = "kpp",
    seed: int = 42,
    kpp_rounds: int = 4,
    kpp_schedule: str = "flat",
    backend: str = "auto",
    reorder: bool = True,
    mesh=None,
    assume_symmetric: bool = False,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Graph K-medoids: init + one-shot assignment + QE.

    ``init``: "kpp" (exact sequential), "kpp_parallel" (batched k-means||),
    or "random". Matches the reference control flow (fit_kmedoids_optimized,
    kmeans_optimized.py:141-183), which performs no Lloyd refinement.

    ``reorder``: BFS-relabel the graph before device relaxation (sweep-count
    reduction; see ops.graph.bfs_node_order) — results are mapped back to
    original node ids, so callers never see the permutation.
    """
    from scipy import sparse

    perm = None
    reorder_s = 0.0
    # env escape hatch for A/Bs: the BFS relabel + permuted-CSR rebuild
    # costs ~5 s host time at 983k/19.6M (bench detail.kmed_split) and its
    # sweep-count benefit is order-dependent — see docs/benchmarks.md
    # "node-ordering A/B"
    if os.environ.get("VQVAE_TPU_KMED_REORDER", "1") != "1":
        reorder = False
    if (reorder and sparse.issparse(W)
            and float(W.nnz) * max(K, 1) >= HOST_WORK_THRESHOLD):
        from .graph import bfs_node_order

        t0 = time.perf_counter()
        perm = bfs_node_order(W)
        W = W.tocsr()[perm][:, perm]
        reorder_s = time.perf_counter() - t0

    if sparse.issparse(W):  # symmetry survives the BFS permutation
        W = GraphHandle(W, backend, mesh=mesh,
                        assume_symmetric=assume_symmetric)
    graph, resolved, n = _resolve(W, K, backend)
    if mesh is not None and graph.mesh is None:
        graph.mesh = mesh
    assign = dist = None
    if init == "kpp":
        medoids = np.asarray(kpp_initialization(graph, K, seed=seed,
                                                backend=resolved),
                             dtype=np.int64)
    elif init == "kpp_parallel":
        # fused path: the init's per-round relaxations already cover every
        # center once, so assignment + distances come for free (saves the
        # K-wide assignment pass, ~2x on this stage)
        medoids, assign, dist = kpp_parallel_initialization(
            graph, K, seed=seed, rounds=kpp_rounds, backend=resolved,
            return_assignment=True, schedule=kpp_schedule, mesh=mesh)
        medoids = np.asarray(medoids, dtype=np.int64)
        if _kmed_stats_on() and KMED_STATS:
            KMED_STATS[-1]["reorder_seconds"] = reorder_s
    elif init == "random":
        rng = np.random.default_rng(seed)
        medoids = rng.choice(n, size=min(K, n), replace=False).astype(np.int64)
    else:
        raise ValueError("init must be 'kpp', 'kpp_parallel' or 'random'")

    if assign is None:
        assign, dist = assign_points_to_medoids(graph, medoids,
                                                backend=resolved)
    qe = compute_quantization_error(dist)
    if perm is not None:  # map back to original node ids
        medoids = perm[medoids]
        assign_orig = np.empty_like(assign)
        assign_orig[perm] = assign
        assign = assign_orig
    return medoids, assign, qe


def fit_kmedoids_with_connectivity_check(
    W, K: int = 512, init: str = "kpp", seed: int = 42
) -> Tuple[np.ndarray, np.ndarray, float, dict]:
    """Reference-compatible wrapper adding connectivity metadata
    (kmeans_optimized.py:186-227)."""
    from scipy.sparse.csgraph import connected_components

    n = W.shape[0]
    n_components, labels = connected_components(W, directed=False)
    metadata = {
        "n_nodes": int(n),
        "n_edges": int(W.nnz),
        "n_components": int(n_components),
        "largest_component_size": int(np.bincount(labels).max()) if n else 0,
    }
    medoids, assign, qe = fit_kmedoids(W, K=K, init=init, seed=seed)
    metadata.update({
        "n_medoids": len(medoids),
        "quantization_error": qe,
        "method": "tpu_kmedoids",
    })
    return medoids, assign, qe, metadata


if __name__ == "__main__":
    # module self-test (reference kmeans_optimized.py:230-248 parity)
    from .graph import build_knn_graph

    rng = np.random.default_rng(42)
    z = rng.standard_normal((1000, 64)).astype(np.float32)
    W, _ = build_knn_graph(z, k=10)
    medoids, assign, qe = fit_kmedoids(W, K=50, init="kpp", seed=42)
    print(f"medoids={len(medoids)} assignments={len(assign)} qe={qe:.3f}")
    print(f"cluster sizes: min={np.bincount(assign).min()} "
          f"max={np.bincount(assign).max()}")
