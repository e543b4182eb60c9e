"""Connected components by min-label propagation with pointer jumping.

Device-side replacement for scipy.sparse.csgraph.connected_components
(reference src/geo/knn_graph_optimized.py:173-187): every node starts with
its own id as label; each sweep takes the min label over incident edges
(segment_min over both edge directions), then pointer-jumps
``labels = labels[labels]`` to shortcut chains, converging in
O(log diameter) sweeps. Runs as one jitted while_loop with static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def _cc_device(src: jax.Array, dst: jax.Array, valid: jax.Array, n_nodes: int) -> jax.Array:
    init = jnp.arange(n_nodes, dtype=jnp.int32)
    big = jnp.int32(n_nodes)  # sentinel larger than any label
    src_l = jnp.where(valid, src, 0)
    dst_l = jnp.where(valid, dst, 0)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        cand = jnp.where(valid, labels[src_l], big)
        prop = jax.ops.segment_min(cand, dst_l, num_segments=n_nodes)
        new = jnp.minimum(labels, prop)
        # pointer jumping: shortcut label chains
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


def connected_components_device(W_or_edges, n_nodes: int | None = None):
    """Labels (N,) int32 of connected components (undirected).

    Accepts a scipy sparse matrix or an (src, dst) tuple. Labels are the
    minimum original node index in each component (canonical, deterministic).
    """
    from scipy import sparse

    if sparse.issparse(W_or_edges):
        coo = W_or_edges.tocoo()
        src = np.concatenate([coo.row, coo.col]).astype(np.int32)
        dst = np.concatenate([coo.col, coo.row]).astype(np.int32)
        n_nodes = W_or_edges.shape[0]
    else:
        s, d = W_or_edges
        src = np.concatenate([s, d]).astype(np.int32)
        dst = np.concatenate([d, s]).astype(np.int32)
        if n_nodes is None:
            n_nodes = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    e = len(src)
    e_pad = max(8, ((e + 8191) // 8192) * 8192)
    valid = np.zeros(e_pad, bool)
    valid[:e] = True
    src_p = np.zeros(e_pad, np.int32)
    dst_p = np.zeros(e_pad, np.int32)
    src_p[:e] = src
    dst_p[:e] = dst
    labels = _cc_device(jnp.asarray(src_p), jnp.asarray(dst_p),
                        jnp.asarray(valid), int(n_nodes))
    return np.asarray(labels)
