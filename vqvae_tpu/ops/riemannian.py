"""Decoder-pullback Riemannian edge lengths via jax.jvp.

Parity target: reference src/geo/riemannian_metric.py:12-66 —
L_ij ~= 0.5 * (||J(z_i) dz|| + ||J(z_j) dz||) where J is the Jacobian of
z -> sigmoid(decoder(z)) flattened to pixels, and dz = z_j - z_i.

The torch implementation calls ``torch.autograd.functional.jvp`` per
512-edge batch (riemannian_metric.py:32-34, two decoder JVPs each); here
the whole batched computation — both endpoint JVPs — is a single jitted
``lax.map`` over fixed-size chunks of the edge list, so the decoder's
linearization runs fully fused on the MXU. For spatial decoders, each
latent vector is decoded as a 1x1 spatial grid exactly like the reference
(riemannian_metric.py:24-27: 2-D z is unsqueezed to (B, C, 1, 1)).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_decoder_image_fn(model, variables, topology: str) -> Callable:
    """Build z -> flattened sigmoid(decoder(z)) for the given VAE.

    ``topology="flat"``: z (B, D) feeds the dense decoder directly.
    ``topology="spatial"``: z (B, C) is decoded as a (B, 1, 1, C) grid
    (NHWC transpose of the reference's (B, C, 1, 1)).
    """
    def decode_fn(z):
        if topology == "spatial" and z.ndim == 2:
            z = z[:, None, None, :]
        logits = model.apply(variables, z, method=model.decode)
        img = jax.nn.sigmoid(logits)
        return img.reshape(img.shape[0], -1)

    return decode_fn


@functools.lru_cache(maxsize=16)
def _build_lengths_fn(mesh, decode_fn, fused: bool, latent_ndim: int = 1):
    """Compiled chunked edge-length kernel.

    ``mesh``: >1-device meshes shard the chunk axis with ``shard_map``
    (edge chunks are embarrassingly data-parallel; decoder params ride in as
    replicated closure constants). ``fused``: evaluate both endpoint JVPs in
    ONE decoder linearization over the concatenated (za, zb) batch — half
    the kernel dispatches of the two-call form at identical FLOPs.
    """
    def impl(z_start_chunks, z_end_chunks):
        def one_chunk(args):
            za, zb = args
            v = zb - za
            if fused:
                _, jvp = jax.jvp(decode_fn,
                                 (jnp.concatenate([za, zb]),),
                                 (jnp.concatenate([v, v]),))
                norms = jnp.linalg.norm(jvp.astype(jnp.float32), axis=1)
                na, nb = norms[:za.shape[0]], norms[za.shape[0]:]
            else:
                _, jvp_a = jax.jvp(decode_fn, (za,), (v,))
                _, jvp_b = jax.jvp(decode_fn, (zb,), (v,))
                na = jnp.linalg.norm(jvp_a.astype(jnp.float32), axis=1)
                nb = jnp.linalg.norm(jvp_b.astype(jnp.float32), axis=1)
            return 0.5 * (na + nb)

        return jax.lax.map(one_chunk, (z_start_chunks, z_end_chunks))

    if mesh is not None and len(mesh.devices.ravel()) > 1:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        # chunk inputs are (n_chunks, bs, *latent_shape): shard the chunk
        # axis only, replicate the rest whatever the latent rank (spatial
        # latents are rank>2; a fixed rank-3 spec would fail in shard_map)
        spec = P(DATA_AXIS, *([None] * (latent_ndim + 1)))
        impl = jax.shard_map(impl, mesh=mesh, in_specs=(spec, spec),
                             out_specs=P(DATA_AXIS, None))
    return jax.jit(impl)


@functools.partial(jax.jit, static_argnames=("decode_fn",))
def _pullback_metrics(decode_fn, z_chunks):
    """Per-node pullback metric G(z) = J(z)^T J(z), J the decoder Jacobian.

    The D basis tangents of a node chunk are flattened into ONE large-batch
    JVP (node repeated D times, tangents = tiled identity): a node costs D
    primal+tangent passes at full per-sample conv throughput. Measured on
    v5e this beats a ``jax.linearize`` + vmap-over-tangents formulation by
    >5x — XLA executes the replayed linear jaxpr far below plain-JVP conv
    throughput — and halves decoder passes vs 2-JVPs-per-edge whenever
    2N*D < 4E.
    """
    b, d = z_chunks.shape[1], z_chunks.shape[2]
    basis = jnp.tile(jnp.eye(d, dtype=z_chunks.dtype), (b, 1))  # (B*D, D)

    def one_chunk(zb):  # (B, D) -> (B, D, D)
        z_rep = jnp.repeat(zb, d, axis=0)                       # (B*D, D)
        _, jt = jax.jvp(decode_fn, (z_rep,), (basis,))          # (B*D, P)
        Jt = jt.astype(jnp.float32).reshape(b, d, -1)
        return jnp.einsum("bip,bjp->bij", Jt, Jt)

    return jax.lax.map(one_chunk, z_chunks)


def pullback_metrics(decode_fn: Callable, z: np.ndarray,
                     batch_size: int = 1024) -> np.ndarray:
    """(N, D, D) pullback metrics for all nodes, chunked under one jit.

    ``batch_size`` bounds the *decoder* batch: each chunk holds
    ``batch_size // D`` nodes so the flattened JVP batch stays at
    ``batch_size`` samples regardless of latent dim.
    """
    z = np.asarray(z, np.float32)
    n, d = z.shape
    if n == 0:
        return np.empty((0, d, d), np.float32)
    bs = max(1, min(batch_size // max(d, 1), n))
    n_pad = ((n + bs - 1) // bs) * bs
    if n_pad > n:
        z = np.concatenate([z, np.zeros((n_pad - n, d), np.float32)])
    chunks = jnp.asarray(z).reshape(n_pad // bs, bs, d)
    G = _pullback_metrics(decode_fn, chunks)
    return np.asarray(G).reshape(n_pad, d, d)[:n]


@jax.jit
def _edge_lengths_from_metrics(G, z, rows, cols):
    v = z[cols] - z[rows]
    qa = jnp.einsum("ei,eij,ej->e", v, G[rows], v)
    qb = jnp.einsum("ei,eij,ej->e", v, G[cols], v)
    return 0.5 * (jnp.sqrt(jnp.maximum(qa, 0.0))
                  + jnp.sqrt(jnp.maximum(qb, 0.0)))


def edge_lengths_riemannian_nodal(
    decode_fn: Callable,
    z: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    batch_size: int = 1024,
    edge_block: int = 1_048_576,
) -> np.ndarray:
    """Edgewise-identical Riemannian lengths via per-node pullback metrics.

    Computes ``|J(z_a) v|`` as ``sqrt(v^T G(z_a) v)`` with G precomputed per
    node — the same quantity ``edge_lengths_riemannian`` evaluates with two
    JVPs per edge (float-associativity differences only). Wins whenever the
    latent dim D is below the average node degree x2 (spatial codebooks:
    D=16, degree ~16-20): decoder JVP passes drop from 4E (edgewise) to
    2 x N x D, and the per-node sweep is a clean batched decode instead of
    edge-ordered gathers. Reference semantics: riemannian_metric.py:12-35
    (same half-sum-of-endpoint-norms edge length).
    """
    z = np.asarray(z, np.float32)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    G = pullback_metrics(decode_fn, z, batch_size=batch_size)
    e = rows.shape[0]
    if e == 0:
        return np.empty((0,), np.float32)
    blk = min(edge_block, e)
    e_pad = ((e + blk - 1) // blk) * blk  # pad: every block shares 1 program
    if e_pad > e:
        rows = np.concatenate([rows, np.zeros(e_pad - e, rows.dtype)])
        cols = np.concatenate([cols, np.zeros(e_pad - e, cols.dtype)])
    out = np.empty((e_pad,), np.float32)
    G_j = jnp.asarray(G)
    z_j = jnp.asarray(z)
    for s in range(0, e_pad, blk):
        out[s:s + blk] = np.asarray(_edge_lengths_from_metrics(
            G_j, z_j, jnp.asarray(rows[s:s + blk]),
            jnp.asarray(cols[s:s + blk])))
    return out[:e]


def edge_lengths_riemannian_auto(
    decode_fn: Callable,
    z: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    batch_size: int = 1024,
    mesh=None,
) -> np.ndarray:
    """Riemannian edge-length engine dispatch — MEASURED verdict: edgewise.

    The nodal engine halves decoder JVP passes (2ND vs 4E) but must gather
    a D x D metric block per edge endpoint; TPU random-row gathers run at
    ~70 GB/s, and at the north-star shape (983k nodes, 15.5M directed
    edges, D=16) that gather traffic alone exceeds the edgewise engine's
    ENTIRE runtime: measured same-session on v5e, edgewise 33.5 s vs nodal
    162.8 s (tools/bench_riemannian.py; docs/benchmarks.md). Edgewise is
    therefore the default for every current model family; set
    ``VQVAE_TPU_RIEMANNIAN=nodal`` to force the nodal engine (it can win
    for decoders whose per-sample cost dwarfs a D^2 x 8B gather).
    """
    import os

    if os.environ.get("VQVAE_TPU_RIEMANNIAN") == "nodal":
        return edge_lengths_riemannian_nodal(decode_fn, z, rows, cols,
                                             batch_size=batch_size)
    z = np.asarray(z, np.float32)
    return edge_lengths_riemannian(decode_fn, z[rows], z[cols],
                                   batch_size=batch_size, mesh=mesh)


def edge_lengths_riemannian(
    decode_fn: Callable,
    z_start: np.ndarray,
    z_end: np.ndarray,
    batch_size: int = 512,
    mesh=None,
    fused: bool | None = None,
) -> np.ndarray:
    """Riemannian lengths for E edges; returns (E,) float32.

    ``decode_fn`` maps a latent batch to flattened [0,1] images (see
    ``make_decoder_image_fn``). Edges are processed in fixed ``batch_size``
    chunks (padded) under one jit. ``mesh`` shards the chunk axis across
    devices; ``fused`` (env ``VQVAE_TPU_RIEM_FUSED``, default on) evaluates
    both endpoint JVPs in one concatenated decoder pass.
    """
    import os

    if fused is None:
        fused = os.environ.get("VQVAE_TPU_RIEM_FUSED", "1") == "1"
    z_start = np.asarray(z_start, np.float32)
    z_end = np.asarray(z_end, np.float32)
    if z_start.shape != z_end.shape:
        raise ValueError("Start and end points must have same shape")
    e = z_start.shape[0]
    if e == 0:
        return np.empty((0,), np.float32)
    bs = min(batch_size, e)
    n_shards = len(mesh.devices.ravel()) if mesh is not None else 1
    n_chunks = -(-e // bs)
    n_chunks = -(-n_chunks // n_shards) * n_shards  # shard-divisible
    e_pad = n_chunks * bs
    if e_pad > e:
        pad = np.zeros((e_pad - e, *z_start.shape[1:]), np.float32)
        z_start = np.concatenate([z_start, pad])
        z_end = np.concatenate([z_end, pad])
    za = jnp.asarray(z_start).reshape(n_chunks, bs, *z_start.shape[1:])
    zb = jnp.asarray(z_end).reshape(n_chunks, bs, *z_end.shape[1:])
    fn = _build_lengths_fn(mesh if n_shards > 1 else None, decode_fn,
                           bool(fused), latent_ndim=z_start.ndim - 1)
    out = fn(za, zb)
    return np.asarray(out).reshape(e_pad)[:e].astype(np.float32)
