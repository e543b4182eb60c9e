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
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# set VQVAE_TPU_RIEM_STATS=1 to append per-call records here (engine,
# samples, analytic JVP flops/sample, wall seconds) — bench.py's roofline
# accounting reads them. Off by default.
RIEM_STATS: list = []


def make_decoder_image_fn(model, variables, topology: str) -> Callable:
    """Build z -> flattened sigmoid(decoder(z)) for the given VAE.

    ``topology="flat"``: z (B, D) feeds the dense decoder directly.
    ``topology="spatial"``: z (B, C) is decoded as a (B, 1, 1, C) grid
    (NHWC transpose of the reference's (B, C, 1, 1)).

    The model/variables refs ride along as attributes so the engine
    dispatcher (``edge_lengths_riemannian_auto``) can build the linearized
    matmul decoder for spatial 1x1 grids without changing this signature.
    """
    def decode_fn(z):
        if topology == "spatial" and z.ndim == 2:
            z = z[:, None, None, :]
        logits = model.apply(variables, z, method=model.decode)
        img = jax.nn.sigmoid(logits)
        return img.reshape(img.shape[0], -1)

    decode_fn.model = model
    decode_fn.variables = variables
    decode_fn.topology = topology
    return decode_fn


def _decoder_affine_segments(model, variables):
    """Dense affine segments of the spatial decoder on 1x1 latent grids.

    A spatial-topology decoder fed a (B, 1, 1, D) grid — the ONLY shape the
    Riemannian stage ever decodes (reference riemannian_metric.py:24-27
    unsqueezes each latent vector to (B, C, 1, 1)) — reduces exactly to an
    MLP: every transposed conv acts on a tiny fixed grid (1x1 -> 2x2 ->
    4x4), so the maps between ReLUs are small dense affines. Probing them
    once (identity batches through the real flax layers, on the local CPU
    backend) yields matrices whose JVP is pure MXU matmuls at ~7x fewer
    FLOPs than the input-dilated deconvs XLA would otherwise execute.

    Returns ``[(M, c), ...]`` (flattened row-major (H, W, C) layout, ReLU
    between consecutive segments, sigmoid applied by the caller) or None
    when the decoder is not expressible this way (flat topology, group
    norm — data-dependent, not affine — or non-f32 compute).
    """
    import flax.linen as nn

    from ..parallel import run_on_cpu

    if (getattr(model, "topology", None) != "spatial"
            or model.norm_type not in ("batch", "none")
            or getattr(model, "dtype", jnp.float32) != jnp.float32
            or model.output_image_size not in (28, 32)):
        return None
    chs = tuple(model.dec_channels)
    # mirror Decoder.__call__ geometry (models/vae.py:121-145): two k4s2
    # deconvs then the size-dependent head — keep in sync with the model
    stages = list(zip(chs[1:], [((4, 4), (2, 2)), ((4, 4), (2, 2))]))
    head_pad = (2, 2) if model.output_image_size == 32 else (0, 0)
    last_ch = stages[-1][0] if stages else chs[0]

    def probe(variables):
        params = variables["params"]["decoder"]
        bstats = variables.get("batch_stats", {}).get("decoder", {})

        def bn_affine(i, ch):
            if model.norm_type != "batch":
                return (jnp.ones((ch,), jnp.float32),
                        jnp.zeros((ch,), jnp.float32))
            p, s = params[f"BatchNorm_{i}"], bstats[f"BatchNorm_{i}"]
            sc = p["scale"] / jnp.sqrt(s["var"] + 1e-5)
            return sc, p["bias"] - s["mean"] * sc

        def probe_affine(fn, d_in, in_shape):
            eye = jnp.concatenate([jnp.zeros((1, d_in), jnp.float32),
                                   jnp.eye(d_in, dtype=jnp.float32)])
            out = fn(eye.reshape(d_in + 1, *in_shape))
            out = out.reshape(d_in + 1, -1)
            return out[1:] - out[0], out[0], out.shape[1]

        segs = []
        hw = (1, 1)
        d_in = int(model.latent_dim)
        for i, (ch, (kern, pad)) in enumerate(stages):
            ct = nn.ConvTranspose(ch, kern, strides=(2, 2),
                                  padding=(pad,) * 2,
                                  param_dtype=jnp.float32)
            name = f"ConvTranspose_{i}"
            sc, sh = bn_affine(i, ch)

            if i == 0:
                conv_in = nn.Conv(chs[0], (1, 1), param_dtype=jnp.float32)

                def seg(z2d, ct=ct, name=name, sc=sc, sh=sh,
                        conv_in=conv_in):
                    h = conv_in.apply({"params": params["conv_in"]},
                                      z2d[:, None, None, :])
                    h = ct.apply({"params": params[name]}, h)
                    return h * sc + sh

                M, c, d_out = probe_affine(seg, d_in, (d_in,))
            else:
                def seg(h, ct=ct, name=name, sc=sc, sh=sh):
                    return ct.apply({"params": params[name]}, h) * sc + sh

                M, c, d_out = probe_affine(seg, d_in, (*hw, stages[i - 1][0]))
            hw = tuple(2 * s for s in hw)  # k4s2 pad(2,2): out = 2*in
            segs.append((M, c))
            d_in = d_out

        hd = nn.ConvTranspose(model.in_channels, (4, 4), strides=(2, 2),
                              padding=(head_pad,) * 2,
                              param_dtype=jnp.float32)
        M, c, _ = probe_affine(
            lambda h: hd.apply({"params": params["out"]}, h),
            d_in, (*hw, last_ch))
        segs.append((M, c))
        return tuple(x for seg in segs for x in seg)

    try:
        flat = run_on_cpu(probe, variables)
    except (KeyError, TypeError, ValueError):
        return None  # param tree shape drift: fall back to the conv path
    out = [(np.asarray(flat[i]), np.asarray(flat[i + 1]))
           for i in range(0, len(flat), 2)]
    return out


def _verify_affine_segments(model, variables, segs) -> bool:
    """Runtime backstop for the linearized decoder: evaluate the probed
    affine+ReLU stack and the REAL conv decoder on a small random latent
    batch (local CPU backend, milliseconds) and require agreement. The
    probe hand-mirrors ``Decoder.__call__``'s stage geometry; if the model
    ever drifts (or an unusual ``dec_channels`` shape slips past the
    guards), this turns a silent wrong-metric failure into a clean
    fallback to the always-correct conv path."""
    from ..parallel import run_on_cpu

    z = np.random.RandomState(0).randn(8, int(model.latent_dim))
    z = z.astype(np.float32)

    def check(variables):
        h = jnp.asarray(z)
        for i, (M, c) in enumerate(segs):
            h = jnp.dot(h, jnp.asarray(M)) + jnp.asarray(c)
            if i < len(segs) - 1:
                h = jax.nn.relu(h)
        mlp = jax.nn.sigmoid(h)
        logits = model.apply(variables, jnp.asarray(z)[:, None, None, :],
                             method=model.decode)
        conv = jax.nn.sigmoid(logits).reshape(z.shape[0], -1)
        return mlp, conv

    try:
        mlp, conv = run_on_cpu(check, variables)
    except Exception:
        return False
    mlp, conv = np.asarray(mlp), np.asarray(conv)
    return (mlp.shape == conv.shape
            and bool(np.allclose(mlp, conv, rtol=1e-3, atol=1e-4)))


def build_mlp_decode_fn(model, variables) -> Callable | None:
    """Linearized spatial decoder: z (B, D) -> flattened sigmoid image via
    dense matmuls — numerically the same map as ``make_decoder_image_fn``
    (float association aside), built for the 1x1-grid decode the Riemannian
    stage runs. None when the decoder can't be expressed as affine+ReLU
    segments, or when the built linearization fails the self-check below.
    ``VQVAE_TPU_RIEM_MLP_PRECISION`` sets the matmul precision
    (default ``highest``: true-f32 passes; the FLOP count is tiny)."""
    segs = _decoder_affine_segments(model, variables)
    if segs is None:
        return None
    if not _verify_affine_segments(model, variables, segs):
        return None  # probe geometry drifted from the model: conv fallback
    prec = os.environ.get("VQVAE_TPU_RIEM_MLP_PRECISION", "highest")
    mats = [(jnp.asarray(M), jnp.asarray(c)) for M, c in segs]

    def decode_fn(z):
        h = z.reshape(z.shape[0], -1)
        for i, (M, c) in enumerate(mats):
            h = jnp.dot(h, M, precision=prec) + c
            if i < len(mats) - 1:
                h = jax.nn.relu(h)
        return jax.nn.sigmoid(h)

    decode_fn.jvp_flops_per_sample = float(
        sum(4 * M.shape[0] * M.shape[1] for M, _ in segs))
    return decode_fn


def _mlp_decode_fn_cached(decode_fn) -> Callable | None:
    """Build-once cache of the linearized decoder for a decode_fn carrying
    model/variables attributes (see make_decoder_image_fn)."""
    if not hasattr(decode_fn, "_mlp_cache"):
        model = getattr(decode_fn, "model", None)
        variables = getattr(decode_fn, "variables", None)
        decode_fn._mlp_cache = (
            build_mlp_decode_fn(model, variables)
            if model is not None and variables is not None else None)
    return decode_fn._mlp_cache


def conv_decoder_jvp_flops_per_sample(model) -> float | None:
    """Analytic per-sample JVP FLOPs of the conv-executed spatial decoder
    on a 1x1 latent grid (dense input-dilated deconvs: out_H*out_W*k^2*
    Cin*Cout MACs each, x2 FLOPs/MAC, x2 primal+tangent) — the edgewise
    engine's roofline numerator."""
    if (getattr(model, "topology", None) != "spatial"
            or model.output_image_size not in (28, 32)):
        return None
    chs = tuple(model.dec_channels)
    macs = float(model.latent_dim * chs[0])  # 1x1 conv_in
    size = 1
    dims = list(chs) + [model.in_channels]
    for i in range(len(chs[1:]) + 1):
        last = i == len(chs[1:])
        if last and model.output_image_size == 28:
            size = 2 * size - 4  # head pad (0,0): out = 2*in - 4 (16 -> 28)
        else:
            size = 2 * size  # k4s2 pad (2,2): out = 2*in
        macs += size * size * 16 * dims[i] * dims[i + 1]
    return 4.0 * macs


def _chunk_norms(decode_fn, za, zb, fused: bool):
    """Half-sum of endpoint JVP norms for one edge chunk (shared by the
    preformed and the indexed kernels)."""
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


@functools.lru_cache(maxsize=16)
def _build_indexed_lengths_fn(mesh, decode_fn, fused: bool, z_ndim: int):
    """Edge-length kernel gathering endpoints ON DEVICE from the full
    latent table: the host ships z once (N x D) plus int32 index chunks
    instead of two materialized (E, D) endpoint arrays — ~8x less
    host->device traffic at k=10, and no host gather pass at all."""
    def impl(z, rows_chunks, cols_chunks):
        def one_chunk(args):
            r, c = args
            return _chunk_norms(decode_fn, z[r], z[c], fused)

        return jax.lax.map(one_chunk, (rows_chunks, cols_chunks))

    if mesh is not None and len(mesh.devices.ravel()) > 1:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        idx_spec = P(DATA_AXIS, None)
        impl = jax.shard_map(impl, mesh=mesh,
                             in_specs=(P(*([None] * z_ndim)), idx_spec,
                                       idx_spec),
                             out_specs=P(DATA_AXIS, None))
    return jax.jit(impl)


def edge_lengths_riemannian_indexed(
    decode_fn: Callable,
    z,
    rows: np.ndarray,
    cols: np.ndarray,
    batch_size: int = 4096,
    mesh=None,
    fused: bool | None = None,
) -> np.ndarray:
    """Riemannian lengths with device-side endpoint gathers; exact same
    math as ``edge_lengths_riemannian(decode_fn, z[rows], z[cols])``."""
    if fused is None:
        fused = os.environ.get("VQVAE_TPU_RIEM_FUSED", "1") == "1"
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    e = rows.shape[0]
    if e == 0:
        return np.empty((0,), np.float32)
    bs = min(batch_size, e)
    n_shards = len(mesh.devices.ravel()) if mesh is not None else 1
    n_chunks = -(-e // bs)
    n_chunks = -(-n_chunks // n_shards) * n_shards
    e_pad = n_chunks * bs
    if e_pad > e:
        rows = np.concatenate([rows, np.zeros(e_pad - e, rows.dtype)])
        cols = np.concatenate([cols, np.zeros(e_pad - e, cols.dtype)])
    z_j = jnp.asarray(np.asarray(z, np.float32))
    r_j = jnp.asarray(rows.astype(np.int32)).reshape(n_chunks, bs)
    c_j = jnp.asarray(cols.astype(np.int32)).reshape(n_chunks, bs)
    fn = _build_indexed_lengths_fn(mesh if n_shards > 1 else None, decode_fn,
                                   bool(fused), z_j.ndim)
    out = fn(z_j, r_j, c_j)
    return np.asarray(out).reshape(e_pad)[:e].astype(np.float32)


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
            return _chunk_norms(decode_fn, za, zb, fused)

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


_AUTO_DEFAULT_BATCH = 1024


def edge_lengths_riemannian_auto(
    decode_fn: Callable,
    z: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    batch_size: int = _AUTO_DEFAULT_BATCH,
    mesh=None,
) -> np.ndarray:
    """Riemannian edge-length engine dispatch.

    ``VQVAE_TPU_RIEMANNIAN`` selects the engine (default ``auto``):

    - ``auto``: the linearized matmul decoder (``mlp``) whenever the model
      supports it — same map, probed dense affine segments, ~7x fewer
      JVP FLOPs, pure MXU matmuls — else the fused edgewise conv path.
      Both gather edge endpoints on device from the (N, D) latent table.
    - ``mlp`` / ``edgewise``: force that engine (mlp raises if the decoder
      can't be linearized: flat topology, group norm, non-f32).
    - ``nodal``: per-node pullback metrics — loses at current shapes
      (measured 162.8 s vs edgewise 33.5 s at 983k: the D x D metric
      gather per endpoint exceeds the whole edgewise runtime;
      docs/benchmarks.md), kept for decoders whose per-sample cost dwarfs
      a D^2 x 8B gather.
    """
    engine = os.environ.get("VQVAE_TPU_RIEMANNIAN", "auto")
    if engine == "nodal":
        return edge_lengths_riemannian_nodal(decode_fn, z, rows, cols,
                                             batch_size=batch_size)
    mlp_fn = None
    if engine in ("auto", "mlp"):
        mlp_fn = _mlp_decode_fn_cached(decode_fn)
        if engine == "mlp" and mlp_fn is None:
            raise ValueError(
                "VQVAE_TPU_RIEMANNIAN=mlp: decoder cannot be linearized "
                "(needs spatial topology, batch/none norm, f32 compute)")
    z = np.asarray(z, np.float32)
    record = os.environ.get("VQVAE_TPU_RIEM_STATS") == "1"
    t0 = time.perf_counter() if record else 0.0
    if mlp_fn is not None:
        # the linearized engine's live buffers are tiny (<=1k-wide
        # activations), so chunk bigger than conv callers ask for:
        # 983k-edge sweep measured best at 16384 (docs/benchmarks.md r4).
        # A caller passing a non-default batch_size keeps control (memory-
        # constrained hosts); the 16384 floor only lifts the conv default,
        # and VQVAE_TPU_RIEM_BATCH (when set) floors everything.
        env_bs = os.environ.get("VQVAE_TPU_RIEM_BATCH")
        if env_bs is not None:
            mlp_bs = max(batch_size, int(env_bs))
        elif batch_size == _AUTO_DEFAULT_BATCH:
            mlp_bs = 16384
        else:
            mlp_bs = batch_size
        out = edge_lengths_riemannian_indexed(
            mlp_fn, z.reshape(z.shape[0], -1), rows, cols,
            batch_size=mlp_bs, mesh=mesh)
        engine_used, flops = "mlp", mlp_fn.jvp_flops_per_sample
    else:
        out = edge_lengths_riemannian_indexed(
            decode_fn, z, rows, cols, batch_size=batch_size, mesh=mesh)
        model = getattr(decode_fn, "model", None)
        flops = (conv_decoder_jvp_flops_per_sample(model)
                 if model is not None else None)
        engine_used = "edgewise"
    if record:
        RIEM_STATS.append({
            "engine": engine_used, "samples": 2 * int(len(rows)),
            "jvp_flops_per_sample": flops,
            "seconds": time.perf_counter() - t0})
    return out


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
