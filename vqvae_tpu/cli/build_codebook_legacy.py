"""Legacy flat-latent codebook builders (Euclidean and Riemannian).

Parity targets:
- reference src/training/build_codebook_legacy.py:27-99 — flat latents
  (z or mu) -> kNN distance graph per config -> LCC -> K-medoids ->
  knn_graph.npz + codebook + codes (N,) with -1 off-LCC backfill.
- reference src/training/build_riemannian_codebook_legacy.py:67-291 —
  same, but edges re-weighted with Riemannian lengths first: either
  ``full`` (all edges) or ``subset`` mode (a stratified sample of
  ``max_edges`` by Euclidean-distance quantile keeps the rest Euclidean),
  symmetrized by max, with a non-finite-weight fallback to the Euclidean
  weight.
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np
from scipy import sparse

from ..config import Config
from ..ops import (build_knn_graph_auto, edge_lengths_riemannian,
                   fit_kmedoids, largest_connected_component)
from ..ops.riemannian import make_decoder_image_fn
from ..utils.checkpoint import load_vae_from_checkpoint
from ..utils.latents import load_latents
from .build_codebook import save_codebook_artifacts


def _load_flat_latents(cfg: Config) -> np.ndarray:
    # multi-key tolerant like the reference legacy builders
    # (build_riemannian_codebook_legacy.py:185-198)
    path = cfg.get("latents_path") or cfg.get("data", Config({})).get("latents_path")
    if path is None:
        raise KeyError("latents_path (top-level or under data:)")
    source = str(cfg.get("latents_key", cfg.get("source", "z")))
    p = str(path)
    if p.endswith("mu.pt") or p.endswith("mu.npy"):
        source = "mu"
    lat = load_latents(Path(p).parent if p.endswith(".pt") else p)
    z = lat.get(source, lat["z"])
    if z.ndim != 2:
        raise ValueError(f"legacy codebook build expects flat (N,D) latents, got {z.shape}")
    return np.asarray(z, np.float32)


def _reweight_graph_with_riemannian(W: sparse.csr_matrix, z: np.ndarray,
                                    decode_fn, mode: str = "subset",
                                    max_edges: int = 5000,
                                    batch_size: int = 512,
                                    seed: int = 42) -> sparse.csr_matrix:
    """Riemannian re-weighting (reference build_riemannian_codebook_legacy
    .py:67-166): ``subset`` = stratified sample by Euclidean-distance
    quantile; non-finite lengths fall back to the Euclidean weight."""
    coo = sparse.triu(W, k=1).tocoo()
    rows, cols, eu = coo.row, coo.col, coo.data
    n_edges = len(rows)
    if mode == "subset" and n_edges > max_edges:
        # stratified by distance quantile: equal share per decile
        rng = np.random.default_rng(seed)
        qs = np.quantile(eu, np.linspace(0, 1, 11))
        sel_idx = []
        per_bin = max_edges // 10
        for b in range(10):
            in_bin = np.nonzero((eu >= qs[b]) & (eu <= qs[b + 1]))[0]
            if in_bin.size:
                take = min(per_bin, in_bin.size)
                sel_idx.append(rng.choice(in_bin, size=take, replace=False))
        sel = np.unique(np.concatenate(sel_idx))
    else:
        sel = np.arange(n_edges)

    lengths = edge_lengths_riemannian(decode_fn, z[rows[sel]], z[cols[sel]],
                                      batch_size=batch_size)
    new_w = eu.astype(np.float32).copy()
    finite = np.isfinite(lengths)
    new_w[sel[finite]] = lengths[finite]  # non-finite keep Euclidean weight

    W_new = sparse.csr_matrix((new_w, (rows, cols)), shape=W.shape)
    return W_new.maximum(W_new.T)


def build_codebook_legacy_main(cfg: Config, riemannian: bool = False) -> Path:
    # out dir may live at top level (ours) or under out.dir (the reference's
    # legacy quantize.yaml layout, configs/quantize.yaml there)
    out = cfg.get("out_dir") or cfg.get("out", Config({})).get("dir")
    if out is None:
        raise KeyError("out_dir (top-level or out.dir)")
    out_dir = Path(str(out))
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()

    z = _load_flat_latents(cfg)
    print(f"[codebook-legacy] latents: {z.shape}")

    graph_cfg = cfg.get("graph", Config({}))
    k = int(graph_cfg.get("k", 20))
    metric = str(graph_cfg.get("metric", "euclidean"))
    sym = str(graph_cfg.get("sym", "union"))
    mode = str(graph_cfg.get("mode", "distance"))
    W, _ = build_knn_graph_auto(z, k=k, metric=metric, mode=mode, sym=sym)
    print(f"[codebook-legacy] graph: {W.shape[0]} nodes, {W.nnz} edges")
    sparse.save_npz(out_dir / "knn_graph.npz", W.tocsr())

    mask_lcc = largest_connected_component(W)
    W_lcc = W[mask_lcc][:, mask_lcc] if mask_lcc.sum() < W.shape[0] else W
    z_lcc = z[mask_lcc]

    if riemannian:
        # arch may live under "model" (reference layout) or "vae" (ours)
        vae_cfg = dict(cfg.get("model") or cfg.get("vae") or {})
        ckpt_path = (cfg.get("vae_ckpt_path")
                     or cfg.get("vae", Config({})).get("ckpt_path"))
        if ckpt_path is None:
            raise KeyError("vae_ckpt_path (top-level or vae.ckpt_path)")
        vae_cfg.pop("ckpt_path", None)
        topology = vae_cfg.pop("topology", "flat")
        recon_loss = vae_cfg.pop("recon_loss", "mse")
        mse_use_sigmoid = bool(vae_cfg.pop("mse_use_sigmoid", True))
        if "enc_channels" in vae_cfg:
            vae_cfg["enc_channels"] = tuple(vae_cfg["enc_channels"])
        if "dec_channels" in vae_cfg:
            vae_cfg["dec_channels"] = tuple(vae_cfg["dec_channels"])
        vae_cfg["topology"] = topology
        ckpt = Path(str(ckpt_path))
        model, variables = load_vae_from_checkpoint(
            ckpt.parent, ckpt.name, config=vae_cfg or None,
            recon_loss=recon_loss, mse_use_sigmoid=mse_use_sigmoid)
        decode_fn = make_decoder_image_fn(model, variables, model.topology)
        riem_cfg = cfg.get("riemannian", Config({}))
        W_lcc = _reweight_graph_with_riemannian(
            W_lcc, z_lcc, decode_fn,
            mode=str(riem_cfg.get("mode", "subset")),
            max_edges=int(riem_cfg.get("max_edges", 5000)),
            batch_size=int(riem_cfg.get("batch_size", 512)),
            seed=int(cfg.get("seed", 42)))
        sparse.save_npz(out_dir / "knn_graph_riemannian.npz", W_lcc.tocsr())
        print(f"[codebook-legacy] Riemannian re-weighted graph saved")

    quant_cfg = cfg.get("quantize", Config({}))
    K = int(quant_cfg.get("K", 512))
    init = str(quant_cfg.get("init", "kpp"))
    seed = int(quant_cfg.get("seed", cfg.get("seed", 42)))
    medoids, assign_lcc, qe = fit_kmedoids(W_lcc, K=K, init=init, seed=seed)

    # -1 backfill for off-LCC points (reference build_codebook_legacy.py:80-84)
    codes = np.full(z.shape[0], -1, dtype=np.int32)
    codes[mask_lcc] = assign_lcc
    z_medoid = z_lcc[medoids]

    config_record = {"k": k, "metric": metric, "sym": sym, "mode": mode,
                     "K": K, "init": init, "seed": seed,
                     "riemannian": riemannian,
                     "total_s": round(time.perf_counter() - t0, 2)}
    save_codebook_artifacts(out_dir, medoids, z_medoid, codes, config_record)
    print(f"[codebook-legacy] K={len(medoids)} qe={qe:.3f} "
          f"({time.perf_counter() - t0:.1f}s) -> {out_dir}")
    return out_dir
