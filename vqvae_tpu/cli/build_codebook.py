"""Spatial geodesic codebook build — the north-star stage.

Pipeline parity with reference src/scripts/build_codebook.py:14-106:
spatial latents -> flatten grid cells to nodes -> Euclidean kNN
connectivity graph (union) -> Riemannian re-weighting of all unique edges
via decoder JVPs -> symmetrize -> LCC -> graph K-medoids (K=512) ->
codes (N, H, W) with -1 off-LCC sentinel -> artifacts:

    knn_graph_geodesic.npz   (scipy CSR of the LCC graph)
    codebook.npz             {medoid_indices, z_medoid, config_json}
    codebook.pt              (torch-compat mirror of the reference artifact)
    codes.npy

Every device-heavy step (kNN matmuls, JVP metric, multi-source relaxation)
runs jitted on the TPU mesh; host work is O(edges) numpy.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
from scipy import sparse

from ..config import Config
from ..ops import (build_knn_graph_auto, edge_lengths_riemannian_auto,
                   fit_kmedoids, largest_connected_component,
                   symmetric_csr_from_edges)
from ..ops.riemannian import make_decoder_image_fn
from ..utils.checkpoint import load_vae_from_checkpoint
from ..utils.latents import load_latents, flatten_spatial


def build_codebook_main(cfg: Config) -> Path:
    out_dir = Path(cfg["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    t_start = time.perf_counter()

    vae_cfg = dict(cfg["vae"])
    vae_cfg.setdefault("topology", "spatial")
    recon_loss = vae_cfg.pop("recon_loss", "mse")
    mse_use_sigmoid = bool(vae_cfg.pop("mse_use_sigmoid", True))
    vae_cfg["enc_channels"] = tuple(vae_cfg.get("enc_channels", (64, 128, 256)))
    vae_cfg["dec_channels"] = tuple(vae_cfg.get("dec_channels", (256, 128, 64)))
    ckpt_path = Path(cfg["vae_ckpt_path"])
    model, variables = load_vae_from_checkpoint(
        ckpt_path.parent, ckpt_path.name, config=vae_cfg,
        recon_loss=recon_loss, mse_use_sigmoid=mse_use_sigmoid)
    decode_fn = make_decoder_image_fn(model, variables, model.topology)

    from ..parallel import get_mesh

    mesh = get_mesh()  # all geo kernels shard over every visible chip

    lat = load_latents(cfg["latents_path"])
    z = lat["z"]
    if z.ndim != 4:
        raise ValueError(f"spatial codebook build expects (N,H,W,C) latents, got {z.shape}")
    n, h, w, c = z.shape
    print(f"[codebook] latents: N={n}, H={h}, W={w}, C={c}")
    z_flat = flatten_spatial(z)

    graph_cfg = cfg.get("graph", Config({}))
    k = int(graph_cfg.get("k", cfg.get("k", 20)))
    sym = str(graph_cfg.get("sym", cfg.get("sym", "union")))
    # default approx: PartialReduce candidate selection with exact f32
    # re-rank — candidate recall 0.99983 measured at the 983k north-star
    # shape (docs/benchmarks.md round-3 kNN), QE-flat downstream, ~5x the
    # exact kernel. "exact" restores full exact selection.
    method = graph_cfg.get("method", "approx")
    if method == "exact":
        method = None
    from ..ops.knn import resolve_knn_kernel

    resolved = ("exact" if method is None else
                f"approx ({resolve_knn_kernel(True)} kernel)")
    print(f"[codebook] kNN selection: {resolved} "
          f"(graph.method={'exact' if method is None else method}; "
          f"default changed to approx in round 3 — set graph.method: exact "
          f"for the reference's exact selection)")
    t0 = time.perf_counter()
    W_eu, _ = build_knn_graph_auto(z_flat, k=k, metric="euclidean",
                                   mode="connectivity", sym=sym,
                                   force_method=method, mesh=mesh)
    t_knn = time.perf_counter() - t0
    print(f"[codebook] kNN graph: {W_eu.shape[0]} nodes, {W_eu.nnz} edges "
          f"({t_knn:.1f}s)")

    rows, cols = W_eu.nonzero()
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    batch_size = int(cfg.get("system", Config({})).get(
        "batch_size", cfg.get("batch_size", 512)))
    t0 = time.perf_counter()
    lengths = edge_lengths_riemannian_auto(decode_fn, z_flat, rows, cols,
                                           batch_size=batch_size, mesh=mesh)
    t_riem = time.perf_counter() - t0
    print(f"[codebook] Riemannian re-weighting: {len(lengths)} edges "
          f"({t_riem:.1f}s)")

    W_geo = symmetric_csr_from_edges(rows, cols, np.asarray(lengths),
                                     W_eu.shape[0])

    mask_lcc = largest_connected_component(W_geo)
    if mask_lcc.sum() < W_geo.shape[0]:
        print(f"[codebook] Using LCC: {int(mask_lcc.sum())}/{W_geo.shape[0]} nodes")
        W_lcc = W_geo[mask_lcc][:, mask_lcc]
        z_lcc = z_flat[mask_lcc]
    else:
        W_lcc, z_lcc = W_geo, z_flat
    sparse.save_npz(out_dir / "knn_graph_geodesic.npz", W_lcc.tocsr())

    quant_cfg = cfg.get("quantize", Config({}))
    K = int(quant_cfg.get("K", cfg.get("K", 512)))
    init = str(quant_cfg.get("init", cfg.get("init", "kpp_parallel")))
    seed = int(quant_cfg.get("seed", cfg.get("seed", 42)))
    kpp_rounds = int(quant_cfg.get("kpp_rounds", cfg.get("kpp_rounds", 4)))
    kpp_schedule = str(quant_cfg.get("kpp_schedule",
                                     cfg.get("kpp_schedule", "flat")))
    t0 = time.perf_counter()
    medoids, assign_lcc, qe = fit_kmedoids(W_lcc, K=K, init=init, seed=seed,
                                           kpp_rounds=kpp_rounds,
                                           kpp_schedule=kpp_schedule,
                                           mesh=mesh,
                                           assume_symmetric=True)
    t_kmed = time.perf_counter() - t0
    print(f"[codebook] K-medoids: K={len(medoids)}, qe={qe:.3f} ({t_kmed:.1f}s)")

    assign_flat = np.full(z_flat.shape[0], -1, dtype=np.int32)
    assign_flat[mask_lcc] = assign_lcc
    codes = assign_flat.reshape(n, h, w)
    z_medoid = z_lcc[medoids]

    config_record = {
        "latents_path": str(cfg["latents_path"]),
        "out_dir": str(out_dir),
        "vae_ckpt_path": str(cfg["vae_ckpt_path"]),
        "k": k, "sym": sym, "K": K, "init": init, "seed": seed,
        "kpp_rounds": kpp_rounds, "kpp_schedule": kpp_schedule,
        "batch_size": batch_size,
        **{f"vae_{kk}": (list(v) if isinstance(v, tuple) else v)
           for kk, v in vae_cfg.items()},
        "timings_s": {"knn": round(t_knn, 2), "riemannian": round(t_riem, 2),
                      "kmedoids": round(t_kmed, 2),
                      "total": round(time.perf_counter() - t_start, 2)},
    }
    save_codebook_artifacts(out_dir, medoids, z_medoid, codes, config_record)
    print(f"[codebook] Quantization error: {qe:.3f}")
    print(f"[codebook] Saved artifacts to: {out_dir} "
          f"(total {time.perf_counter() - t_start:.1f}s)")
    return out_dir


def save_codebook_artifacts(out_dir: Path, medoids: np.ndarray,
                            z_medoid: np.ndarray, codes: np.ndarray,
                            config_record: dict) -> None:
    np.savez_compressed(
        out_dir / "codebook.npz",
        medoid_indices=medoids.astype(np.int32),
        z_medoid=z_medoid.astype(np.float32),
        config_json=np.bytes_(json.dumps(config_record).encode()))
    np.save(out_dir / "codes.npy", codes)
    try:  # torch-compat mirror of the reference's codebook.pt artifact
        import torch

        torch.save({
            "medoid_indices": torch.from_numpy(medoids.astype(np.int64)),
            "z_medoid": torch.from_numpy(z_medoid.astype(np.float32)),
            "config": config_record,
        }, out_dir / "codebook.pt")
    except ImportError:
        pass


def load_codebook(path: str | Path) -> dict:
    """Load a codebook from codebook.npz (ours) or codebook.pt (reference)."""
    path = Path(path)
    if path.is_dir():
        path = path / ("codebook.npz" if (path / "codebook.npz").exists()
                       else "codebook.pt")
    if path.suffix == ".npz":
        with np.load(path) as f:
            return {
                "medoid_indices": f["medoid_indices"],
                "z_medoid": f["z_medoid"],
                "config": json.loads(bytes(f["config_json"]).decode()),
            }
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "medoid_indices": np.asarray(d["medoid_indices"]),
        "z_medoid": np.asarray(d["z_medoid"].float()),
        "config": d.get("config", {}),
    }
