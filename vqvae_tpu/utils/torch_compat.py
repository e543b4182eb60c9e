"""Torch checkpoint interop: load reference .pt VAE weights into Flax.

Lets users of the reference bring their trained checkpoints (reference
engine.py:143 saves {'model_state_dict': ...}) straight into this
framework. Conversions handled:

- Conv2d (O, I, kh, kw)        -> flax Conv kernel (kh, kw, I, O)
- ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel
  (kh, kw, I, O) with a spatial flip: torch's transposed conv is the
  gradient of correlation, while lax.conv_transpose correlates with the
  given kernel, so the spatial taps must be reversed.
- Linear (O, I) -> Dense (I, O), with the flatten-order permutation for
  the encoder/decoder bottleneck: torch flattens NCHW (C major), this
  framework flattens NHWC (C minor), so feature axes are reordered via
  (C,4,4) <-> (4,4,C).
- BatchNorm weight/bias/running_mean/running_var -> scale/bias +
  batch_stats mean/var.

Verified numerically against torch-cpu forward passes (tests/test_torch_compat.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _convT_w(w: np.ndarray) -> np.ndarray:
    # IOHW -> HWIO with spatial flip (gradient-of-corr vs corr semantics)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # (O,I) -> (I,O)


def _fc_mu_w(w: np.ndarray, ch: int) -> np.ndarray:
    # torch: (latent, C*4*4) flattened C-major; ours: (4*4*C, latent)
    latent = w.shape[0]
    w = w.reshape(latent, ch, 4, 4).transpose(0, 2, 3, 1).reshape(latent, -1)
    return w.T


def _fc_dec_w(w: np.ndarray, ch: int) -> Tuple[np.ndarray, ...]:
    # torch decoder fc: (C*4*4, latent) output C-major; ours outputs HWC
    latent = w.shape[1]
    w = w.reshape(ch, 4, 4, latent).transpose(1, 2, 0, 3).reshape(-1, latent)
    return w.T  # (latent, 16C) -> flax Dense kernel (latent, 16C)


def _fc_dec_b(b: np.ndarray, ch: int) -> np.ndarray:
    return b.reshape(ch, 4, 4).transpose(1, 2, 0).reshape(-1)


def load_reference_vae_checkpoint(
    path: str | Path,
    topology: str,
    enc_channels,
    dec_channels,
    norm_type: str = "batch",
) -> Dict:
    """Convert a reference VAE/SpatialVAE .pt checkpoint into flax
    ``variables`` ({"params": ..., "batch_stats": ...}) for models.VAE."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = raw.get("model_state_dict", raw.get("model", raw))
    sd = {k: v.numpy() for k, v in sd.items()}

    params: Dict = {"encoder": {}, "decoder": {}}
    stats: Dict = {"encoder": {}, "decoder": {}}
    has_norm = norm_type.lower() == "batch"

    # ---- encoder conv trunk: Sequential [conv, norm, relu] x len(enc) ----
    for i in range(len(enc_channels)):
        base = f"encoder.conv_layers.{3 * i}"
        params["encoder"][f"Conv_{i}"] = {
            "kernel": _conv_w(sd[f"{base}.weight"]),
            "bias": sd[f"{base}.bias"],
        }
        if has_norm:
            nb = f"encoder.conv_layers.{3 * i + 1}"
            params["encoder"][f"BatchNorm_{i}"] = {
                "scale": sd[f"{nb}.weight"], "bias": sd[f"{nb}.bias"]}
            stats["encoder"][f"BatchNorm_{i}"] = {
                "mean": sd[f"{nb}.running_mean"],
                "var": sd[f"{nb}.running_var"]}

    # ---- latent heads -----------------------------------------------------
    if topology == "spatial":
        for name in ("mu", "logvar"):
            params["encoder"][f"head_{name}"] = {
                "kernel": _conv_w(sd[f"encoder.fc_{name}.weight"]),
                "bias": sd[f"encoder.fc_{name}.bias"],
            }
    else:
        for name in ("mu", "logvar"):
            params["encoder"][f"head_{name}"] = {
                "kernel": _fc_mu_w(sd[f"encoder.fc_{name}.weight"],
                                   enc_channels[-1]),
                "bias": sd[f"encoder.fc_{name}.bias"],
            }

    # ---- decoder ----------------------------------------------------------
    def put_norm(dst_idx: int, torch_base: str):
        if has_norm:
            params["decoder"][f"BatchNorm_{dst_idx}"] = {
                "scale": sd[f"{torch_base}.weight"],
                "bias": sd[f"{torch_base}.bias"]}
            stats["decoder"][f"BatchNorm_{dst_idx}"] = {
                "mean": sd[f"{torch_base}.running_mean"],
                "var": sd[f"{torch_base}.running_var"]}

    if topology == "spatial":
        params["decoder"]["conv_in"] = {
            "kernel": _conv_w(sd["decoder.conv_in.weight"]),
            "bias": sd["decoder.conv_in.bias"]}
        # deconv_layers: Sequential [convT, norm, relu] x 2 + final convT
        for i in range(2):
            base = f"decoder.deconv_layers.{3 * i}"
            params["decoder"][f"ConvTranspose_{i}"] = {
                "kernel": _convT_w(sd[f"{base}.weight"]),
                "bias": sd[f"{base}.bias"]}
            put_norm(i, f"decoder.deconv_layers.{3 * i + 1}")
        fin = "decoder.deconv_layers.6"
        params["decoder"]["out"] = {
            "kernel": _convT_w(sd[f"{fin}.weight"]),
            "bias": sd[f"{fin}.bias"]}
    else:
        params["decoder"]["fc_in"] = {
            "kernel": _fc_dec_w(sd["decoder.fc.weight"], dec_channels[0]),
            "bias": _fc_dec_b(sd["decoder.fc.bias"], dec_channels[0])}
        for i, blk in enumerate(("deconv1", "deconv2")):
            base = f"decoder.{blk}.0"
            params["decoder"][f"ConvTranspose_{i}"] = {
                "kernel": _convT_w(sd[f"{base}.weight"]),
                "bias": sd[f"{base}.bias"]}
            put_norm(i, f"decoder.{blk}.1")
        params["decoder"]["out"] = {
            "kernel": _convT_w(sd["decoder.output_layer.weight"]),
            "bias": sd["decoder.output_layer.bias"]}

    variables = {"params": _to_f32(params)}
    if has_norm:
        variables["batch_stats"] = _to_f32(stats)
    return variables


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


def export_reference_vae_checkpoint(
    variables: Dict,
    path: str | Path,
    topology: str,
    enc_channels,
    dec_channels,
    norm_type: str = "batch",
    epoch: int = 0,
) -> Path:
    """Inverse of ``load_reference_vae_checkpoint``: write a torch ``.pt``
    in the reference's {'model_state_dict', 'epoch'} format so models
    trained here load in the reference codebase. Exact round-trip
    (load(export(v)) == v) is covered by tests."""
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    has_norm = norm_type.lower() == "batch"
    sd = {}

    def put(key, arr):
        sd[key] = torch.from_numpy(np.ascontiguousarray(np.asarray(arr, np.float32)))

    for i in range(len(enc_channels)):
        conv = params["encoder"][f"Conv_{i}"]
        put(f"encoder.conv_layers.{3 * i}.weight",
            np.transpose(conv["kernel"], (3, 2, 0, 1)))  # HWIO -> OIHW
        put(f"encoder.conv_layers.{3 * i}.bias", conv["bias"])
        if has_norm:
            bn = params["encoder"][f"BatchNorm_{i}"]
            st = stats["encoder"][f"BatchNorm_{i}"]
            put(f"encoder.conv_layers.{3 * i + 1}.weight", bn["scale"])
            put(f"encoder.conv_layers.{3 * i + 1}.bias", bn["bias"])
            put(f"encoder.conv_layers.{3 * i + 1}.running_mean", st["mean"])
            put(f"encoder.conv_layers.{3 * i + 1}.running_var", st["var"])

    for name in ("mu", "logvar"):
        head = params["encoder"][f"head_{name}"]
        if topology == "spatial":
            put(f"encoder.fc_{name}.weight",
                np.transpose(head["kernel"], (3, 2, 0, 1)))
        else:
            ch = enc_channels[-1]
            w = head["kernel"].T  # (latent, 16C) HWC-major
            latent = w.shape[0]
            w = w.reshape(latent, 4, 4, ch).transpose(0, 3, 1, 2).reshape(latent, -1)
            put(f"encoder.fc_{name}.weight", w)
        put(f"encoder.fc_{name}.bias", head["bias"])

    def put_convT(key, kernel):
        # HWIO -> IOHW with spatial flip (inverse of _convT_w)
        put(key, np.transpose(kernel, (2, 3, 0, 1))[:, :, ::-1, ::-1])

    def put_bn(tkey, fkey):
        if has_norm:
            bn = params["decoder"][fkey]
            st = stats["decoder"][fkey]
            put(f"{tkey}.weight", bn["scale"])
            put(f"{tkey}.bias", bn["bias"])
            put(f"{tkey}.running_mean", st["mean"])
            put(f"{tkey}.running_var", st["var"])

    if topology == "spatial":
        put("decoder.conv_in.weight",
            np.transpose(params["decoder"]["conv_in"]["kernel"], (3, 2, 0, 1)))
        put("decoder.conv_in.bias", params["decoder"]["conv_in"]["bias"])
        for i in range(2):
            ct = params["decoder"][f"ConvTranspose_{i}"]
            put_convT(f"decoder.deconv_layers.{3 * i}.weight", ct["kernel"])
            put(f"decoder.deconv_layers.{3 * i}.bias", ct["bias"])
            put_bn(f"decoder.deconv_layers.{3 * i + 1}", f"BatchNorm_{i}")
        put_convT("decoder.deconv_layers.6.weight",
                  params["decoder"]["out"]["kernel"])
        put("decoder.deconv_layers.6.bias", params["decoder"]["out"]["bias"])
    else:
        ch = dec_channels[0]
        fc = params["decoder"]["fc_in"]
        w = fc["kernel"].T  # (16C, latent) HWC-major rows
        latent = w.shape[1]
        w = w.reshape(4, 4, ch, latent).transpose(2, 0, 1, 3).reshape(-1, latent)
        put("decoder.fc.weight", w)
        put("decoder.fc.bias",
            np.asarray(fc["bias"]).reshape(4, 4, ch).transpose(2, 0, 1).reshape(-1))
        for i, blk in enumerate(("deconv1", "deconv2")):
            ct = params["decoder"][f"ConvTranspose_{i}"]
            put_convT(f"decoder.{blk}.0.weight", ct["kernel"])
            put(f"decoder.{blk}.0.bias", ct["bias"])
            put_bn(f"decoder.{blk}.1", f"BatchNorm_{i}")
        put_convT("decoder.output_layer.weight",
                  params["decoder"]["out"]["kernel"])
        put("decoder.output_layer.bias", params["decoder"]["out"]["bias"])

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"model_state_dict": sd, "epoch": int(epoch)}, path)
    return path
