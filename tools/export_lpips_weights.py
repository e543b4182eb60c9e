#!/usr/bin/env python
"""Build ``data/lpips_alex.npz`` from any locally-present LPIPS/AlexNet
weights so ``eval/lpips.py`` can compute a real (non-null) LPIPS.

The reference computes LPIPS through the torch ``lpips`` pip package
(reference src/eval/evaluate_model.py:110), which combines two artifacts:

1. the AlexNet **trunk** (torchvision ``alexnet-owt-*.pth``, keys
   ``features.{0,3,6,8,10}.{weight,bias}``) — usually cached at
   ``~/.cache/torch/hub/checkpoints/``;
2. the LPIPS **linear calibration** heads (``lpips/weights/v0.1/alex.pth``
   inside the lpips package, keys ``lin{0..4}.model.1.weight``).

This tool accepts any combination that is locally available:

- ``--from-lpips``: instantiate ``lpips.LPIPS(net='alex')`` (needs the
  package + a cached trunk; zero egress otherwise).
- ``--state_dict FILE``: a full lpips state_dict (trunk + lins).
- ``--alexnet FILE [--lins FILE]``: a raw torchvision AlexNet state_dict,
  optionally with the lpips lin heads. Without ``--lins`` the heads are
  UNIFORM (1/C per stage) — that is the lpips package's own
  ``lpips=False`` mode, clearly recorded in the npz as
  ``meta/lins=uniform``.
- no flags: auto-discover the files above under ``~/.cache/torch/hub/
  checkpoints`` and any importable ``lpips`` package directory.

Required arrays in the output npz (see eval/lpips.py): OIHW conv kernels
``conv{0..4}/kernel`` + ``conv{0..4}/bias`` and per-stage calibration
vectors ``lin{0..4}`` (squeezed 1x1-conv weights, shape (C,)).
"""
import argparse
import glob
import os
import sys
from pathlib import Path
from typing import Dict, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# AlexNet trunk conv channel widths, stage i -> out channels
_STAGE_CH = [64, 192, 384, 256, 256]
# torchvision AlexNet features module indices of the 5 convs
_TV_CONV_IDX = [0, 3, 6, 8, 10]


def from_lpips_package() -> Dict[str, np.ndarray]:
    import lpips  # type: ignore
    import torch

    m = lpips.LPIPS(net="alex")
    out = {}
    convs = [layer for s in (m.net.slice1, m.net.slice2, m.net.slice3,
                             m.net.slice4, m.net.slice5) for layer in s]
    conv_i = 0
    for layer in convs:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}/kernel"] = layer.weight.detach().numpy()
            out[f"conv{conv_i}/bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(m.lins):
        out[f"lin{i}"] = lin.model[-1].weight.detach().numpy().squeeze()
    out["meta/lins"] = np.array("calibrated")
    return out


def _torch_load(path: Path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def from_alexnet_state_dict(alexnet_path: Path,
                            lins_path: Optional[Path] = None
                            ) -> Dict[str, np.ndarray]:
    """Trunk from a torchvision AlexNet state_dict; lins from the lpips
    calibration file when given, else uniform (lpips ``lpips=False``
    semantics)."""
    sd = _torch_load(alexnet_path)
    out = {}
    for i, tv_idx in enumerate(_TV_CONV_IDX):
        out[f"conv{i}/kernel"] = sd[f"features.{tv_idx}.weight"].numpy()
        out[f"conv{i}/bias"] = sd[f"features.{tv_idx}.bias"].numpy()
    if lins_path is not None:
        lsd = _torch_load(lins_path)
        for k, v in lsd.items():
            if "lin" in k and "weight" in k:
                idx = int("".join(c for c in k.split(".")[0] if c.isdigit()))
                out[f"lin{idx}"] = v.numpy().squeeze()
        out["meta/lins"] = np.array("calibrated")
    else:
        for i, ch in enumerate(_STAGE_CH):
            out[f"lin{i}"] = np.full(ch, 1.0 / ch, np.float32)
        out["meta/lins"] = np.array("uniform")
    return out


def discover() -> Dict[str, np.ndarray]:
    """Find whatever weights exist locally and build the best npz possible."""
    hub = Path(os.path.expanduser("~/.cache/torch/hub/checkpoints"))
    alexnet = None
    for pat in ("alexnet-owt-*.pth", "alexnet*.pth"):
        hits = sorted(glob.glob(str(hub / pat)))
        if hits:
            alexnet = Path(hits[0])
            break
    lins = None
    try:
        import lpips  # type: ignore

        cand = (Path(lpips.__file__).parent / "weights" / "v0.1" /
                "alex.pth")
        if cand.is_file():
            lins = cand
    except ImportError:
        pass
    if alexnet is None and lins is None:
        raise FileNotFoundError(
            "no LPIPS/AlexNet weights found locally (looked for "
            f"{hub}/alexnet*.pth and an importable lpips package); "
            "fetch them on a networked machine and pass --alexnet/--lins")
    if alexnet is None:
        raise FileNotFoundError(
            "found lpips lin heads but no AlexNet trunk checkpoint under "
            f"{hub}; the trunk is required")
    print(f"[export] trunk: {alexnet}")
    print(f"[export] lins: {lins or 'UNIFORM (lpips package not found)'}")
    return from_alexnet_state_dict(alexnet, lins)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-lpips", action="store_true",
                    help="use the installed lpips package directly")
    ap.add_argument("--state_dict", type=str, default=None,
                    help="full lpips state_dict .pt/.pth (trunk + lins)")
    ap.add_argument("--alexnet", type=str, default=None,
                    help="torchvision AlexNet state_dict (trunk only)")
    ap.add_argument("--lins", type=str, default=None,
                    help="lpips lin-head state_dict (with --alexnet)")
    ap.add_argument("--out", type=str, default="data/lpips_alex.npz")
    args = ap.parse_args()

    if args.from_lpips:
        weights = from_lpips_package()
    elif args.state_dict:
        from vqvae_tpu.eval.lpips import _load_weights

        weights = _load_weights(Path(args.state_dict))
    elif args.alexnet:
        weights = from_alexnet_state_dict(
            Path(args.alexnet), Path(args.lins) if args.lins else None)
    else:
        weights = discover()

    missing = [k for i in range(5)
               for k in (f"conv{i}/kernel", f"conv{i}/bias", f"lin{i}")
               if k not in weights]
    if missing:
        raise SystemExit(f"incomplete weights, missing: {missing}")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **weights)
    print(f"wrote {out} ({len(weights)} arrays)")


if __name__ == "__main__":
    main()
