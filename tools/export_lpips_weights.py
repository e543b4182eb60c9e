#!/usr/bin/env python
"""Convert lpips-package AlexNet weights to the npz format eval/lpips.py
loads (for machines that have the torch ``lpips`` package or its cached
weights; this build environment has neither, so LPIPS stays gated).

Usage:
    python tools/export_lpips_weights.py --out data/lpips_alex.npz
    python tools/export_lpips_weights.py --state_dict /path/alex.pth --out ...
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def from_lpips_package() -> dict:
    import lpips  # type: ignore
    import torch

    m = lpips.LPIPS(net="alex")
    out = {}
    convs = [layer for layer in m.net.slice1] + \
            [layer for layer in m.net.slice2] + \
            [layer for layer in m.net.slice3] + \
            [layer for layer in m.net.slice4] + \
            [layer for layer in m.net.slice5]
    conv_i = 0
    for layer in convs:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}/kernel"] = layer.weight.detach().numpy()
            out[f"conv{conv_i}/bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(m.lins):
        out[f"lin{i}"] = lin.model[-1].weight.detach().numpy().squeeze()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dict", type=str, default=None,
                    help="optional raw lpips state_dict .pt/.pth")
    ap.add_argument("--out", type=str, default="data/lpips_alex.npz")
    args = ap.parse_args()

    if args.state_dict:
        from vqvae_tpu.eval.lpips import _load_weights

        weights = _load_weights(Path(args.state_dict))
    else:
        weights = from_lpips_package()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **weights)
    print(f"wrote {out} ({len(weights)} arrays)")


if __name__ == "__main__":
    main()
