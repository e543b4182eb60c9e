#!/usr/bin/env python
"""Ground-truth accuracy spot check for the Riemannian engines.

The round-4 hardware A/B measured 1.8e-1 max rel diff between the TPU
conv (indexed) engine and the linearized (mlp) engine on identical
edges; on CPU the two agree to 5e-7. This tool attributes the error:
compute a fixed edge subset on the LOCAL CPU backend (true-f32 convs,
the ground truth), then the same subset on the default device with both
engines, and report each engine's max rel diff vs the CPU truth.

Usage:
  python tools/check_riem_accuracy.py --nodes 983040 --edges 65536
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=983040)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--edges", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import make_latents  # noqa: E402

    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops import (build_mlp_decode_fn,
                               edge_lengths_riemannian_indexed)
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn
    from vqvae_tpu.parallel import run_on_cpu

    print(f"devices={jax.devices()}", file=sys.stderr)
    z = make_latents(args.nodes, dim=args.dim, seed=0)
    model = VAE(in_channels=1, latent_dim=args.dim, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(64, 128, 256), dec_channels=(256, 128, 64))
    variables = run_on_cpu(lambda r, x: model.init({"params": r}, x),
                           jax.random.key(0),
                           np.zeros((1, 28, 28, 1), np.float32))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")
    mlp_fn = build_mlp_decode_fn(model, variables)

    rng = np.random.default_rng(11)
    rows = rng.integers(0, args.nodes, size=args.edges)
    cols = rng.integers(0, args.nodes, size=args.edges)

    # ground truth: conv path on the local CPU backend (true-f32 convs)
    import jax.numpy as jnp

    from vqvae_tpu.ops.riemannian import _chunk_norms

    def cpu_truth(za, zb):
        out = []
        for s in range(0, len(za), args.batch):
            out.append(run_on_cpu(
                lambda a, b: _chunk_norms(decode_fn, a, b, True),
                jnp.asarray(za[s:s + args.batch]),
                jnp.asarray(zb[s:s + args.batch])))
        return np.concatenate([np.asarray(o) for o in out])

    truth = cpu_truth(z[rows], z[cols])
    scale = np.maximum(np.abs(truth), 1e-6)

    res = {}
    for name, fn in [("conv_indexed", decode_fn), ("mlp", mlp_fn)]:
        got = edge_lengths_riemannian_indexed(
            fn, z if name != "mlp" else z.reshape(len(z), -1), rows, cols,
            batch_size=args.batch)
        rel = np.abs(got - truth) / scale
        res[name] = {"max_rel": float(rel.max()),
                     "p999_rel": float(np.quantile(rel, 0.999)),
                     "mean_rel": float(rel.mean())}
        print(f"[{name}] max={rel.max():.2e} p99.9="
              f"{np.quantile(rel, 0.999):.2e} mean={rel.mean():.2e}",
              file=sys.stderr)
    print(json.dumps({"edges": args.edges, "results": res}))


if __name__ == "__main__":
    main()
