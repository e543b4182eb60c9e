#!/usr/bin/env python
"""Standalone fast end-to-end smoke pipeline (repo root, like the
reference's test_fast_pipeline.py: runs the whole 5-stage pipeline on the
sandbox preset and checks exit conditions + artifacts). Not a pytest test —
run directly:

    python test_fast_pipeline.py            # spatial geodesic sandbox
    python test_fast_pipeline.py euclidean  # vanilla euclidean sandbox
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
import _common  # noqa: F401,E402

from vqvae_tpu.cli.pipeline import run_pipeline  # noqa: E402


def main() -> int:
    preset = sys.argv[1] if len(sys.argv) > 1 else "geodesic"
    # configs live next to this script; artifacts land under the CWD
    preset_dir = (Path(__file__).resolve().parent / "configs"
                  / "sandbox-fashion" / preset)
    t0 = time.perf_counter()
    timings = run_pipeline(preset_dir)
    exp = Path("experiments/sandbox-fashion") / preset

    checks = {
        "codebook.npz": exp / "codebook" / "codebook.npz",
        "codes.npy": exp / "codebook" / "codes.npy",
        "generated_samples.png": exp / "evaluation" / "generated_samples.png",
        "metrics.yaml": exp / "evaluation" / "metrics.yaml",
    }
    ok = True
    for name, path in checks.items():
        status = "OK" if path.exists() else "MISSING"
        ok &= path.exists()
        print(f"  [{status}] {name}")
    print(f"Fast pipeline {'PASSED' if ok else 'FAILED'} in "
          f"{time.perf_counter() - t0:.0f}s "
          f"(stages: { {k: round(v, 1) for k, v in timings.items()} })")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
