"""Five-stage pipeline orchestrator.

The reference ships six per-dataset orchestrator scripts that shell out to
each stage (reference scripts/run_*_pipeline.py, subprocess.run at :23);
here ONE config-driven orchestrator runs the stages **in-process** — the
artifact contract between stages is unchanged (files under
``experiments/<dataset>/<variant>/<distance>/``), but XLA compilation
caches stay warm across stages and there is no shell quoting. ``--skip-*``
resume flags match the reference's (run_fashionmnist_spatial_geodesic_
pipeline.py:33-38). Stage failures abort unless the stage is marked
non-critical (evaluation mirrors the reference's ``critical=False`` eval
steps).
"""
from __future__ import annotations

import time
import traceback
from pathlib import Path
from typing import Dict, Iterable, Optional

from ..config import Config, load_config

STAGES = ("vae", "codebook", "quality", "transformer", "generate", "evaluate")
# quality gates and final evaluation continue on failure, like the
# reference's critical=False steps (run_fashionmnist_vanilla_geodesic_
# pipeline.py:69-103)
NON_CRITICAL = {"quality", "evaluate"}


def _stage_config(config_dir: Path, stage: str,
                  overrides: Optional[Dict] = None) -> Optional[Config]:
    path = config_dir / f"{stage}.yaml"
    if not path.exists():
        return None
    return load_config(path, overrides=(overrides or {}).get(stage))


def run_pipeline(
    config_dir: str | Path,
    skip: Iterable[str] = (),
    overrides: Optional[Dict] = None,
    root_dir: str | Path = ".",
) -> Dict[str, float]:
    """Run all configured stages under ``config_dir``; returns per-stage
    wall-clock seconds (the framework's headline metric is end-to-end
    wall time — SURVEY.md §6)."""
    from . import (train_vae_main, build_codebook_main,
                   build_codebook_legacy_main, train_transformer_main,
                   generate_samples_main, evaluate_model_main)

    config_dir = Path(config_dir)
    if not config_dir.is_dir():
        raise FileNotFoundError(f"preset directory not found: {config_dir}")
    if not any((config_dir / f"{s}.yaml").exists() for s in STAGES):
        raise FileNotFoundError(
            f"{config_dir} contains no stage configs "
            f"({', '.join(s + '.yaml' for s in STAGES)})")
    skip = set(skip)
    timings: Dict[str, float] = {}
    t_total = time.perf_counter()

    from ..utils.profiling import CompileStats

    compiles = CompileStats.install()
    c_total = compiles.snapshot()

    import os
    prev_cwd = os.getcwd()
    os.chdir(root_dir)
    try:
        for stage in STAGES:
            if stage in skip:
                print(f"[pipeline] skipping {stage}")
                continue
            cfg = _stage_config(config_dir, stage, overrides)
            if cfg is None:
                print(f"[pipeline] no {stage}.yaml — stage not configured")
                continue
            print(f"[pipeline] === stage: {stage} ===")
            t0 = time.perf_counter()
            c0 = compiles.snapshot()
            from ..utils.profiling import profile_trace

            try:
                with profile_trace(stage):
                    if stage == "vae":
                        train_vae_main(cfg)
                    elif stage == "codebook":
                        builder = cfg.get("builder")
                        if builder is None:  # infer reference-style configs
                            if "riemannian" in cfg:
                                builder = "legacy_riemannian"
                            elif "model" in cfg:
                                builder = "legacy"
                            else:
                                builder = "spatial"
                        if builder == "spatial":
                            build_codebook_main(cfg)
                        else:
                            build_codebook_legacy_main(
                                cfg,
                                riemannian=(builder == "legacy_riemannian"))
                    elif stage == "quality":
                        from .quality_checks import (
                            evaluate_codebook_health_main,
                            evaluate_quantization_loss_main,
                            evaluate_vae_quality_main)

                        exp = str(cfg["experiment"])
                        ds = str(cfg.get("dataset", "fashionmnist"))
                        synth = cfg.get("synthetic_size")
                        rc = evaluate_vae_quality_main(exp, dataset=ds)
                        evaluate_quantization_loss_main(
                            exp, dataset=ds, synthetic_size=synth)
                        evaluate_codebook_health_main(exp, dataset=ds)
                        if rc != 0:
                            print("[pipeline] VAE quality gate recommends "
                                  "RETRAIN (continuing: non-critical)")
                    elif stage == "transformer":
                        train_transformer_main(cfg)
                    elif stage == "generate":
                        generate_samples_main(cfg)
                    elif stage == "evaluate":
                        evaluate_model_main(cfg)
            except Exception:
                traceback.print_exc()
                if stage in NON_CRITICAL:
                    print(f"[pipeline] non-critical stage {stage} failed; continuing")
                else:
                    raise
            timings[stage] = time.perf_counter() - t0
            dc = compiles.delta(c0)
            print(f"[pipeline] {stage} done in {timings[stage]:.1f}s "
                  f"({dc['programs']} programs compiled, "
                  f"{dc['compile_seconds']}s compiling)")
    finally:
        os.chdir(prev_cwd)

    timings["total"] = time.perf_counter() - t_total
    dt = compiles.delta(c_total)
    print(f"[pipeline] TOTAL: {timings['total']:.1f}s "
          f"({ {k: round(v, 1) for k, v in timings.items()} }); "
          f"{dt['programs']} XLA programs, {dt['compile_seconds']}s compiling")
    timings_path = os.environ.get("VQVAE_TPU_TIMINGS_PATH")
    if timings_path:
        import json

        with open(timings_path, "w") as f:
            json.dump({**timings, "programs_compiled": dt["programs"],
                       "compile_seconds": dt["compile_seconds"]}, f, indent=2)
    return timings
