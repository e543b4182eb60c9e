"""Every CLI shim in scripts/ must import and print --help cleanly.

The reference's user-facing surface is its scripts/ entry points (SURVEY
§1 L1); the shims here are thin argparse wrappers over vqvae_tpu.cli.*.
This smoke test catches broken imports / argparse regressions across the
whole surface — the kind of breakage per-module unit tests miss because
they import the cli module, not the shim.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted(p for p in (REPO / "scripts").glob("*.py")
                 if not p.name.startswith("_"))


@pytest.mark.slow
def test_every_cli_prints_help():
    assert len(SCRIPTS) >= 20, "CLI surface shrank unexpectedly"
    env = {**os.environ, "VQVAE_TPU_PLATFORM": "cpu"}
    failures = []
    for script in SCRIPTS:
        proc = subprocess.run(
            [sys.executable, str(script), "--help"], env=env,
            cwd=str(REPO), capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            failures.append(f"{script.name}: rc={proc.returncode}\n"
                            f"{proc.stderr[-500:]}")
        elif "usage" not in (proc.stdout + proc.stderr).lower():
            failures.append(f"{script.name}: no usage text in --help")
    assert not failures, "\n---\n".join(failures)
