"""Guard: the checked-in configs/ tree matches tools/gen_configs.py output."""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_configs_in_sync_with_generator(tmp_path):
    r = subprocess.run([sys.executable, str(REPO / "tools" / "gen_configs.py"),
                        "--out", str(tmp_path)],
                       capture_output=True, text=True, timeout=120)
    if r.returncode != 0 and "--out" in (r.stderr or ""):
        import pytest
        pytest.skip("gen_configs.py has no --out flag")
    generated = {p.relative_to(tmp_path): p.read_text()
                 for p in tmp_path.rglob("*.yaml")}
    assert generated, "generator produced nothing"
    for rel, text in generated.items():
        checked_in = REPO / "configs" / rel
        assert checked_in.exists(), f"configs/{rel} missing from the repo"
        assert checked_in.read_text() == text, f"configs/{rel} drifted"
