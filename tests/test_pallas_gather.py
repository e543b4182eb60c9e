"""Interpret-mode correctness for the DMA-pipelined gather-min prototype
(tools/bench_pallas_gather.py — the measured Pallas-vs-XLA relaxation
roofline; VERDICT r1 item 6)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.parametrize("k,slots", [(128, 2), (256, 8)])
def test_pallas_gather_min_interpret(k, slots):
    import jax.numpy as jnp

    import bench_pallas_gather as b

    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.random((2048, k), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 2048, b.CHUNK * 2), jnp.int32)
    ours = np.asarray(b.pallas_gather_min(d, idx, slots=slots,
                                          interpret=True))[0]
    ref = np.asarray(d[idx].min(axis=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
