#!/usr/bin/env bash
# Environment check for vqvae_tpu (reference scripts/setup_env.sh analog).
# This framework targets TPU via JAX; there is nothing to pip-install in the
# standard image — this script verifies the toolchain and builds the native
# host library ahead of time.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== python/jax =="
python - <<'EOF'
import jax, flax, optax, orbax.checkpoint
print("jax", jax.__version__, "backend:", jax.default_backend())
print("devices:", jax.devices())
EOF

echo "== native toolchain =="
g++ --version | head -1

echo "== building native graph library =="
python -c "from vqvae_tpu import native; print('native ok:', native.available())"

echo "setup complete"
