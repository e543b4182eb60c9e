#!/usr/bin/env bash
# Dataset fetcher (reference scripts/download_data.sh analog).
#
# In network-restricted environments this is a no-op: the data layer falls
# back to a deterministic synthetic dataset automatically. With network
# access, fetch the raw files into ./data so the parsers pick them up:
#   MNIST / FashionMNIST: the four IDX files (train/t10k images+labels),
#     optionally gzipped, under data/MNIST/raw or data/FashionMNIST/raw
#   CIFAR-10: cifar-10-batches-py/ (the python pickle batches) under data/
set -euo pipefail
mkdir -p data

have() { [ -e "$1" ] && echo "found: $1"; }

echo "== checking local datasets =="
have data/MNIST/raw/train-images-idx3-ubyte || true
have data/FashionMNIST/raw/train-images-idx3-ubyte || true
have data/cifar-10-batches-py/data_batch_1 || true

if command -v curl >/dev/null && curl -fsI https://www.cs.toronto.edu >/dev/null 2>&1; then
  echo "network available — fetch datasets manually or extend this script"
else
  echo "no network egress: the framework will use its synthetic fallback"
  echo "(set VQVAE_TPU_SYNTH_SIZE to control the synthetic dataset size)"
fi
