"""vqvae_tpu — a TPU-native (JAX / Flax / Pallas / pjit) geodesic VQ-VAE framework.

Re-implements the full capability surface of the reference research pipeline
(m4rch1n0/vqvae): continuous conv VAEs (flat and spatial-grid latents),
post-hoc geodesic codebooks (kNN latent graphs, decoder-pullback Riemannian
edge weights, multi-source shortest paths, graph K-medoids), an autoregressive
Transformer prior with class-conditional sampling, and a PSNR/SSIM/LPIPS +
codebook-health evaluation suite, plus an end-to-end EMA VQ-VAE baseline.

Design is TPU-first: models are jitted Flax modules (NHWC, bf16 matmuls with
f32 accumulation), training is data-parallel over a `jax.sharding.Mesh`, and
the geometry hot loops (kNN top-k, multi-source graph relaxation, JVP metric)
run as batched XLA/Pallas programs sharded over the device mesh rather than
the reference's scipy/sklearn/FAISS host code.
"""

__version__ = "0.1.0"
