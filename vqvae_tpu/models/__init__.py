from .vae import VAE, elbo_loss, decode_to_image
from .transformer import Transformer
from .vqvae_baseline import VQVAE

__all__ = ["VAE", "elbo_loss", "decode_to_image", "Transformer", "VQVAE"]
