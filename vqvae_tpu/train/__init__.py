from .state import TrainState, make_optimizer
from .vae_engine import VAEEngine
from .transformer_engine import TransformerEngine
from .vqvae_engine import VQVAEEngine

__all__ = ["TrainState", "make_optimizer", "VAEEngine", "TransformerEngine",
           "VQVAEEngine"]
