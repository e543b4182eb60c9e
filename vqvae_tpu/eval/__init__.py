from .metrics import psnr, ssim_simple, codebook_stats, psnr_np, ssim_simple_np

__all__ = ["psnr", "ssim_simple", "codebook_stats", "psnr_np", "ssim_simple_np"]
