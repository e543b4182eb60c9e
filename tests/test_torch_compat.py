"""Verify torch->flax weight conversion with a numeric forward-pass oracle.

The torch modules here re-create the reference architectures from their
published structure (stride-2 conv trunk, dense/1x1 heads, deconv decoder
with the output-padding geometry) purely as a test oracle.
"""
import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from vqvae_tpu.models import VAE  # noqa: E402
from vqvae_tpu.utils.torch_compat import load_reference_vae_checkpoint  # noqa: E402

ENC = (4, 8, 16)
DEC = (16, 8, 4)
LATENT = 6


def _torch_vanilla(norm):
    def blocks(cin, couts, k=3, s=2, p=1):
        layers = []
        for c in couts:
            layers += [nn.Conv2d(cin, c, k, stride=s, padding=p),
                       nn.BatchNorm2d(c) if norm else nn.Identity(),
                       nn.ReLU()]
            cin = c
        return layers

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_layers = nn.Sequential(*blocks(1, ENC))
            self.fc_mu = nn.Linear(ENC[-1] * 16, LATENT)
            self.fc_logvar = nn.Linear(ENC[-1] * 16, LATENT)

        def forward(self, x):
            h = self.conv_layers(x).flatten(1)
            return self.fc_mu(h), self.fc_logvar(h)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(LATENT, DEC[0] * 16)
            self.deconv1 = nn.Sequential(
                nn.ConvTranspose2d(DEC[0], DEC[1], 3, stride=2, padding=1),
                nn.BatchNorm2d(DEC[1]) if norm else nn.Identity(), nn.ReLU())
            self.deconv2 = nn.Sequential(
                nn.ConvTranspose2d(DEC[1], DEC[2], 4, stride=2, padding=1),
                nn.BatchNorm2d(DEC[2]) if norm else nn.Identity(), nn.ReLU())
            self.output_layer = nn.ConvTranspose2d(DEC[2], 1, 4, stride=2,
                                                   padding=1)

        def forward(self, z):
            h = self.fc(z).view(-1, DEC[0], 4, 4)
            return self.output_layer(self.deconv2(self.deconv1(h)))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.decoder = Dec()

    return M()


def _torch_spatial(norm):
    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            cin = 1
            for c in ENC:
                layers += [nn.Conv2d(cin, c, 3, stride=2, padding=1),
                           nn.BatchNorm2d(c) if norm else nn.Identity(),
                           nn.ReLU()]
                cin = c
            self.conv_layers = nn.Sequential(*layers)
            self.fc_mu = nn.Conv2d(ENC[-1], LATENT, 1)
            self.fc_logvar = nn.Conv2d(ENC[-1], LATENT, 1)

        def forward(self, x):
            h = self.conv_layers(x)
            return self.fc_mu(h), self.fc_logvar(h)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(LATENT, DEC[0], 1)
            self.deconv_layers = nn.Sequential(
                nn.ConvTranspose2d(DEC[0], DEC[1], 4, stride=2, padding=1),
                nn.BatchNorm2d(DEC[1]) if norm else nn.Identity(), nn.ReLU(),
                nn.ConvTranspose2d(DEC[1], DEC[2], 4, stride=2, padding=1),
                nn.BatchNorm2d(DEC[2]) if norm else nn.Identity(), nn.ReLU(),
                nn.ConvTranspose2d(DEC[2], 1, 4, stride=2, padding=3))

        def forward(self, z):
            return self.deconv_layers(self.conv_in(z))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.decoder = Dec()

    return M()


@pytest.mark.parametrize("topology,norm", [("flat", False), ("flat", True),
                                           ("spatial", False),
                                           ("spatial", True)])
def test_forward_parity(tmp_path, topology, norm):
    tm = _torch_spatial(norm) if topology == "spatial" else _torch_vanilla(norm)
    tm.eval()
    # randomize batchnorm running stats so the conversion is actually tested
    if norm:
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ckpt = tmp_path / "best.pt"
    torch.save({"model_state_dict": tm.state_dict()}, ckpt)

    variables = load_reference_vae_checkpoint(
        ckpt, topology, ENC, DEC, norm_type="batch" if norm else "none")
    fm = VAE(in_channels=1, enc_channels=ENC, dec_channels=DEC,
             latent_dim=LATENT, recon_loss="mse", output_image_size=28,
             norm_type="batch" if norm else "none", topology=topology)

    x = np.random.RandomState(0).rand(3, 28, 28, 1).astype(np.float32)
    with torch.no_grad():
        t_mu, t_logvar = tm.encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        t_dec = tm.decoder(t_mu)
    j_mu, j_logvar = fm.apply(variables, np.asarray(x), method=fm.encode)
    j_dec = fm.apply(variables, j_mu, method=fm.decode)

    t_mu_np = t_mu.numpy()
    t_dec_np = t_dec.numpy()
    if topology == "spatial":
        t_mu_np = t_mu_np.transpose(0, 2, 3, 1)
    t_dec_np = t_dec_np.transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(j_mu), t_mu_np, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_dec), t_dec_np, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("topology", ["flat", "spatial"])
def test_export_roundtrip(tmp_path, topology):
    """export -> load must reproduce the flax variables exactly."""
    from vqvae_tpu.utils.torch_compat import export_reference_vae_checkpoint

    fm = VAE(in_channels=1, enc_channels=ENC, dec_channels=DEC,
             latent_dim=LATENT, recon_loss="mse", output_image_size=28,
             norm_type="batch", topology=topology)
    import jax as _jax

    variables = fm.init({"params": _jax.random.key(7)},
                        np.zeros((1, 28, 28, 1), np.float32))
    variables = _jax.device_get(variables)

    p = export_reference_vae_checkpoint(variables, tmp_path / "export.pt",
                                        topology, ENC, DEC, "batch", epoch=3)
    back = load_reference_vae_checkpoint(p, topology, ENC, DEC, "batch")

    flat_a = _jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(_jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]),
                                   atol=1e-6, err_msg=str(path))
