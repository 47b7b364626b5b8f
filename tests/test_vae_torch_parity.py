"""AutoencoderKL numeric parity vs a random-init torch twin of diffusers'
VAE (encode moments + decode), through the converter path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from naturaldiffusion_tpu.models.convert import fill_from_torch
from naturaldiffusion_tpu.models.vae import (AutoencoderKL, VAEConfig,
                                             vae_torch_path_map)
from torch_vae_twin import TorchAutoencoderKL

CFG = VAEConfig(base_channels=32, ch_mult=(1, 2), layers_per_block=2,
                latent_channels=4)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    twin = TorchAutoencoderKL(cin=3, ch=32, mults=(1, 2), layers=2,
                              zc=4).eval()
    model = AutoencoderKL(config=CFG)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3)))["params"]
    params, unused = fill_from_torch(template, twin.state_dict(),
                                     path_map=vae_torch_path_map)
    assert unused == [], unused
    return twin, model, params


def test_encode_moments_parity(pair):
    twin, model, params = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    want = twin.encode_moments(
        torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    mean, logvar = model.apply({"params": params}, jnp.asarray(x),
                               method=AutoencoderKL.encode)
    got = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_decode_parity(pair):
    twin, model, params = pair
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    want = twin.decode(
        torch.from_numpy(z).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(z),
                                 method=AutoencoderKL.decode))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
