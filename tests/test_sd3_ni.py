"""SD3 NI on the engine == reference-shaped host loop (VERDICT r1 item 5).

The sigma-reprojection ``model_input = sigma*noise + (1-sigma)*weighted_x0``
(``src/SD3NaturalInference.py:201-223``) is affine, so it must ride the one
jitted NISchedule executable bit-compatibly with the host loop — including
on the reference's 28-step plain/sharp CSVs when the snapshot is present."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.apps.sd3_ni import (sd3_natural_inference,
                                              sd3_natural_inference_host,
                                              load_weight_csv)
from naturaldiffusion_tpu.coeffs.sd3 import sd3_weight_matrix
from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

TINY = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                   hidden_size=64, depth=2, num_heads=4,
                   caption_projection_dim=64, joint_attention_dim=32,
                   pooled_projection_dim=48, pos_embed_max_size=8)

REF_CSV = "/root/reference/weights/sd3_step_28_weight.csv"
REF_CSV_SHARP = "/root/reference/weights/sd3_step_28_weight_sharp.csv"


def _setup(b=2):
    model = MMDiT(config=TINY)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    noises = jax.random.normal(ks[0], (b, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(ks[1], (b, 6, 32), jnp.float32) * 0.2
    pooled = jax.random.normal(ks[2], (b, 48), jnp.float32) * 0.2
    nctx = jnp.zeros_like(ctx)
    npooled = jnp.zeros_like(pooled)
    params = model.init(ks[3], noises[:1], jnp.zeros(1), ctx[:1],
                        pooled[:1])["params"]
    return model, params, noises, dict(context=ctx, pooled=pooled,
                                       neg_context=nctx, neg_pooled=npooled)


def _random_weights(n, seed=0):
    rng = np.random.default_rng(seed)
    w = np.tril(rng.uniform(0.1, 1.0, (n, n)))
    return w


@pytest.mark.parametrize("n", [5, 12])
def test_engine_matches_host_loop(n):
    model, params, noises, cond = _setup()
    w = _random_weights(n)
    got = sd3_natural_inference(model, params, noises, w, num_step=n, **cond)
    want = sd3_natural_inference_host(model, params, noises, w, num_step=n,
                                      **cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("csv", [REF_CSV, REF_CSV_SHARP])
def test_engine_matches_host_on_reference_csvs(csv):
    if not os.path.exists(csv):
        pytest.skip("reference snapshot not present")
    model, params, noises, cond = _setup()
    w = load_weight_csv(csv)
    got = sd3_natural_inference(model, params, noises, w, num_step=28, **cond)
    want = sd3_natural_inference_host(model, params, noises, w, num_step=28,
                                      **cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_schedule_shape_and_determinism():
    m = sd3_weight_matrix(_random_weights(28), 28)
    assert m.x0.shape == (28, 28)
    assert m.eps.shape == (28, 29)
    assert m.is_deterministic
    # sigma_0 == 1 exactly: the first model input is the prior noise
    assert m.node[0, 2] == 1.0
    # final row: sigma_n == 0, x0 row == the normalized final weight row
    assert m.node[28, 2] == 0.0
    np.testing.assert_allclose(m.x0[-1].sum(), 1.0, atol=1e-12)


def test_zero_row_raises():
    w = _random_weights(6)
    w[3] = 0.0
    with pytest.raises(ValueError, match="all-zero row"):
        sd3_weight_matrix(w, 6)
