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


def test_euler_weights_equal_direct_euler():
    """NI with the Euler-increment weight matrix == the vanilla Euler
    recursion in the (x0 - eps) form (``src/SD3NaturalInference.py:72-80``);
    the rows telescope to 1 - sigma_{k+1}."""
    import jax
    from naturaldiffusion_tpu.coeffs.sd3 import (sd3_euler_weights,
                                                 sd3_weight_matrix,
                                                 flow_match_sigmas)
    from naturaldiffusion_tpu.engine import NISchedule, natural_inference

    n = 12
    w = sd3_euler_weights(n)
    m = sd3_weight_matrix(w, n)
    _, sigmas = flow_match_sigmas(n)
    np.testing.assert_allclose(m.x0.sum(axis=1), 1.0 - sigmas[1:],
                               atol=1e-12)

    model, params, noises, cond = _setup()

    # an arbitrary (t-dependent) x0 predictor exercises the identity beyond
    # the consistent-model special case
    def x0_fn(z, t):
        return 0.8 * z + 0.01 * t / 1000.0

    sched = NISchedule.from_matrix(m)
    got = jax.jit(lambda z: natural_inference(
        lambda z, t: x0_fn(z, t), sched, z, prediction_type="x0"))(noises)

    timesteps, sigmas = flow_match_sigmas(n)
    z = noises
    for k in range(n):
        x0 = x0_fn(z, timesteps[k])
        z = z + float(sigmas[k] - sigmas[k + 1]) * (x0 - noises)
    np.testing.assert_allclose(np.asarray(got), np.asarray(z),
                               atol=1e-5, rtol=1e-5)


def test_euler_weights_cliplen_bands():
    from naturaldiffusion_tpu.coeffs.sd3 import sd3_euler_weights
    w = sd3_euler_weights(6, cliplen=2)
    assert np.count_nonzero(w[4]) == 2 and w[4, 3] != 0 and w[4, 2] == 0


def test_schedule_mods_forward_equals_standard():
    """mmdit_schedule_mods + the mods= fast path == the standard forward:
    the precompute applies the model's OWN submodules standalone, so the
    only difference is matmul batching (all steps at once)."""
    from naturaldiffusion_tpu.models.mmdit import mmdit_schedule_mods

    model, params, noises, cond = _setup()
    ctx, pooled = cond["context"], cond["pooled"]
    t_all = jnp.asarray([0.0, 250.0, 999.0], jnp.float32)
    mods = mmdit_schedule_mods(model, params, t_all, pooled, ctx)
    ctx_emb = mods.pop("ctx_emb")
    for k in range(t_all.shape[0]):
        aux = jax.tree.map(lambda a: a[k], mods)
        t = jnp.full((noises.shape[0],), t_all[k], jnp.float32)
        want = model.apply({"params": params}, noises, t, ctx, pooled)
        got = model.apply({"params": params}, noises, t, ctx, pooled,
                          mods=dict(aux, ctx_emb=ctx_emb))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("unroll", [True, False])
def test_sd3_ni_precomputed_mods_match(unroll):
    """The full SD3 NI run with the schedule-precomputed conditioning ==
    the per-step recompute path, on both engine execution modes."""
    model, params, noises, cond = _setup()
    w = _random_weights(8)
    a = sd3_natural_inference(model, params, noises, w, num_step=8,
                              unroll=unroll, precompute_mods=True, **cond)
    b = sd3_natural_inference(model, params, noises, w, num_step=8,
                              unroll=unroll, precompute_mods=False, **cond)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
