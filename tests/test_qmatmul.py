"""Weight-only-int8 Pallas matmul (ops/qmatmul.py) + DiT w8 dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.ops.qmatmul import matmul_wdq, qmatmul_ok
from naturaldiffusion_tpu.ops.quant import quantize_weight


def test_qmatmul_matches_dequant_reference():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (512,), jnp.float32) * 0.1
    w_i8, s_w = quantize_weight(w, axis=-1)
    got = matmul_wdq(x, w_i8, s_w.reshape(-1), b.astype(jnp.bfloat16))
    assert got.dtype == x.dtype and got.shape == (2, 64, 512)
    want = (np.asarray(x, np.float64).reshape(128, 256)
            @ (np.asarray(w_i8, np.float64)
               * np.asarray(s_w, np.float64))) + np.asarray(b, np.float64)
    rel = np.abs(np.asarray(got, np.float64).reshape(128, 512) - want).max() \
        / (np.abs(want).max() + 1e-12)
    assert rel < 2e-2, rel


def test_qmatmul_no_bias_and_gate():
    x = jnp.ones((16, 128), jnp.bfloat16)
    w = jnp.ones((128, 128), jnp.float32) * 0.01
    w_i8, s_w = quantize_weight(w, axis=-1)
    got = matmul_wdq(x, w_i8, s_w.reshape(-1))
    # all-equal operands: exact expected value 128 * w_dq
    want = 128 * float(w_i8[0, 0]) * float(s_w.reshape(-1)[0])
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.full((16, 128), want), rtol=1e-2)
    assert qmatmul_ok(512, 1152, 4608)
    assert not qmatmul_ok(512, 100, 4608)      # K not lane-aligned
    assert not qmatmul_ok(7, 128, 128)         # M has no sublane block


def test_mmdit_w8_forward_close(monkeypatch):
    from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    cfg = MMDiTConfig(sample_size=16, patch_size=2, in_channels=4,
                      hidden_size=128, depth=2, num_heads=4,
                      caption_projection_dim=128, joint_attention_dim=32,
                      pooled_projection_dim=48, pos_embed_max_size=16)
    model = MMDiT(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4)) * 0.3
    t = jnp.array([0.2, 0.8])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 48)) * 0.1
    params = model.init(jax.random.PRNGKey(3), x, t, ctx, pooled)["params"]
    # zero-init output head: perturb so the forward carries signal
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(4), len(leaves))
    params = jax.tree.unflatten(treedef, [
        a + 0.02 * jax.random.normal(k, a.shape, a.dtype)
        for a, k in zip(leaves, keys)])
    want = model.apply({"params": params}, x, t, ctx, pooled)
    monkeypatch.setenv("NATDIFF_QUANT", "w8")
    got = model.apply({"params": params}, x, t, ctx, pooled)
    a = np.asarray(want, np.float64).ravel()
    c = np.asarray(got, np.float64).ravel()
    assert np.isfinite(c).all()
    cos = a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > 0.999, cos


def test_dit_w8_forward_close(monkeypatch):
    from naturaldiffusion_tpu.models.dit import DiT, DiTConfig
    cfg = DiTConfig(input_size=16, patch_size=2, in_channels=4,
                    hidden_size=128, depth=2, num_heads=4, num_classes=10,
                    learn_sigma=False, class_dropout_prob=0.0)
    model = DiT(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    # adaLN-Zero: the random-init output is exactly zero — perturb every
    # param so the forward produces signal to compare
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree.unflatten(treedef, [
        a + 0.02 * jax.random.normal(k, a.shape, a.dtype)
        for a, k in zip(leaves, keys)])
    want = model.apply({"params": params}, x, t, y)
    monkeypatch.setenv("NATDIFF_QUANT", "w8")
    got = model.apply({"params": params}, x, t, y)
    a = np.asarray(want, np.float64).ravel()
    c = np.asarray(got, np.float64).ravel()
    assert np.isfinite(c).all()
    cos = a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > 0.999, cos
