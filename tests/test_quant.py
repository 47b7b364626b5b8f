"""W8A8 int8 conv path (ops/quant.py): numerics + model-level dispatch.

Accuracy bound rationale: per-output-channel weight scales + per-sample
activation scales give a worst-case elementwise quantization noise of
~(amax/127) per operand; for the unit-variance random tensors here the
conv-output relative error lands ~1e-2, and exact-int8 inputs must come
back bitwise (the scheme is exact on representable points).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.ops.quant import (conv3x3_int8, quantize_act,
                                            quantize_weight)
from naturaldiffusion_tpu.ops.conv3x3 import conv3x3_xla


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def test_weight_quant_roundtrip_exact():
    # weights already on the int8 grid (scaled) must quantize losslessly
    key = jax.random.PRNGKey(0)
    wi = jax.random.randint(key, (3, 3, 8, 16), -127, 128).astype(jnp.float32)
    scale = 0.03
    w = wi * scale
    w_i8, s_w = quantize_weight(w)
    # per-channel amax decides the scale; channels whose amax is 127*scale
    # reproduce exactly
    w_back = w_i8.astype(jnp.float32) * s_w
    amax = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    full = amax == 127 * scale
    err = np.abs(np.asarray(w_back - w))[..., full]
    assert err.max() < 1e-6


def test_act_quant_per_sample_scales():
    x = jnp.stack([jnp.ones((4, 4, 3)) * 0.1, jnp.ones((4, 4, 3)) * 10.0])
    x_i8, s_x = quantize_act(x)
    assert s_x.shape == (2, 1, 1, 1)
    # both samples use their own full range
    assert np.asarray(jnp.abs(x_i8).max(axis=(1, 2, 3))).tolist() == [127, 127]


def test_conv3x3_int8_close_to_float():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 128, 128),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(3), (128,), jnp.float32) * 0.1
    y_ref = conv3x3_xla(x, w, b)
    y_q = conv3x3_int8(x, w, b)
    assert y_q.dtype == x.dtype
    assert np.isfinite(np.asarray(y_q)).all()
    assert _rel(y_q, y_ref) < 2e-2


def test_conv3x3_int8_exact_on_grid():
    # ints through the int8 path are exact (no rounding error at all)
    key = jax.random.PRNGKey(4)
    x = jax.random.randint(key, (1, 6, 6, 8), -127, 128).astype(jnp.float32)
    w = jnp.zeros((3, 3, 8, 8)).at[1, 1].set(jnp.eye(8))  # identity tap
    y = conv3x3_int8(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=1e-5)


def test_model_quant_dispatch(monkeypatch):
    # NATDIFF_QUANT=int8 must produce a finite forward close to the float one
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    cfg = NCSNppConfig(nf=128, ch_mult=(1,), num_res_blocks=1,
                       attn_resolutions=(), image_size=8)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]
    y_f = model.apply({"params": params}, x, t)
    monkeypatch.setenv("NATDIFF_QUANT", "int8")
    y_q = model.apply({"params": params}, x, t)
    assert np.isfinite(np.asarray(y_q)).all()
    # random-init output is near-zero-init head; compare pre-head feature
    # error indirectly through output correlation
    a = np.asarray(y_f, np.float64).ravel()
    b = np.asarray(y_q, np.float64).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99
    assert _rel(y_q, y_f) < 5e-2


def test_conv3x3_int8_static_close_to_float():
    key = jax.random.PRNGKey(5)
    x = jnp.tanh(jax.random.normal(key, (2, 8, 8, 128), jnp.float32)) * 3.0
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 128, 128),
                          jnp.float32) * 0.05
    y_ref = conv3x3_xla(x, w, None)
    y_q = conv3x3_int8(x, w, act_amax=6.0)
    assert _rel(y_q, y_ref) < 3e-2
    # out-of-range inputs saturate instead of wrapping
    xb = x.at[0, 0, 0, 0].set(50.0)
    yb = conv3x3_int8(xb, w, act_amax=6.0)
    assert np.isfinite(np.asarray(yb)).all()


def test_quant_flag_off_is_float_path(monkeypatch):
    monkeypatch.delenv("NATDIFF_QUANT", raising=False)
    from naturaldiffusion_tpu.ops.quant import quant_enabled
    assert quant_enabled() is None
    monkeypatch.setenv("NATDIFF_QUANT", "int8")
    assert quant_enabled() == "int8"
    monkeypatch.setenv("NATDIFF_QUANT", "garbage")
    assert quant_enabled() is None

def test_conv1x1_int8_static_close_to_float():
    # int8_all_static path: NIN/shortcut matmul with a compile-time clip
    from naturaldiffusion_tpu.ops.quant import conv1x1_int8
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(7),
                                   (2, 8, 8, 128), jnp.float32)) * 3.0
    w = jax.random.normal(jax.random.PRNGKey(8), (128, 128),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(9), (128,), jnp.float32) * 0.1
    y_ref = jnp.einsum("...c,cd->...d", x, w) + b
    y_dyn = conv1x1_int8(x, w, b)
    y_st = conv1x1_int8(x, w, b, act_amax=6.0)
    assert _rel(y_dyn, y_ref) < 2e-2
    assert _rel(y_st, y_ref) < 3e-2
    # out-of-range saturates, stays finite
    xb = x.at[0, 0, 0, 0].set(50.0)
    assert np.isfinite(np.asarray(conv1x1_int8(xb, w, b, act_amax=6.0))).all()


def test_model_quant_all_static_dispatch(monkeypatch):
    # the combined mode must run every quantized surface and stay close
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    cfg = NCSNppConfig(nf=128, ch_mult=(1,), num_res_blocks=1,
                       attn_resolutions=(8,), image_size=8)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(11), x, t)["params"]
    y_f = model.apply({"params": params}, x, t)
    monkeypatch.setenv("NATDIFF_QUANT", "int8_all_static")
    y_q = model.apply({"params": params}, x, t)
    assert np.isfinite(np.asarray(y_q)).all()
    a = np.asarray(y_f, np.float64).ravel()
    b = np.asarray(y_q, np.float64).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99
