"""Pallas implicit-GEMM 3x3 conv (ops/conv3x3.py) vs the XLA oracle.

Covers: the raw kernel across shapes/dtypes (incl. a batch the block picker
can't split), the custom-VJP backward, and the in-model dispatch — an
NCSN++ forward with NATDIFF_PALLAS_CONV=1 must equal the flag-off forward
bit-for-bit modulo accumulation order (the stem/head convs fall through to
XLA in both).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.ops.conv3x3 import (conv3x3_pallas, conv3x3_xla,
                                              _pick_block_batch)


@pytest.mark.parametrize("variant", ["taps9", "kstack", "valid9"])
@pytest.mark.parametrize("shape", [
    (2, 4, 4, 128, 128),
    (1, 5, 3, 128, 256),      # odd spatial, channel-raising
    (3, 8, 8, 256, 128),      # batch=3: block picker must fall back to 1
])
def test_kernel_matches_xla_f32(shape, variant):
    b, h, w, ci, co = shape
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, h, w, ci), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                           jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    got = conv3x3_pallas(x, wt, bias, variant=variant)
    want = conv3x3_xla(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_kernel_bf16_f32_accumulation():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 6, 6, 128), jnp.bfloat16)
    wt = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128),
                            jnp.bfloat16) * 0.05)
    got = conv3x3_pallas(x, wt, None)
    assert got.dtype == jnp.bfloat16
    want = conv3x3_xla(x.astype(jnp.float32), wt.astype(jnp.float32), None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=0.05)


def test_no_bias_path():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 4, 4, 128), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128),
                           jnp.float32) * 0.05
    np.testing.assert_allclose(np.asarray(conv3x3_pallas(x, wt, None)),
                               np.asarray(conv3x3_xla(x, wt, None)),
                               rtol=0, atol=1e-4)


def test_rejects_unaligned_channels():
    x = jnp.zeros((1, 4, 4, 64))
    wt = jnp.zeros((3, 3, 64, 128))
    with pytest.raises(ValueError, match="multiples of 128"):
        conv3x3_pallas(x, wt, None)


def test_custom_vjp_matches_xla_grads():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 4, 4, 128), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128),
                           jnp.float32) * 0.05
    bias = jnp.zeros((128,))

    def loss(fn):
        return lambda x, w, b: (fn(x, w, b) * jnp.cos(
            jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape[:-1] +
                                                          (128,)))).sum()

    g1 = jax.grad(loss(conv3x3_pallas), (0, 1, 2))(x, wt, bias)
    g0 = jax.grad(loss(conv3x3_xla), (0, 1, 2))(x, wt, bias)
    for a, b_ in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0, atol=1e-4)


def test_block_picker_divides_batch():
    for b in (1, 2, 3, 5, 8, 64):
        nb = _pick_block_batch(b, 32, 32, 128, 128, 2)
        assert b % nb == 0 and nb >= 1


def test_ncsnpp_forward_flag_on_equals_off(monkeypatch):
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    cfg = NCSNppConfig(nf=128, ch_mult=(1,), num_res_blocks=1,
                       attn_resolutions=(), image_size=8)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])["params"]

    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    y_off = model.apply({"params": params}, x, t)
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "1")
    y_on = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=0, atol=2e-5)


def test_pconv_param_tree_matches_nn_conv():
    """The swap-in module must keep nn.Conv's exact param names/shapes so
    every torch->flax converter path map stays valid."""
    import flax.linen as nn
    from naturaldiffusion_tpu.models.layers import conv3x3
    x = jnp.zeros((1, 4, 4, 128))
    ours = conv3x3(256, name="Conv_0")
    ref = nn.Conv(256, (3, 3), padding="SAME", name="Conv_0")
    p1 = ours.init(jax.random.PRNGKey(0), x)["params"]
    p2 = ref.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))


def test_ncsnpp_forward_fused_resblock_equals_off(monkeypatch):
    """NATDIFF_PALLAS_CONV=2: GN_0+SiLU->Conv_0->(+temb)GN_1+SiLU->Conv_1
    ->+skip/sqrt2 as two fused kernels — must match the unfused forward."""
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    cfg = NCSNppConfig(nf=128, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), image_size=8)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])["params"]

    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    y_off = model.apply({"params": params}, x, t)
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    y_on = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=0, atol=5e-5)


def test_fused_resblock_param_tree_unchanged(monkeypatch):
    """init under flag=2 must create the exact same param tree (names +
    shapes) as the unfused init — checkpoint mapping cannot depend on the
    perf mode."""
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    cfg = NCSNppConfig(nf=128, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), image_size=8)
    model = NCSNpp(config=cfg)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    p_off = model.init(jax.random.PRNGKey(1), x, t)["params"]
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    p_on = model.init(jax.random.PRNGKey(1), x, t)["params"]
    assert jax.tree.structure(p_on) == jax.tree.structure(p_off)
    for a, b in zip(jax.tree.leaves(p_on), jax.tree.leaves(p_off)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_conv_gn_kernel_oracle():
    """conv3x3_gn_pallas == GN(+tb,+silu) -> conv -> +skip/sqrt2 oracle,
    incl. the emitted channel sums."""
    from naturaldiffusion_tpu.ops.conv3x3 import (conv3x3_gn_pallas,
                                                  conv3x3_xla)
    from naturaldiffusion_tpu.ops.group_norm import (
        group_norm_reference, gn_channel_sums, gn_affine_coeffs)
    k = jax.random.PRNGKey(0)
    B, H, W, C = 2, 8, 8, 128
    x = jax.random.normal(k, (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (C,), jnp.float32)
    sc = 1 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (C,))
    bi = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (C,))
    tb = 0.2 * jax.random.normal(jax.random.PRNGKey(5), (B, C))
    skip = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))

    gn = group_norm_reference(x, sc, bi, 32, act="silu", extra_bias=tb)
    want = (conv3x3_xla(gn, w, b) + skip) / np.sqrt(2.0)
    s1, s2 = gn_channel_sums(x)
    wc, bc = gn_affine_coeffs(s1, s2, H * W, sc, bi, 32, extra_bias=tb)
    got, g1, g2 = conv3x3_gn_pallas(x, w, b, pre=(wc, bc), skip=skip,
                                    skip_rescale=True, emit_stats=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)
    w1, w2 = gn_channel_sums(want)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(w1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-4, atol=1e-3)


def test_fused_conv_under_dp_sharding(monkeypatch):
    """The Pallas conv paths must survive the DP-sharded dispatch the 50k
    FID sweep uses: batch sharded over the 8-device mesh, per-device batch
    1, kernel gridded on the local shard."""
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    from naturaldiffusion_tpu.parallel import make_mesh, shard_batch

    cfg = NCSNppConfig(image_size=8, num_channels=3, nf=128, ch_mult=(1,),
                       num_res_blocks=1, attn_resolutions=(), dropout=0.0)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3), jnp.float32)
    t = jnp.full((8,), 500.0)
    params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])["params"]

    def fwd(z, tt):
        return model.apply({"params": params}, z, tt)

    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    want = jax.jit(fwd)(x, t)

    mesh = make_mesh({"data": 8})
    xs, ts = shard_batch(mesh, (x, t))
    for flag in ("1", "2"):
        monkeypatch.setenv("NATDIFF_PALLAS_CONV", flag)
        got = jax.jit(fwd)(xs, ts)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=5e-5)


def test_ddpm_resblock_fused_equals_off(monkeypatch):
    """The DDPM-style resblock's fused path (incl. NIN shortcut and the
    no-rescale skip) must match the unfused forward."""
    from naturaldiffusion_tpu.models.layers import ResnetBlockDDPMpp
    for in_ch, out_ch, rescale in [(128, 128, True), (128, 256, False)]:
        blk = ResnetBlockDDPMpp(out_ch=out_ch, skip_rescale=rescale,
                                dropout=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, in_ch))
        temb = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
        params = blk.init(jax.random.PRNGKey(2), x, temb)["params"]
        monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
        want = blk.apply({"params": params}, x, temb)
        monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
        got = blk.apply({"params": params}, x, temb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=5e-5)


def test_vmem_gate_and_module_fallback(monkeypatch):
    """Shapes whose single-image working set exceeds VMEM must be rejected
    by the whole-image variants (clear error) and dispatch to the
    DMA-halo TILED variant at the module level (celebahq-256 / LSUN
    level-0 maps); only pathological widths fall all the way to XLA."""
    from naturaldiffusion_tpu.models import layers as L
    from naturaldiffusion_tpu.ops import conv3x3 as pconv

    assert pconv.pallas_conv_fits((64, 32, 32, 128), 128, 2)  # CIFAR
    # celebahq-256 level-0: whole-image no, halo-tiled yes (both forms)
    assert not pconv.pallas_conv_fits((1, 256, 256, 128), 128, 2)
    assert pconv.pallas_conv_fits((1, 256, 256, 128), 128, 2, "tiled")
    assert pconv.pallas_conv_fits((1, 256, 256, 128), 128, 2, "tiledew")

    big = jnp.zeros((1, 256, 256, 128), jnp.bfloat16)
    wt = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="VMEM"):
        conv3x3_pallas(big, wt)   # whole-image valid9: still a loud error

    calls = []
    real = pconv.conv3x3_pallas
    monkeypatch.setattr(
        pconv, "conv3x3_pallas",
        lambda *a, **k: calls.append(k.get("variant")) or real(*a, **k))
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "1")
    m = L.PConv3x3(128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 128))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    got = m.apply({"params": params}, x)      # falls through to tiled
    assert calls[-1] == "tiled" or pconv.pallas_conv_fits(
        x.shape, 128, x.dtype.itemsize)
    want = conv3x3_xla(x, params["kernel"], params["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("variant", ["tiled", "tiledew"])
@pytest.mark.parametrize("shape", [
    (2, 8, 8, 128, 128),
    (1, 12, 4, 128, 256),     # tall/narrow, channel-raising
    (3, 6, 5, 128, 128),      # odd W, batch 3
])
def test_tiled_variant_matches_xla(shape, variant):
    """Halo-tiled valid9 (manual-DMA and element-window forms) == XLA
    oracle, incl. the zeroed image-edge halo rows of the first/last
    tiles."""
    b, h, w, ci, co = shape
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, h, w, ci), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                           jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    got = conv3x3_pallas(x, wt, bias, variant=variant)
    want = conv3x3_xla(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("variant", ["tiled", "tiledew"])
def test_tiled_variant_grads(variant):
    """The custom VJP covers the tiled variants too."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 128))
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128)) * 0.05

    def loss(fn):
        return lambda xx, ww_: jnp.sum(fn(xx, ww_, None) ** 2)

    g_t = jax.grad(loss(lambda *a: conv3x3_pallas(*a, variant=variant)),
                   (0, 1))(x, wt)
    g_x = jax.grad(loss(conv3x3_xla), (0, 1))(x, wt)
    for a, b_ in zip(g_t, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0, atol=1e-4)


def test_xla_conv_only_context(monkeypatch):
    from naturaldiffusion_tpu.ops import conv3x3 as pc

    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    assert pc.pallas_conv_enabled() and pc.fused_resblock_enabled()
    with pc.xla_conv_only():
        assert not pc.pallas_conv_enabled()
        assert not pc.fused_resblock_enabled()
    assert pc.pallas_conv_enabled()


def test_jvp_with_flag_needs_xla_conv_context(monkeypatch):
    """Forward-mode autodiff (the Hutchinson divergence in
    eval/likelihood.py) cannot cross the custom-VJP Pallas conv; the
    xla_conv_only() trace context must restore it with the flag set."""
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    from naturaldiffusion_tpu.ops.conv3x3 import xla_conv_only

    cfg = NCSNppConfig(image_size=8, num_channels=3, nf=128, ch_mult=(1,),
                       num_res_blocks=1, attn_resolutions=(), dropout=0.0)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3), jnp.float32)
    t = jnp.full((1,), 500.0)
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]
    v = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    def f(z):
        return model.apply({"params": params}, z, t)

    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    want_y, want_jv = jax.jvp(f, (x,), (v,))

    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    with pytest.raises(Exception):
        jax.jvp(f, (x,), (v,))
    with xla_conv_only():
        got_y, got_jv = jax.jvp(f, (x,), (v,))
    np.testing.assert_allclose(np.asarray(got_jv), np.asarray(want_jv),
                               atol=1e-5)


def test_likelihood_fn_survives_conv_flag(monkeypatch):
    """End-to-end: get_likelihood_fn applies xla_conv_only() itself, so
    --bpd evaluation works with NATDIFF_PALLAS_CONV set."""
    from naturaldiffusion_tpu.eval.likelihood import get_likelihood_fn
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    from naturaldiffusion_tpu.sde import VPSDE

    cfg = NCSNppConfig(image_size=8, num_channels=3, nf=128, ch_mult=(1,),
                       num_res_blocks=1, attn_resolutions=(), dropout=0.0)
    model = NCSNpp(config=cfg)
    # f64 ODE state: the x64 test env promotes the integrator's step-size
    # bookkeeping to f64, so keep the whole state wide for dtype stability
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3), jnp.float64)
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros(1))["params"]
    sde = VPSDE()

    def score_fn(z, tt):
        lbl = tt * (sde.N - 1)
        out = model.apply({"params": params}, z, lbl)
        std = sde.marginal_prob(jnp.zeros_like(z), tt)[1]
        # keep the ODE state dtype stable under x64 (std is f64 here)
        return (-out / std[:, None, None, None]).astype(z.dtype)

    lf = get_likelihood_fn(sde, score_fn, rtol=1e-1, atol=1e-1)
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    bpd, _, nfe = lf(jax.random.PRNGKey(3), x)
    assert np.isfinite(np.asarray(bpd)).all() and int(nfe) > 0


def test_fused_pre_act_none_and_invalid():
    """pre_act=None applies only the affine prologue; unknown names fail
    loudly instead of silently skipping the activation."""
    from naturaldiffusion_tpu.ops.conv3x3 import conv3x3_gn_pallas

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 4, 4, 128), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128),
                           jnp.float32) * 0.05
    pw = jnp.full((2, 128), 1.5, jnp.float32)
    pb = jnp.full((2, 128), -0.25, jnp.float32)

    got = conv3x3_gn_pallas(x, wt, pre=(pw, pb), pre_act=None)
    want = conv3x3_xla(x * 1.5 - 0.25, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    with pytest.raises(ValueError, match="pre_act"):
        conv3x3_gn_pallas(x, wt, pre=(pw, pb), pre_act="relu")


def test_biggan_updown_resblock_fused_equals_off(monkeypatch):
    """The up/down BigGAN blocks' partially-fused path (GN_0 standalone —
    the resample sits between its SiLU and Conv_0 — then stats-emitting
    Conv_0 + fused GN_1/Conv_1/skip) must match the unfused forward, for
    both resample directions and both FIR modes."""
    from naturaldiffusion_tpu.models import layers as L
    from naturaldiffusion_tpu.ops import conv3x3 as pconv
    calls = []
    real = pconv.conv3x3_gn_pallas
    monkeypatch.setattr(pconv, "conv3x3_gn_pallas",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    for up, down in [(True, False), (False, True)]:
        for fir in (False, True):
            blk = L.ResnetBlockBigGANpp(out_ch=128, up=up, down=down,
                                        fir=fir, dropout=0.0,
                                        skip_rescale=True)
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
            params = blk.init(jax.random.PRNGKey(2), x, temb)["params"]
            monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
            want = blk.apply({"params": params}, x, temb)
            n_before = len(calls)
            monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
            got = blk.apply({"params": params}, x, temb)
            assert len(calls) == n_before + 2   # Conv_0(stats) + Conv_1
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0, atol=5e-5)


def test_full_biggan_model_fused_equals_off(monkeypatch):
    """Whole-model check at the bench config's shape grammar (biggan
    resblocks, resamples at every level transition): NATDIFF_PALLAS_CONV=2
    must now cover the up/down blocks too and still match the XLA model."""
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig

    cfg = NCSNppConfig(image_size=16, num_channels=3, nf=128,
                       ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), dropout=0.0)
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.full((2,), 500.0)
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]
    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    want = model.apply({"params": params}, x, t)
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    got = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-4)


def test_fused_resblock_grad_falls_back_to_xla(monkeypatch):
    """Reverse-mode AD through the fused path (e.g. gradient-guided
    sampling of a deterministic forward) must produce the unfused
    gradients via the custom-VJP XLA recompute, not crash in Mosaic."""
    from naturaldiffusion_tpu.models.layers import ResnetBlockBigGANpp

    blk = ResnetBlockBigGANpp(out_ch=128, dropout=0.0, skip_rescale=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    params = blk.init(jax.random.PRNGKey(2), x, temb)["params"]

    def loss(z):
        return jnp.sum(blk.apply({"params": params}, z, temb) ** 2)

    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)
    want = jax.grad(loss)(x)
    monkeypatch.setenv("NATDIFF_PALLAS_CONV", "2")
    got = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


def test_pick_block_batch_respects_fused_working_set():
    """The block-batch picker must budget the FUSED working set (skip
    double-buffer + f32 prologue temp), not the plain conv's — otherwise
    large local batches compile working sets past VMEM on chip."""
    from naturaldiffusion_tpu.ops.conv3x3 import (_pick_block_batch,
                                                  _working_set_bytes,
                                                  _VMEM_BUDGET)
    for itemsize in (2, 4):
        for kw in ({"fused": True, "has_pre": True, "has_skip": True},
                   {"fused": False}):
            nb = _pick_block_batch(56, 16, 16, 256, 256, itemsize,
                                   "valid9", **kw)
            assert 56 % nb == 0
            assert _working_set_bytes(nb, 16, 16, 256, 256, itemsize,
                                      "valid9", **kw) <= _VMEM_BUDGET
