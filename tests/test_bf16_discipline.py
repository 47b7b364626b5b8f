"""bf16 dtype discipline: with bf16 params + bf16 inputs, the transformer
backbones must keep their streams (and the attention kernel inputs) in
bf16.  Regression for the r3 xprof finding that the f32 sinusoidal
conditioning vector promoted every MMDiT/DiT block — and the flash
attention custom-call — to f32 (same class as the r2 NCSN++ temb fix)."""

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.ops import attention as attention_mod


def _record_mha_dtypes(monkeypatch, seen):
    real = attention_mod.mha

    def spy(q, k, v, **kw):
        seen.append((q.dtype, k.dtype, v.dtype))
        return real(q, k, v, **kw)

    monkeypatch.setattr(attention_mod, "mha", spy)


def _bf16(params):
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def test_mmdit_stays_bf16(monkeypatch):
    from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(sample_size=8, hidden_size=64, depth=2, num_heads=2,
                      pos_embed_max_size=16, qk_norm=True,
                      joint_attention_dim=32, pooled_projection_dim=32)
    model = MMDiT(config=cfg)
    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 5, 32), jnp.float32)
    pooled = jnp.zeros((1, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)["params"]

    seen = []
    _record_mha_dtypes(monkeypatch, seen)
    out = model.apply({"params": _bf16(params)}, x.astype(jnp.bfloat16), t,
                      ctx.astype(jnp.bfloat16), pooled.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    assert seen and all(d == (jnp.bfloat16,) * 3 for d in seen), seen
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # the OTHER promotion channel: real text encoders emit f32 context /
    # pooled.  Those must not drag the joint streams back to f32 either.
    seen.clear()
    out = model.apply({"params": _bf16(params)}, x.astype(jnp.bfloat16), t,
                      ctx, pooled)
    assert out.dtype == jnp.bfloat16
    assert seen and all(d == (jnp.bfloat16,) * 3 for d in seen), seen

    # and through the schedule-hoisted mods path (f32 context input)
    from naturaldiffusion_tpu.models.mmdit import mmdit_schedule_mods
    mods = mmdit_schedule_mods(model, _bf16(params),
                               jnp.asarray([500.0]), pooled, ctx)
    ctx_emb = mods.pop("ctx_emb")          # step-constant (sd3_ni pattern)
    assert ctx_emb.dtype == jnp.bfloat16
    seen.clear()
    step = jax.tree.map(lambda a: a[0], mods)
    out = model.apply({"params": _bf16(params)}, x.astype(jnp.bfloat16), t,
                      ctx, pooled, mods=dict(step, ctx_emb=ctx_emb))
    assert out.dtype == jnp.bfloat16
    assert seen and all(d == (jnp.bfloat16,) * 3 for d in seen), seen


def test_dit_stays_bf16(monkeypatch):
    from naturaldiffusion_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(input_size=8, hidden_size=64, depth=2, num_heads=2,
                    num_classes=10)
    model = DiT(config=cfg)
    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]

    seen = []
    _record_mha_dtypes(monkeypatch, seen)
    out = DiT(config=cfg).apply({"params": _bf16(params)},
                                x.astype(jnp.bfloat16), t, y)
    assert out.dtype == jnp.bfloat16
    assert seen and all(d == (jnp.bfloat16,) * 3 for d in seen), seen


def test_f32_params_unaffected():
    """The cast is to the STREAM dtype: full-f32 runs (parity tests,
    training) stay f32 end-to-end."""
    from naturaldiffusion_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(input_size=8, hidden_size=64, depth=1, num_heads=2,
                    num_classes=10)
    model = DiT(config=cfg)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    out = model.apply({"params": params}, x, t, y)
    assert out.dtype == jnp.float32
