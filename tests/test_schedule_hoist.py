"""Schedule-hoisted conditioning == the standard per-step path (NCSN++).

``ncsnpp_schedule_biases`` precomputes the whole time-embedding chain +
every resblock's ``Dense_0`` projection for a static NI schedule (the rows
are batch-independent matmuls, so hoisted rows equal in-loop rows bitwise
up to reduction order).  These tests pin (a) the forward fast path against
the standard forward for both resblock types and both embedding types, and
(b) a full ``natural_inference`` run through the ``step_inputs=`` hook
against the unhoisted run.

DiT's twin (``dit_schedule_mods``) is pinned in ``test_dit_parity.py``;
MMDiT's in ``test_sd3_ni.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.models.ncsnpp import (NCSNpp, NCSNppConfig,
                                                ncsnpp_schedule_biases)


def _small_cfg(**kw):
    base = dict(image_size=16, num_channels=3, nf=32, ch_mult=(1, 2),
                num_res_blocks=1, attn_resolutions=(8,), dropout=0.0)
    base.update(kw)
    return NCSNppConfig(**base)


def _init(model, x, t):
    return model.init(jax.random.PRNGKey(0), x[:1], t[:1])["params"]


@pytest.mark.parametrize("cfg", [
    _small_cfg(),                                         # biggan positional
    _small_cfg(resblock_type="ddpm"),
    _small_cfg(fir=True, embedding_type="fourier", scale_by_sigma=True),
], ids=["biggan-positional", "ddpm-positional", "fourier-ve"])
def test_forward_mods_equals_standard(cfg):
    model = NCSNpp(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3), jnp.float32)
    t_all = jnp.asarray([900.0, 450.0, 2.0], jnp.float32)
    params = _init(model, x, jnp.full((1,), 500.0))
    mods = ncsnpp_schedule_biases(model, params, t_all)
    assert mods, "no resblock projections found"
    for leaf in jax.tree.leaves(mods):
        assert leaf.shape[0] == 3 and leaf.shape[1] == 1
    for k in range(3):
        t = jnp.full((3,), t_all[k], jnp.float32)
        want = model.apply({"params": params}, x, t)
        aux = jax.tree.map(lambda a: a[k], mods)
        got = model.apply({"params": params}, x, t, mods=aux)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_ni_step_inputs_equals_standard():
    """Full 6-step NI through the step_inputs hook == the unhoisted run
    (deterministic DDIM schedule; both scan and unrolled paths)."""
    from naturaldiffusion_tpu.coeffs import registry
    from naturaldiffusion_tpu.engine import NISchedule, natural_inference

    cfg = _small_cfg()
    model = NCSNpp(config=cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3), jnp.float32)
    params = _init(model, z, jnp.full((1,), 500.0))
    n = 6
    sched = NISchedule.from_matrix(registry.derive("ddim", n))
    mods = ncsnpp_schedule_biases(model, params, sched.node[:n, 0])

    def fwd(x, t):
        return model.apply({"params": params}, x,
                           jnp.full((x.shape[0],), t, jnp.float32))

    def fwd_m(x, t, aux):
        return model.apply({"params": params}, x,
                           jnp.full((x.shape[0],), t, jnp.float32), mods=aux)

    for unroll in (False, True):
        want = jax.jit(lambda zz: natural_inference(
            fwd, sched, zz, prediction_type="eps", unroll=unroll))(z)
        got = jax.jit(lambda zz: natural_inference(
            fwd_m, sched, zz, prediction_type="eps", unroll=unroll,
            step_inputs=mods))(z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_mods_rejects_unconditional():
    cfg = _small_cfg(conditional=False)
    model = NCSNpp(config=cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = _init(model, x, jnp.full((1,), 500.0))
    with pytest.raises(ValueError):
        ncsnpp_schedule_biases(model, params, jnp.asarray([1.0]))
    with pytest.raises(ValueError):
        model.apply({"params": params}, x, jnp.full((1,), 1.0),
                    mods={"m0": jnp.zeros((1, 32))})
