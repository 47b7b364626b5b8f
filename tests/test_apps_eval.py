"""Apps (analyze/validate/degradation), FID machinery, Inception port."""

import os

import numpy as np
import pytest


def test_analyze_cli_writes_artifacts(tmp_path):
    from naturaldiffusion_tpu.apps.analyze import main
    rc = main(["--alg", "ddim", "--steps", "8", "--outdir", str(tmp_path),
               "--no-plot"])
    assert rc == 0
    base = tmp_path / "ddim" / "ddim_sympy_008"
    assert (base.with_suffix(".npz")).exists()
    assert (base.with_suffix(".csv")).exists()
    from naturaldiffusion_tpu.coeffs.matrix import CoeffMatrix
    m = CoeffMatrix.load(str(base.with_suffix(".npz")))
    assert m.num_step == 8


def test_validate_cli_all_algorithms():
    from naturaldiffusion_tpu.apps.validate import main
    assert main(["--steps", "12"]) == 0


def test_degradation_concentrates_with_low_noise():
    from naturaldiffusion_tpu.apps.degradation import posterior_stats
    import jax.numpy as jnp
    feats = np.random.default_rng(0).standard_normal((64, 32)).astype(
        np.float32)
    diag_lo, _ = posterior_stats(jnp.asarray(feats), 100, kind="vp")
    diag_hi, _ = posterior_stats(jnp.asarray(feats), 900, kind="vp")
    # low noise -> posterior concentrates on own x0; high noise -> spreads
    assert np.asarray(diag_lo).mean() > 0.9
    assert np.asarray(diag_hi).mean() < np.asarray(diag_lo).mean()


def test_frechet_distance_known_values():
    from naturaldiffusion_tpu.eval.fid import frechet_distance
    d = 8
    mu = np.zeros(d)
    sig = np.eye(d)
    assert frechet_distance(mu, sig, mu, sig) < 1e-10
    # mean shift only: FID = ||dmu||^2
    mu2 = np.ones(d) * 0.5
    np.testing.assert_allclose(frechet_distance(mu, sig, mu2, sig),
                               d * 0.25, atol=1e-8)
    # isotropic scale: trace terms (1 + s - 2 sqrt(s)) per dim
    s = 2.0
    np.testing.assert_allclose(
        frechet_distance(mu, sig, mu, sig * s),
        d * (1 + s - 2 * np.sqrt(s)), atol=1e-8)


def test_compute_statistics():
    from naturaldiffusion_tpu.eval.fid import compute_statistics
    x = np.random.default_rng(1).standard_normal((5000, 4))
    mu, sig = compute_statistics(x)
    np.testing.assert_allclose(mu, 0.0, atol=0.1)
    np.testing.assert_allclose(sig, np.eye(4), atol=0.15)


def test_inception_shapes_and_determinism():
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.eval.inception import FIDInceptionV3
    model = FIDInceptionV3()
    x = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    f1 = model.apply({"params": params}, x)
    assert f1.shape == (2, 2048)
    assert np.isfinite(np.asarray(f1)).all()
    # param count sanity: pytorch-fid InceptionV3 trunk has ~21.8M params
    n = sum(p.size for p in jax.tree.leaves(params))
    assert 21e6 < n < 24e6, n


def test_avg_pool_nocount_matches_manual():
    import jax.numpy as jnp
    from naturaldiffusion_tpu.eval.inception import avg_pool_nocount
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    y = np.asarray(avg_pool_nocount(x))
    # corner (0,0): window covers 4 valid cells (0,1,4,5) / 4
    np.testing.assert_allclose(y[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4.0)
    # center (1,1): full 3x3 window
    np.testing.assert_allclose(y[0, 1, 1, 0],
                               np.arange(16).reshape(4, 4)[:3, :3].mean())


def test_profiling_harness():
    import jax.numpy as jnp
    from naturaldiffusion_tpu.utils.profiling import Timer, NFECounter
    from naturaldiffusion_tpu.samplers import direct

    t = Timer(iters=3)(lambda x: x * 2.0, jnp.ones((8, 8)))
    assert t > 0 and len(Timer(iters=3).times) == 0

    # unrolled NI: one call site per step -> true NFE
    from naturaldiffusion_tpu.coeffs import registry
    from naturaldiffusion_tpu.engine import NISchedule, natural_inference
    counted = NFECounter(lambda x, tt: jnp.tanh(x) * 0.5)
    sched = NISchedule.from_matrix(registry.derive("ddim", 7))
    import jax
    jax.jit(lambda z: natural_inference(counted, sched, z,
                                        prediction_type="x0",
                                        unroll=True))(jnp.ones((2, 4)))
    assert counted.nfe == 7
    # scan-based loops trace the body once
    counted.reset()
    jax.jit(lambda z: direct.ddim(counted, 7, z))(jnp.ones((2, 4)))
    assert counted.nfe == 1


def test_activations_sharded_matches_unsharded():
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.eval.fid import activations
    from naturaldiffusion_tpu.parallel import make_mesh

    @jax.jit
    def feature_fn(x):
        return jnp.stack([x.sum(axis=(1, 2, 3)), x.max(axis=(1, 2, 3))], -1)

    imgs = np.random.default_rng(0).random((37, 8, 8, 3)).astype(np.float32)
    plain = activations(imgs, feature_fn, batch_size=16)
    mesh = make_mesh({"data": 8})
    sharded = activations(imgs, feature_fn, batch_size=16, mesh=mesh)
    assert sharded.shape == plain.shape == (37, 2)
    np.testing.assert_allclose(sharded, plain, atol=1e-6)
