"""The DP program must be communication-CLEAN, not just correct.

The multi-chip dryrun (``__graft_entry__._dryrun_body``) asserts DP-sharded
trajectories equal replicated ones; this test asserts the stronger property
that makes DP *scale*: the optimized HLO of the DP-sharded executables
contains **no collective on activation-sized tensors**.  Pure data-parallel
inference with replicated weights needs zero communication — any
all-gather/all-reduce on a batch-sized tensor means GSPMD fell back to
gathering the global batch onto every device (the failure mode
``ops/conv3x3._cp_wrap`` exists to prevent for the opaque Mosaic custom
call; reference scale point: the 50k-sample FID sweep,
``src/CIFAR10NaturalInference.py:288-313``).

Covers both executables the FID pipeline runs at scale:
  * the NI sampler (``apps.cifar10_ni.make_sampler``), XLA-conv and
    Pallas-conv (``NATDIFF_PALLAS_CONV=1``) paths;
  * the InceptionV3 feature pass (``eval.inception.default_feature_fn``).

Runs on the session's virtual 8-device CPU mesh (conftest).
"""

import re

import pytest

import jax
import jax.numpy as jnp

from naturaldiffusion_tpu.parallel import make_mesh, batch_sharding

# any collective family GSPMD can insert; -start/-done async forms share the
# prefix so the word-boundary match catches them too
_COLLECTIVE = re.compile(
    r"\b(all-gather|all-reduce|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast)\b")
# `f32[16,32,32,3]{...} all-gather(...)` — the op's OUTPUT shape leads the line
_SHAPE = re.compile(r"=\s*(?:\([^)]*\)|[a-z0-9]+\[([0-9,]*)\])")

# anything this big is activation-sized (one CIFAR image = 3072 elements);
# genuinely tiny control scalars (replica groups bookkeeping etc.) pass
_MAX_ELEMS = 1024


def _activation_collectives(hlo_text: str) -> list[str]:
    bad = []
    for ln in hlo_text.splitlines():
        if not _COLLECTIVE.search(ln):
            continue
        m = _SHAPE.search(ln)
        dims = m.group(1) if m else None
        if dims is None:
            # tuple-shaped or unparsable output: conservatively flag it
            bad.append(ln.strip())
            continue
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        if n > _MAX_ELEMS:
            bad.append(ln.strip())
    return bad


def _assert_comm_clean(compiled, label: str):
    bad = _activation_collectives(compiled.as_text())
    assert not bad, (
        f"{label}: DP executable communicates on activation-sized tensors "
        f"(GSPMD gathered the batch):\n" + "\n".join(bad[:8]))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _tiny_ncsnpp():
    """Full production model class at a shrunken width/depth so the AOT
    compile stays test-sized; the conv/GN/attention op mix (what GSPMD
    partitions) is identical to the headline config."""
    from naturaldiffusion_tpu.models.ncsnpp import CIFAR10_DDPMPP_CONTINUOUS
    import dataclasses
    return dataclasses.replace(
        CIFAR10_DDPMPP_CONTINUOUS, nf=32, num_res_blocks=1)


@pytest.mark.parametrize("conv", ["xla", "pallas"])
def test_ni_sampler_dp_comm_clean(mesh, conv, monkeypatch):
    if conv == "pallas":
        # CPU test platform: conv3x3_pallas auto-selects interpret mode
        # off-TPU, but GSPMD still partitions the call via _cp_wrap
        monkeypatch.setenv("NATDIFF_PALLAS_CONV", "1")
    else:
        monkeypatch.setenv("NATDIFF_PALLAS_CONV", "0")

    from naturaldiffusion_tpu.apps.cifar10_ni import make_sampler
    from naturaldiffusion_tpu.coeffs import registry
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp

    model = NCSNpp(config=_tiny_ncsnpp())
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32),
                        jnp.zeros(1))["params"]
    run = make_sampler(params, model, registry.derive("ddim", 2),
                       batch=16, micro=8, mesh=mesh)

    sharding = batch_sharding(mesh, 4)
    init = jax.ShapeDtypeStruct((16, 32, 32, 3), jnp.float32,
                                sharding=sharding)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = run.lower(init, key).compile()
    _assert_comm_clean(compiled, f"cifar10 NI sampler ({conv} conv)")


def test_inception_feature_pass_dp_comm_clean(mesh):
    from naturaldiffusion_tpu.eval.inception import default_feature_fn

    fn = default_feature_fn()          # random weights: same partitioning
    sharding = batch_sharding(mesh, 4)
    imgs = jax.ShapeDtypeStruct((16, 32, 32, 3), jnp.float32,
                                sharding=sharding)
    compiled = fn.lower(imgs).compile()
    _assert_comm_clean(compiled, "inception feature pass")
    # and the output stays batch-sharded (no implicit gather at the boundary)
    out_sh = compiled.output_shardings
    spec = getattr(out_sh, "spec", None)
    assert spec is not None and spec[0] is not None, out_sh


def test_detector_catches_planted_collective(mesh):
    """The HLO scraper itself must fire on a real all-reduce (guards against
    the regex silently rotting as XLA's text format evolves)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    f = shard_map(lambda x: jax.lax.psum(x, "data"), mesh,
                  in_specs=P("data"), out_specs=P())
    x = jax.ShapeDtypeStruct((16, 3072), jnp.float32,
                             sharding=batch_sharding(mesh, 2))
    hlo = jax.jit(f).lower(x).compile().as_text()
    assert _activation_collectives(hlo), \
        "detector failed to flag a planted batch-sized all-reduce"
