"""repro_all: the CPU-pinning wrapper and the step table."""

import subprocess

from naturaldiffusion_tpu.apps.repro_all import _cpu_mod, _steps


def test_cpu_mod_pins_platform():
    # the wrapper must defeat the sitecustomize axon pin at CONFIG level;
    # probe with a module that prints the active backend
    cmd = _cpu_mod("naturaldiffusion_tpu.apps.repro_all", "--help")
    # swap the runpy target for an inline backend probe with the same prolog
    code = cmd[2].split("runpy.run_module")[0] + (
        "import jax\nprint('backend:', jax.default_backend())\n")
    out = subprocess.run([cmd[0], "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    assert "backend: cpu" in out.stdout


def test_steps_table_shape():
    steps = _steps("/tmp/x", chip=False, quick=False)
    names = [n for n, _ in steps]
    assert names == ["corpus", "validate_analyzers", "validate_dit",
                     "fid_selfcheck_toy", "visualize"]
    chip_steps = _steps("/tmp/x", chip=True, quick=False)
    assert len(chip_steps) == len(steps) + 4
    for _, cmd in steps:
        assert all(isinstance(c, str) for c in cmd)
