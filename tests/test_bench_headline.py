"""Smoke test for the repo-root ``bench.py`` headline benchmark.

The driver runs ``python bench.py`` on the real chip at the end of every
round; nothing else imports it, so an edit can silently break the one
artifact the round is scored on.  This drives ``main()`` end-to-end on CPU
at toy scale (``BENCH_TOTAL``/``BENCH_STEPS``/``BENCH_MICRO`` env
overrides — defaults stay the production 1024/10/64) and checks the JSON
contract the driver parses.
"""

import importlib
import json
import os
import sys

import pytest


@pytest.mark.parametrize("mods", ["1", "0"])
def test_bench_main_toy(capsys, monkeypatch, mods, request):
    monkeypatch.setenv("BENCH_TOTAL", "4")
    monkeypatch.setenv("BENCH_MICRO", "2")
    monkeypatch.setenv("BENCH_STEPS", "2")
    monkeypatch.setenv("BENCH_MODS", mods)
    monkeypatch.syspath_prepend(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    # drop the module at teardown (after monkeypatch restores the env) so any
    # later `import bench` re-reads the PRODUCTION constants, not TOTAL=4
    request.addfinalizer(lambda: sys.modules.pop("bench", None))
    import bench
    importlib.reload(bench)  # re-read the env-dependent module constants
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "cifar10_ni10_img_per_sec_per_chip"
    assert rec["unit"] == "img/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["flops_per_img_step"] > 0
    assert rec["micro_batch"] == 2 and rec["total_batch"] == 4
