"""Smoke test for the train CLI incl. the --fsdp path.

The train *step* is covered by tests/test_sde_train.py and the multichip
dryrun; this pins the CLI wiring itself (argparse -> TrainConfig -> mesh ->
FSDP device_put -> step -> metrics) at toy scale with the synthetic dataset
fallback, so `--fsdp` can't bitrot between chip sessions.
"""

import pytest


@pytest.mark.parametrize("extra", [[], ["--fsdp"]], ids=["plain", "fsdp"])
def test_train_cli_toy(tmp_path, extra):
    from naturaldiffusion_tpu.apps.train import main

    rc = main(["--workdir", str(tmp_path), "--n-iters", "3", "--batch", "8",
               "--nf", "32", "--ch-mult", "1,2", "--num-res-blocks", "1",
               "--log-freq", "2", "--snapshot-freq", "1000000",
               "--no-snapshot-samples"] + extra)
    assert rc == 0
    assert (tmp_path / "metrics.jsonl").exists()
