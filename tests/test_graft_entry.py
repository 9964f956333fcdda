"""Driver entry-point tests: the multichip dry run must execute a real
sharded training step on the virtual 8-device CPU mesh."""

import pathlib
import sys

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft

# driver dryruns re-compile the sharded step in subprocesses; default runs include this — deselect with -m 'not slow'
pytestmark = pytest.mark.slow



class TestDryrun:
    def test_dryrun_multichip_8(self, capsys):
        assert len(jax.devices()) == 8
        graft.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "mesh={'data': 4, 'model': 2}" in out

    def test_dryrun_multichip_2(self, capsys):
        graft.dryrun_multichip(2)
        out = capsys.readouterr().out
        assert "mesh={'data': 2, 'model': 1}" in out

    def test_dryrun_self_provisions_from_one_device(self):
        """Regression for MULTICHIP_r01.json (ok=false): the driver calls
        dryrun_multichip(8) in a fresh process whose backend has ONE device
        (the real axon chip). Simulate that with a scrubbed 1-CPU-device env;
        the entry must self-provision a virtual 8-device mesh and succeed."""
        import os
        import subprocess

        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
        }
        env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device, like the driver's 1 chip
        repo = str(pathlib.Path(__file__).resolve().parent.parent)
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import __graft_entry__ as g; g.dryrun_multichip(8)",
            ],
            env=env,
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "mesh={'data': 4, 'model': 2}" in proc.stdout
