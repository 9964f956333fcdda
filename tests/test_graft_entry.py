"""Driver entry-point tests: the multichip dry run must execute a real
sharded training step on the virtual 8-device CPU mesh."""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


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
