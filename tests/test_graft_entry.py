"""Keep the driver contract green: dryrun_multichip on the virtual mesh."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out


@pytest.mark.slow
def test_dryrun_multichip_subprocess_bootstrap(capsys):
    """Driver contract: when the calling process has fewer devices than
    requested (the driver runs against ONE real TPU chip), dryrun must
    re-exec itself on a virtual CPU mesh and still print OK
    (MULTICHIP_r01.json failure mode)."""
    import __graft_entry__ as g

    # 16 > the 8 virtual devices conftest provides → forces the
    # subprocess bootstrap path.
    g.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "'data': 8" in out and "'index': 2" in out
