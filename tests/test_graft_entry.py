"""Driver-contract tests: dryrun_multichip must build a dp×tp mesh and
execute one sharded train step on the 8-device CPU mesh."""
import pytest
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
