"""The driver contract: entry() compiles; dryrun_multichip runs on the
virtual 8-device CPU mesh."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

# each dryrun jit-compiles the full sharded train step on the virtual CPU
# mesh (~2 min); `-m "not slow"` for a fast suite pass (VERDICT r1 weak #6)
pytestmark = pytest.mark.slow


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
