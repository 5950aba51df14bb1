"""The driver contract: entry() compiles; dryrun_multichip runs on the
virtual 8-device CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
