"""CLI argument-surface tests (no device compute)."""

import numpy as np
import pytest

from relativepose_tpu.cli import common as cli_common
from relativepose_tpu.eval.harness import EvalConfig


class TestEvalConfigSemantics:
    def test_alter_steps_per_method(self):
        # evaluation.py:73-74
        assert EvalConfig(method="ours").alter_steps == 3
        assert EvalConfig(method="ours_nr").alter_steps == 1
        assert EvalConfig(method="ours_nc").alter_steps == 3
        assert EvalConfig(method="ours").completion
        assert not EvalConfig(method="ours_nc").completion

    def test_evaluate_parse_snumclass_auto(self):
        from relativepose_tpu.cli.evaluate import _parse_args
        a = _parse_args(["--dataList", "suncgv3", "--method", "ours"])
        assert a.snumclass == 15  # evaluation.py:75
        a = _parse_args(["--dataList", "matterport3dv1"])
        assert a.snumclass == 21
        a = _parse_args(["--dataList", "scannetv1"])
        assert a.snumclass == 21
        assert a.maskMethod == "kinect"

    def test_evaluate_para_table(self, tmp_path):
        import os

        from relativepose_tpu.cli.evaluate import _parse_args
        path = os.path.join(tmp_path, "p.txt")
        np.savetxt(path, np.tile([0.3, 0.3, 0.04, 0.01], (3, 1)))
        a = _parse_args(["--dataList", "suncgv3", "--para", path])
        tab = np.loadtxt(a.para).reshape(-1, 4)
        assert tab.shape == (3, 4)


class TestCommonArgs:
    def _parse(self, argv):
        import argparse
        p = argparse.ArgumentParser()
        cli_common.add_common_training_args(p)
        p.add_argument("--synthetic_family", type=str, default="suncg")
        return p.parse_args(argv)

    def test_defaults_mirror_reference(self):
        a = self._parse([])
        assert a.batch_size == 8          # opts.py:12
        assert a.outputType == "rgbdnsf"  # opts.py:22
        assert a.D == 0.5                 # opts.py:38
        assert a.useTanh == 1
        assert a.skipLayer == 1

    def test_resolve_dataset_families(self):
        a = self._parse(["--dataList", "scannetv1"])
        ds, mask = cli_common.resolve_dataset(a)
        assert ds == "scannet" and mask == "kinect" and a.snumclass == 21
        a = self._parse(["--dataList", "suncgv3"])
        ds, mask = cli_common.resolve_dataset(a)
        assert ds == "suncg" and mask == "second" and a.snumclass == 15
        a = self._parse(["--dataList", "synthetic",
                         "--synthetic_family", "matterport"])
        ds, _ = cli_common.resolve_dataset(a)
        assert ds == "matterport"

    def test_unknown_dataset_raises(self):
        a = self._parse(["--dataList", "kitti"])
        with pytest.raises(ValueError):
            cli_common.resolve_dataset(a)


class TestTuneSigmaCLI:
    def test_module_entry_exists(self):
        from relativepose_tpu.cli import tune_sigma
        assert callable(tune_sigma.main)
