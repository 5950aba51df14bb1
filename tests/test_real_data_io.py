"""Real-data IO path + CLI main() coverage.

Writes tiny panos/poses in the reference's on-disk layout
(datasets/SUNCG.py:273-312: depth/ rgb/ normal/ semanticLabel/ pose/ dirs
plus a data-list .npy) to a tmp dir, then drives:

  * `PanoPairDataset` -> decoded values round-trip vs what was written
  * `datasets.batched` -> stacked batch pytrees
  * `cli.train_feature.main()` + `cli.train_completion.main()` (one tiny
    epoch each, shrunken models)
  * `cli.evaluate.main()` classical (`gs`) and learned (`ours_nr` with the
    tiny completion checkpoint) branches
  * `eval.baselines.run_classical_eval` via the CLI dispatch

This is the coverage VERDICT round 1 flagged as absent: the reference's
on-disk contract exercised end-to-end through every entry point.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from relativepose_tpu.data import datasets as dsets
from relativepose_tpu.data import synthetic


def write_reference_layout(root, dataset="suncg", n_pairs=2, seed=0):
    """Encode synthetic pairs into the reference's on-disk layout
    (SUNCG.py:273-312) and return the dataList .npy path."""
    base = os.path.join(root, "scene0")
    for sub in ("depth", "rgb", "normal", "semanticLabel", "pose"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    records = []
    frame = 0
    for p in range(n_pairs):
        d_s, d_t, _ = synthetic.make_pair(seed + p, dataset)
        ids = []
        for view in (d_s, d_t):
            fid = f"{frame:06d}"
            cv2.imwrite(os.path.join(base, "depth", f"{fid}.png"),
                        np.round(view["depth"] * 1000).astype(np.uint16))
            cv2.imwrite(os.path.join(base, "rgb", f"{fid}.png"),
                        np.round(view["rgb"] * 255).astype(np.uint8))
            cv2.imwrite(
                os.path.join(base, "normal", f"{fid}.png"),
                np.round((view["norm"] + 1.0) / 2.0 * 255).astype(np.uint8))
            seg = np.zeros((*view["segm"].shape, 3), np.uint8)
            seg[..., 0] = view["segm"].astype(np.uint8)  # SUNCG channel 0
            cv2.imwrite(os.path.join(base, "semanticLabel", f"{fid}.png"),
                        seg)
            np.savetxt(os.path.join(base, "pose", f"{fid}.pose.txt"),
                       view["pose"])
            ids.append(frame)
            frame += 1
        records.append({"base": base, "id_src": ids[0], "id_tgt": ids[1]})
    list_path = os.path.join(root, "list.npy")
    np.save(list_path, {"train": records, "test": records},
            allow_pickle=True)
    return list_path


@pytest.fixture(scope="module")
def layout(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("suncg_layout"))
    return root, write_reference_layout(root)


class TestPanoPairDataset:
    def test_roundtrip_values(self, layout):
        root, list_path = layout
        src = dsets.PanoPairDataset("suncgv3", "test", list_path)
        assert len(src) == 2
        item = src[0]
        d_s, d_t, T_gt = synthetic.make_pair(0, "suncg")
        got = item["data_s"]
        # quantization bounds: depth 1 mm, rgb/norm one 8-bit step
        assert np.max(np.abs(got["depth"] - d_s["depth"])) <= 0.5e-3 + 1e-6
        assert np.max(np.abs(got["rgb"] - d_s["rgb"])) <= 1.0 / 255 + 1e-6
        assert np.max(np.abs(got["norm"] - d_s["norm"])) <= 2.0 / 255 + 1e-6
        assert np.array_equal(got["segm"], d_s["segm"].astype(np.int32))
        np.testing.assert_allclose(got["pose"], d_s["pose"], atol=1e-5)
        np.testing.assert_allclose(item["T_gt"], T_gt, atol=1e-4)

    def test_quaternion_matches_pose(self, layout):
        root, list_path = layout
        src = dsets.PanoPairDataset("suncgv3", "test", list_path)
        item = src[1]
        from relativepose_tpu.core import quaternion as quat
        for i, view in enumerate((item["data_s"], item["data_t"])):
            R = np.asarray(view["pose"][:3, :3])
            q = item["Q"][i, :4]
            R_back = np.asarray(quat.quaternion_to_rot(q))
            np.testing.assert_allclose(R_back, R, atol=1e-4)
            np.testing.assert_allclose(item["Q"][i, 4:], view["pose"][:3, 3],
                                       atol=1e-5)

    def test_entry_split(self, layout):
        root, list_path = layout
        full = dsets.PanoPairDataset("suncgv3", "test", list_path)
        shard0 = dsets.PanoPairDataset("suncgv3", "test", list_path,
                                       entry_split=0)
        shard1 = dsets.PanoPairDataset("suncgv3", "test", list_path,
                                       entry_split=1)
        assert len(shard0) == len(full)  # < 100 pairs -> shard 0 has all
        assert len(shard1) == 0

    def test_batched_shapes(self, layout):
        root, list_path = layout
        src = dsets.PanoPairDataset("suncgv3", "test", list_path)
        batches = list(dsets.batched(src, 2))
        assert len(batches) == 1
        data_s, data_t, T_gt, n_valid = batches[0]
        assert data_s["rgb"].shape == (2, 160, 640, 3)
        assert data_s["depth"].shape == (2, 160, 640)
        assert data_s["norm"].shape == (2, 160, 640, 3)
        assert T_gt.shape == (2, 4, 4)
        assert n_valid == 2

    def test_batched_pads_tail(self, layout):
        """A 3-item source at batch 2 must flush the last pair in a padded
        batch with n_valid=1 (VERDICT r2: tail used to be dropped)."""
        root, list_path = layout
        src = dsets.PanoPairDataset("suncgv3", "test", list_path)

        class Repeat:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return src[i % len(src)]

        batches = list(dsets.batched(Repeat(), 2))
        assert [b[3] for b in batches] == [2, 1]
        # padded row repeats the last real item; shapes stay full
        assert batches[1][0]["rgb"].shape == (2, 160, 640, 3)
        # max_items caps consumption (the reference's maxIter)
        batches = list(dsets.batched(Repeat(), 2, max_items=1))
        assert [b[3] for b in batches] == [1]


TINY = ["--batch_size", "2", "--max_epoch", "1", "--train_duration", "3",
        "--ngf", "8", "--base_width", "8", "--bf16", "0", "--rm",
        "--num_devices", "1"]


@pytest.fixture(scope="module")
def trained_ckpts(layout, tmp_path_factory):
    """Run both train CLI mains on the fixture data; return ckpt dirs."""
    root, list_path = layout
    exp_root = str(tmp_path_factory.mktemp("exps"))
    cwd = os.getcwd()
    os.chdir(exp_root)
    try:
        from relativepose_tpu.cli import train_completion, train_feature
        train_feature.main(["--exp", "io_feat", "--dataList", "suncgv3",
                            "--listPath", list_path,
                            "--featurelearning", "1"] + TINY)
        feat_params = os.path.join(exp_root, "experiments", "exp_io_feat",
                                   "params")
        assert os.path.isdir(feat_params)
        train_completion.main(["--exp", "io_comp", "--dataList", "suncgv3",
                               "--listPath", list_path,
                               "--featurelearning", "1",
                               "--feat_ckpt", feat_params] + TINY)
        comp_params = os.path.join(exp_root, "experiments", "exp_io_comp",
                                   "params")
        assert os.path.isdir(comp_params)
    finally:
        os.chdir(cwd)
    return feat_params, comp_params


@pytest.mark.slow
class TestCLIMains:
    def test_train_clis_produce_checkpoints(self, trained_ckpts):
        feat_params, comp_params = trained_ckpts
        from relativepose_tpu.utils.checkpoint import CheckpointManager
        feat = CheckpointManager(feat_params).restore()
        assert feat is not None and "net_f" in feat["params"]
        comp = CheckpointManager(comp_params).restore()
        assert comp is not None

    def test_feature_cli_resume_advances_epoch(self, layout,
                                                tmp_path_factory):
        """--resume must continue the epoch counter: a resumed run's new
        checkpoint steps sort ABOVE the restored ones, so keep-N cleanup
        retains them (regression: resumed checkpoints were silently
        deleted when epoch numbering restarted at 0)."""
        import numpy as np
        root, list_path = layout
        exp_root = str(tmp_path_factory.mktemp("resume_exps"))
        cwd = os.getcwd()
        os.chdir(exp_root)
        try:
            from relativepose_tpu.cli import train_feature
            from relativepose_tpu.utils.checkpoint import CheckpointManager
            base = [a for a in TINY if a != "--rm"]
            train_feature.main(["--exp", "io_res", "--dataList", "suncgv3",
                                "--listPath", list_path,
                                "--featurelearning", "1", "--rm"] + base)
            params = os.path.join(exp_root, "experiments", "exp_io_res",
                                  "params")
            first = CheckpointManager(params).all_steps()
            assert first, "first run saved no checkpoint"
            resumed = list(base)
            resumed[resumed.index("--max_epoch") + 1] = "2"
            train_feature.main(["--exp", "io_res", "--dataList", "suncgv3",
                                "--listPath", list_path,
                                "--featurelearning", "1", "--resume"]
                               + resumed)
            second = CheckpointManager(params).all_steps()
            assert max(second) > max(first), (first, second)
        finally:
            os.chdir(cwd)

    def test_evaluate_cli_classical_gs(self, layout, tmp_path, monkeypatch):
        root, list_path = layout
        monkeypatch.chdir(tmp_path)
        from relativepose_tpu.cli import evaluate
        runner = evaluate.main(["--dataList", "suncgv3",
                                "--listPath", list_path,
                                "--method", "gs", "--maxIter", "1",
                                "--exp", "io_gs", "--rm"])
        # pair may be skipped at overlap<0.1; either way the result file
        # exists and entries (if any) carry finite errors
        assert os.path.exists(runner.result_path)
        for r in runner.error_stats:
            assert np.isfinite(r["err_ad"]) and np.isfinite(r["err_t"])

    def test_evaluate_cli_ours_with_trained_ckpt(self, layout, trained_ckpts,
                                                 tmp_path, monkeypatch):
        root, list_path = layout
        _, comp_params = trained_ckpts
        monkeypatch.chdir(tmp_path)
        from relativepose_tpu.cli import evaluate
        runner = evaluate.main(
            ["--dataList", "suncgv3", "--listPath", list_path,
             "--method", "ours_nr", "--maxIter", "2", "--batch_pairs", "2",
             "--comp_ckpt", comp_params, "--ngf", "8", "--bf16", "0",
             "--exp", "io_ours", "--rm"])
        assert len(runner.error_stats) == 2
        for r in runner.error_stats:
            assert np.isfinite(r["err_ad"]) and np.isfinite(r["err_t"])


class TestFramelessSyntheticCache:
    """full_frames=False skips the scannet kinect raycast for training
    data; its '_nf' cache files must never satisfy a full request, while
    full files satisfy frameless requests (datasets.py::SyntheticPairs)."""

    def test_frameless_skips_kinect_and_cache_isolation(self, tmp_path):
        from relativepose_tpu.data import datasets as dsets
        cache = str(tmp_path / "cache")
        nf = dsets.SyntheticPairs("scannet", n=1, seed=3, cache_dir=cache,
                                  full_frames=False)
        item = nf[0]
        assert "rgb_full" not in item["data_s"]
        files = os.listdir(cache)
        assert len(files) == 1 and files[0].endswith("_nf.npz")

        full = dsets.SyntheticPairs("scannet", n=1, seed=3, cache_dir=cache,
                                    full_frames=True)
        item_full = full[0]
        assert item_full["data_s"]["rgb_full"].shape == (480, 640, 3)
        # same scene, identical panos
        np.testing.assert_allclose(item["data_s"]["rgb"],
                                   item_full["data_s"]["rgb"])

        # the full file now satisfies a fresh frameless request (no
        # re-render): corrupt scene rendering to prove no render happens
        nf2 = dsets.SyntheticPairs("scannet", n=1, seed=3, cache_dir=cache,
                                   full_frames=False)
        import relativepose_tpu.data.synthetic as synth
        orig = synth.make_pair
        synth.make_pair = None  # would raise if called
        try:
            item2 = nf2[0]
        finally:
            synth.make_pair = orig
        np.testing.assert_allclose(item2["data_s"]["rgb"],
                                   item["data_s"]["rgb"])
