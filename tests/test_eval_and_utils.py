import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu.eval import harness
from relativepose_tpu.tune import sigma as sigma_tune
from relativepose_tpu.utils.checkpoint import CheckpointManager
from relativepose_tpu.utils.experiment import ExperimentDirs
from relativepose_tpu.utils.log import AverageMeter
from relativepose_tpu.utils.trainer import Trainer


class TestEvalHarness:
    def test_bucket_assignment(self):
        assert harness.bucket_of(0.05) == "0-0.1"
        assert harness.bucket_of(0.1) == "0-0.1"
        assert harness.bucket_of(0.3) == "0.1-0.5"
        assert harness.bucket_of(0.9) == "0.5-1.0"

    def test_pose_errors_identity(self):
        T = jnp.eye(4)
        pc = jnp.asarray(np.random.RandomState(0).randn(100, 3), jnp.float32)
        valid = jnp.ones(100, bool)
        errs = harness.pose_errors(T, T, pc, valid)
        assert float(errs["err_ad"]) < 1e-3
        assert float(errs["err_t"]) < 1e-6

    def test_pose_errors_translation_formula(self):
        """err_t must follow evaluation.py:296:
        ||(R_hat - R_gt) @ mean(pc) + t_hat - t_gt||."""
        rng = np.random.RandomState(1)
        from scipy.spatial.transform import Rotation as SR
        R_hat = SR.random(random_state=rng).as_matrix().astype(np.float32)
        R_gt = SR.random(random_state=rng).as_matrix().astype(np.float32)
        t_hat = rng.randn(3).astype(np.float32)
        t_gt = rng.randn(3).astype(np.float32)
        pc = rng.randn(50, 3).astype(np.float32)
        T_hat = np.eye(4, dtype=np.float32)
        T_hat[:3, :3], T_hat[:3, 3] = R_hat, t_hat
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3], T_gt[:3, 3] = R_gt, t_gt
        errs = harness.pose_errors(jnp.asarray(T_hat), jnp.asarray(T_gt),
                                   jnp.asarray(pc), jnp.ones(50, bool))
        expect = np.linalg.norm((R_hat - R_gt) @ pc.mean(0) + t_hat - t_gt)
        assert float(errs["err_t"]) == pytest.approx(expect, rel=1e-4)

    def test_runner_resume_by_count(self, tmp_path):
        cfg = harness.EvalConfig(exp="t", out_dir=str(tmp_path),
                                 save_every=2)
        r = harness.EvalRunner(cfg)
        for i in range(4):
            r.record({"overlap": 0.3, "err_ad": 1.0, "err_t": 0.1})
        r.save()
        r2 = harness.EvalRunner(cfg)
        assert len(r2.error_stats) == 4
        assert r2.n_done == 4
        # prior results replay into the bucket statistics
        assert len(r2.ad_stats["0.1-0.5"]) == 4

    def _stub_eval(self, calls):
        def eval_fn(data_s, data_t, T_gt, keys):
            calls.append(int(T_gt.shape[0]))
            n = T_gt.shape[0]
            return {"overlap": jnp.full((n,), 0.3),
                    "err_ad": jnp.full((n,), 1.0),
                    "err_t": jnp.full((n,), 0.1)}
        return eval_fn

    def _batches(self, n_pairs, batch):
        out = []
        for s in range(0, n_pairs, batch):
            n = min(batch, n_pairs - s)
            T = jnp.tile(jnp.eye(4), (n, 1, 1))
            out.append(({"i": jnp.arange(s, s + n)},
                        {"i": jnp.arange(s, s + n)}, T))
        return out

    def test_evaluate_stream_repeats_accumulate(self, tmp_path):
        """num_repeat passes append to ONE result file
        (evaluation.py:156-158); resume skips completed iterations."""
        calls = []
        cfg = harness.EvalConfig(exp="rep", out_dir=str(tmp_path),
                                 num_repeat=2, save_every=100)
        runner = harness.evaluate_stream(
            lambda: self._batches(6, 2), self._stub_eval(calls), cfg)
        assert len(runner.error_stats) == 12
        assert [r["repeat"] for r in runner.error_stats] == [0] * 6 + [1] * 6
        assert len(calls) == 6  # 3 batches x 2 repeats

        # a fresh run over the same exp resumes and evaluates nothing new
        calls2 = []
        r2 = harness.evaluate_stream(
            lambda: self._batches(6, 2), self._stub_eval(calls2), cfg)
        assert len(r2.error_stats) == 12
        assert calls2 == []

    def test_evaluate_stream_resume_mid_run(self, tmp_path):
        """Kill-and-resume completes with exactly num_repeat*n entries,
        re-evaluating only the partial batch + remainder."""
        cfg = harness.EvalConfig(exp="res", out_dir=str(tmp_path),
                                 num_repeat=2, save_every=100)
        # simulate a killed run: 3 of 12 results already on disk
        pre = harness.EvalRunner(cfg)
        for i in range(3):
            pre.record({"overlap": 0.3, "err_ad": 1.0, "err_t": 0.1,
                        "repeat": 0})
        pre.save()

        calls = []
        runner = harness.evaluate_stream(
            lambda: self._batches(6, 2), self._stub_eval(calls), cfg)
        assert len(runner.error_stats) == 12
        # batch 0 (pairs 0-1) skipped entirely; batch 1 re-run for its
        # second half; everything after runs: 2 + 2x3 = 5 batches
        assert len(calls) == 5

    def test_evaluate_stream_max_iter_and_padded_tail(self, tmp_path):
        """--maxIter 6 with batch 4 over a 10-pair source evaluates
        EXACTLY 6 pairs per repeat (evaluation.py:156-158), and a padded
        tail batch (n_valid < batch) records only its real rows."""
        calls = []
        cfg = harness.EvalConfig(exp="cap", out_dir=str(tmp_path),
                                 max_iter=6, num_repeat=1, save_every=100)

        def batches():
            out = []
            for s in range(0, 10, 4):
                n = min(4, 10 - s)
                T = jnp.tile(jnp.eye(4), (4, 1, 1))  # padded to batch 4
                out.append(({"i": jnp.arange(4)}, {"i": jnp.arange(4)},
                            T, n))
            return out

        runner = harness.evaluate_stream(
            lambda: batches(), self._stub_eval(calls), cfg)
        assert len(runner.error_stats) == 6
        assert len(calls) == 2  # batch 3 never runs
        # compile time reported separately; steady-state speed excludes it
        assert runner.compile_s is not None
        assert len(runner.speed) == 2  # only the second batch's rows

        # padded tail: an est of 5 pairs at batch 4 -> 4 + 1 recorded
        calls2 = []
        cfg2 = harness.EvalConfig(exp="tail", out_dir=str(tmp_path),
                                  max_iter=1000, save_every=100)

        def batches2():
            T = jnp.tile(jnp.eye(4), (4, 1, 1))
            return [({"i": jnp.arange(4)}, {"i": jnp.arange(4)}, T, 4),
                    ({"i": jnp.arange(4)}, {"i": jnp.arange(4)}, T, 1)]

        r2 = harness.evaluate_stream(
            lambda: batches2(), self._stub_eval(calls2), cfg2)
        assert len(r2.error_stats) == 5

    def test_parse_eval_data_scannet_method_branch(self):
        """scannet + classical method consumes the ORIGINAL 480x640 frame
        (util.py:80-92, evaluation.py:165-166); 'ours' uses the kinect
        crop."""
        rng = np.random.RandomState(0)
        depth = jnp.asarray(rng.rand(160, 640).astype(np.float32) + 0.5)
        rgb = jnp.asarray(rng.rand(160, 640, 3).astype(np.float32))
        norm = jnp.asarray(rng.rand(160, 640, 3).astype(np.float32))
        depth_full = jnp.asarray(
            rng.rand(480, 640).astype(np.float32) + 0.5)
        rgb_full = jnp.asarray(rng.rand(480, 640, 3).astype(np.float32))

        pc_ours, val_ours, _ = harness.parse_eval_data(
            depth, rgb, norm, "scannet", "ours",
            depth_full=depth_full, rgb_full=rgb_full)
        assert pc_ours.shape[0] == 66 * 88

        pc_gs, val_gs, col_gs = harness.parse_eval_data(
            depth, rgb, norm, "scannet", "gs",
            depth_full=depth_full, rgb_full=rgb_full)
        assert pc_gs.shape[0] == 480 * 640
        assert col_gs.shape == (480 * 640, 3)
        # full-frame lift uses the kinect intrinsics fudge factors
        # (util.py:508-509)
        from relativepose_tpu import config as rcfg
        pc_np = np.asarray(pc_gs).reshape(480, 640, 3)
        d_np = np.asarray(depth_full)
        x_expect = ((320 / 640 - 0.5) * 2) * d_np[0, 320] / rcfg.KINECT_FX_DIV
        assert pc_np[0, 320, 0] == pytest.approx(x_expect, rel=1e-5)

        # without full tensors, classical falls back to the crop
        pc_fb, _, _ = harness.parse_eval_data(
            depth, rgb, norm, "scannet", "gs")
        assert pc_fb.shape[0] == 66 * 88

    def test_default_sigma_tables_ship(self):
        for ds in ("suncg", "matterport", "scannet"):
            t = harness.default_sigma_table(ds)
            assert t.shape == (3, 4)
            assert (t > 0).all()

    def test_sigma_tables_match_reference_values(self):
        # data/relativePoseModule/final_param_suncg_rlevel_3.txt row 0
        t = harness.default_sigma_table("suncg")
        np.testing.assert_allclose(
            t[0], [1.2974606, 0.31758944, 0.03550027, 0.00872483],
            rtol=1e-5)


class TestSigmaTuner:
    def _toy_primitives(self, rng, n_pairs=4, k=16):
        from tests.test_match_solver import make_scene, to_device_data
        prims, rgts = [], []
        for i in range(n_pairs):
            ds, dt, T = make_scene(rng, k=k, noise=0.003)
            prims.append((to_device_data(ds), to_device_data(dt)))
            rgts.append(T[:3, :3])
        return prims, np.stack(rgts).astype(np.float32)

    def test_objective_finite_and_sensitive(self, rng):
        from relativepose_tpu.match.solver import SolverStaticConfig
        prims, rgts = self._toy_primitives(rng)
        ps, pt = sigma_tune.stack_primitives(prims)
        obj = sigma_tune.make_objective(
            ps, pt, jnp.asarray(rgts),
            SolverStaticConfig(top_k=3, power_iters=10))
        v1 = float(obj(jnp.asarray([0.2615, 0.2615, 0.04, 0.01])))
        v2 = float(obj(jnp.asarray([0.5, 0.5, 0.1, 0.05])))
        assert np.isfinite(v1) and np.isfinite(v2)
        assert v1 != v2

    def test_fd_optimize_improves_quadratic(self):
        target = np.array([0.3, 0.2, 0.05, 0.02])

        def obj(s):
            return float(np.sum((np.asarray(s) - target) ** 2))

        sig, hist = sigma_tune.fd_optimize(
            obj, [0.5, 0.5, 0.1, 0.05],
            sigma_tune.FDConfig(max_iter=15), log_fn=lambda m: None)
        assert hist[-1][0] < hist[0][0] * 0.5

    def test_grad_optimize_improves_quadratic(self):
        target = jnp.asarray([0.3, 0.2, 0.05, 0.02])
        obj = lambda s: jnp.sum((s - target) ** 2)
        sig, hist = sigma_tune.grad_optimize(
            obj, [0.5, 0.5, 0.1, 0.05], steps=120, lr=0.05,
            log_fn=lambda m: None)
        assert float(obj(jnp.asarray(sig))) < 0.25 * float(
            obj(jnp.asarray([0.5, 0.5, 0.1, 0.05])))
        assert (sig > 0).all()

    def test_tune_per_level_validation_gate(self, rng):
        """A tuned row that does not beat sigma0 on the held-out pairs
        must be rejected (VERDICT r3 #6: round 3 shipped a table that
        degraded held-out results)."""
        from relativepose_tpu.match.solver import SolverStaticConfig
        prims, rgts = self._toy_primitives(rng, n_pairs=8)
        # grad tuning on a noiseless synthetic scene barely moves the
        # objective; the gate should either accept an improvement or
        # fall back to sigma0 — never ship a worse row.
        table = sigma_tune.tune_per_level(
            [prims], rgts, method="grad", val_frac=0.25, grad_steps=8,
            cfg=SolverStaticConfig(top_k=3, power_iters=10))
        assert table.shape == (1, 4)
        ps, pt = sigma_tune.stack_primitives(prims[-2:])
        val_obj = sigma_tune.make_objective(
            ps, pt, jnp.asarray(rgts[-2:]),
            SolverStaticConfig(top_k=3, power_iters=10))
        default = float(val_obj(jnp.asarray([0.2615, 0.2615, 0.04, 0.01])))
        tuned = float(val_obj(jnp.asarray(table[0], jnp.float32)))
        assert tuned <= default + 1e-6


class TestSiftDescriptor:
    def test_sift_ranking_ratio_identity(self, rng):
        """Same image + identity correspondences: the true match's SIFT
        distance is 0, so (almost) no grid location ranks closer
        (mainFeatureLearning.py:293-321 semantics)."""
        from relativepose_tpu.data import synthetic
        from relativepose_tpu.eval.descriptor_eval import sift_ranking_ratio

        ds, _, _ = synthetic.make_pair(2, "suncg")
        rgb = ds["rgb"][None]  # [1, H, W, 3]
        k = 64
        xs = rng.randint(5, rgb.shape[2] - 5, k)
        ys = rng.randint(5, rgb.shape[1] - 5, k)
        idx = np.stack([xs, ys], -1)[None].astype(np.float32)
        ratios = sift_ranking_ratio(rgb, rgb, idx, idx, np.ones(1),
                                    sample=32)
        assert len(ratios) == 1
        assert 0.0 <= ratios[0] < 0.02

    def test_sift_ranking_ratio_skips_invalid(self):
        from relativepose_tpu.eval.descriptor_eval import sift_ranking_ratio
        rgb = np.zeros((1, 32, 32, 3), np.float32)
        idx = np.zeros((1, 4, 2), np.float32)
        assert sift_ranking_ratio(rgb, rgb, idx, idx, np.zeros(1)) == []


class TestCheckpoint:
    def test_save_restore_keep3(self, tmp_path):
        cm = CheckpointManager(str(tmp_path), keep=3)
        state = {"params": {"w": np.arange(6.0).reshape(2, 3)}, "step": 0}
        for s in range(5):
            state["step"] = s
            cm.save(s, state)
        assert cm.all_steps() == [2, 3, 4]
        loaded = cm.restore()
        assert int(loaded["step"]) == 4
        np.testing.assert_allclose(loaded["params"]["w"],
                                   state["params"]["w"])

    def test_npz_weight_artifact_roundtrip(self, tmp_path):
        from relativepose_tpu.utils.checkpoint import (
            load_params_npz,
            restore_params,
            save_params_npz,
        )
        params = {"conv": {"kernel": np.random.randn(3, 3, 4, 8)
                           .astype(np.float32),
                           "bias": np.zeros(8, np.float32)},
                  "bn": {"scale": np.ones(8, np.float32)}}
        path = str(tmp_path / "w.npz")
        save_params_npz(path, params)
        back = load_params_npz(path)
        assert set(back) == {"conv", "bn"}
        np.testing.assert_allclose(back["conv"]["kernel"],
                                   params["conv"]["kernel"], atol=1e-3)
        assert back["conv"]["kernel"].dtype == np.float32  # upcast on load
        st = restore_params(path)
        assert "params" in st and "conv" in st["params"]

    def test_partial_restore(self, tmp_path):
        cm = CheckpointManager(str(tmp_path))
        cm.save(0, {"a": np.ones(3), "b": np.zeros(2)})
        template = {"a": np.zeros(3), "c": np.full(4, 7.0)}
        merged, ok = cm.restore_into(template)
        assert ok
        np.testing.assert_allclose(merged["a"], np.ones(3))
        np.testing.assert_allclose(merged["c"], np.full(4, 7.0))


    def test_restore_into_optax_state(self, tmp_path):
        """Regression: real optimizer states hold (named)tuples of arrays
        with inhomogeneous shapes — restore_into must recurse into them
        instead of calling np.shape on the container (the completion
        trainer's --resume crashed on this)."""
        import collections
        import jax.numpy as jnp
        Adam = collections.namedtuple("Adam", ["count", "mu"])
        cm = CheckpointManager(str(tmp_path))
        state = {"params": {"w": np.ones((2, 3))},
                 "opt": (Adam(np.zeros(()), {"w": np.ones((2, 3))}),
                         (np.arange(4.0), np.ones((5, 1))))}
        cm.save(0, state)
        template = {"params": {"w": np.zeros((2, 3))},
                    "opt": (Adam(np.full((), 9.0), {"w": np.zeros((2, 3))}),
                            (np.zeros(4), np.zeros((5, 1))))}
        merged, ok = cm.restore_into(template)
        assert ok
        np.testing.assert_allclose(merged["params"]["w"], 1.0)
        assert type(merged["opt"][0]).__name__ == "Adam"
        np.testing.assert_allclose(np.asarray(merged["opt"][0].count), 0.0)
        np.testing.assert_allclose(merged["opt"][1][0], np.arange(4.0))

    def test_restore_into_without_checkpoint(self, tmp_path):
        cm = CheckpointManager(str(tmp_path))
        tpl = {"x": np.ones(2)}
        out, ok = cm.restore_into(tpl)
        assert not ok and out is tpl


class TestExperimentDirs:
    def test_create_and_rm_semantics(self, tmp_path):
        root = str(tmp_path)
        d = ExperimentDirs("foo", root=root)
        assert os.path.isdir(d.samples_dir)
        assert os.path.isdir(d.params_dir)
        # a params file makes re-creation without rm/resume an error
        open(os.path.join(d.params_dir, "checkpoint_0001"), "w").close()
        with pytest.raises(FileExistsError):
            ExperimentDirs("foo", root=root)
        ExperimentDirs("foo", root=root, resume=True)
        ExperimentDirs("foo", root=root, rm=True)
        with pytest.raises(FileNotFoundError):
            ExperimentDirs("nope", root=root, resume=True)

    def test_latest_checkpoint(self, tmp_path):
        d = ExperimentDirs("bar", root=str(tmp_path))
        assert d.latest_checkpoint() is None
        for i in (1, 3, 2):
            open(os.path.join(d.params_dir, f"checkpoint_{i:04d}"),
                 "w").close()
        assert d.latest_checkpoint().endswith("checkpoint_0003")


class TestTrainer:
    def test_time_boxed_phases_and_callbacks(self):
        calls = []

        def step_fn(batch, mode):
            calls.append((batch, mode))
            return {"loss": 1.0}

        from relativepose_tpu.utils.callbacks import (
            CallbackLoc,
            PeriodicCallback,
        )
        seen_epochs = []
        cb = PeriodicCallback(CallbackLoc.epoch_end, 1,
                              lambda ctx: seen_epochs.append(ctx["epoch"]))
        tr = Trainer(step_fn=step_fn, train_loader=[1, 2, 3],
                     val_loader=[4], max_epoch=2, train_duration=0.2,
                     train_test_ratio=5, callbacks=[cb])
        tr.run()
        assert seen_epochs == [1, 2]
        modes = {m for _, m in calls}
        assert modes == {"train", "val"}

    def test_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0


class TestAlterStepOverride:
    """--alterStep (evaluation.py:56,73): explicit recurrence depth."""

    def test_default_by_method(self):
        assert harness.EvalConfig(dataset="suncg",
                                  method="ours").alter_steps == 3
        assert harness.EvalConfig(dataset="suncg",
                                  method="ours_nr").alter_steps == 1

    def test_override_wins(self):
        cfg = harness.EvalConfig(dataset="suncg", method="ours",
                                 alter_steps_override=2)
        assert cfg.alter_steps == 2
        # a 3-row sigma table still validates against the shallower depth
        hp = harness.hyper_params_from_table(
            np.tile([0.26, 0.26, 0.04, 0.01], (3, 1)), alter_steps=2)
        assert hp.sigma_dist.shape == (3,)
        with pytest.raises(ValueError):
            harness.hyper_params_from_table(
                np.tile([0.26, 0.26, 0.04, 0.01], (1, 1)), alter_steps=2)
