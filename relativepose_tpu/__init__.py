"""relativepose_tpu — TPU-native extreme relative pose estimation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
zhenpeiyang/RelativePose ("Extreme Relative Pose Estimation for RGB-D Scans
via Scene Completion", CVPR 2019).  Given two RGB-D indoor scans with little
or no overlap, each represented as a 4-face skybox panorama (160x640), the
pipeline hallucinates the unobserved 360deg content with a scene-completion
U-Net (SCNet), matches learned descriptors at detected keypoints, and solves
for the relative rigid pose with a spectral / IRLS geometric-matching solver,
alternating completion and matching over several recurrence levels.

Unlike the reference (single-GPU PyTorch; warp/match/solve on host CPU), the
entire recurrent complete<->match<->solve loop here is batched, fixed-shape
XLA computation that runs on TPU, with `jax.sharding` data parallelism over
a device mesh for training and evaluation.

Subpackages
-----------
core      geometry: skybox camera model, warps, masking, Horn'87, quaternions
ops       numeric primitives: batched 4x4 eigensolver, top-k NMS, bilinear
          sampling, power iteration (+ Pallas kernels for hot paths)
match     keypoint detection, descriptor affinity, pairwise-consistency
          pose solver (irls+sm / spectral / irls / horn87)
models    Flax modules: Resnet18_8s feature net, SCNet completion U-Net
pipeline  the recurrent completion<->pose loop, fully on device
data      dataset adapters (SUNCG/Matterport3D/ScanNet) + synthetic scenes,
          device-side dense-correspondence and reprojection augmentation
train     training drivers (feature learning, pano completion), optax/orbax
tune      sigma-hyperparameter finite-difference trainer
eval      evaluation harness (methods ours/ours_nr/ours_nc + baselines)
utils     logging, meters, callbacks, experiment dirs, profiling
"""

__version__ = "0.1.0"


def enable_compile_cache() -> None:
    """Turn on the persistent XLA compilation cache for this process.

    The full 3-step pipeline graph costs minutes to compile over the axon
    tunnel; caching it on disk makes every process after the first (eval
    rows, benches, tools) start in seconds.  Called by the CLI entry
    points, bench.py, and the tools — NOT at package import, so library
    and test consumers keep their own cache policy (a bare
    `import relativepose_tpu` has no global side effects).  Opt out with
    RPTPU_NO_COMPILE_CACHE=1.
    """
    import os

    import jax

    if os.environ.get("RPTPU_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rptpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass


from relativepose_tpu import config  # noqa: E402,F401
