"""viorb_tpu — TPU-native visual-inertial ORB-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hwb0314/VI-ORB-SLAM-ICRA2018 (monocular visual-inertial ORB-SLAM with online
camera-IMU extrinsic calibration, ICRA 2018).

Layer map (mirrors reference SURVEY.md section 1, re-architected TPU-first):

  utils/     L0  Lie-group math (SO3/SE3/Sim3), timers, logging
  ops/       L1-L2  core compute: IMU preintegration scan, ORB pyramid /
             FAST / rBRIEF kernels, Hamming matchers, triangulation, RANSAC
  solver/    L4  batched Gauss-Newton / Levenberg-Marquardt with Schur
             complement over landmarks (replaces g2o)
  map/       L3  map-as-arrays: fixed-capacity keyframe / landmark /
             observation tables (struct-of-arrays pytrees)
  pipeline/  L5-L6  tracking, local mapping, loop closing, VIO init,
             System facade
  parallel/  multi-chip sharding: distributed Schur BA over jax.sharding.Mesh
  io/        dataset readers (EuRoC/TUM), msg synchronization, trajectory IO
  native/    C++ runtime components (dataset decode, inverted index)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 passes for float32 inputs. Geometry math
# (rotation chains, Jacobians, normal equations) needs true float32: on a
# TPU v5e the default costs ~15x accuracy on preintegration with zero
# latency benefit for the tiny (3x3 .. 128x128) matrices involved.
# Throughput kernels (descriptor matching, FAST conv) request lower
# precision explicitly at their call sites.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import (  # noqa: E402
    SystemConfig,
    build_system,
    config_from_yaml,
)
from .system import MONO_VI, MONOCULAR, RGBD, STEREO, System  # noqa: E402

__all__ = [
    "System",
    "SystemConfig",
    "config_from_yaml",
    "build_system",
    "MONOCULAR",
    "STEREO",
    "RGBD",
    "MONO_VI",
]
