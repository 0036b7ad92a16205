"""Test configuration: pure local CPU with 8 virtual devices, f64 enabled.

Tests verify numerics in double precision on a virtual 8-device CPU mesh
(multi-chip sharding paths compile/execute without real TPU hardware). The
real-TPU path is exercised by bench.py / __graft_entry__.py.

NOTE: this environment's sitecustomize registers a remote TPU PJRT plugin
("axon") in every interpreter and forces ``jax_platforms="axon,cpu"`` via
``jax.config.update`` — which overrides the JAX_PLATFORMS env var. Without
the override below, "CPU" tests silently run on the TPU's emulated float64
(float32-level trig accuracy, ~0.5 s per-op remote compiles, occasional
tunnel deadlocks). ``jax.config.update`` here wins because it runs last.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE on the persistent compilation cache: round 1 enabled
# jax_compilation_cache_dir here to amortize the suite's XLA compiles.
# On this jaxlib, DESERIALIZING a cached XLA:CPU executable that contains
# LAPACK custom calls (the BA solvers' cholesky/solve) segfaults the
# process (jax/_src/compilation_cache.py get_executable_and_time), and
# cross-machine reuse can SIGILL on AVX-feature mismatches. Reproduced
# deterministically with a fresh single-process cache — so the cache stays
# OFF; set VIORB_JAX_CACHE=1 to opt in locally at your own risk.
if os.environ.get("VIORB_JAX_CACHE") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rendered_vi_sequence():
    """The rendered VI sequence shared by the image-level e2e modules
    (test_vi_image_e2e, test_calibration_e2e) — rendered once per session
    instead of once per module (round-3 VERDICT item 7). 600 frames
    (30 s — the reference's MH_01 converges at ~26 s, BASELINE.md): the
    online-calibration convergence monitors need the early noisy
    estimates to AGE OUT of the trailing-10 s window; shorter tests slice
    a prefix."""
    from _fixtures import render_vi_sequence

    return render_vi_sequence(600)
