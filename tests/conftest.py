"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference framework's tests require a CUDA GPU (BasicSR/tests/README.md:3)
and its distributed path was never testable without a cluster. Here every
test runs on CPU with 8 virtual devices so sharding/collective code is
exercised deterministically on any machine.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the shell targets a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS in the environment; override at the config level.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (round 4): the CPU backend writes reusable cache
# entries (verified by the dryrun, PERF.md r3), and the heavy tier cost is
# dominated by recompiling the same train-step/pipeline programs every run.
# Warm re-runs load them instead. Keyed on HLO+flags, so code changes that
# alter a program miss the cache naturally. Dir is gitignored.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# ---------------------------------------------------------------------------
# Test tiers (round 3): the golden reference-parity tests import and RUN the
# actual /root/reference torch code — thorough but slow (the full suite is
# ~1.6 h on this 1-core host). Default runs skip them so the routine tier
# stays fast enough to run on every change; `--golden` (or OGI_TEST_ALL=1)
# runs everything. CLAUDE.md documents both tiers.

import pytest

GOLDEN_FILES = (
    "test_reference_parity",   # every test_reference_parity*.py module
    "test_lpips_oracle",       # torch LPIPS oracle
    "test_converter",          # torch state_dict converters
)
SLOW_FILES = (
    "test_train_model",        # multi-phase train steps at several configs
    "test_pipeline",           # end-to-end train/resume/val pipelines
)


def pytest_addoption(parser):
    parser.addoption("--golden", action="store_true", default=False,
                     help="also run the golden reference-parity tier "
                          "(runs the actual torch reference; slow)")
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run the slow end-to-end tier")


# Individual tests whose COMPILE time dominates the default tier on this
# 1-core host (r4 --durations: each is minutes even cache-warm because any
# code change invalidates their big programs). They join the slow tier;
# coverage-wise each has a cheaper sibling that stays default (e.g. the
# data-parallel + reg-family mesh tests stay, the 8-device scaling sanity
# and the 2-D hybrid mesh variant move).
HEAVY_TESTS = (
    "test_scaling_sanity_full_8_device_mesh",
    "test_hybrid_dp_sp_train_step_matches_single",
    "test_sharded_save_resume_roundtrip",
    "test_load_pretrained_npz_roundtrip",
    "test_invert_spatial_default_mesh_does_not_retrace",
    "test_arch_jit_gradient_flows_to_samm_only_targets",
    "test_inception_v3_fid_arch",
)


def pytest_collection_modifyitems(config, items):
    run_all = (config.getoption("--golden") and config.getoption("--slow")) \
        or os.environ.get("OGI_TEST_ALL") == "1"
    if run_all:
        return
    skip_golden = pytest.mark.skip(
        reason="golden tier: pass --golden (or OGI_TEST_ALL=1)")
    skip_slow = pytest.mark.skip(
        reason="slow tier: pass --slow (or OGI_TEST_ALL=1)")
    for item in items:
        fname = item.fspath.basename
        if any(fname.startswith(g) for g in GOLDEN_FILES):
            item.add_marker(pytest.mark.golden)
            if not config.getoption("--golden"):
                item.add_marker(skip_golden)
        elif any(fname.startswith(s) for s in SLOW_FILES) \
                or any(item.name.startswith(h) for h in HEAVY_TESTS):
            item.add_marker(pytest.mark.slow)
            if not config.getoption("--slow"):
                item.add_marker(skip_slow)
