"""Test config: force CPU JAX with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, per the driver's dryrun methodology), and locate
the reference's committed tiny-model fixtures."""

import os
import sys
from pathlib import Path

# Must be set before jax is imported anywhere. NOTE: this environment ships a
# jaxlib that force-registers the TPU ("axon") platform and overrides the
# JAX_PLATFORMS env var, so we must ALSO override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast-by-default test selection. The interpret-mode Pallas kernel tests and
# the requantized golden-logit matrix dominate suite wall time (>10 min on a
# 4-core box); they are auto-marked `slow` here and excluded by the default
# `-m "not slow"` addopts (pyproject.toml). CI runs the FULL suite with
# `-m ""`; locally use `pytest -m ""` (everything) or `-m slow` (the rest).
# The fast subset keeps every architecture's FP32/FP16 golden gates, the
# committed-file format gates, and one representative of each kernel family.
# ---------------------------------------------------------------------------

_SLOW_PATTERNS = (
    # requantized golden matrix (FP32/FP16 golden cases stay in the default)
    "-to-Q",
    # interpret-mode Pallas megakernel heavies
    "test_megamodel_tiled",
    "test_megamodel_v6_tiled",
    "test_megamodel_v4_tiled",
    "test_megamodel_v5_tiled",
    "test_megamodel_w4a8",
    "test_megamodel_inkernel_head",
    "test_megamodel_synth_multilayer",
    "test_megamodel_batched",
    "test_packed_matches_plain_batched",
    "test_device_loop_packed_megakernel",
    "test_mega_pack_save_load_roundtrip",
    "test_serving_mega_pack_cache",
    # TP megakernels on the virtual mesh
    "test_megakernel_tp.py",
    # multi-device / multi-process integration
    "test_dryrun_multichip_entrypoint",
    "test_multiprocess.py",
    "test_pipeline.py",
    # heavier serving / speculative integration paths
    "test_prefill_buckets_match_single_shot",
    "test_speculative",
    "test_tp_serving_batcher",
    "test_enhanced_readouts",
    "test_chunked_eval_matches_serial",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)

# Golden fixtures: tiny RWKV models + expected logits committed in the
# reference repo's tests/ directory (read-only mount). Overridable for CI
# environments that stage fixtures elsewhere.
FIXTURES_DIR = Path(os.environ.get("RWKV_TPU_FIXTURES", "/root/reference/tests"))

TINY_VERSIONS = ["4v0-660K", "5v1-730K", "5v2-730K", "6v0-3m", "7v0-834K"]


def fixture_path(name: str) -> Path:
    return FIXTURES_DIR / name


def require_fixture(name: str) -> Path:
    p = fixture_path(name)
    if not p.exists():
        pytest.skip(f"fixture {name} not available at {FIXTURES_DIR}")
    return p


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    if not FIXTURES_DIR.exists():
        pytest.skip(f"fixtures dir {FIXTURES_DIR} not available")
    return FIXTURES_DIR
