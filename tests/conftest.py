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
