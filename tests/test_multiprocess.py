"""True multi-process execution test: two `jax.distributed` worker
processes form a global (data=2, model=4) mesh over DCN/ICI-analogue axes
and run the TP+DP-sharded serving engine — SURVEY §7.7's N-host rung,
exercised with real process boundaries (Gloo collectives on CPU)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.timeout(600)
def test_two_process_distributed_serving():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["RWKV_TPU_DEMO_PORT"] = "12417"
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_demo.py")],
        capture_output=True, text=True, timeout=570, env=env,
    )
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "MULTIHOST DEMO OK" in out.stdout
