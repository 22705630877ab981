"""Multi-host runtime skeleton tests (CPU-runnable, single process —
SURVEY §7.7's 1-chip → 1-host → N-host ladder, exercised at the 1-host
rung with the N-host code path driven via fake device grids)."""

import dataclasses

import numpy as np
import pytest

import jax

from rwkv_tpu.parallel import launch


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_initialize_single_process_noop():
    info = launch.initialize()
    assert info.n_processes == 1
    assert info.process_id == 0
    assert not info.is_distributed
    # idempotent
    assert launch.initialize() is info


def test_launch_mesh_axes(eight_devices):
    mesh = launch.launch_mesh(2, 4, verbose=False)
    assert mesh.shape == {"data": 2, "model": 4}
    kinds = launch.describe_axes(mesh)
    # single process: every axis stays within the process
    assert kinds == {"data": "ICI", "model": "ICI"}


def test_launch_mesh_runs_serving(eight_devices):
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    mesh = launch.launch(2, 4)
    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512, head_size=32)
    srv = ServingModel((cfg, synth_params(cfg, seed=0, lora_dim=32)),
                       precision="bf16", mesh=mesh)
    logits, _ = srv.decode(np.array([1, 2], np.int32), srv.init_state(2))
    assert logits.shape == (2, 512)


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int


def test_device_grid_hybrid_layout():
    """4 processes x 4 local devices, mesh (data=4, model=4): model must stay
    within a process (ICI), data must stride across processes (DCN)."""
    devs = [FakeDev(id=p * 4 + i, process_index=p) for p in range(4) for i in range(4)]
    grid = launch._device_grid(4, 4, devs)
    assert grid.shape == (4, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1  # model rides ICI
    col_procs = {grid[r, 0].process_index for r in range(4)}
    assert len(col_procs) == 4  # data crosses processes (DCN)


def test_device_grid_hybrid_mixed_axes():
    """2 processes x 8 local devices, mesh (data=4, model=4): data covers the
    within-process remainder first, then processes."""
    devs = [FakeDev(id=p * 8 + i, process_index=p) for p in range(2) for i in range(8)]
    grid = launch._device_grid(4, 4, devs)
    assert grid.shape == (4, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1
    procs = [grid[r, 0].process_index for r in range(4)]
    assert procs == [0, 0, 1, 1]
