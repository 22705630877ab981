"""Multi-host runtime: process initialization and global mesh construction.

The reference is a single-process library (SURVEY §2.7: no NCCL/MPI — its
only cross-device transport is ggml's in-process backend scheduler,
rwkv_eval.inc:45-66). The TPU-native scale-out story is:

- `jax.distributed.initialize` to form the multi-process runtime (one
  process per host; controller-less, rendezvous via the coordinator).
- ONE global (data, model) mesh spanning every process's local devices.
  `model` (tensor-parallel: per-layer all-reduces every step) is laid out
  over ICI within a slice; `data` (batch-parallel: no per-step collectives
  beyond what the caller introduces) spans slices/hosts over DCN.
- The same GSPMD-sharded jit used single-host (models/serve.py) then runs
  unchanged: under SPMD every process executes the same traced program on
  its addressable shard, and XLA routes collectives over ICI/DCN.

Environment-driven launch (TPU pods set these automatically; explicit args
are for CPU tests and bring-up):

    import rwkv_tpu.parallel.launch as launch
    launch.initialize()                      # no-op single-process
    mesh = launch.launch_mesh(dp=2, tp=4)    # global mesh
    srv = ServingModel(path, precision="w8a8", mesh=mesh)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


@dataclasses.dataclass
class RuntimeInfo:
    """What the distributed runtime looks like after initialize()."""

    n_processes: int
    process_id: int
    n_devices_global: int
    n_devices_local: int

    @property
    def is_distributed(self) -> bool:
        return self.n_processes > 1


_initialized: Optional[RuntimeInfo] = None


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> RuntimeInfo:
    """Form (or introspect) the multi-process JAX runtime.

    With no arguments on a TPU pod, `jax.distributed.initialize` picks up
    the cluster env (TPU_WORKER_HOSTNAMES etc.). With explicit arguments it
    rendezvouses at `coordinator_address`. Single-process (the default
    everywhere else) skips the rendezvous entirely and is a no-op, so
    library code can call this unconditionally.
    """
    global _initialized
    if _initialized is not None:
        return _initialized
    want_multi = (
        coordinator_address is not None
        or (num_processes is not None and num_processes > 1)
    )
    if want_multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = RuntimeInfo(
        n_processes=jax.process_count(),
        process_id=jax.process_index(),
        n_devices_global=len(jax.devices()),
        n_devices_local=len(jax.local_devices()),
    )
    return _initialized


def _device_grid(dp: int, tp: int, devices: Sequence[jax.Device]) -> np.ndarray:
    """[dp, tp] device array with `tp` contiguous within a process (ICI) and
    `dp` striding across processes (DCN) whenever the shapes allow it."""
    devices = list(devices)
    n_proc = max(len({d.process_index for d in devices}), 1)
    per_proc = len(devices) // n_proc
    if n_proc > 1 and per_proc % tp == 0 and dp % n_proc == 0:
        # Hybrid layout: model stays inside each process's devices (ICI);
        # data first covers the within-process remainder, then processes.
        by_proc = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        rows = []
        for pid in sorted(by_proc):
            local = sorted(by_proc[pid], key=lambda d: d.id)
            for r in range(per_proc // tp):
                rows.append(local[r * tp : (r + 1) * tp])
        return np.asarray(rows[: dp])
    return np.asarray(devices[: dp * tp]).reshape(dp, tp)


def launch_mesh(
    dp: int, tp: int, devices: Optional[Sequence[jax.Device]] = None,
    verbose: bool = True,
) -> Mesh:
    """Build the global (data, model) mesh over all processes' devices.

    `model` is placed over devices local to a process (all-reduces ride
    ICI); `data` spans processes (DCN) — the axis order a recurrent decode
    wants, since TP collectives fire per layer per step while DP needs no
    per-step communication.
    """
    if devices is None:
        devices = jax.devices()
    need = dp * tp
    if len(devices) < need:
        raise ValueError(
            f"mesh (data={dp}, model={tp}) needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = _device_grid(dp, tp, devices)
    mesh = Mesh(grid, axis_names=("data", "model"))
    if verbose and jax.process_index() == 0:
        kinds = describe_axes(mesh)
        print(
            f"[rwkv_tpu.launch] mesh data={dp} ({kinds['data']}) x "
            f"model={tp} ({kinds['model']}), "
            f"{jax.process_count()} process(es)"
        )
    return mesh


def describe_axes(mesh: Mesh) -> dict:
    """Which interconnect each mesh axis rides: 'ICI' if every step along
    the axis stays within one process, 'DCN' if it crosses processes,
    'local' for size-1 axes."""
    grid = mesh.devices
    out = {}
    for ax, name in enumerate(mesh.axis_names):
        if grid.shape[ax] == 1:
            out[name] = "local"
            continue
        moved = np.moveaxis(grid, ax, 0)
        procs = np.vectorize(lambda d: d.process_index)(moved)
        crosses = (procs != procs[0:1]).any()
        out[name] = "DCN" if crosses else "ICI"
    return out


def launch(dp: int, tp: int, **init_kwargs) -> Mesh:
    """initialize() + launch_mesh() in one call (the documented entry)."""
    initialize(**init_kwargs)
    return launch_mesh(dp, tp)
