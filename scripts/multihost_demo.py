"""Two-process `jax.distributed` demo on CPU: the N-host rung of SURVEY
§7.7's 1-chip -> 1-host -> N-host ladder, runnable without a pod.

Parent mode spawns two worker processes; each worker:
  1. initializes the distributed runtime (coordinator rendezvous),
  2. builds the global (data=2, model=4) mesh via parallel.launch —
     `data` spans the two processes (DCN-analogue), `model` stays within
     each process's 4 virtual CPU devices (ICI-analogue),
  3. runs a TP+DP-sharded ServingModel decode step,
  4. process 0 prints a logits checksum, compared against a single-process
     run of the same model.

Run:  python scripts/multihost_demo.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("RWKV_TPU_DEMO_PORT", "12355"))


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rwkv_tpu.parallel import launch

    info = launch.initialize(
        coordinator_address=f"localhost:{PORT}", num_processes=2, process_id=pid
    )
    assert info.n_processes == 2, info
    mesh = launch.launch_mesh(2, 4)
    kinds = launch.describe_axes(mesh)
    if pid == 0:
        print(f"worker0: {len(jax.devices())} global devices over "
              f"{info.n_processes} processes; axes {kinds}", flush=True)
    assert kinds == {"data": "DCN", "model": "ICI"}, kinds

    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512, head_size=32)
    srv = ServingModel((cfg, synth_params(cfg, seed=0, lora_dim=32)),
                       precision="f32", mesh=mesh)
    state = srv.init_state(2)
    logits, state = srv.decode(np.array([3, 4], np.int32), state)
    # the logits span both processes' devices: gather before materializing
    from jax.experimental import multihost_utils

    logits_full = multihost_utils.process_allgather(logits, tiled=True)
    checksum = float(np.sum(np.asarray(logits_full)))
    if pid == 0:
        print(f"worker0: distributed logits checksum {checksum:.6f}", flush=True)
        # single-process reference value for comparison
        ref = ServingModel((cfg, synth_params(cfg, seed=0, lora_dim=32)),
                           precision="f32")
        ref_logits, _ = ref.decode(np.array([3, 4], np.int32), ref.init_state(2))
        ref_sum = float(np.sum(np.asarray(ref_logits)))
        print(f"worker0: single-process checksum   {ref_sum:.6f}", flush=True)
        assert abs(checksum - ref_sum) < 1e-2 * max(abs(ref_sum), 1.0)
        print("MULTIHOST DEMO OK", flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return 0
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL,
        )
        for pid in range(2)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        print(f"worker exit codes: {codes}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
