"""Full golden-logit parity sweep vs the reference's expected tables.

Runs every tiny model x format on CPU, printing ours vs the reference's
hard-coded expected diff sums (test_tiny_rwkv.c:38-134).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from rwkv_tpu.models.model import RWKVModel

TESTS = "/root/reference/tests"

EXPECTED_FULL = {
    ("4v0-660K", "FP32"): 0.001, ("4v0-660K", "FP16"): -0.013652,
    ("5v1-730K", "FP32"): 0.001, ("5v1-730K", "FP16"): -0.289921,
    ("5v2-730K", "FP32"): 0.001, ("5v2-730K", "FP16"): +0.455912,
    ("6v0-3m", "FP32"): 0.001, ("6v0-3m", "FP16"): -0.416620,
    ("7v0-834K", "FP32"): 0.001, ("7v0-834K", "FP16"): +0.005766,
}

EXPECTED_Q_FP32 = {
    "4v0-660K": [-0.160030, -0.547409, -0.170404, +0.278034, +0.076282],
    "5v1-730K": [+117.932594, -26.712271, -163.439407, -18.017435, +0.585238],
    "5v2-730K": [+35.271305, +67.015076, +25.273308, +48.068733, -9.441034],
    "6v0-3m": [-7.588121, +21.939022, -27.332073, +3.576909, -9.539596],
    "7v0-834K": [+0.136785, +0.002614, -0.063645, -0.064663, +0.011924],
}
EXPECTED_Q_FP16 = {
    "4v0-660K": [+0.154614, -0.539827, -0.180142, +0.294953, +0.077226],
    "5v1-730K": [+119.471931, -28.245888, -159.870956, -39.708530, -0.962695],
    "5v2-730K": [+34.135971, +65.573822, +21.588751, +29.726818, -7.242277],
    "6v0-3m": [-7.660988, +21.797060, -27.269241, +3.405264, -9.734720],
    "7v0-834K": [+0.136678, -0.005140, -0.064447, -0.063531, +0.010921],
}
QFMT = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0"]


def run(path, expected_logits):
    m = RWKVModel(path)
    state = m.init_state()
    for tok in b'"in':
        logits, state = m.eval(tok, state)
    serial = np.float32(np.sum(np.asarray(logits) - expected_logits))
    logits2, _ = m.eval_sequence(list(b'"in'))
    seq = np.float32(np.sum(np.asarray(logits2) - expected_logits))
    return serial, seq


def main():
    n_fail = 0
    for v in ["4v0-660K", "5v1-730K", "5v2-730K", "6v0-3m", "7v0-834K"]:
        exp_logits = np.fromfile(f"{TESTS}/expected-logits-{v}.bin", dtype=np.float32)
        cases = []
        for f in ("FP32", "FP16"):
            if (v, f) in EXPECTED_FULL:
                cases.append((f, EXPECTED_FULL[(v, f)]))
        for src, table in (("FP32", EXPECTED_Q_FP32), ("FP16", EXPECTED_Q_FP16)):
            for qf, exp in zip(QFMT, table[v]):
                cases.append((f"{src}-to-{qf}", exp))
        for fmt, exp in cases:
            path = f"{TESTS}/tiny-rwkv-{v}-{fmt}.bin"
            if not os.path.exists(path):
                continue
            serial, seq = run(path, exp_logits)
            ok_s = abs(serial) <= abs(exp) * 1.05
            ok_q = abs(seq) <= abs(exp) * 1.05
            status = "OK  " if (ok_s and ok_q) else "FAIL"
            if not (ok_s and ok_q):
                n_fail += 1
            print(
                f"{status} {v:10s} {fmt:14s} serial {serial:+12.6f} seq {seq:+12.6f}"
                f"  expected {exp:+12.6f}",
                flush=True,
            )
    print(f"failures: {n_fail}")


if __name__ == "__main__":
    main()
