"""Golden-logit regression tests against the reference's committed tiny
models and expected-logit tables.

Replicates tests/test_tiny_rwkv.c + logit_difference_validator.inc: feed the
prompt `"\"in"` both token-by-token (serial) and as one sequence, sum the
signed logit differences vs the committed expected logits, and assert
|diff_sum| <= |expected| * 1.05 using the reference's own hard-coded
per-version/per-format expected values (test_tiny_rwkv.c:38-134).
"""

import numpy as np
import pytest

from conftest import require_fixture

PROMPT = [34, 105, 110]  # '"', 'i', 'n'

EXPECTED_FULL = {
    ("4v0-660K", "FP32"): 0.001,
    ("4v0-660K", "FP16"): -0.013652,
    ("5v1-730K", "FP32"): 0.001,
    ("5v1-730K", "FP16"): -0.289921,
    ("5v2-730K", "FP32"): 0.001,
    ("5v2-730K", "FP16"): +0.455912,
    ("6v0-3m", "FP32"): 0.001,
    ("6v0-3m", "FP16"): -0.416620,
    ("7v0-834K", "FP32"): 0.001,
    ("7v0-834K", "FP16"): +0.005766,
}

QFMT = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0"]

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

# Tolerance is the reference's own 1.05x (logit_difference_validator.inc:69).
# One exception: the 7v0 FP16-to-Q8_0 constant was generated with an older
# ggml whose F16 matmul rounded activations to f16; current ggml routes F16
# matmuls through tinyBLAS with raw f32 activations (which we reproduce — our
# FP16 result equals the FP32-to-Q8_0 function, +0.011925 vs the FP32 table's
# +0.011924), leaving it 9% from the stale constant.
TOLERANCE_OVERRIDE = {("7v0-834K", "FP16-to-Q8_0"): 1.15}

ALL_CASES = []
for (v, f), exp in EXPECTED_FULL.items():
    ALL_CASES.append((v, f, exp))
for src, table in (("FP32", EXPECTED_Q_FP32), ("FP16", EXPECTED_Q_FP16)):
    for v, exps in table.items():
        for qf, exp in zip(QFMT, exps):
            ALL_CASES.append((v, f"{src}-to-{qf}", exp))


@pytest.mark.parametrize("version,fmt,expected_sum", ALL_CASES)
def test_golden_logits(version, fmt, expected_sum):
    from rwkv_tpu.models.model import RWKVModel

    path = require_fixture(f"tiny-rwkv-{version}-{fmt}.bin")
    expected_logits = np.fromfile(
        str(require_fixture(f"expected-logits-{version}.bin")), dtype=np.float32
    )
    model = RWKVModel(str(path))
    tol = TOLERANCE_OVERRIDE.get((version, fmt), 1.05)

    # Serial mode: token-by-token.
    state = model.init_state()
    for tok in PROMPT:
        logits, state = model.eval(tok, state)
    serial = float(np.float32(np.sum(np.asarray(logits) - expected_logits)))
    assert abs(serial) <= abs(expected_sum) * tol, (
        f"serial diff {serial:+.6f} exceeds {expected_sum:+.6f} * {tol}"
    )

    # Sequence mode.
    logits, _ = model.eval_sequence(PROMPT)
    seq = float(np.float32(np.sum(np.asarray(logits) - expected_logits)))
    assert abs(seq) <= abs(expected_sum) * tol, (
        f"sequence diff {seq:+.6f} exceeds {expected_sum:+.6f} * {tol}"
    )
