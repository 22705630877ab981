"""On-disk format stability: the committed (historical) Q5_0/Q5_1 model
files must keep loading and producing in-tolerance logits (the reference's
test_quantization_format_compatibility.c, with its expected table)."""

import numpy as np
import pytest

from conftest import require_fixture

PROMPT = [34, 105, 110]

# (version, format) -> expected diff sum (test_quantization_format_compatibility.c:23-35)
CASES = [
    ("4v0-660K", "Q5_0", -0.170404),
    ("4v0-660K", "Q5_1", +0.278034),
    ("5v1-730K", "Q5_0", -163.439407),
    ("5v1-730K", "Q5_1", -18.017435),
    ("5v2-730K", "Q5_0", +25.273308),
    ("5v2-730K", "Q5_1", +48.068733),
    ("6v0-3m", "Q5_0", -21.151785),
    ("6v0-3m", "Q5_1", +3.576909),
]


@pytest.mark.parametrize("version,fmt,expected", CASES)
def test_committed_quantized_files(version, fmt, expected):
    from rwkv_tpu.models.model import RWKVModel

    path = require_fixture(f"tiny-rwkv-{version}-{fmt}.bin")
    expected_logits = np.fromfile(
        str(require_fixture(f"expected-logits-{version}.bin")), dtype=np.float32
    )
    model = RWKVModel(str(path))
    logits, _ = model.eval_sequence(PROMPT)
    diff = float(np.float32(np.sum(np.asarray(logits) - expected_logits)))
    assert abs(diff) <= abs(expected) * 1.05, f"{diff:+.6f} vs {expected:+.6f}"
