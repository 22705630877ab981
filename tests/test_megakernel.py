"""Whole-layer v7 decode mega-kernel vs the reference layer math
(interpreter mode on CPU; compiles natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import require_fixture


@pytest.mark.parametrize("is_first", [False, True])
@pytest.mark.parametrize("batch", [1, 4])
def test_megakernel_matches_layer_math(is_first, batch):
    import jax

    from rwkv_tpu.models.loader import load_params
    from rwkv_tpu.models.serve import stack_layer_params, _att_v7_fused
    from rwkv_tpu.models import graph as G
    from rwkv_tpu.ops.megakernel import v7_layer_decode

    cfg, params = load_params(str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin")))
    stacked = stack_layer_params(params, cfg, jnp.float32, "dense", fuse=True)
    i = 0 if is_first else 1
    layer = {k: v[i] for k, v in stacked["blocks"].items()}

    rng = np.random.default_rng(0)
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    x = jnp.asarray(rng.standard_normal((batch, c)), jnp.float32)
    att_xx = jnp.asarray(rng.standard_normal((batch, c)), jnp.float32) * 0.1
    ffn_xx = jnp.asarray(rng.standard_normal((batch, c)), jnp.float32) * 0.1
    heads = jnp.asarray(rng.standard_normal((batch, h, s, s)), jnp.float32) * 0.1
    v_first = jnp.asarray(rng.standard_normal((batch, c)), jnp.float32) * 0.1

    # Reference: per-sequence unfused math, T=1 (time-major [1, C]).
    ref_y, ref_xx, ref_fxx, ref_heads, ref_vf = [], [], [], [], []
    for bi in range(batch):
        xi = x[bi][None]  # [1, C]
        dx, nxx, nh, nvf = _att_v7_fused(
            layer, xi, att_xx[bi], heads[bi], v_first[bi][None], cfg,
            jnp.asarray(is_first), None,
        )
        xi2 = xi + dx
        dff, nfxx = G.ffn_v7(layer, xi2, ffn_xx[bi])
        ref_y.append(np.asarray(xi2 + dff)[0])
        ref_xx.append(np.asarray(nxx))
        ref_fxx.append(np.asarray(nfxx))
        ref_heads.append(np.asarray(nh))
        ref_vf.append(np.asarray(nvf)[0])

    y, nxx, nfxx, nheads, nvf = v7_layer_decode(
        x, att_xx, ffn_xx, heads, v_first, is_first, layer, cfg, interpret=True
    )

    # Kernel matmuls run in bf16 (serving precision); compare accordingly.
    np.testing.assert_allclose(np.asarray(y), np.stack(ref_y), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(nxx), np.stack(ref_xx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nfxx), np.stack(ref_fxx), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(nheads), np.stack(ref_heads), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(nvf), np.stack(ref_vf), rtol=2e-2, atol=2e-2)
