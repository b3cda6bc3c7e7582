"""Fused int4 dequant-matmul kernel (ops/matmul_q4.py) vs the XLA
reference path (models/llama.py:_mm4 fallback), interpret mode.

The kernel accelerates the reference's Vicuna-7B matmuls
(modified_lm.py:89-146) under the group-wise int4 capacity format
(models/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.models import llama as L
from navillm_tpu.models.quant import _quant_one4, unpack_int4_host
from navillm_tpu.ops.matmul_q4 import matmul_q4, q4_kernel_eligible


def _make(h, o, seed=0):
    rng = np.random.RandomState(seed)
    w = (rng.randn(h, o) * 0.02).astype(np.float32)
    q4p, s = _quant_one4(jnp.asarray(w, jnp.bfloat16))
    q4p = np.asarray(q4p)
    s = np.asarray(s.astype(jnp.float32))
    g = h // s.shape[0]
    wd = (unpack_int4_host(q4p).reshape(s.shape[0], g, o)
          * s[:, None, :]).reshape(h, o)
    return q4p, s, wd


@pytest.mark.parametrize("m,h,o", [(40, 256, 512), (7, 384, 256),
                                   (256, 256, 256)])
def test_fp_matches_dequant_reference(m, h, o):
    q4p, s, wd = _make(h, o)
    x = np.random.RandomState(1).randn(m, h).astype(np.float32)
    y = np.asarray(matmul_q4(jnp.asarray(x), jnp.asarray(q4p),
                             jnp.asarray(s), interpret=True))
    ref = x @ wd
    assert np.abs(y - ref).max() <= 1e-4 * max(np.abs(ref).max(), 1.0)


def test_int8_activation_path_exact():
    """int8 x int4 accumulates in int32 -> the f32 result is exact."""
    q4p, s, wd = _make(256, 512, seed=2)
    xa = np.random.RandomState(3).randint(-127, 128,
                                          (33, 256)).astype(np.int8)
    y = np.asarray(matmul_q4(jnp.asarray(xa), jnp.asarray(q4p),
                             jnp.asarray(s), interpret=True))
    # reference: integer dot per group, scaled
    g = 256 // s.shape[0]
    qh = unpack_int4_host(q4p).astype(np.int32)
    part = np.einsum("mgk,gko->mgo", xa.astype(np.int32).reshape(33, -1, g),
                     qh.reshape(-1, g, 512))
    ref = (part.astype(np.float64) * s[None].astype(np.float64)).sum(1)
    np.testing.assert_allclose(y, ref.astype(np.float32), rtol=1e-6)


def test_leading_dims_and_odd_rows():
    q4p, s, wd = _make(256, 256, seed=4)
    x = np.random.RandomState(5).randn(3, 5, 256).astype(np.float32)
    y = np.asarray(matmul_q4(jnp.asarray(x), jnp.asarray(q4p),
                             jnp.asarray(s), interpret=True))
    assert y.shape == (3, 5, 256)
    ref = x.reshape(-1, 256) @ wd
    assert np.abs(y.reshape(-1, 256) - ref).max() <= 1e-4

def test_eligibility_gate():
    # CPU backend -> never eligible (tests run with jax_platforms=cpu)
    q4p, s, _ = _make(256, 512)
    assert not q4_kernel_eligible(jnp.zeros((4, 256)), jnp.asarray(q4p),
                                  jnp.asarray(s))


def test_mm4_fallback_unchanged():
    """llama._mm4 on CPU keeps the XLA path and matches the dequantized
    matmul (the same contract the kernel is tested against)."""
    q4p, s, wd = _make(256, 512, seed=6)
    x = np.random.RandomState(7).randn(9, 256).astype(np.float32)
    w = {"q4p": jnp.asarray(q4p), "s": jnp.asarray(s, jnp.bfloat16)}
    y = np.asarray(L._mm(jnp.asarray(x), w))
    # bf16 scale storage dominates the tolerance
    assert np.abs(y - x @ wd).max() <= 2e-2 * max(np.abs(y).max(), 1.0)
