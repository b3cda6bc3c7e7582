"""Fused int4 dequant-in-the-matmul Pallas kernel.

The XLA path for group-quantized int4 weights (models/llama.py:_mm4)
unpacks the nibbles with plain ops, which materializes an int8 (and
then bf16/int32-operand) weight copy in HBM before the matmul — the
r4 driver artifact recorded the consequence (rollout_7b_w4 1.98 vs
rollout_7b 9.27 eps/s; decode_7b_w4 181 vs 704 tok/s): the capacity
format QUARTERED speed. This kernel keeps the weight packed in HBM
(0.5 byte/param — half the int8 headline's weight traffic, the whole
point of int4 on a bandwidth-bound decode) and unpacks each [G, BO]
tile in VMEM on the VPU, feeding the MXU directly.

Reference workload being accelerated: the Vicuna-7B matmuls of
modified_lm.py forward/generate (reference models/modified_lm.py:89-146,
184-198); quantization format: models/quant.py (`q4p` uint8 [h, o/2]
nibble-packed pairwise over adjacent output channels, `s` [h/G, o]
group scales, G = gcd(h, 128)).

Layout trick — no in-kernel lane interleave: the packed byte c holds
output channels (2c, 2c+1). Unpacking to natural channel order needs an
interleave (a lane shuffle Mosaic lowers poorly). Instead the kernel
computes the EVEN and ODD channel halves as separate contractions
(x @ lo_nibbles, x @ hi_nibbles) and writes output in a permuted
[m, 2, o/2] layout ([:, 0] = even channels, [:, 1] = odd). The caller
un-permutes with one transpose+reshape on the ACTIVATIONS — m*o
elements, vs the h*o weight elements the XLA path shuffles. Scales are
pre-split into the same layout ([h/G, 2, o/2], a tiny [ng, o] slice-
stack XLA folds into the call).

Grid: (m/BM, o2/BO, h/G) with the k axis innermost ("arbitrary"
semantics): each (m, o) program accumulates over k groups in an f32
VMEM scratch and writes once at the last k step. One k step = one
scale group, so the group scale is a single [2, BO] row — the partial
(x_g @ q_g) * s_g contraction never materializes a per-group tensor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output-half block width (packed bytes per block). 128 divides every
# packed width in the 7B stack (4096 -> 2048, 11008 -> 5504).
DEFAULT_BLOCK_O = 128
DEFAULT_BLOCK_M = 256


def _unpack_nibbles(p):
    """uint8 [G, BO] -> (lo, hi) int8 [G, BO] two's-complement."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = ((p >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo, hi


def _mm4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                int8_x: bool):
    """One (m-block, o-block) program at one k group.

    x_ref: [BM, G] (int8 when int8_x else bf16/f32);
    w_ref: [G, BO] uint8 packed; s_ref: [1, 2, BO] f32 group scales
    (pre-split even/odd); o_ref: [BM, 2, BO]; acc_ref: f32 scratch
    [BM, 2, BO]."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    lo, hi = _unpack_nibbles(w_ref[...])
    if int8_x:
        pe = jnp.dot(x, lo, preferred_element_type=jnp.int32)
        po = jnp.dot(x, hi, preferred_element_type=jnp.int32)
    else:
        pe = jnp.dot(x, lo.astype(x.dtype),
                     preferred_element_type=jnp.float32)
        po = jnp.dot(x, hi.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    s = s_ref[0]                                   # [2, BO] f32
    acc_ref[:, 0, :] += pe.astype(jnp.float32) * s[0][None, :]
    acc_ref[:, 1, :] += po.astype(jnp.float32) * s[1][None, :]

    @pl.when(k == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def matmul_q4(x, q4p, s, *, out_dtype=None, block_m: int = DEFAULT_BLOCK_M,
              block_o: int = DEFAULT_BLOCK_O, interpret: bool = False):
    """y = x @ unpack(q4p, s), fused.

    x: [..., h] (bf16/f32, or int8 for the W8A8-style path — the caller
    applies its per-row activation scale to the f32-accumulated output);
    q4p: uint8 [h, o/2]; s: [h/G, o] with G = h // s.shape[0].
    Returns [..., o] in out_dtype (default x.dtype, f32 when x is int8).
    """
    if out_dtype is None:
        out_dtype = jnp.float32 if x.dtype == jnp.int8 else x.dtype
    h, o2 = q4p.shape
    o = o2 * 2
    ng = s.shape[0]
    g = h // ng
    assert ng * g == h, (h, ng)
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    xf = x.reshape(m, h)

    # 32-row floor keeps the x block sublane-aligned for every operand
    # dtype (int8 tiles are (32, 128); bf16 (16, 128))
    bm = min(block_m, max(32, m))
    bo = min(block_o, o2)
    m_pad = -m % bm
    if m_pad:
        xf = jnp.pad(xf, ((0, m_pad), (0, 0)))
    mp = m + m_pad
    assert o2 % bo == 0, (o2, bo)
    assert g % 128 == 0 or g == h, (g,)

    # split scales into the kernel's (even, odd) halves: [ng, 2, o/2]
    s2 = jnp.stack([s[:, 0::2], s[:, 1::2]], axis=1).astype(jnp.float32)

    int8_x = xf.dtype == jnp.int8
    grid = (mp // bm, o2 // bo, ng)
    kernel = functools.partial(_mm4_kernel, n_k=ng, int8_x=int8_x)
    yp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, g), lambda i, j, k: (i, k)),
            pl.BlockSpec((g, bo), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, 2, bo), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 2, bo), lambda i, j, k: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, 2, o2), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, 2, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xf, q4p, s2)
    # un-permute (even, odd) halves -> natural channel order: one
    # transpose over ACTIVATION elements (m*o), not weight elements
    y = yp[:m].transpose(0, 2, 1).reshape(m, o)
    return y.reshape(*lead, o)


def q4_kernel_eligible(x, q4p, s) -> bool:
    """Shape/platform gate for the fused kernel: group size must be a
    lane multiple and the packed width must tile; anything else (tiny
    test models, CPU) takes the XLA fallback in models/llama.py.

    Multi-device processes also fall back: a bare pallas_call inside a
    GSPMD program with TP-sharded q4p would force a full re-gather
    (it needs shard_map plumbing to partition). int4 is a single-chip
    capacity lever today; the multichip dryrun covers the XLA form."""
    try:
        if jax.default_backend() != "tpu" or jax.device_count() > 1:
            return False
    except Exception:
        return False
    h, o2 = q4p.shape
    ng = s.shape[0]
    g = h // max(ng, 1)
    return g % 128 == 0 and o2 % DEFAULT_BLOCK_O == 0
