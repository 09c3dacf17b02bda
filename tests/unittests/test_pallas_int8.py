"""Pallas int8 matmul kernels (avex_tpu.ops.pallas_int8), interpret mode.

The kernels exist to chase v5e's doubled int8 MXU rate (the on-chip numbers
live in ``scripts/bench_int8_matmul.py`` + docs/architecture.md); these
tests pin their NUMERICS on the CPU interpreter so the fast tier catches
contract drift regardless of what the chip verdict turns out to be:

- raw ``s8 x s8 -> s32`` is exact integer arithmetic (vs numpy int32);
- the fused dynamic-quant dense matches ``avex_tpu.quant.dynamic_int8_matmul``
  within one activation quantization level (the two compute the same scheme
  but may round a borderline ``x/scale`` differently — measured divergence
  is a 1-level flip on ~0.1% of elements);
- padding/leading-dim handling: non-divisible M, 3-D activations, bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.ops.pallas_int8 import int8_dynamic_dense, int8_matmul
from avex_tpu.quant import dynamic_int8_matmul, quantize_kernel


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


def test_raw_int8_matmul_exact(np_rng):
    xq = jnp.asarray(np_rng.integers(-127, 128, (96, 256)), jnp.int8)
    wq = jnp.asarray(np_rng.integers(-127, 128, (256, 256)), jnp.int8)
    want = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    got = int8_matmul(xq, wq, block_m=32, block_n=128, interpret=True)
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), want)


def test_raw_int8_matmul_pads_m(np_rng):
    # M=50 is not a multiple of block_m=32: the wrapper zero-pads and slices.
    xq = jnp.asarray(np_rng.integers(-127, 128, (50, 128)), jnp.int8)
    wq = jnp.asarray(np_rng.integers(-127, 128, (128, 128)), jnp.int8)
    want = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    got = int8_matmul(xq, wq, block_m=32, block_n=128, interpret=True)
    assert got.shape == (50, 128)
    np.testing.assert_array_equal(np.asarray(got), want)


def _quant_level_tolerance(x, w_scale):
    """Output-space bound for a 1-level activation-quantization flip.

    A flipped level changes one xq entry by 1; the output element moves by
    at most row_scale * |wq| * 1 <= row_scale * 127 * col_scale."""
    xf = np.abs(np.asarray(x, np.float32))
    row_scale = xf.max(axis=-1, keepdims=True) / 127.0
    return row_scale * 127.0 * np.asarray(w_scale, np.float32)[None, :]


@pytest.mark.parametrize("use_bias", [False, True])
def test_dynamic_dense_matches_quant_path(np_rng, use_bias):
    x = jnp.asarray(np_rng.standard_normal((64, 128)), jnp.bfloat16)
    w = jnp.asarray(np_rng.standard_normal((128, 128)), jnp.float32)
    wq, ws = quantize_kernel(w)
    b = jnp.asarray(np_rng.standard_normal((128,)), jnp.float32) if use_bias else None
    want = np.asarray(
        dynamic_int8_matmul(x, wq, ws, b, out_dtype=jnp.float32), np.float32
    )
    got = np.asarray(
        int8_dynamic_dense(
            x, wq, ws, b, block_m=32, block_n=128, out_dtype=jnp.float32,
            interpret=True,
        ),
        np.float32,
    )
    tol = _quant_level_tolerance(x, ws)
    assert np.all(np.abs(got - want) <= tol + 1e-5)
    # and in aggregate the two paths are the same scheme: rel-L2 far below
    # the ~1e-2 quant-vs-float error the scheme itself carries
    denom = np.linalg.norm(want) or 1.0
    assert np.linalg.norm(got - want) / denom < 2e-3


def test_dynamic_dense_leading_dims_and_padding(np_rng):
    # (B, T, K) activations with B*T=72 not divisible by block_m=32.
    x = jnp.asarray(np_rng.standard_normal((3, 24, 128)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((128, 128)), jnp.float32)
    wq, ws = quantize_kernel(w)
    got = int8_dynamic_dense(
        x, wq, ws, block_m=32, block_n=128, out_dtype=jnp.float32, interpret=True
    )
    assert got.shape == (3, 24, 128)
    want = np.asarray(
        dynamic_int8_matmul(x.reshape(-1, 128), wq, ws, out_dtype=jnp.float32),
        np.float32,
    ).reshape(3, 24, 128)
    tol = _quant_level_tolerance(x.reshape(-1, 128), ws).reshape(3, 24, 128)
    assert np.all(np.abs(np.asarray(got) - want) <= tol + 1e-5)


def test_dynamic_dense_fp_reconstruction_quality(np_rng):
    """End quality vs the float matmul: same envelope as the quant path."""
    x = jnp.asarray(np_rng.standard_normal((64, 256)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((256, 128)), jnp.float32)
    wq, ws = quantize_kernel(w)
    fp = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    q = np.asarray(
        int8_dynamic_dense(
            x, wq, ws, block_m=32, block_n=128, out_dtype=jnp.float32, interpret=True
        )
    )
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.02, rel
