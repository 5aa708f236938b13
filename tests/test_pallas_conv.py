"""Parity tests for the Pallas 3x3 conv kernel (ops/pallas_conv.py).

Interpret mode on the CPU test platform; the real-chip check is driven by
tools/profile_stages.py + bench.py (doc/performance.md round 5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airv2x_tpu.ops.pallas_conv import conv3x3_same, supports_pallas_conv3x3


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "b,h,w,c,co",
    [
        (2, 8, 16, 8, 16),   # aligned W
        (1, 5, 11, 8, 8),    # W padded to the sublane tile
        (3, 10, 24, 16, 8),  # Cout < Cin
        (6, 13, 22, 8, 8),   # flagship-like: 6 maps, odd spatial
    ],
)
def test_conv3x3_parity_f32(b, h, w, c, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1, jnp.float32)
    got = conv3x3_same(x, k, interpret=True)
    np.testing.assert_allclose(got, _ref(x, k), atol=1e-4, rtol=1e-4)


def test_conv3x3_parity_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 18, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.bfloat16)
    got = conv3x3_same(x, k, interpret=True).astype(jnp.float32)
    ref = _ref(x, k).astype(jnp.float32)
    # both accumulate f32 over bf16 operands
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_fused_affine_relu_epilogue():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(16) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    got = conv3x3_same(x, k, s, b, relu=True, interpret=True)
    ref = jnp.maximum(_ref(x, k) * s + b, 0.0)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_im2col_matches_conv():
    from airv2x_tpu.ops.pallas_conv import conv3x3_im2col

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(16) + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    got = conv3x3_im2col(x, k, s, b, relu=True)
    ref = jnp.maximum(_ref(x, k) * s + b, 0.0)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_convbnrelu_im2col_matches_xla(monkeypatch):
    from airv2x_tpu.models.nn import ConvBNReLU

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    blk = ConvBNReLU(8, dtype=jnp.float32)
    monkeypatch.setenv("AIRV2X_CONV_KERNEL", "xla")
    variables = blk.init(jax.random.PRNGKey(0), x, False)
    ref = blk.apply(variables, x, False)
    monkeypatch.setenv("AIRV2X_CONV_KERNEL", "im2col")
    got = blk.apply(variables, x, False)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_support_gate():
    assert supports_pallas_conv3x3((6, 100, 352, 64), jnp.bfloat16, 64)
    assert supports_pallas_conv3x3((6, 25, 88, 256), jnp.bfloat16, 256)
    # the 256-ch shrink DoubleConv at full BEV res blows the VMEM budget
    assert not supports_pallas_conv3x3((6, 100, 352, 256), jnp.bfloat16, 256)
    # odd channel counts stay on XLA
    assert not supports_pallas_conv3x3((1, 16, 16, 12), jnp.float32, 12)


def test_convbnrelu_pallas_matches_xla(monkeypatch):
    """The flax block gives identical outputs under both backends, from the
    same params (the Pallas branch must bind the same 'Conv_0/kernel')."""
    from airv2x_tpu.models.nn import ConvBNReLU

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    blk = ConvBNReLU(8, dtype=jnp.float32)

    monkeypatch.setenv("AIRV2X_CONV_KERNEL", "xla")
    variables = blk.init(jax.random.PRNGKey(0), x, False)
    ref = blk.apply(variables, x, False)

    monkeypatch.setenv("AIRV2X_CONV_KERNEL", "pallas")
    got = blk.apply(variables, x, False)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # train path always stays on XLA (no custom VJP) — must still trace
    out, _ = blk.apply(
        variables, x, True, mutable=["batch_stats"],
        rngs={"params": jax.random.PRNGKey(1)},
    )
    assert out.shape == ref.shape
