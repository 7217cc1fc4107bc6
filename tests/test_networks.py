"""Dtype contracts of the coupling networks (round-3 bf16-stream change).

The flagship step is HBM-traffic-bound (PERFORMANCE.md diagnostic), so
``dense``/``layer_norm`` must MATERIALIZE activations in the compute
dtype, not just compute in it — while everything that needs fp32 keeps
it: LN statistics, MXU accumulation, the LSTM recurrent state (256-step
carries would drift in bf16), and the fp32 eval twin (compute_dtype
float32 must remain byte-identical to the pre-change behavior).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from categoricalnf_tpu.networks.common import dense, dense_init, layer_norm
from categoricalnf_tpu.networks.lstm import CausalLSTM
from categoricalnf_tpu.networks.transformer import SetTransformer


def test_dense_returns_compute_dtype():
    p = dense_init(jax.random.PRNGKey(0), 8, 16)
    x = jnp.ones((4, 8), jnp.float32)
    assert dense(p, x, jnp.bfloat16).dtype == jnp.bfloat16
    assert dense(p, x, jnp.float32).dtype == jnp.float32


def test_dense_fp32_path_unchanged():
    """compute_dtype=float32 is the eval-twin path: exact fp32 matmul."""
    p = dense_init(jax.random.PRNGKey(1), 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    want = x @ p["w"] + p["b"]
    np.testing.assert_allclose(dense(p, x, jnp.float32), want, rtol=1e-6)


def test_layer_norm_dtype_and_fp32_stats():
    x16 = jax.random.normal(jax.random.PRNGKey(3), (4, 32)).astype(
        jnp.bfloat16)
    y = layer_norm(x16)
    assert y.dtype == jnp.bfloat16
    # statistics must have been computed in fp32: the normalized fp32
    # upcast has ~zero mean / unit variance despite the bf16 output
    y32 = y.astype(jnp.float32)
    np.testing.assert_allclose(y32.mean(-1), 0.0, atol=2e-2)
    np.testing.assert_allclose(y32.var(-1), 1.0, atol=5e-2)
    assert layer_norm(x16.astype(jnp.float32)).dtype == jnp.float32


def test_lstm_cell_state_stays_fp32_under_bf16():
    """The recurrent carry must never quantize to bf16: a 256-step
    accumulation in bf16 loses ~2 decimal digits and visibly degrades the
    LM flow.  Promotion (bf16 gate x fp32 cell) must preserve fp32."""
    net = CausalLSTM(hidden_dim=16, num_layers=2, compute_dtype="bfloat16")
    p = net.init(jax.random.PRNGKey(4), 4, 4)
    carry, out = net.step(p, net.init_carry(3), jnp.ones((3, 4)))
    for h, c in carry:
        assert c.dtype == jnp.float32
        assert h.dtype == jnp.float32


def test_transformer_bf16_stream_finite_and_fp32_equivalent():
    """bf16 stream stays finite and close to the fp32 reference net."""
    kwargs = dict(hidden_dim=32, num_heads=4, num_layers=2)
    net16 = SetTransformer(compute_dtype="bfloat16", **kwargs)
    net32 = SetTransformer(compute_dtype="float32", **kwargs)
    p = net16.init(jax.random.PRNGKey(5), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 4))
    y16 = net16.apply(p, x).astype(jnp.float32)
    y32 = net32.apply(p, x)
    assert bool(jnp.isfinite(y16).all())
    # zero-init output head => both are exactly 0 at init; perturb it
    p2 = jax.tree.map(lambda a: a, p)
    p2["out"] = {"w": jnp.ones_like(p["out"]["w"]) * 0.1,
                 "b": p["out"]["b"]}
    y16 = net16.apply(p2, x).astype(jnp.float32)
    y32 = net32.apply(p2, x)
    np.testing.assert_allclose(y16, y32, atol=0.15, rtol=0.1)
