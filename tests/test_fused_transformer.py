"""Fused SetTransformer kernel vs the XLA path.

Three layers of pinning:
  1. the pure-jnp math mirror (`_net_forward`) must be EXACTLY equal to
     SetTransformer.apply on CPU — in fp32 AND bf16 (same ops, same
     cast points; the block-diagonal attention trick is an exact no-op);
  2. the Pallas wrapper (interpret mode on CPU) must match the mirror:
     exactly in fp32; loosely in bf16 (the interpreter executes bf16
     subcomputations at different intermediate precisions than XLA);
  3. gradients through the fused custom VJP must match autodiff through
     the XLA path (fp32, tight tolerance) — this exercises the
     jax.vjp-inside-kernel backward and the fp32 grid accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from categoricalnf_tpu.networks.transformer import SetTransformer
from categoricalnf_tpu.ops.pallas import fused_transformer as ft

B, S, IN, OUT, H = 32, 16, 4, 104, 96


def _make(compute_dtype):
    net = SetTransformer(hidden_dim=H, num_heads=4, num_layers=2,
                         compute_dtype=compute_dtype)
    params = net.init(jax.random.PRNGKey(0), IN, OUT)
    # zero-init final layer would make y == 0; randomize for a real test
    params["out"]["w"] = jax.random.normal(
        jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, IN), jnp.float32)
    return net, params, x


def _fused(net, params, x):
    return ft.fused_set_transformer(
        params, x, hidden_dim=net.hidden_dim, num_heads=net.num_heads,
        num_layers=net.num_layers, mlp_ratio=net.mlp_ratio,
        compute_dtype=net.compute_dtype,
        out_dim=params["out"]["w"].shape[-1])


def _mirror(net, params, x):
    cfg = ft.FusedCfg(net.hidden_dim, net.num_heads, net.num_layers,
                      net.mlp_ratio, net.compute_dtype,
                      params["out"]["w"].shape[-1], S)
    ws = ft.flatten_params(params, net.num_layers)
    cd = jnp.dtype(net.compute_dtype)
    y2 = ft._net_forward(x.reshape(B * S, IN).astype(cd), ws, cfg)
    return y2.reshape(B, S, -1)


@pytest.mark.parametrize("impl", ["blockdiag", "extract", "bcast"])
def test_math_mirror_bf16(impl, monkeypatch):
    """Layer 1 (bf16): all attention variants are semantically the same
    computation; fp32 summation-order noise can flip single bf16
    roundings (measured max: 1 ulp, 0.0078 at unit scale)."""
    monkeypatch.setattr(ft, "ATTN_IMPL", impl)
    net, params, x = _make("bfloat16")
    y_ref = np.asarray(net.apply(params, x).astype(jnp.float32))
    y_mir = np.asarray(_mirror(net, params, x).astype(jnp.float32))
    np.testing.assert_allclose(y_mir, y_ref, rtol=0.02, atol=0.02)


@pytest.mark.parametrize("impl", ["extract", "bcast"])
def test_math_mirror_fp32_variants(impl, monkeypatch):
    monkeypatch.setattr(ft, "ATTN_IMPL", impl)
    net, params, x = _make("float32")
    y_ref = np.asarray(net.apply(params, x))
    y_mir = np.asarray(_mirror(net, params, x))
    np.testing.assert_allclose(y_mir, y_ref, rtol=1e-4, atol=1e-5)


def test_math_mirror_fp32():
    """Layer 1 (fp32): only matmul summation order differs (~1e-6)."""
    net, params, x = _make("float32")
    y_ref = np.asarray(net.apply(params, x))
    y_mir = np.asarray(_mirror(net, params, x))
    np.testing.assert_allclose(y_mir, y_ref, rtol=1e-4, atol=1e-5)


def test_kernel_matches_fp32():
    """Layer 2: pallas wrapper == mirror (fp32, tight)."""
    net, params, x = _make("float32")
    y_ref = net.apply(params, x)
    y_fused = _fused(net, params, x)
    assert y_fused.dtype == y_ref.dtype
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_bf16_loose():
    """Layer 2 (bf16): interpret mode executes bf16 at different
    intermediate precision than compiled XLA; bound the drift."""
    net, params, x = _make("bfloat16")
    y_ref = np.asarray(_mirror(net, params, x).astype(jnp.float32))
    y_fused = np.asarray(_fused(net, params, x).astype(jnp.float32))
    err = np.abs(y_fused - y_ref)
    tol = 0.05 * np.maximum(np.abs(y_ref), 1.0)
    frac_bad = float((err > tol).mean())
    assert frac_bad < 0.02, f"{frac_bad:.4f} of elements off by >5%"


def test_gradients_match_fp32():
    """Layer 3: fused custom VJP == autodiff through the XLA path."""
    net, params, x = _make("float32")

    def loss_ref(p, x_):
        y = net.apply(p, x_)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_fused(p, x_):
        y = _fused(net, p, x_)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    (gp_fused, gx_fused) = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree.leaves(gp_ref)
    flat_fused = jax.tree.leaves(gp_fused)
    assert len(flat_ref) == len(flat_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_apply_dispatches_fused():
    """SetTransformer(fused=True) must route through the kernel for the
    supported shape and fall back when cond/mask present."""
    net, params, x = _make("float32")
    fused_net = SetTransformer(hidden_dim=H, num_heads=4, num_layers=2,
                               compute_dtype="float32", fused=True)
    y_plain = net.apply(params, x)
    y_fused = fused_net.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)
    # fallback path: mask present -> must still equal plain-XLA output
    mask = jnp.ones((B, S))
    y_masked = fused_net.apply(params, x, mask=mask)
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)


def test_unsupported_shapes_fall_back():
    assert not ft.supported(jnp.zeros((7, 13, 4)), None, None, H, 4)
    assert ft.supported(jnp.zeros((B, S, 4)), None, None, H, 4)


@pytest.mark.parametrize("rows", [128, 512, 1024 * 16])
def test_tile_picker_covers_rows(rows):
    t = ft._pick_tile(rows, S, ft.FWD_TILE_ROWS)
    assert t is not None and rows % t == 0 and t % S == 0
