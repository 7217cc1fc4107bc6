"""Fused SetTransformer coupling-net Pallas kernel (fwd + custom VJP).

Reference parity: this accelerates the coupling backbone of SURVEY.md C15
(the reference's per-coupling feed-forward nets); numerics mirror
``networks.transformer.SetTransformer.apply`` exactly (pinned by
tests/test_fused_transformer.py: the math mirror is bit-identical to the
XLA path in BOTH fp32 and bf16 on CPU).

Why a whole-network kernel: the flagship training step is HBM-traffic
bound (PERFORMANCE.md round-3 diagnostic: 9.2 GB accessed vs 0.17 ms of
MXU work per step).  The coupling net's *external* I/O is tiny — x is
[B, S, 4] (~0.13 MB bf16) and the mixture-parameter output [B, S, D*(2+3K)]
(~3 MB) — but the XLA path materializes ~20 intermediate [B, S, H]
tensors in HBM per coupling layer (one per matmul/LN/softmax fusion
boundary).  This kernel runs the ENTIRE net for a row tile inside VMEM:
one read of x, one write of y, with the weights resident across grid
steps (constant-index blocks are fetched once).

Backward: a second kernel *recomputes* the tile forward and applies
``jax.vjp`` INSIDE the kernel body — the cotangent chain is built by
autodiff at trace time (correct by construction), and no activation is
ever saved to HBM: this is remat with the recompute living entirely in
VMEM.  Weight gradients accumulate in fp32 across the sequentially-
executed TPU grid via constant-index output blocks.

Mosaic-friendly layout: everything in the kernel is strictly 2-D
([rows, features]); the [B, S, ·] <-> [B*S, ·] reshapes happen outside in
XLA-land (free: contiguous).  Attention over tiny sets (S=16, head dim
24 — far below MXU tiling) runs as TWO plain matmuls per head over the
whole row tile with a block-diagonal additive mask: out-of-sample logits
sit at -1e9, so their softmax weights underflow to exactly 0.0 and the
fp32 accumulation of the attn@V matmul is bit-identical to per-sample
attention (only summation order differs).  The ~TB-fold logit-FLOP
overcompute is free — the MXU is <1% utilized in this step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e9  # same off-mask constant as the XLA attention path


class FusedCfg(NamedTuple):
    """Hashable static config (mirrors SetTransformer's fields)."""

    hidden_dim: int
    num_heads: int
    num_layers: int
    mlp_ratio: int
    compute_dtype: str
    out_dim: int
    set_size: int


# Weight tuple layout (all fp32, block weights stacked on a leading L axis;
# unstacked biases ride as [1, N] — 1-D arrays are fragile under Mosaic's
# (sublane, lane) tiling, and [1, N] broadcasts identically):
#   0 embed_w [IN, H]      1 embed_b [1, H]
#   2 qkv_w  [L, H, 3H]    3 qkv_b  [L, 3H]
#   4 proj_w [L, H, H]     5 proj_b [L, H]
#   6 fc1_w  [L, H, RH]    7 fc1_b  [L, RH]
#   8 fc2_w  [L, RH, H]    9 fc2_b  [L, H]
#  10 out_w  [H, OUT]     11 out_b  [1, OUT]
NUM_W = 12

# Row-tile sizes (rows = flattened B*S).  The block-diagonal attention's
# overcompute is FREE on the MXU but its softmax runs on the VPU over the
# full [tile, tile] logits — exp/max/sum cost scales LINEARLY with tile
# size (measured: tile 512 made the fused step slower than XLA despite
# ~30x less HBM traffic).  Small tiles shrink the quadratic waste; grid
# steps are a hardware loop with resident weights, so many-step grids are
# cheap.  Env-tunable for on-chip probing.
import os as _os

FWD_TILE_ROWS = int(_os.environ.get("CNF_FT_TILE_FWD", "128"))
BWD_TILE_ROWS = int(_os.environ.get("CNF_FT_TILE_BWD", "128"))

# Attention inner implementation (semantics identical, perf differs):
#   blockdiag — full [n,n] softmax with -1e9 bias: simplest, but VPU exp
#               cost scales with the tile (measured slow at tile 512)
#   extract   — [n,n] logits on the MXU, softmax only on the TB extracted
#               [S,S] diagonal blocks, scatter back into zeros: VPU cost
#               at per-sample parity, quadratic work stays on the MXU
#   bcast     — per-head [TB,S,S,hd] broadcast-multiply-reduce on the
#               VPU: zero overcompute, but its 4-D ops CRASH Mosaic's
#               layout inference (compile-helper 500) — interpret/CPU
#               mirror only, kept as documentation of the attempt
ATTN_IMPL = _os.environ.get("CNF_FT_ATTN", "extract")


def flatten_params(params, num_layers: int):
    """SetTransformer param pytree -> the fixed 12-tuple above."""
    blocks = params["blocks"]
    stack = lambda key, part: jnp.stack(
        [blocks[l][key][part] for l in range(num_layers)])
    return (
        params["embed"]["w"], params["embed"]["b"][None, :],
        stack("qkv", "w"), stack("qkv", "b"),
        stack("proj", "w"), stack("proj", "b"),
        stack("fc1", "w"), stack("fc1", "b"),
        stack("fc2", "w"), stack("fc2", "b"),
        params["out"]["w"], params["out"]["b"][None, :],
    )


def _block_diag_bias(n: int, s: int) -> jax.Array:
    """[n, n] additive attention bias: 0 within a sample's S rows,
    NEG_BIG across samples."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // s
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // s
    return jnp.where(row == col, 0.0, NEG_BIG).astype(jnp.float32)


def _net_forward(x2, ws, cfg: FusedCfg):
    """Pure-jnp 2-D mirror of SetTransformer.apply (mask=None, cond
    folded into x).  Runs on VMEM values inside the kernels; also the
    function jax.vjp differentiates in the backward kernel.

    x2: [rows, IN] in the compute dtype; rows is a multiple of set_size.
    Returns [rows, OUT] in the compute dtype.
    """
    cd = jnp.dtype(cfg.compute_dtype)
    (embed_w, embed_b, qkv_w, qkv_b, proj_w, proj_b,
     fc1_w, fc1_b, fc2_w, fc2_b, out_w, out_b) = ws
    n = x2.shape[0]
    H, nh = cfg.hidden_dim, cfg.num_heads
    hd = H // nh
    attn_bias = (_block_diag_bias(n, cfg.set_size)
                 if ATTN_IMPL == "blockdiag" else None)

    def dense2d(h2, w, b):
        # networks.common.dense: bf16 MXU compute, fp32 accumulate + bias,
        # compute-dtype out.
        y = jax.lax.dot_general(
            h2.astype(cd), w.astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b).astype(cd)

    def ln2d(h2):
        h32 = h2.astype(jnp.float32)
        mu = h32.mean(axis=-1, keepdims=True)
        var = h32.var(axis=-1, keepdims=True)
        return ((h32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(h2.dtype)

    def matmul_f32acc(a, b_t_contract):
        # a [n, d] . b [n, d]^T -> [n, n], bf16 operands, fp32 accumulate
        return jax.lax.dot_general(
            a, b_t_contract,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    s = cfg.set_size
    tb = n // s

    def attn_blockdiag(qh, kh, vh):
        logits = matmul_f32acc(qh, kh) / jnp.sqrt(jnp.float32(hd))
        attn = jax.nn.softmax(logits + attn_bias, axis=-1)
        # XLA path casts attn to the compute dtype before the AV matmul;
        # off-block weights are exactly 0.0 so the extra fp32-accumulated
        # products are exact no-ops.
        return jax.lax.dot_general(
            attn.astype(cd), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def attn_extract(qh, kh, vh):
        # One quadratic QK^T matmul on the idle MXU, then per-sample
        # STATIC diagonal-block extraction (Mosaic has no dynamic_slice):
        # softmax and the [S,S]x[S,hd] AV matmul run per block, so VPU
        # transcendental cost stays at per-sample parity and no [n,n]
        # attention matrix is ever rebuilt.
        logits = matmul_f32acc(qh, kh) / jnp.sqrt(jnp.float32(hd))
        outs = []
        for b in range(tb):
            blk = logits[b * s:(b + 1) * s, b * s:(b + 1) * s]
            attn = jax.nn.softmax(blk, axis=-1).astype(cd)
            outs.append(jax.lax.dot_general(
                attn, vh[b * s:(b + 1) * s, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=0)

    def attn_bcast(qh, kh, vh):
        # Zero overcompute: per-sample attention via broadcast-multiply-
        # reduce (fp32 products of bf16 operands are exact, matching the
        # MXU convention up to summation order).
        q3 = qh.reshape(tb, s, hd).astype(jnp.float32)
        k3 = kh.reshape(tb, s, hd).astype(jnp.float32)
        v3 = vh.reshape(tb, s, hd).astype(jnp.float32)
        logits = jnp.sum(q3[:, :, None, :] * k3[:, None, :, :], axis=-1)
        logits = logits / jnp.sqrt(jnp.float32(hd))
        attn = jax.nn.softmax(logits, axis=-1).astype(cd).astype(
            jnp.float32)
        out3 = jnp.sum(attn[:, :, :, None] * v3[:, None, :, :], axis=2)
        return out3.reshape(n, hd)

    attn_fn = {"blockdiag": attn_blockdiag, "extract": attn_extract,
               "bcast": attn_bcast}[ATTN_IMPL]

    h = dense2d(x2, embed_w, embed_b)                      # [n, H]
    for l in range(cfg.num_layers):
        # --- attention (mask=None; per-sample over the row tile) --------
        qkv = dense2d(ln2d(h), qkv_w[l], qkv_b[l])         # [n, 3H]
        head_outs = []
        for hh in range(nh):
            qh = qkv[:, hh * hd:(hh + 1) * hd]
            kh = qkv[:, H + hh * hd:H + (hh + 1) * hd]
            vh = qkv[:, 2 * H + hh * hd:2 * H + (hh + 1) * hd]
            head_outs.append(attn_fn(qh, kh, vh))
        aout = jnp.concatenate(head_outs, axis=-1)         # [n, H] f32
        h = h + dense2d(aout, proj_w[l], proj_b[l])
        # --- MLP --------------------------------------------------------
        m = jax.nn.gelu(dense2d(ln2d(h), fc1_w[l], fc1_b[l]))
        h = h + dense2d(m, fc2_w[l], fc2_b[l])
    return dense2d(ln2d(h), out_w, out_b)                  # [n, OUT]


def _fwd_kernel(cfg: FusedCfg, x_ref, *rest):
    w_refs, (y_ref,) = rest[:NUM_W], rest[NUM_W:]
    ws = tuple(r[:] for r in w_refs)
    y_ref[:] = _net_forward(x_ref[:], ws, cfg)


def _bwd_kernel(cfg: FusedCfg, x_ref, g_ref, *rest):
    w_refs = rest[:NUM_W]
    dx_ref = rest[NUM_W]
    dw_refs = rest[NUM_W + 1:]
    ws = tuple(r[:] for r in w_refs)

    def f(x2, ws_):
        return _net_forward(x2, ws_, cfg)

    _, pullback = jax.vjp(f, x_ref[:], ws)
    dx, dws = pullback(g_ref[:])
    dx_ref[:] = dx

    # fp32 weight-grad accumulation across the sequential TPU grid:
    # constant-index output blocks stay VMEM-resident between steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in dw_refs:
            r[:] = jnp.zeros_like(r)

    for r, dw in zip(dw_refs, dws):
        r[:] = r[:] + dw.astype(jnp.float32)


def _pick_tile(rows: int, set_size: int, want: int) -> int | None:
    for t in (want, 512, 256, 128, 64, 32, 16, 8):
        if t <= want and t % set_size == 0 and rows % t == 0:
            return t
    return None


def _const_spec(shape):
    """Full-array VMEM block with a constant index map: fetched once,
    resident across all grid steps."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _row_spec(tile_rows: int, feat: int):
    return pl.BlockSpec((tile_rows, feat), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_apply(cfg: FusedCfg, interpret: bool, x2, ws):
    y, _ = _fused_fwd(cfg, interpret, x2, ws)
    return y


def _fused_fwd(cfg, interpret, x2, ws):
    rows, in_dim = x2.shape
    cd = jnp.dtype(cfg.compute_dtype)
    tile = _pick_tile(rows, cfg.set_size, FWD_TILE_ROWS)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(rows // tile,),
        in_specs=[_row_spec(tile, in_dim)] + [_const_spec(w.shape)
                                              for w in ws],
        out_specs=_row_spec(tile, cfg.out_dim),
        out_shape=jax.ShapeDtypeStruct((rows, cfg.out_dim), cd),
        interpret=interpret,
    )(x2.astype(cd), *ws)
    return y, (x2, ws)


def _fused_bwd(cfg, interpret, res, g):
    x2, ws = res
    rows, in_dim = x2.shape
    cd = jnp.dtype(cfg.compute_dtype)
    tile = _pick_tile(rows, cfg.set_size, BWD_TILE_ROWS)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(rows // tile,),
        in_specs=([_row_spec(tile, in_dim), _row_spec(tile, cfg.out_dim)]
                  + [_const_spec(w.shape) for w in ws]),
        out_specs=([_row_spec(tile, in_dim)]
                   + [_const_spec(w.shape) for w in ws]),
        out_shape=([jax.ShapeDtypeStruct((rows, in_dim), cd)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                      for w in ws]),
        interpret=interpret,
    )(x2.astype(cd), g.astype(cd), *ws)
    # Cotangent dtypes must match the primals (x2 as passed in; fp32 ws).
    return outs[0].astype(x2.dtype), tuple(outs[1:])


_fused_apply.defvjp(_fused_fwd, _fused_bwd)


def supported(x, cond, mask, hidden_dim: int, num_heads: int) -> bool:
    """Fused path covers the flagship coupling-net call shape."""
    if cond is not None or mask is not None:
        return False
    if x.ndim != 3:
        return False
    if hidden_dim % num_heads != 0:
        return False
    rows, s = x.shape[0] * x.shape[1], x.shape[1]
    return (_pick_tile(rows, s, FWD_TILE_ROWS) is not None
            and _pick_tile(rows, s, BWD_TILE_ROWS) is not None)


def fused_set_transformer(params, x, *, hidden_dim, num_heads, num_layers,
                          mlp_ratio, compute_dtype, out_dim):
    """Drop-in replacement for SetTransformer.apply (cond/mask None).

    The [B, S, ·] <-> [B*S, ·] reshapes live here in XLA-land (free:
    contiguous); the kernels are strictly 2-D.
    """
    B, S, in_dim = x.shape
    cfg = FusedCfg(hidden_dim, num_heads, num_layers, mlp_ratio,
                   str(compute_dtype), out_dim, S)
    interpret = jax.default_backend() not in ("tpu", "axon")
    ws = flatten_params(params, num_layers)
    y2 = _fused_apply(cfg, interpret, x.reshape(B * S, in_dim), ws)
    return y2.reshape(B, S, out_dim)
