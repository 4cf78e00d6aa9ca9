"""Pallas TPU kernels over the ELL (padded neighbour-list) sparse layout.

These are the contract's standalone kernels (BASELINE.json:5, SURVEY.md
section 2.2) for graphs WITHOUT block-diagonal structure — the general
sparse path. Layout: ell_src int32 [V, max_deg], ell_mask [V, max_deg]
(GraphBatch.ell_src / ell_mask; edges regularized per destination).

- ell_spmm:  out[v] = sum_j w[v,j] * values[ell_src[v,j]] — the heavy op.
  Grid over destination tiles; source rows stream HBM -> VMEM via per-row
  async DMA, double-buffered across neighbour slots so the gather of slot
  j+1 overlaps the multiply-accumulate of slot j. Total traffic is the
  E*D roofline volume.
- ell_sddmm: logits[v,j] = <q[v], k[ell_src[v,j]]> — same gather structure
  over the small key table, reduction instead of accumulation.
- ell_softmax: masked row softmax (the ELL form of segment-softmax).

Backward passes run the equivalent XLA math (gathers + one scatter-add)
via custom_vjp; forward is where the bytes are.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _node_tile(V: int, cap: int = 128) -> int:
    for t in (cap, 64, 32, 16, 8):
        if V % t == 0:
            return t
    return V


# --- ell_spmm ---------------------------------------------------------------


def _spmm_kernel(src_ref, w_ref, values_ref, out_ref, vbuf, sems):
    """src_ref: SMEM [Tv, deg]; w_ref: VMEM [Tv, deg]; values_ref: HBM [V, D];
    out_ref: VMEM [Tv, D]; vbuf: VMEM [2, Tv, D]; sems: DMA [2, Tv].

    The neighbour loop is Python-unrolled (deg is static and small): Mosaic
    cannot index the minor (lane) dimension of a VMEM ref at a dynamic
    offset, so per-column weights come from static slices of the loaded
    block and the only stores are full blocks.
    """
    Tv, deg = w_ref.shape

    def dma(slot, r, j):
        # values is [V, Dc, 128]: a row DMA lands on whole (Dc, 128) minor
        # tiles — a flat [D] destination spanning several lane tiles at
        # sublane width 1 does not satisfy Mosaic's tiling constraints.
        return pltpu.make_async_copy(
            values_ref.at[src_ref[r, j]], vbuf.at[slot, r], sems.at[slot, r])

    def start_col(j):
        slot = j % 2
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).start(), c)[1], 0)

    start_col(0)
    w_tile = w_ref[:]                     # [Tv, deg], one aligned load
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(deg):                  # static unroll
        slot = j % 2
        if j + 1 < deg:
            start_col(j + 1)
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).wait(), c)[1], 0)
        # column j of w via one-hot reduce: lane-dim slicing at width 1 is
        # not tile-aligned on TPU, reductions are.
        w_col = jnp.sum(jnp.where(col_ids == j, w_tile, 0.0), axis=1,
                        keepdims=True)                       # [Tv, 1]
        acc = acc + w_col[..., None] * vbuf[slot]            # [Tv, Dc, 128]
    out_ref[:] = acc.astype(out_ref.dtype)


def _pad_lanes(x, mult=128):
    """Zero-pad the minor dim to a multiple of the 128-lane tile."""
    d = x.shape[-1]
    pad = (-d) % mult
    if pad == 0:
        return x, d
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]), d


def _spmm_forward(weights, values, ell_src, interpret):
    values, D_orig = _pad_lanes(values)
    V, D = values.shape
    deg = ell_src.shape[1]
    Tv = _node_tile(V)
    Dc = D // 128
    v3 = values.reshape(V, Dc, 128)
    out = pl.pallas_call(
        _spmm_kernel,
        grid=(V // Tv,),
        in_specs=[
            pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),       # ell_src tile
            pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # weights tile
            pl.BlockSpec(memory_space=pl.ANY),        # values (HBM)
        ],
        out_specs=pl.BlockSpec((Tv, Dc, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, Dc, 128), values.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Tv, Dc, 128), values.dtype),
            pltpu.SemaphoreType.DMA((2, Tv)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * V * deg * D,
            bytes_accessed=V * deg * D * values.dtype.itemsize
            + V * D * values.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ell_src, weights, v3)
    return out.reshape(V, D)[:, :D_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ell_spmm(weights, values, ell_src, interpret):
    return _spmm_forward(weights, values, ell_src, interpret)


def _ell_spmm_fwd(weights, values, ell_src, interpret):
    return _spmm_forward(weights, values, ell_src, interpret), \
        (weights, values, ell_src)


def _ell_spmm_bwd(interpret, res, g):
    weights, values, ell_src = res
    # dw[v,j] = <g[v], values[src[v,j]]>; dvalues[s] += sum w[v,j] g[v]
    dw = jnp.einsum("vd,vjd->vj", g, values[ell_src])
    contrib = weights[..., None] * g[:, None, :]          # [V, deg, D]
    dvalues = jnp.zeros_like(values).at[ell_src].add(contrib)
    return dw.astype(weights.dtype), dvalues, None


_ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


def ell_spmm(weights: jax.Array, values: jax.Array, ell_src: jax.Array,
             ell_mask: jax.Array) -> jax.Array:
    """Weighted neighbour aggregation; masked slots contribute zero."""
    w = jnp.where(ell_mask, weights, 0.0).astype(jnp.float32)
    return _ell_spmm(w, values, ell_src, _interpret())


# --- ell_max ----------------------------------------------------------------


def _max_kernel(src_ref, mask_ref, values_ref, out_ref, vbuf, sems):
    """Masked segment-MAX over in-neighbours: same per-row DMA structure as
    _spmm_kernel with a max-accumulate; rows with no valid in-edges emit
    exactly zero (the segment tier's third reduction, reference.py
    ell_aggregate mode='max')."""
    Tv, deg = mask_ref.shape

    def dma(slot, r, j):
        return pltpu.make_async_copy(
            values_ref.at[src_ref[r, j]], vbuf.at[slot, r], sems.at[slot, r])

    def start_col(j):
        slot = j % 2
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).start(), c)[1], 0)

    start_col(0)
    maskf = mask_ref[:]                   # [Tv, deg] float 0/1
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    acc = jnp.full(out_ref.shape, _NEG, jnp.float32)
    for j in range(deg):                  # static unroll
        slot = j % 2
        if j + 1 < deg:
            start_col(j + 1)
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).wait(), c)[1], 0)
        mj = jnp.sum(jnp.where(col_ids == j, maskf, 0.0), axis=1,
                     keepdims=True)                          # [Tv, 1]
        cand = jnp.where(mj[..., None] > 0,
                         vbuf[slot].astype(jnp.float32), _NEG)
        acc = jnp.maximum(acc, cand)
    any_valid = jnp.sum(maskf, axis=1, keepdims=True) > 0    # [Tv, 1]
    acc = jnp.where(any_valid[..., None], acc, 0.0)
    out_ref[:] = acc.astype(out_ref.dtype)


def _max_forward(values, ell_src, maskf, interpret):
    values, D_orig = _pad_lanes(values)
    V, D = values.shape
    deg = ell_src.shape[1]
    Tv = _node_tile(V)
    Dc = D // 128
    v3 = values.reshape(V, Dc, 128)
    out = pl.pallas_call(
        _max_kernel,
        grid=(V // Tv,),
        in_specs=[
            pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),       # ell_src tile
            pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # mask tile (f32)
            pl.BlockSpec(memory_space=pl.ANY),        # values (HBM)
        ],
        out_specs=pl.BlockSpec((Tv, Dc, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, Dc, 128), values.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Tv, Dc, 128), values.dtype),
            pltpu.SemaphoreType.DMA((2, Tv)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=V * deg * D,
            bytes_accessed=(V * deg * D + V * D) * values.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ell_src, maskf, v3)
    return out.reshape(V, D)[:, :D_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ell_max(values, ell_src, maskf, interpret):
    return _max_forward(values, ell_src, maskf, interpret)


def _ell_max_fwd(values, ell_src, maskf, interpret):
    out = _max_forward(values, ell_src, maskf, interpret)
    return out, (values, ell_src, maskf, out)


def _ell_max_bwd(interpret, res, g):
    values, ell_src, maskf, out = res
    # subgradient: route g[v] to the slots achieving the max (split equally
    # among ties, matching jnp.max's gather-based vjp convention of picking
    # contributions via equality; exact ties are measure-zero for real data)
    gathered = values[ell_src]                               # [V, deg, D]
    is_max = ((gathered == out[:, None, :])
              & (maskf[..., None] > 0)).astype(values.dtype)
    nmax = jnp.maximum(is_max.sum(axis=1, keepdims=True), 1.0)
    contrib = is_max / nmax * g[:, None, :]
    dvalues = jnp.zeros_like(values).at[ell_src].add(contrib)
    return dvalues, None, None


_ell_max.defvjp(_ell_max_fwd, _ell_max_bwd)


def ell_max(values: jax.Array, ell_src: jax.Array,
            ell_mask: jax.Array) -> jax.Array:
    """Masked segment-max over in-neighbours (Pallas kernel; rows with no
    valid in-edges emit zero)."""
    return _ell_max(values, ell_src, ell_mask.astype(jnp.float32),
                    _interpret())


# --- ell_sddmm --------------------------------------------------------------


def _sddmm_kernel(src_ref, q_ref, k_ref, out_ref, kbuf, sems):
    """q_ref: VMEM [Tv, dk]; k_ref: HBM [V, dk]; out_ref: VMEM [Tv, deg].

    Neighbour loop Python-unrolled; per-slot logits kept as SSA columns and
    concatenated into ONE aligned store (Mosaic rejects dynamic minor-dim
    column stores)."""
    Tv, deg = out_ref.shape

    def dma(slot, r, j):
        return pltpu.make_async_copy(
            k_ref.at[src_ref[r, j]], kbuf.at[slot, r], sems.at[slot, r])

    def start_col(j):
        slot = j % 2
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).start(), c)[1], 0)

    start_col(0)
    q = q_ref[:]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    acc = jnp.zeros((Tv, deg), jnp.float32)
    for j in range(deg):                  # static unroll
        slot = j % 2
        if j + 1 < deg:
            start_col(j + 1)
        jax.lax.fori_loop(0, Tv, lambda r, c: (dma(slot, r, j).wait(), c)[1], 0)
        lj = jnp.sum(q * kbuf[slot], axis=-1, keepdims=True)  # [Tv, 1]
        # scatter into column j by one-hot broadcast (no lane-dim stores)
        acc = acc + lj * (col_ids == j).astype(jnp.float32)
    out_ref[:] = acc


def _sddmm_forward(q, k, ell_src, interpret):
    q, _ = _pad_lanes(q)
    k, _ = _pad_lanes(k)
    V, dk = q.shape
    deg = ell_src.shape[1]
    Tv = _node_tile(V)
    return pl.pallas_call(
        _sddmm_kernel,
        grid=(V // Tv,),
        in_specs=[
            pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Tv, dk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # k (HBM)
        ],
        out_specs=pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, deg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, Tv, dk), q.dtype),
            pltpu.SemaphoreType.DMA((2, Tv)),
        ],
        interpret=interpret,
    )(ell_src, q, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ell_sddmm(q, k, ell_src, interpret):
    return _sddmm_forward(q, k, ell_src, interpret)


def _ell_sddmm_fwd(q, k, ell_src, interpret):
    return _sddmm_forward(q, k, ell_src, interpret), (q, k, ell_src)


def _ell_sddmm_bwd(interpret, res, g):
    q, k, ell_src = res
    dq = jnp.einsum("vj,vjd->vd", g, k[ell_src])
    dk = jnp.zeros_like(k).at[ell_src].add(g[..., None] * q[:, None, :])
    return dq.astype(q.dtype), dk, None


_ell_sddmm.defvjp(_ell_sddmm_fwd, _ell_sddmm_bwd)


def ell_sddmm(q: jax.Array, k: jax.Array, ell_src: jax.Array,
              ell_mask: jax.Array) -> jax.Array:
    logits = _ell_sddmm(q.astype(jnp.float32), k.astype(jnp.float32),
                        ell_src, _interpret())
    return jnp.where(ell_mask, logits, 0.0)


# --- ell_softmax ------------------------------------------------------------


def _softmax_kernel(x_ref, mask_ref, out_ref):
    x = jnp.where(mask_ref[:] > 0, x_ref[:], _NEG)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - jnp.maximum(m, _NEG / 2))
    e = jnp.where(mask_ref[:] > 0, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out_ref[:] = jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)


def _softmax_forward(logits, maskf, interpret):
    V, deg = logits.shape
    Tv = _node_tile(V)
    return pl.pallas_call(
        _softmax_kernel,
        grid=(V // Tv,),
        in_specs=[
            pl.BlockSpec((Tv, deg), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tv, deg), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tv, deg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, deg), jnp.float32),
        interpret=interpret,
    )(logits, maskf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ell_softmax(logits, maskf, interpret):
    return _softmax_forward(logits, maskf, interpret)


def _ell_softmax_fwd(logits, maskf, interpret):
    alpha = _softmax_forward(logits, maskf, interpret)
    return alpha, (alpha,)


def _ell_softmax_bwd(interpret, res, g):
    (alpha,) = res
    # softmax jacobian per row: dl = alpha * (g - <alpha, g>); masked slots
    # have alpha == 0 so their cotangent vanishes automatically.
    dl = alpha * (g - jnp.sum(alpha * g, axis=-1, keepdims=True))
    return dl, None


_ell_softmax.defvjp(_ell_softmax_fwd, _ell_softmax_bwd)


def ell_softmax(logits: jax.Array, ell_mask: jax.Array) -> jax.Array:
    """Masked row softmax (Pallas kernel, trainable via custom_vjp — the
    backward uses the standard softmax jacobian on the saved alpha)."""
    return _ell_softmax(logits.astype(jnp.float32),
                        ell_mask.astype(jnp.float32), _interpret())
