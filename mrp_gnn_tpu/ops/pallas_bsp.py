"""Tile-block-sparse Pallas TPU kernels for fused graph attention.

The contract's standalone kernel tier (BASELINE.json:5, SURVEY.md section
2.2) redesigned around how the TPU actually moves bytes. The round-1 ELL
kernels gathered one source row per DMA descriptor (pallas_ell.py) — correct
but latency-bound at ~128 tiny descriptors per step. These kernels instead
exploit tile-level sparsity (the robot-graph structure: scene locality,
communication radius):

- the node axis is cut into tiles of GraphBatch.bsp_tile (128 = MXU/VPU
  width); a host-side pair plan (graph.build_bsp_pairs) lists, per
  destination tile, the few source tiles its in-edges touch;
- VALUE ROWS STREAM AS WHOLE-TILE SEQUENTIAL DMAs (the fastest thing HBM
  can do) — one [Ts, D_tile] copy per (dst, src) tile pair, no per-row
  descriptors;
- per-edge selection happens on-chip: the [Tv, Ts] edge-weight matrix A of
  a tile pair is built from the ELL columns by one-hot compares (VPU) and
  applied as a single MXU matmul acc += A @ V_tile;
- total HBM traffic is num_pairs * Ts * D bytes — proportional to TOUCHED
  TILES, beating the per-edge gather roofline (E * D) by ~deg / pairs-per-
  tile (7x for fully-connected 8-robot scenes, ~4x for radius-4 swarms).

Two kernels (alpha is [V, deg] — negligible traffic between them):
  bsp_attention_weights: SDDMM + masked segment-softmax fused; logits live
    in VMEM scratch across the pair group and never visit HBM.
  bsp_spmm: attention-weighted aggregation with the A @ V_tile scheme.

Backward passes ride the SAME tile-pair machinery (round 3): ``dalpha`` is a
generic block-sparse SDDMM over the dst-major plan (one [Tv,D]x[D,Ts] MXU
matmul per pair + the one-hot column selection), and ``dvalues``/``dk`` are
the TRANSPOSED SpMM — ``out[s] += A(pair)^T @ g[dst]`` accumulated per
SOURCE tile over a src-major re-sort of the pair plan
(graph.derive_bsp_pairs_t). Training therefore streams whole-tile DMAs in
both directions; the old XLA gather+scatter math remains only as the
fallback when a batch carries no transposed plan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _out_vma(*xs) -> frozenset:
    """Union of the operands' varying-manual-axes: inside a check_vma=True
    shard_map, pallas_call out_shapes must declare how the output varies."""
    vma = set()
    for x in xs:
        vma |= set(getattr(jax.typeof(x), "vma", None) or ())
    return frozenset(vma)


def _sds(shape, dtype, vma: frozenset):
    return (jax.ShapeDtypeStruct(shape, dtype, vma=vma) if vma
            else jax.ShapeDtypeStruct(shape, dtype))



_FORI_UNROLL = 32  # partial-unroll factor for the rolled column loop


def _col_loop(deg, body, init):
    """Iterate the one-hot column build: static unroll up to 64 columns
    (fastest — Mosaic schedules the straight-line chain; chip A/B at deg 40:
    unroll 257M vs fori 213M edges/s, +21%), lax.fori_loop past that. The
    unrolled form allocates its temporaries on the Mosaic stack, which
    scales with the unroll depth (~2 x Tv x Ts x 4 bytes ~ 123 KB per
    column at T=128) and blows the 16 MB scoped-vmem limit near width 128
    (seen on chip at the expanded width-128 plan); 64 columns cap the stack
    at ~8 MB, safe under every feature-tile/dtype combination. Past that,
    the loop runs MANUALLY partially unrolled: each fori trip statically
    runs _FORI_UNROLL bodies at dynamic column offsets (~4 MB stack at 32),
    with a full-unroll epilogue for the remainder. Round-5 interleaved chip
    sweep at deg-255/W=128 (BASELINE.md): rolled 265M/92M edges/s
    (fwd/train) -> u=8 371M/133M -> u=32 390M/140M, outputs bit-identical;
    Mosaic's own loop lowering only supports unroll=1 or full, hence the
    manual form. Loop-dynamic ``j`` is fine: the body only ever COMPARES
    against j (one-hot reduces), never indexes the lane dimension with it.
    """
    if deg <= 64:
        c = init
        for j in range(deg):
            c = body(j, c)
        return c
    u = _FORI_UNROLL
    main = (deg // u) * u if u > 1 else deg
    if u > 1:
        # MANUAL partial unroll: Mosaic's loop lowering only supports
        # unroll=1 or full, so each fori trip statically runs u bodies at
        # dynamic column offsets (compares only — never lane indexing).
        def trip(t, c):
            base = t * u
            for cc in range(u):
                c = body(base + cc, c)
            return c
        c = jax.lax.fori_loop(0, main // u, trip, init, unroll=False)
    else:
        c = jax.lax.fori_loop(0, main, body, init, unroll=False)
    for j in range(main, deg):
        c = body(j, c)
    return c


# --- kernel 1: fused SDDMM + segment softmax --------------------------------


def _weights_kernel(pd_ref, ps_ref, first_ref, last_ref,
                    q_ref, k_ref, src_ref, mask_ref, out_ref, logit_acc):
    """One (dst tile, src tile) pair step.

    q_ref [Tv, dk] (dst tile), k_ref [Ts, dk] (src tile), src_ref/mask_ref
    [Tv, deg] ELL columns of the dst tile, out_ref [Tv, deg] alpha,
    logit_acc [Tv, deg] f32 scratch persisting across the pair group.
    """
    p = pl.program_id(0)
    Ts = k_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts

    # Q @ K_tile^T: every (dst row, src-in-tile) score in one MXU matmul.
    # f32 inputs need HIGHEST precision: the MXU's default f32 mode rounds
    # through bf16 passes (~1e-2 relative error on logits).
    qk = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [Tv, Ts]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]

    acc0 = jnp.where(first_ref[p] == 1, jnp.zeros((Tv, deg), jnp.float32),
                     logit_acc[:])

    def col_w(j, acc):
        # column j of src via one-hot reduce (width-1 lane slices are not
        # tile-aligned on TPU; reductions are)
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        sel = (col == srcj).astype(jnp.float32)        # [Tv, Ts]
        lj = jnp.sum(qk * sel, axis=1, keepdims=True)  # [Tv, 1]
        return acc + lj * (dcol == j).astype(jnp.float32)

    acc = _col_loop(deg, col_w, acc0)
    logit_acc[:] = acc

    @pl.when(last_ref[p] == 1)
    def _softmax():
        m = mask_ref[:] > 0
        x = jnp.where(m, acc, _NEG)
        mx = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - jnp.maximum(mx, _NEG / 2))
        e = jnp.where(m, e, 0.0)
        den = jnp.sum(e, axis=-1, keepdims=True)
        out_ref[:] = jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)


def _weights_forward(q, k, ell_src, ell_mask, pd, ps, fi, la, T, interpret):
    V, dk = q.shape
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((T, dk), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # q (dst tile)
            pl.BlockSpec((T, dk), lambda p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # k (src tile)
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_mask tile
        ],
        out_specs=pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, deg), jnp.float32)],
    )
    return pl.pallas_call(
        _weights_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((V, deg), jnp.float32,
                       _out_vma(q, k, ell_src, ell_mask)),
        interpret=interpret,
    )(pd, ps, fi, la, q, k, ell_src, ell_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def _bsp_weights(q, k, ell_src, ell_mask, pd, ps, fi, la, pdt, pst, fit, lat,
                 T, interpret):
    return _weights_forward(q, k, ell_src, ell_mask, pd, ps, fi, la, T,
                            interpret)


def _bsp_weights_fwd(q, k, ell_src, ell_mask, pd, ps, fi, la,
                     pdt, pst, fit, lat, T, interpret):
    alpha = _weights_forward(q, k, ell_src, ell_mask, pd, ps, fi, la, T,
                             interpret)
    return alpha, (q, k, ell_src, ell_mask, alpha,
                   pd, ps, fi, la, pdt, pst, fit, lat)


def _bsp_weights_bwd(T, interpret, res, g):
    q, k, src, mask_i, alpha, pd, ps, fi, la, pdt, pst, fit, lat = res
    mask = mask_i > 0
    # softmax backward: dlogits = alpha * (g - sum_j alpha_j g_j)
    dlog = alpha * (g - jnp.sum(alpha * g, axis=-1, keepdims=True))
    dlog = jnp.where(mask, dlog, 0.0)
    nones = (None,) * 10
    if pdt is None:
        kg = k[src]                                    # [V, deg, dk]
        dq = jnp.einsum("vj,vjd->vd", dlog, kg)
        dk_ = jnp.zeros_like(k).at[src].add(dlog[..., None] * q[:, None, :])
        return (dq.astype(q.dtype), dk_.astype(k.dtype)) + nones
    # dq[v] = sum_j dlog[v,j] k[src[v,j]]  == forward SpMM(dlog, k);
    # dk[s] = sum_{v,j: src=s} dlog[v,j] q[v]  == transposed SpMM(dlog, q).
    dq = _spmm_forward(dlog, k, src, pd, ps, fi, la, T, interpret)
    dk_ = _spmm_t_forward(dlog, q, src, pdt, pst, fit, lat, T, interpret,
                          out_dtype=k.dtype, out_rows=k.shape[0])
    return (dq.astype(q.dtype), dk_) + nones


_bsp_weights.defvjp(_bsp_weights_fwd, _bsp_weights_bwd)


# --- kernel 2: block-sparse SpMM ---------------------------------------------


def _spmm_kernel(pd_ref, ps_ref, first_ref, last_ref,
                 alpha_ref, src_ref, v_ref, out_ref, acc_ref):
    """Grid (feature tiles, pairs) — pairs fastest. v_ref [Ts, Tf] streams
    as one whole-tile DMA; A = one-hot(src) * alpha applied on the MXU."""
    p = pl.program_id(1)
    Ts = v_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]
    alpha = alpha_ref[:]

    def col_a(j, A):
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        aj = jnp.sum(jnp.where(dcol == j, alpha, 0.0), axis=1, keepdims=True)
        return A + aj * (col == srcj).astype(jnp.float32)

    A = _col_loop(deg, col_a, jnp.zeros((Tv, Ts), jnp.float32))
    # bf16 values ride the MXU natively — pin DEFAULT precision explicitly:
    # fp32 contract precision on bf16 operands is rejected by Mosaic, and a
    # global jax_default_matmul_precision=highest would otherwise leak in.
    # f32 values need HIGHEST (default f32 matmul rounds through bf16). A is
    # one-hot scaled alpha: each output element sums at most deg products.
    prec = (jax.lax.Precision.DEFAULT
            if jnp.dtype(v_ref.dtype).name == "bfloat16"
            else jax.lax.Precision.HIGHEST)
    contrib = jnp.dot(A.astype(v_ref.dtype), v_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=prec)  # [Tv, Tf]
    acc = jnp.where(first_ref[p] == 1, contrib, acc_ref[:] + contrib)
    acc_ref[:] = acc

    @pl.when(last_ref[p] == 1)
    def _emit():
        out_ref[:] = acc.astype(out_ref.dtype)


def _pick_feat_tile(D: int, interpret: bool, dtype=None):
    # Widest tile wins (chip sweep, BASELINE.md): the one-hot A build runs
    # once per (pair, feature tile), so fewer feature tiles amortize it.
    # Budgeted by BYTES, not columns: the kernels hold value/out/acc blocks
    # double-buffered in scoped VMEM, and f32 at 2048 columns blows the
    # 16 MB scoped limit (seen on chip in the transposed-SpMM backward) —
    # cap the tile at 4 KB rows (2048 cols bf16, 1024 cols f32).
    width_cap = 4096 // (jnp.dtype(dtype).itemsize if dtype is not None else 2)
    for t in (2048, 1024, 512, 256, 128):
        if t <= width_cap and D % t == 0:
            return t
    return D if interpret else None


def _pad_lanes(x, mult=128):
    d = x.shape[-1]
    pad = (-d) % mult
    if pad == 0:
        return x, d
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]), d


def _spmm_forward(alpha, values, ell_src, pd, ps, fi, la, T, interpret):
    values, D_orig = _pad_lanes(values)
    D = values.shape[1]
    # Output rows follow the DESTINATION side (alpha/ell_src): equals the
    # value rows for square plans, V*rows for row-expanded rectangular ones.
    V = alpha.shape[0]
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    Tf = _pick_feat_tile(D, interpret, values.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(D // Tf, num_pairs),
        in_specs=[
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # alpha (dst tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (ps[p], f),
                         memory_space=pltpu.VMEM),     # values (src tile)
        ],
        out_specs=pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la:
                               (pd[p], f), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, Tf), jnp.float32)],
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((V, D), values.dtype,
                       _out_vma(alpha, values, ell_src)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * T * D,
            bytes_accessed=(num_pairs * T * D + V * D) * values.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pd, ps, fi, la, alpha, ell_src, values)
    return out[:, :D_orig] if D_orig != D else out


# --- backward kernels: block-sparse SDDMM + transposed SpMM ------------------
#
# The adjoint of the forward SpMM's linear map out[v] = sum_j A-selected
# alpha[v,j] * values[src[v,j]] decomposes into two kernels that reuse the
# tile-pair machinery exactly:
#   dalpha[v,j] = <g[v], values[src[v,j]]>   (dst-major plan: per pair, one
#     G_tile @ V_tile^T MXU matmul, then the one-hot column selection)
#   dvalues[s]  = sum_{v,j: src=s} w[v,j] * g[v]   (SRC-major plan
#     derive_bsp_pairs_t: per pair, A^T @ G_tile accumulated per src tile)
# Both use the forward's selection (pairs of the plan), so together they are
# the EXACT vjp of the forward kernel — bit-consistent even on padding slots.


def _mm_precision(dtype) -> jax.lax.Precision:
    # bf16 rides the MXU natively; f32 needs HIGHEST (default f32 matmul
    # rounds through bf16 passes).
    return (jax.lax.Precision.DEFAULT
            if jnp.dtype(dtype).name == "bfloat16"
            else jax.lax.Precision.HIGHEST)


def _edge_dot(a_ref, b_ref):
    """[Tv, D] x [Ts, D] -> [Tv, Ts] f32 edge-score matmul for the SDDMM
    kernels. Same-dtype operands ride the MXU natively (bf16 products are
    exact into the f32 accumulator, so a pure-bf16 dot needs no upcast and
    no f32 VMEM temporaries); MIXED dtypes are equalized per block with a
    VPU cast in VMEM — keeping the cast inside the kernel so the bf16
    operand still streams HBM at bf16 width instead of paying a whole-array
    f32 copy outside."""
    if a_ref.dtype == b_ref.dtype:
        return jax.lax.dot_general(a_ref[:], b_ref[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_mm_precision(a_ref.dtype))
    return jax.lax.dot_general(a_ref[:].astype(jnp.float32),
                               b_ref[:].astype(jnp.float32),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _sddmm_kernel(pd_ref, ps_ref, first_ref, last_ref,
                  a_ref, b_ref, src_ref, out_ref, acc_ref):
    """out[v, j] = <a[v], b[src[v, j]]> over the dst-major pair plan.

    a_ref [Tv, D] (dst tile), b_ref [Ts, D] (src tile, whole-tile DMA),
    src_ref [Tv, deg] ELL columns, out_ref/acc_ref [Tv, deg] f32."""
    p = pl.program_id(0)
    Ts = b_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts

    ab = _edge_dot(a_ref, b_ref)                                   # [Tv, Ts]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]

    acc0 = jnp.where(first_ref[p] == 1, jnp.zeros((Tv, deg), jnp.float32),
                     acc_ref[:])

    def col_l(j, acc):
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        sel = (col == srcj).astype(jnp.float32)
        lj = jnp.sum(ab * sel, axis=1, keepdims=True)
        return acc + lj * (dcol == j).astype(jnp.float32)

    acc = _col_loop(deg, col_l, acc0)
    acc_ref[:] = acc

    @pl.when(last_ref[p] == 1)
    def _emit():
        out_ref[:] = acc


def _sddmm_forward(a, b, ell_src, pd, ps, fi, la, T, interpret):
    # Mixed dtypes (f32 cotangent x bf16 values in the backward) are cast
    # per block INSIDE the kernel — never equalized here, which would
    # materialize an f32 copy of the whole values array in HBM and double
    # its stream bytes.
    # VMEM guard: the kernel holds [T, D] blocks of BOTH operands,
    # double-buffered across grid steps. The edge dot decomposes over the
    # feature axis, so chunk wide D and sum the partial SDDMMs.
    max_d = 4096 if (a.dtype == jnp.float32
                     or b.dtype == jnp.float32) else 8192
    if a.shape[1] > max_d:
        mid = (a.shape[1] // 2 + 127) // 128 * 128
        return (_sddmm_forward(a[:, :mid], b[:, :mid], ell_src, pd, ps, fi,
                               la, T, interpret)
                + _sddmm_forward(a[:, mid:], b[:, mid:], ell_src, pd, ps,
                                 fi, la, T, interpret))
    a, _ = _pad_lanes(a)
    b, _ = _pad_lanes(b)
    V, D = a.shape
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((T, D), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # a (dst tile)
            pl.BlockSpec((T, D), lambda p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # b (src tile)
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
        ],
        out_specs=pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, deg), jnp.float32)],
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((V, deg), jnp.float32, _out_vma(a, b, ell_src)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * T * D,
            bytes_accessed=(num_pairs * T * D + V * D) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pd, ps, fi, la, a, b, ell_src)


def _spmm_t_kernel(pd_ref, ps_ref, first_ref, last_ref,
                   alpha_ref, src_ref, x_ref, out_ref, acc_ref):
    """Transposed SpMM: out[s] += A(pair)^T @ x[dst] per SRC-major pair.

    Grid (feature tiles, pairs) — pairs fastest, grouped by src tile.
    alpha_ref/src_ref [Tv, deg] (dst tile of the pair), x_ref [Tv, Tf]
    (dst tile), out_ref/acc_ref [Ts, Tf] (src tile)."""
    p = pl.program_id(1)
    Tv, deg = src_ref.shape
    Ts = out_ref.shape[0]
    base = ps_ref[p] * Ts
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]
    alpha = alpha_ref[:]

    def col_a(j, A):
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        aj = jnp.sum(jnp.where(dcol == j, alpha, 0.0), axis=1, keepdims=True)
        return A + aj * (col == srcj).astype(jnp.float32)

    A = _col_loop(deg, col_a, jnp.zeros((Tv, Ts), jnp.float32))
    contrib = jax.lax.dot_general(
        A.astype(x_ref.dtype), x_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(x_ref.dtype))       # [Ts, Tf]
    acc = jnp.where(first_ref[p] == 1, contrib, acc_ref[:] + contrib)
    acc_ref[:] = acc

    @pl.when(last_ref[p] == 1)
    def _emit():
        out_ref[:] = acc.astype(out_ref.dtype)


def _spmm_t_forward(alpha, x, ell_src, pdt, pst, fit, lat, T, interpret,
                    out_dtype=None, out_rows=None):
    """out[s] = sum_{v,j: ell_src[v,j]=s, pair in plan} alpha[v,j] * x[v].

    out_rows: SOURCE-side row count of the output — defaults to x's rows
    (square plans); must be passed for rectangular row-expanded plans where
    the dst side has V*rows rows but sources live in the original [V) space.
    """
    x, D_orig = _pad_lanes(x)
    D = x.shape[1]
    V = out_rows if out_rows is not None else x.shape[0]
    deg = ell_src.shape[1]
    num_pairs = pdt.shape[0]
    Tf = _pick_feat_tile(D, interpret, x.dtype)
    out_dtype = out_dtype or x.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(D // Tf, num_pairs),
        in_specs=[
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # alpha (dst tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (pd[p], f),
                         memory_space=pltpu.VMEM),     # x (dst tile)
        ],
        out_specs=pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la:
                               (ps[p], f), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, Tf), jnp.float32)],
    )
    out = pl.pallas_call(
        _spmm_t_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((V, D), out_dtype, _out_vma(alpha, x, ell_src)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * T * D,
            bytes_accessed=(num_pairs * T * D + V * D) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pdt, pst, fit, lat, alpha, ell_src, x)
    return out[:, :D_orig] if D_orig != D else out


def _spmm_t2_kernel(pd_ref, ps_ref, first_ref, last_ref,
                    w1_ref, w2_ref, src_ref, x1_ref, x2_ref,
                    out1_ref, out2_ref, acc1_ref, acc2_ref):
    """DUAL transposed SpMM over one src-major sweep with a SHARED one-hot
    selection: out1[s] += A1(pair)^T @ x1[dst] and out2[s] += A2(pair)^T @
    x2[dst], A1/A2 built from w1/w2 over the same (col == srcj) compare.
    The fused-attention backward needs exactly this pair (dvalues from
    alpha x g, dk from dlog x q) — running them in one sweep builds the
    selection once instead of twice, the per-column compute bottleneck.

    BENCH-ONLY (round 5): a 6-round interleaved chip A/B measured this
    kernel at 0.955x +/- 0.005 of the two-separate-sweeps form under the
    ROLLED column loop, and dead-even (1.001x) after the manual partial
    unroll landed (BASELINE.md round 5) — no win either way, so the
    backwards dispatch the simpler separate sweeps; the kernel stays
    correct (interpret-tested) and measurable.

    Grid (x1 feature tiles, pairs) — pairs fastest, grouped by src tile.
    x2 is narrow (attention dim) and rides whole per step; its accumulator
    is recomputed identically on every feature-tile sweep and its output
    block rewritten with the same values (negligible bytes — required
    because revisited Pallas output windows do not persist across grid
    sweeps on TPU)."""
    p = pl.program_id(1)
    Tv, deg = src_ref.shape
    Ts = out1_ref.shape[0]
    base = ps_ref[p] * Ts
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]

    def col_a(j, carry):
        A1, A2 = carry
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        sel = (col == srcj).astype(jnp.float32)
        a1j = jnp.sum(jnp.where(dcol == j, w1, 0.0), axis=1, keepdims=True)
        a2j = jnp.sum(jnp.where(dcol == j, w2, 0.0), axis=1, keepdims=True)
        return (A1 + a1j * sel, A2 + a2j * sel)

    zero = jnp.zeros((Tv, Ts), jnp.float32)
    A1, A2 = _col_loop(deg, col_a, (zero, zero))
    c1 = jax.lax.dot_general(
        A1.astype(x1_ref.dtype), x1_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(x1_ref.dtype))        # [Ts, Tf]
    c2 = jax.lax.dot_general(
        A2.astype(x2_ref.dtype), x2_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(x2_ref.dtype))        # [Ts, D2]
    first = first_ref[p] == 1
    acc1 = jnp.where(first, c1, acc1_ref[:] + c1)
    acc2 = jnp.where(first, c2, acc2_ref[:] + c2)
    acc1_ref[:] = acc1
    acc2_ref[:] = acc2

    @pl.when(last_ref[p] == 1)
    def _emit():
        out1_ref[:] = acc1.astype(out1_ref.dtype)
        out2_ref[:] = acc2.astype(out2_ref.dtype)


def _spmm_t2_forward(w1, x1, w2, x2, ell_src, pdt, pst, fit, lat, T,
                     interpret, out_rows, out1_dtype, out2_dtype):
    """(out1, out2) = two transposed SpMMs over one shared src-major sweep.
    Falls back to two separate sweeps when x2 is too wide to ride whole
    alongside an x1 feature tile in the VMEM block budget."""
    if x2.shape[1] > 512:
        return (_spmm_t_forward(w1, x1, ell_src, pdt, pst, fit, lat, T,
                                interpret, out_dtype=out1_dtype,
                                out_rows=out_rows),
                _spmm_t_forward(w2, x2, ell_src, pdt, pst, fit, lat, T,
                                interpret, out_dtype=out2_dtype,
                                out_rows=out_rows))
    x1, D1_orig = _pad_lanes(x1)
    x2, D2_orig = _pad_lanes(x2)
    D1, D2 = x1.shape[1], x2.shape[1]
    V = out_rows
    deg = ell_src.shape[1]
    num_pairs = pdt.shape[0]
    Tf = _pick_feat_tile(D1, interpret, x1.dtype)
    vma = _out_vma(w1, x1, w2, x2, ell_src)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(D1 // Tf, num_pairs),
        in_specs=[
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # w1 (dst tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # w2 (dst tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (pd[p], f),
                         memory_space=pltpu.VMEM),     # x1 (dst tile)
            pl.BlockSpec((T, D2), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # x2 (dst tile)
        ],
        out_specs=[
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (ps[p], f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D2), lambda f, p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((T, Tf), jnp.float32),
                        pltpu.VMEM((T, D2), jnp.float32)],
    )
    out1, out2 = pl.pallas_call(
        _spmm_t2_kernel,
        grid_spec=grid_spec,
        out_shape=(_sds((V, D1), out1_dtype, vma),
                   _sds((V, D2), out2_dtype, vma)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * T * (D1 + D2),
            bytes_accessed=(num_pairs * T * D1 + V * D1) * x1.dtype.itemsize
            + (num_pairs * T * D2 + V * D2) * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pdt, pst, fit, lat, w1, w2, ell_src, x1, x2)
    if D1_orig != D1:
        out1 = out1[:, :D1_orig]
    if D2_orig != D2:
        out2 = out2[:, :D2_orig]
    return out1, out2


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _bsp_spmm(alpha, values, ell_src, pd, ps, fi, la, pdt, pst, fit, lat,
              T, interpret):
    return _spmm_forward(alpha, values, ell_src, pd, ps, fi, la, T, interpret)


def _bsp_spmm_fwd(alpha, values, ell_src, pd, ps, fi, la, pdt, pst, fit, lat,
                  T, interpret):
    out = _spmm_forward(alpha, values, ell_src, pd, ps, fi, la, T, interpret)
    return out, (alpha, values, ell_src, pd, ps, fi, la, pdt, pst, fit, lat)


def _bsp_spmm_bwd(T, interpret, res, g):
    alpha, values, src, pd, ps, fi, la, pdt, pst, fit, lat = res
    nones = (None,) * 8
    if pdt is None:
        # No transposed plan on this batch: legacy XLA gather/scatter math.
        dalpha = jnp.einsum("vd,vjd->vj", g, values[src])
        dvalues = jnp.zeros_like(values).at[src].add(
            alpha[..., None].astype(values.dtype)
            * g[:, None, :].astype(values.dtype))
        return (dalpha.astype(alpha.dtype), dvalues, None) + nones
    dalpha = _sddmm_forward(g, values, src, pd, ps, fi, la, T, interpret)
    dvalues = _spmm_t_forward(alpha, g, src, pdt, pst, fit, lat, T,
                              interpret, out_dtype=values.dtype,
                              out_rows=values.shape[0])
    return (dalpha.astype(alpha.dtype), dvalues, None) + nones


_bsp_spmm.defvjp(_bsp_spmm_fwd, _bsp_spmm_bwd)


# --- kernel 3: one-pass fused attention (online softmax) ---------------------
#
# SDDMM + softmax + SpMM in a single sweep over the tile-pair plan. Where the
# two-kernel path builds the one-hot selection matrix twice (once per kernel)
# and round-trips alpha through HBM, this kernel keeps a flash-attention-style
# running (max, denominator, accumulator) triple in VMEM scratch across each
# destination tile's pair group and rescales on the fly — logits never leave
# the chip, each (pair, feature-tile) step touches HBM only for the one
# whole-tile value DMA.


def _fused_kernel(pd_ref, ps_ref, first_ref, last_ref,
                  q_ref, k_ref, src_ref, mask_ref, v_ref, out_ref,
                  acc_ref, m_ref, l_ref):
    """Grid (feature tiles, pairs) — pairs fastest, grouped by dst tile.

    q_ref [Tv, dk] (dst tile, pre-scaled by 1/sqrt(dk)), k_ref [Ts, dk]
    (src tile), src_ref/mask_ref [Tv, deg] ELL columns, v_ref [Ts, Tf]
    source values; scratch: acc [Tv, Tf] f32 weighted sum, m/l [Tv, 128]
    f32 running max / softmax denominator (column 0 is live; the full lane
    width keeps the layout tile-aligned).
    """
    p = pl.program_id(1)
    Ts = k_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts

    # Q @ K_tile^T on the MXU: qk[v, c] IS the logit of edge (c+base -> v)
    # whenever that edge exists; existence/multiplicity comes from E below.
    qk = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [Tv, Ts]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]
    maskf = (mask_ref[:] > 0).astype(jnp.float32)

    # E[v, c] = multiplicity of edge (c+base -> v) among the VALID ELL slots
    # (duplicate edges sum correctly; masked slots contribute nothing).
    def col_e(j, E):
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        mj = jnp.sum(jnp.where(dcol == j, maskf, 0.0), axis=1, keepdims=True)
        return E + mj * (col == srcj).astype(jnp.float32)

    E = _col_loop(deg, col_e, jnp.zeros((Tv, Ts), jnp.float32))

    first = first_ref[p] == 1
    m_old = jnp.where(first, jnp.full((Tv, 1), _NEG, jnp.float32),
                      m_ref[:, :1])
    l_old = jnp.where(first, jnp.zeros((Tv, 1), jnp.float32), l_ref[:, :1])
    acc_old = jnp.where(first, jnp.zeros_like(acc_ref),
                        acc_ref[:])

    qk_m = jnp.where(E > 0, qk, _NEG)
    m_new = jnp.maximum(m_old, jnp.max(qk_m, axis=-1, keepdims=True))
    mg = jnp.maximum(m_new, _NEG / 2)  # guard: rows with no edges anywhere
    a = jnp.exp(qk_m - mg) * E                       # [Tv, Ts]
    scale = jnp.exp(m_old - mg)                      # [Tv, 1]
    l_new = l_old * scale + jnp.sum(a, axis=-1, keepdims=True)
    prec = (jax.lax.Precision.DEFAULT
            if jnp.dtype(v_ref.dtype).name == "bfloat16"
            else jax.lax.Precision.HIGHEST)
    contrib = jnp.dot(a.astype(v_ref.dtype), v_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=prec)                # [Tv, Tf]
    acc_new = acc_old * scale + contrib

    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
    acc_ref[:] = acc_new

    @pl.when(last_ref[p] == 1)
    def _emit():
        out_ref[:] = jnp.where(l_new > 0, acc_new / jnp.maximum(l_new, 1e-30),
                               0.0).astype(out_ref.dtype)


def _fused_forward(q, k, values, ell_src, ell_mask, pd, ps, fi, la, T,
                   interpret):
    values, D_orig = _pad_lanes(values)
    V, D = values.shape
    dk = q.shape[1]
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    Tf = _pick_feat_tile(D, interpret, values.dtype)
    mask_i = ell_mask.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(D // Tf, num_pairs),
        in_specs=[
            pl.BlockSpec((T, dk), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # q (dst tile)
            pl.BlockSpec((T, dk), lambda f, p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # k (src tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_mask tile
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (ps[p], f),
                         memory_space=pltpu.VMEM),     # values (src tile)
        ],
        out_specs=pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la:
                               (pd[p], f), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, Tf), jnp.float32),
                        pltpu.VMEM((T, 128), jnp.float32),
                        pltpu.VMEM((T, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((V, D), values.dtype,
                       _out_vma(q, k, ell_src, ell_mask, values)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * (T * D + T * dk),
            bytes_accessed=(num_pairs * T * D + V * D) * values.dtype.itemsize,
            transcendentals=num_pairs * T * T,
        ),
        interpret=interpret,
    )(pd, ps, fi, la, q, k, ell_src, mask_i, values)
    return out[:, :D_orig] if D_orig != D else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def _bsp_fused(q, k, values, ell_src, ell_mask, pd, ps, fi, la,
               pdt, pst, fit, lat, T, interpret):
    return _fused_forward(q, k, values, ell_src, ell_mask, pd, ps, fi, la, T,
                          interpret)


def _bsp_fused_fwd(q, k, values, ell_src, ell_mask, pd, ps, fi, la,
                   pdt, pst, fit, lat, T, interpret):
    out = _fused_forward(q, k, values, ell_src, ell_mask, pd, ps, fi, la, T,
                         interpret)
    return out, (q, k, values, ell_src, ell_mask,
                 pd, ps, fi, la, pdt, pst, fit, lat)


def _bsp_fused_bwd(T, interpret, res, g):
    """Backward of the one-pass kernel, on the same tile-pair machinery.

    Recomputes alpha via the two-kernel weights pass (dk is tiny, so the
    recompute streams far fewer bytes than saving [V, deg] from the fused
    kernel would), then: dalpha = block-sparse SDDMM(g, values); dvalues =
    transposed SpMM(alpha, g); softmax backward on-chip in XLA (pure
    elementwise); dq = SpMM(dlog, k); dk = transposed SpMM(dlog, q). Falls
    back to XLA gather/scatter math when the batch has no transposed plan."""
    q, k, values, src, mask_i, pd, ps, fi, la, pdt, pst, fit, lat = res
    mask = mask_i > 0
    nones = (None,) * 10
    if pdt is None:
        kg = k[src]                                        # [V, deg, dk]
        logits = jnp.einsum("vd,vjd->vj", q, kg)
        x = jnp.where(mask, logits, _NEG)
        mx = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.where(mask, jnp.exp(x - jnp.maximum(mx, _NEG / 2)), 0.0)
        den = jnp.sum(e, axis=-1, keepdims=True)
        alpha = jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)
        dalpha = jnp.einsum("vd,vjd->vj", g.astype(jnp.float32),
                            values[src].astype(jnp.float32))
        dvalues = jnp.zeros_like(values).at[src].add(
            alpha[..., None].astype(values.dtype)
            * g[:, None, :].astype(values.dtype))
        dlog = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=-1,
                                         keepdims=True))
        dlog = jnp.where(mask, dlog, 0.0)
        dq = jnp.einsum("vj,vjd->vd", dlog, kg)
        dk_ = jnp.zeros_like(k).at[src].add(dlog[..., None] * q[:, None, :])
        return (dq.astype(q.dtype), dk_.astype(k.dtype), dvalues) + nones

    # ONE dual sweep recomputes the logits AND computes dalpha, sharing
    # the selection build (the per-column compute bottleneck); softmax on
    # the [V, deg] logits is cheap XLA elementwise — identical math to the
    # weights kernel's in-kernel softmax.
    mask_f = mask_i > 0
    logits, dalpha = _sddmm2_forward(q, k, g, values, src, pd, ps, fi, la,
                                     T, interpret)
    x = jnp.where(mask_f, logits, _NEG)
    mx = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.where(mask_f, jnp.exp(x - jnp.maximum(mx, _NEG / 2)), 0.0)
    den = jnp.sum(e, axis=-1, keepdims=True)
    alpha = jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)
    dvalues = _spmm_t_forward(alpha, g, src, pdt, pst, fit, lat, T,
                              interpret, out_dtype=values.dtype,
                              out_rows=values.shape[0])
    dlog = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=-1, keepdims=True))
    dlog = jnp.where(mask, dlog, 0.0)
    dq = _spmm_forward(dlog, k, src, pd, ps, fi, la, T, interpret)
    # dvalues/dk deliberately run as TWO separate transposed sweeps: the
    # dual-sweep kernel (_spmm_t2, kept benchmarkable) measured 0.955x of
    # the separate form in a 6-round interleaved chip A/B (BASELINE.md
    # round 5) — the tuple-carry column loop costs more than the shared
    # selection saves.
    dk_ = _spmm_t_forward(dlog, q, src, pdt, pst, fit, lat, T, interpret,
                          out_dtype=k.dtype, out_rows=k.shape[0])
    return (dq.astype(q.dtype), dk_, dvalues) + nones


_bsp_fused.defvjp(_bsp_fused_fwd, _bsp_fused_bwd)


# --- dual block-sparse SDDMM (one sweep, shared selection) -------------------
#
# The fused-attention backward needs TWO edge dots over the SAME plan:
# logits[v,j] = <q[v], k[src]> (alpha recompute) and dalpha[v,j] =
# <g[v], values[src]>. The selection build (srcj extraction + one-hot
# compare per column) is the compute bottleneck of each sweep and is
# identical for both — this kernel runs both dots in one pass, sharing it.


def _sddmm2_kernel(pd_ref, ps_ref, first_ref, last_ref,
                   a1_ref, b1_ref, a2_ref, b2_ref, src_ref,
                   out1_ref, out2_ref, acc1_ref, acc2_ref):
    """out1[v,j] = <a1[v], b1[src[v,j]]>, out2[v,j] = <a2[v], b2[src[v,j]]>
    over one dst-major pair sweep with a SHARED one-hot selection."""
    p = pl.program_id(0)
    Ts = b1_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts

    ab1 = _edge_dot(a1_ref, b1_ref)
    ab2 = _edge_dot(a2_ref, b2_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]

    first = first_ref[p] == 1
    zero = jnp.zeros((Tv, deg), jnp.float32)
    c0 = (jnp.where(first, zero, acc1_ref[:]),
          jnp.where(first, zero, acc2_ref[:]))

    def col2(j, carry):
        c1, c2 = carry
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        sel = (col == srcj).astype(jnp.float32)
        oh = (dcol == j).astype(jnp.float32)
        l1 = jnp.sum(ab1 * sel, axis=1, keepdims=True)
        l2 = jnp.sum(ab2 * sel, axis=1, keepdims=True)
        return (c1 + l1 * oh, c2 + l2 * oh)

    acc1, acc2 = _col_loop(deg, col2, c0)
    acc1_ref[:] = acc1
    acc2_ref[:] = acc2

    @pl.when(last_ref[p] == 1)
    def _emit():
        out1_ref[:] = acc1
        out2_ref[:] = acc2


def _sddmm2_forward(a1, b1, a2, b2, ell_src, pd, ps, fi, la, T, interpret):
    """(out1, out2) = two SDDMMs over one shared plan sweep. Falls back to
    two separate sweeps when the COMBINED operand blocks would not fit the
    VMEM block budget: the kernel holds both pairs' [T, d] blocks (plus
    f32 upcast copies for mixed-dtype pairs) simultaneously, so the budget
    is on d1 + d2 — gated per-row-byte against the single-sweep precedent
    (two [T, 4096] f32 blocks = 32 KB/row, the proven _sddmm_forward
    chunking threshold)."""

    def _pair_row_bytes(a, b):
        # in-kernel element width: native when dtypes match (bf16 dots run
        # without upcast, _edge_dot), f32 copies otherwise
        es = a.dtype.itemsize if a.dtype == b.dtype else 4
        dp = (max(a.shape[1], b.shape[1]) + 127) // 128 * 128  # lane pad
        return 2 * dp * es                                     # two blocks

    if _pair_row_bytes(a1, b1) + _pair_row_bytes(a2, b2) > 32768:
        return (_sddmm_forward(a1, b1, ell_src, pd, ps, fi, la, T,
                               interpret),
                _sddmm_forward(a2, b2, ell_src, pd, ps, fi, la, T,
                               interpret))
    a1, _ = _pad_lanes(a1)
    b1, _ = _pad_lanes(b1)
    a2, _ = _pad_lanes(a2)
    b2, _ = _pad_lanes(b2)
    Vd = a1.shape[0]
    d1, d2 = a1.shape[1], a2.shape[1]
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((T, d1), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # a1 (dst tile)
            pl.BlockSpec((T, d1), lambda p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # b1 (src tile)
            pl.BlockSpec((T, d2), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # a2 (dst tile)
            pl.BlockSpec((T, d2), lambda p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # b2 (src tile)
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
        ],
        out_specs=[
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, deg), lambda p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((T, deg), jnp.float32),
                        pltpu.VMEM((T, deg), jnp.float32)],
    )
    vma = _out_vma(a1, b1, a2, b2, ell_src)
    return pl.pallas_call(
        _sddmm2_kernel,
        grid_spec=grid_spec,
        out_shape=(_sds((Vd, deg), jnp.float32, vma),
                   _sds((Vd, deg), jnp.float32, vma)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * T * (d1 + d2),
            bytes_accessed=(num_pairs * T * (d1 * 4 + d2 * 2)
                            + Vd * deg * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pd, ps, fi, la, a1, b1, a2, b2, ell_src)


# --- raw block-sparse SDDMM (differentiable) ---------------------------------
#
# out[v, j] = <a[v], b[src[v, j]]> with NO softmax — the building block the
# row-expanded high-degree path composes with an XLA row softmax on the
# re-folded logits. Rectangular-safe: a (dst side) may have more rows than
# b (src side).


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _bsp_sddmm(a, b, ell_src, pd, ps, fi, la, pdt, pst, fit, lat,
               T, interpret):
    return _sddmm_forward(a, b, ell_src, pd, ps, fi, la, T, interpret)


def _bsp_sddmm_fwd(a, b, ell_src, pd, ps, fi, la, pdt, pst, fit, lat,
                   T, interpret):
    out = _sddmm_forward(a, b, ell_src, pd, ps, fi, la, T, interpret)
    return out, (a, b, ell_src, pd, ps, fi, la, pdt, pst, fit, lat)


def _bsp_sddmm_bwd(T, interpret, res, g):
    a, b, src, pd, ps, fi, la, pdt, pst, fit, lat = res
    # da[v] = sum_j g[v,j] b[src[v,j]]      (forward SpMM over the dst plan)
    # db[s] = sum_{v,j: src=s} g[v,j] a[v]  (transposed SpMM, src-major plan)
    da = _spmm_forward(g, b, src, pd, ps, fi, la, T, interpret)
    db = _spmm_t_forward(g, a, src, pdt, pst, fit, lat, T, interpret,
                         out_dtype=b.dtype, out_rows=b.shape[0])
    return (da.astype(a.dtype), db) + (None,) * 9


_bsp_sddmm.defvjp(_bsp_sddmm_fwd, _bsp_sddmm_bwd)


# --- high-degree row-expanded entry points -----------------------------------
#
# ELL widths past the kernels' 128-column unroll cap run over the row-
# expanded RECTANGULAR plan (graph.BspExpandedPlan): the [V, deg] neighbour
# list is viewed as [V*R, W<=128] and the UNCHANGED kernels run over
# (V*R dst, V src) tiles; linear aggregations reshape-sum the partials,
# attention composes expanded SDDMM -> row softmax on the re-folded
# [V, R*W] logits -> expanded SpMM -> reshape-sum. docs/kernels.md
# "Degree cap and the designed extension".


def _expand_rows(x, rows: int, width: int):
    """Row-major [V, deg] -> [V*rows, width] view (zero/False-padded tail
    columns) — THE layout contract with graph.build_expanded_bsp: the
    host-side plan builder and every trace-time consumer must reshape the
    same way or the kernels read the wrong sources."""
    return jnp.pad(x, ((0, 0), (0, rows * width - x.shape[1]))
                   ).reshape(-1, width)


def expand_ell_view(ell_src, ell_mask, rows: int, width: int):
    """Trace-time [V*R, W] view of an ELL layout matching the host-side
    layout build_expanded_bsp derived its plan from (row-major reshape of
    the [V, R*W]-padded neighbour list; pad columns are mask-False)."""
    return (_expand_rows(ell_src, rows, width),
            _expand_rows(ell_mask, rows, width))


def _expand_ell(graph):
    xp = graph.bsp_expanded
    return expand_ell_view(graph.ell_src, graph.ell_mask, xp.rows, xp.width)


def _xplan_args(xp):
    return (xp.pair_dst, xp.pair_src, xp.pair_first, xp.pair_last,
            xp.pair_dst_t, xp.pair_src_t, xp.pair_first_t, xp.pair_last_t)


def supports_expanded(graph) -> bool:
    """True when the batch carries a row-expanded high-degree plan."""
    return (graph.bsp_tile > 0 and graph.ell_src is not None
            and graph.bsp_expanded is not None)


def xp_weighted_aggregate(weights: jax.Array, values: jax.Array,
                          ell_src: jax.Array, xplan: tuple,
                          rows: int, width: int, tile: int) -> jax.Array:
    """Explicit-plan-args form of :func:`expanded_weighted_aggregate` —
    the partitioned path (parallel/fused.py) calls this with per-SHARD
    expanded plan arrays carried on EdgePartitionPlan (where no GraphBatch
    exists inside the shard_map body). weights [V, deg], 0 on masked
    slots; differentiable through the kernel custom_vjps."""
    V, deg = ell_src.shape
    src_x = _expand_rows(ell_src, rows, width)
    w_x = _expand_rows(weights.astype(jnp.float32), rows, width)
    out_x = _bsp_spmm(w_x, values, src_x, *xplan, tile,
                      _interpret())                            # [V*R, D]
    return (out_x.reshape(V, rows, -1).astype(jnp.float32).sum(axis=1)
            .astype(values.dtype))


def xp_sddmm(a: jax.Array, b: jax.Array, ell_src: jax.Array,
             xplan: tuple, rows: int, width: int, tile: int) -> jax.Array:
    """Explicit-plan-args raw expanded SDDMM: out[v, j] = <a[v],
    b[ell_src[v, j]]> for j < deg, computed over the rectangular row-
    expanded plan and re-folded to [V, deg]. Feeds the partitioned path's
    split softmax (which needs raw logits, not a normalized alpha).
    Padding columns (rank >= deg) are dropped by the slice; masked slots
    within deg carry whatever the kernel computed for slot src 0 and must
    be masked by the caller exactly like ell_sddmm's output."""
    V, deg = ell_src.shape
    src_x = _expand_rows(ell_src, rows, width)
    # Operands stream in their NATIVE dtypes — _edge_dot keeps same-dtype
    # pairs on the MXU without f32 VMEM copies and equalizes mixed pairs
    # per block; the kernel's output/accumulation is f32 either way.
    a_x = jnp.repeat(a, rows, axis=0)
    logits_x = _bsp_sddmm(a_x, b, src_x, *xplan, tile,
                          _interpret())                        # [V*R, W]
    return logits_x.reshape(V, rows * width)[:, :deg]


def expanded_weighted_aggregate(weights: jax.Array, values: jax.Array,
                                graph) -> jax.Array:
    """out[v] = sum_j weights[v, j] * values[ell_src[v, j]] for ELL widths
    past the unroll cap: expanded SpMM over the rectangular plan, then a
    reshape-sum of the R per-row partials. weights [V, deg] must already be
    0 on masked slots."""
    xp = graph.bsp_expanded
    return xp_weighted_aggregate(weights, values, graph.ell_src,
                                 _xplan_args(xp), xp.rows, xp.width,
                                 graph.bsp_tile)


def expanded_mean(values: jax.Array, graph) -> jax.Array:
    maskf = graph.ell_mask.astype(jnp.float32)
    deg = jnp.maximum(maskf.sum(axis=1, keepdims=True), 1.0)
    return expanded_weighted_aggregate(maskf / deg, values, graph)


def expanded_attention(q: jax.Array, k: jax.Array, values: jax.Array,
                       graph) -> jax.Array:
    """Edge attention for >128-degree graphs, same semantics as
    bsp_attention: scaled logits, masked segment softmax per destination,
    weighted aggregation — all three sweeps on the block-sparse kernels,
    softmax in XLA on the re-folded [V, R*W] logits (pure elementwise)."""
    interpret = _interpret()
    xp = graph.bsp_expanded
    V, deg = graph.ell_src.shape
    src_x, mask_x = _expand_ell(graph)
    scale = 1.0 / np.sqrt(q.shape[-1])
    q_x = jnp.repeat(q.astype(jnp.float32) * scale, xp.rows, axis=0)
    logits_x = _bsp_sddmm(q_x, k.astype(jnp.float32), src_x,
                          *_xplan_args(xp), graph.bsp_tile,
                          interpret)                           # [V*R, W]
    logits = logits_x.reshape(V, xp.rows * xp.width)
    mask = mask_x.reshape(V, xp.rows * xp.width)
    x = jnp.where(mask, logits, _NEG)
    mx = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(x, axis=-1, keepdims=True), _NEG / 2))
    e = jnp.where(mask, jnp.exp(x - mx), 0.0)
    den = jnp.sum(e, axis=-1, keepdims=True)
    alpha = jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)
    alpha_x = alpha.reshape(-1, xp.width)
    out_x = _bsp_spmm(alpha_x, values, src_x, *_xplan_args(xp),
                      graph.bsp_tile, interpret)               # [V*R, D]
    return (out_x.reshape(V, xp.rows, -1).astype(jnp.float32).sum(axis=1)
            .astype(values.dtype))


# --- one-pass expanded attention ---------------------------------------------
#
# The two-kernel expanded path pays the one-hot column build TWICE (chip
# split at deg-255: SDDMM 8.2 ms + SpMM 6.5 ms); this variant reuses the
# one-pass online-softmax kernel body but emits the RAW per-expanded-row
# (acc, m, l) triple instead of dividing, and a cheap XLA combine folds the
# R rows of each node into one softmax: out[v] = sum_r w_r acc_r / sum_r
# w_r l_r with w_r = exp(m_r - max_r m_r). The selection/E build runs once
# per pair instead of twice and logits never visit HBM.


def _fused_parts_kernel(pd_ref, ps_ref, first_ref, last_ref,
                        q_ref, k_ref, src_ref, mask_ref, v_ref,
                        oacc_ref, om_ref, ol_ref, acc_ref, m_ref, l_ref):
    """_fused_kernel body with raw (acc, m, l) emission (no division)."""
    p = pl.program_id(1)
    Ts = k_ref.shape[0]
    Tv, deg = src_ref.shape
    base = ps_ref[p] * Ts

    qk = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [Tv, Ts]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tv, Ts), 1) + base
    dcol = jax.lax.broadcasted_iota(jnp.int32, (Tv, deg), 1)
    src = src_ref[:]
    maskf = (mask_ref[:] > 0).astype(jnp.float32)

    def col_e(j, E):
        srcj = jnp.sum(jnp.where(dcol == j, src, 0), axis=1, keepdims=True)
        mj = jnp.sum(jnp.where(dcol == j, maskf, 0.0), axis=1, keepdims=True)
        return E + mj * (col == srcj).astype(jnp.float32)

    E = _col_loop(deg, col_e, jnp.zeros((Tv, Ts), jnp.float32))

    first = first_ref[p] == 1
    m_old = jnp.where(first, jnp.full((Tv, 1), _NEG, jnp.float32),
                      m_ref[:, :1])
    l_old = jnp.where(first, jnp.zeros((Tv, 1), jnp.float32), l_ref[:, :1])
    acc_old = jnp.where(first, jnp.zeros_like(acc_ref), acc_ref[:])

    qk_m = jnp.where(E > 0, qk, _NEG)
    m_new = jnp.maximum(m_old, jnp.max(qk_m, axis=-1, keepdims=True))
    mg = jnp.maximum(m_new, _NEG / 2)
    a = jnp.exp(qk_m - mg) * E
    scale = jnp.exp(m_old - mg)
    l_new = l_old * scale + jnp.sum(a, axis=-1, keepdims=True)
    prec = (jax.lax.Precision.DEFAULT
            if jnp.dtype(v_ref.dtype).name == "bfloat16"
            else jax.lax.Precision.HIGHEST)
    contrib = jnp.dot(a.astype(v_ref.dtype), v_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=prec)
    acc_new = acc_old * scale + contrib

    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
    acc_ref[:] = acc_new

    @pl.when(last_ref[p] == 1)
    def _emit():
        oacc_ref[:] = acc_new
        om_ref[:] = jnp.broadcast_to(m_new, om_ref.shape)
        ol_ref[:] = jnp.broadcast_to(l_new, ol_ref.shape)


def _fused_parts_forward(q, k, values, ell_src, ell_mask, pd, ps, fi, la,
                         T, interpret):
    """Raw online-softmax triple per (expanded) destination row:
    acc [Vd, D] f32, m/l [Vd, 128] f32 (column 0 live)."""
    values, D_orig = _pad_lanes(values)
    D = values.shape[1]
    Vd = q.shape[0]
    dk = q.shape[1]
    deg = ell_src.shape[1]
    num_pairs = pd.shape[0]
    Tf = _pick_feat_tile(D, interpret, values.dtype)
    mask_i = ell_mask.astype(jnp.int32)
    vma = _out_vma(q, k, ell_src, ell_mask, values)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(D // Tf, num_pairs),
        in_specs=[
            pl.BlockSpec((T, dk), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # q (dst tile)
            pl.BlockSpec((T, dk), lambda f, p, pd, ps, fi, la: (ps[p], 0),
                         memory_space=pltpu.VMEM),     # k (src tile)
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_src tile
            pl.BlockSpec((T, deg), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # ell_mask tile
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (ps[p], f),
                         memory_space=pltpu.VMEM),     # values (src tile)
        ],
        out_specs=[
            pl.BlockSpec((T, Tf), lambda f, p, pd, ps, fi, la: (pd[p], f),
                         memory_space=pltpu.VMEM),     # acc
            pl.BlockSpec((T, 128), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # m
            pl.BlockSpec((T, 128), lambda f, p, pd, ps, fi, la: (pd[p], 0),
                         memory_space=pltpu.VMEM),     # l
        ],
        scratch_shapes=[pltpu.VMEM((T, Tf), jnp.float32),
                        pltpu.VMEM((T, 128), jnp.float32),
                        pltpu.VMEM((T, 128), jnp.float32)],
    )
    acc, m, l = pl.pallas_call(
        _fused_parts_kernel,
        grid_spec=grid_spec,
        out_shape=(_sds((Vd, D), jnp.float32, vma),
                   _sds((Vd, 128), jnp.float32, vma),
                   _sds((Vd, 128), jnp.float32, vma)),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_pairs * T * (T * D + T * dk),
            bytes_accessed=(num_pairs * T * D + 5 * Vd * D)
            * values.dtype.itemsize,
            transcendentals=num_pairs * T * T,
        ),
        interpret=interpret,
    )(pd, ps, fi, la, q, k, ell_src, mask_i, values)
    return (acc[:, :D_orig] if D_orig != D else acc), m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _xp_fused(q, k, values, src_x, mask_x, pd, ps, fi, la, pdt, pst, fit,
              lat, rows, T, interpret):
    return _xp_fused_fwd(q, k, values, src_x, mask_x, pd, ps, fi, la,
                         pdt, pst, fit, lat, rows, T, interpret)[0]


def _xp_combine(acc, m, l, V, rows, out_dtype):
    """Fold the R per-expanded-row online-softmax triples of each node into
    one softmax: rows with l == 0 (no edges) carry m == _NEG and weight 0."""
    D = acc.shape[-1]
    accf = acc.reshape(V, rows, D)
    mf = m[:, 0].reshape(V, rows)
    lf = l[:, 0].reshape(V, rows)
    mx = jnp.maximum(jnp.max(mf, axis=1, keepdims=True), _NEG / 2)
    w = jnp.exp(mf - mx)                                   # [V, rows]
    num = jnp.sum(w[..., None] * accf, axis=1)             # [V, D]
    den = jnp.sum(w * lf, axis=1, keepdims=True)           # [V, 1]
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30),
                     0.0).astype(out_dtype)


def _xp_fused_fwd(q, k, values, src_x, mask_x, pd, ps, fi, la,
                  pdt, pst, fit, lat, rows, T, interpret):
    scale = 1.0 / np.sqrt(q.shape[-1])
    q_x = jnp.repeat(q.astype(jnp.float32) * scale, rows, axis=0)
    acc, m, l = _fused_parts_forward(q_x, k.astype(jnp.float32), values,
                                     src_x, mask_x, pd, ps, fi, la, T,
                                     interpret)
    out = _xp_combine(acc, m, l, q.shape[0], rows, values.dtype)
    return out, (q, k, values, src_x, mask_x,
                 pd, ps, fi, la, pdt, pst, fit, lat)


def _xp_fused_bwd(rows, T, interpret, res, g):
    """Backward = the two-kernel expanded composition's math (alpha
    recompute via the raw SDDMM + folded softmax, then the four plan
    sweeps), exactly as autodiff of expanded_attention produces."""
    q, k, values, src_x, mask_i, pd, ps, fi, la, pdt, pst, fit, lat = res
    V, dk = q.shape
    W = src_x.shape[1]
    scale = 1.0 / np.sqrt(dk)
    q_x = jnp.repeat(q.astype(jnp.float32) * scale, rows, axis=0)
    k32 = k.astype(jnp.float32)
    # The cotangent streams in its NATIVE dtype (bf16 in training — the
    # forward's output dtype is values.dtype), exactly like the square
    # path's backward: an f32 upcast here would double the bytes of the two
    # dominant backward streams (the dual sweep's second dst operand and
    # the transposed SpMM's per-pair dst blocks). Products are exact into
    # the kernels' f32 accumulators either way.
    g_x = jnp.repeat(g, rows, axis=0)                      # [V*R, D]
    # ONE dual sweep: logits recompute + dalpha, shared selection build.
    # (q/k stay f32 so the logits recompute matches the forward's
    # online-softmax precision bit-for-bit on the alpha it rebuilds.)
    logits_x, dalpha_x = _sddmm2_forward(q_x, k32, g_x, values, src_x,
                                         pd, ps, fi, la, T, interpret)
    mask = (mask_i > 0).reshape(V, rows * W)
    x = jnp.where(mask, logits_x.reshape(V, rows * W), _NEG)
    mx = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), _NEG / 2)
    e = jnp.where(mask, jnp.exp(x - mx), 0.0)
    den = jnp.sum(e, axis=-1, keepdims=True)
    alpha = jnp.where(den > 0, e / jnp.maximum(den, 1e-30), 0.0)
    alpha_x = alpha.reshape(-1, W)
    # Two separate transposed sweeps, NOT the dual _spmm_t2 kernel: the
    # 6-round interleaved chip A/B measured the dual at 0.955x of this
    # form (BASELINE.md round 5).
    dvalues = _spmm_t_forward(alpha_x, g_x, src_x, pdt, pst, fit, lat, T,
                              interpret, out_dtype=values.dtype,
                              out_rows=values.shape[0])
    dalpha = dalpha_x.reshape(V, rows * W)
    dlog = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=-1, keepdims=True))
    dlog = jnp.where(mask, dlog, 0.0)
    dlog_x = dlog.reshape(-1, W)
    dq_x = _spmm_forward(dlog_x, k, src_x, pd, ps, fi, la, T, interpret)
    dq = dq_x.reshape(V, rows, dk).astype(jnp.float32).sum(axis=1) * scale
    dk_ = _spmm_t_forward(dlog_x, q_x, src_x, pdt, pst, fit, lat, T,
                          interpret, out_dtype=k.dtype, out_rows=k.shape[0])
    return (dq.astype(q.dtype), dk_, dvalues) + (None,) * 10


_xp_fused.defvjp(_xp_fused_fwd, _xp_fused_bwd)


def expanded_attention_fused(q: jax.Array, k: jax.Array, values: jax.Array,
                             graph) -> jax.Array:
    """One-pass edge attention for >128-degree graphs: same semantics as
    :func:`expanded_attention`, one kernel sweep instead of two (the
    selection build runs once per pair and logits never visit HBM), with a
    cheap XLA combine folding each node's R expanded-row online-softmax
    triples. The dispatch path for high-degree attention."""
    xp = graph.bsp_expanded
    src_x, mask_x = _expand_ell(graph)
    return _xp_fused(q, k, values, src_x, mask_x.astype(jnp.int32),
                     *_xplan_args(xp), xp.rows, graph.bsp_tile, _interpret())


# --- public entry ------------------------------------------------------------


def supports(graph, values_dim: int | None = None) -> bool:
    """True when the batch carries a BSP plan the kernels can run.

    Degree cap: the kernels build the one-hot selection matrix with a
    STATIC unroll over ELL columns — O(deg) VPU work per (pair, feature
    tile) and O(deg) Mosaic program size. Past ~128 in-neighbours the
    build dominates the streamed-bytes win and compile times balloon, so
    very-high-degree graphs take the XLA gather path instead."""
    return (graph.bsp_tile > 0 and graph.ell_src is not None
            and graph.bsp_pair_dst is not None
            and graph.ell_src.shape[1] <= 128)


def _plan_args(graph):
    return (graph.bsp_pair_dst, graph.bsp_pair_src,
            graph.bsp_pair_first, graph.bsp_pair_last,
            graph.bsp_pair_dst_t, graph.bsp_pair_src_t,
            graph.bsp_pair_first_t, graph.bsp_pair_last_t)


def bsp_weighted_aggregate(weights: jax.Array, values: jax.Array,
                           graph) -> jax.Array:
    """out[v] = sum_j weights[v, j] * values[ell_src[v, j]] over the tile-
    pair plan. weights must already be 0 on masked slots (e.g. softmax
    output, or mask/deg for mean aggregation)."""
    return _bsp_spmm(weights.astype(jnp.float32), values, graph.ell_src,
                     *_plan_args(graph), graph.bsp_tile, _interpret())


def bsp_mean(values: jax.Array, graph) -> jax.Array:
    """Mean aggregation over in-neighbours via the block-sparse SpMM."""
    maskf = graph.ell_mask.astype(jnp.float32)
    deg = jnp.maximum(maskf.sum(axis=1, keepdims=True), 1.0)
    return bsp_weighted_aggregate(maskf / deg, values, graph)


def bsp_attention(q: jax.Array, k: jax.Array, values: jax.Array,
                  graph) -> jax.Array:
    """Fused edge attention over the tile-pair plan (two-kernel form).

    Drop-in for the ELL attention composition (dispatch._compose_ell_attention
    semantics): logits scaled by 1/sqrt(dk), masked segment softmax over each
    destination's in-edges, attention-weighted aggregation of source values.
    Kept alongside :func:`bsp_attention_fused` because the partitioned path
    (parallel/fused.py) needs the explicit alpha for its split softmax.
    """
    interpret = _interpret()
    scale = 1.0 / np.sqrt(q.shape[-1])
    qs = (q.astype(jnp.float32) * scale)
    plan = _plan_args(graph)
    mask_i = graph.ell_mask.astype(jnp.int32)
    alpha = _bsp_weights(qs, k.astype(jnp.float32), graph.ell_src, mask_i,
                         *plan, graph.bsp_tile, interpret)
    return _bsp_spmm(alpha, values, graph.ell_src, *plan,
                     graph.bsp_tile, interpret)


def bsp_attention_fused(q: jax.Array, k: jax.Array, values: jax.Array,
                        graph) -> jax.Array:
    """One-pass fused edge attention: SDDMM + online softmax + SpMM in a
    single sweep over the tile-pair plan (kernel 3). Same semantics as
    :func:`bsp_attention`; alpha never visits HBM and the one-hot selection
    build runs once per pair instead of twice."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    return _bsp_fused(q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                      values, graph.ell_src, graph.ell_mask,
                      *_plan_args(graph), graph.bsp_tile, _interpret())
