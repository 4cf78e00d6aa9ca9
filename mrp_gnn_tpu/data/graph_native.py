"""ctypes bridge to the native C++ graph-plan builder (native/graphbuild.cc).

Dynamic-topology batches (DataConfig.mobility > 0) rebuild the GraphBatch
every step; at swarm scale that host work sits on the input-pipeline
critical path, so it gets a native implementation alongside the renderer
(data/native.py). Built on first use with g++ (cached .so next to the
source); plain C ABI + ctypes — no pybind11 in this environment. Falls back
to the numpy builder in graph.py when no toolchain is available; both
produce bit-identical plans (tests/test_graph_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "graphbuild.cc")
_LIB = os.path.join(os.path.dirname(_SRC), "libgraphbuild.so")
_lock = threading.Lock()
_lib = None
_failed = False

_ERRORS = {
    -1: "edge capacity exceeded (raise max_edges)",
    -2: "in-degree capacity exceeded (raise max_degree)",
    -3: "tile-pair capacity exceeded (raise max_bsp_pairs)",
    -4: "bad shapes (S*N > max_nodes or max_nodes % tile != 0)",
}


def _build() -> bool:
    for flags in (["-O3", "-march=native", "-fopenmp"], ["-O3"]):
        try:
            subprocess.run(["g++", *flags, "-shared", "-fPIC", "-o", _LIB,
                            _SRC], check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            continue
    return False


# Subprocess smoke call (see _native_loader): 1 scene x 2 robots within
# radius over 8 node slots exercises the real entry point end-to-end.
_SMOKE = """
import sys, ctypes
import numpy as np
lib = ctypes.CDLL(sys.argv[1])
lib.mrp_build_plan.restype = ctypes.c_int
vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
pos = np.array([0.0, 1.0], np.float64)
es = np.zeros(64, np.int32); ed = np.zeros(64, np.int32)
em = np.zeros(64, np.uint8)
ell_s = np.zeros(8 * 8, np.int32); ell_m = np.zeros(8 * 8, np.uint8)
pd = np.zeros(4, np.int32); ps = np.zeros(4, np.int32)
fi = np.zeros(4, np.int32); la = np.zeros(4, np.int32)
ne = np.zeros(1, np.int32)
rc = lib.mrp_build_plan(vp(pos), 1, 2, 1, ctypes.c_double(10.0),
                        8, 64, 8, 4, 8,
                        vp(es), vp(ed), vp(em), vp(ell_s), vp(ell_m),
                        vp(pd), vp(ps), vp(fi), vp(la), vp(ne))
assert rc == 0 and ne[0] == 2, (rc, int(ne[0]))
"""


def _load():
    from mrp_gnn_tpu.data._native_loader import load_verified
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        lib = load_verified(_LIB, _SRC, _build, _SMOKE)
        if lib is None:
            _failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mrp_build_plan.restype = ctypes.c_int
        lib.mrp_build_plan.argtypes = [
            f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            i32p, i32p, u8p, i32p, u8p, i32p, i32p, i32p, i32p,
            np.ctypeslib.ndpointer(np.int32, shape=(1,)),
        ]
        lib.mrp_build_partition_plan.restype = ctypes.c_int
        lib.mrp_build_partition_plan.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p, ctypes.c_int, ctypes.c_int,
            i32p, i32p, u8p, u8p,
            i32p, i32p, i32p, i32p, u8p,
            i32p, u8p,
            i32p, i32p, i32p, i32p,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def batch_from_positions_native(scene_positions, radius, max_nodes,
                                max_edges, max_degree, max_bsp_pairs,
                                max_expanded_pairs=None):
    """Native counterpart of graph.batch_from_positions' numpy path.

    Returns a GraphBatch, or None when the native library is unavailable or
    the inputs are outside its fast-path shape (heterogeneous team sizes
    fall back to numpy). Positions may be [N] baseline offsets or [N, d]
    coordinates (matching graph.positions_radius_edges).
    """
    lib = _load()
    if lib is None:
        return None
    pos = [np.asarray(p, np.float64) for p in scene_positions]
    if (not pos or any(p.ndim not in (1, 2) for p in pos)
            or len({p.shape for p in pos}) != 1):
        return None
    dim = 1 if pos[0].ndim == 1 else int(pos[0].shape[1])
    from mrp_gnn_tpu.graph import GraphBatch

    S, N = len(pos), pos[0].shape[0]
    tile = 0
    for t in (128, 256, 64, 32, 16, 8):
        if max_nodes % t == 0:
            tile = t
            break
    if tile == 0:
        return None
    max_deg = max(_round_up(max_degree, 8), 8)
    nt = max_nodes // tile
    if max_bsp_pairs is None:
        # No padding requested: compute the exact plan twice is wasteful, so
        # size generously and trim after (the arrays are tiny).
        cap_pairs = nt * nt
    else:
        cap_pairs = max_bsp_pairs

    p_all = np.ascontiguousarray(np.stack(pos))
    edge_src = np.zeros(max_edges, np.int32)
    edge_dst = np.zeros(max_edges, np.int32)
    edge_mask = np.zeros(max_edges, np.uint8)
    ell_src = np.zeros((max_nodes, max_deg), np.int32)
    ell_mask = np.zeros((max_nodes, max_deg), np.uint8)
    pd = np.zeros(cap_pairs, np.int32)
    ps = np.zeros(cap_pairs, np.int32)
    fi = np.zeros(cap_pairs, np.int32)
    la = np.zeros(cap_pairs, np.int32)
    n_out = np.zeros(1, np.int32)
    rc = lib.mrp_build_plan(p_all.reshape(-1), S, N, dim, float(radius),
                            max_nodes, max_edges,
                            max_deg, cap_pairs, tile, edge_src, edge_dst,
                            edge_mask, ell_src.reshape(-1),
                            ell_mask.reshape(-1), pd, ps, fi, la, n_out)
    if rc == -4:
        return None  # shape outside the native fast path -> numpy fallback
    if rc != 0:
        raise ValueError(f"native graph builder: {_ERRORS.get(rc, rc)}")
    if max_bsp_pairs is None:  # trim inert padding for parity with numpy
        # every dst tile emits exactly one last=1 (diagonal fallback), so
        # the final real pair is the last nonzero of `la`.
        real = int(np.nonzero(la)[0][-1]) + 1
        pd, ps, fi, la = pd[:real], ps[:real], fi[:real], la[:real]
    # Past the kernels' 128-column unroll cap the square plan is unusable
    # (graph.build_graph_batch builds none) — drop it for numpy parity and
    # derive the row-expanded plan from the SAME ELL arrays instead (pure
    # numpy, graph.build_expanded_bsp, bit-parity by construction).
    expanded = None
    if max_deg > 128:
        from mrp_gnn_tpu.graph import build_expanded_bsp
        if max_expanded_pairs is not None:
            expanded = build_expanded_bsp(ell_src, ell_mask.astype(bool),
                                          tile,
                                          max_pairs=max_expanded_pairs,
                                          to_device=False)
        pd_t = ps_t = fi_t = la_t = None
        pd = ps = fi = la = None
    else:
        # Transposed (src-major) plan for the backward kernels: derived
        # from the dst-major arrays in numpy (graph.derive_bsp_pairs_t), so
        # the C++ builder needs no mirror implementation and bit-parity is
        # by construction.
        from mrp_gnn_tpu.graph import bsp_pairs_t_capacity, derive_bsp_pairs_t
        pd_t, ps_t, fi_t, la_t = derive_bsp_pairs_t(
            pd, ps, la, nt, max_pairs=bsp_pairs_t_capacity(max_bsp_pairs, nt))

    n_nodes = S * N
    node_mask = np.arange(max_nodes) < n_nodes
    node_scene = np.zeros(max_nodes, np.int32)
    node_scene[:n_nodes] = np.repeat(np.arange(S, dtype=np.int32), N)
    # numpy-backed leaves: the builder runs on the input-pipeline thread, so
    # the host->device copy is left to jit dispatch (pipelined with compute)
    # instead of paying a synchronous jnp.asarray here (~5 ms/batch at
    # 8k-node swarm scale — 4x the native plan build itself).
    return GraphBatch(
        edge_src=edge_src,
        edge_dst=edge_dst,
        node_mask=node_mask,
        edge_mask=edge_mask.astype(bool),
        node_scene=node_scene,
        n_nodes=np.int32(n_nodes),
        n_edges=np.int32(int(n_out[0])),
        ell_src=ell_src,
        ell_mask=ell_mask.astype(bool),
        bsp_pair_dst=pd,
        bsp_pair_src=ps,
        bsp_pair_first=fi,
        bsp_pair_last=la,
        bsp_pair_dst_t=pd_t,
        bsp_pair_src_t=ps_t,
        bsp_pair_first_t=fi_t,
        bsp_pair_last_t=la_t,
        bsp_tile=tile,
        scene_adj=None,
        scene_stride=0,
        bsp_expanded=expanded,
    )


_PART_ERRORS = {
    -10: "shard edge count exceeds edges_per_shard capacity",
    -11: "local in-degree exceeds ELL width capacity",
    -12: "active delta outside capacity delta set",
    -13: "per-delta request rows exceed capacity width",
    -14: "boundary edge count exceeds remote_edges capacity",
    -15: "tile pairs exceed bsp_pairs capacity",
}


def partition_plan_arrays_native(src, dst, nps, num_shards, capacities):
    """Native counterpart of parallel.partition._plan_arrays (the
    capacities-given path — the per-batch dynamic-topology hot path).

    src/dst: ONE replica's masked, replica-local, dst-sorted edge arrays.
    Returns the _plan_arrays dict (numpy arrays, including the derived
    transposed BSP plan), or None when the native library is unavailable or
    the inputs fall outside the native fast path; raises ValueError on
    capacity violations (mirroring the numpy builder's messages).
    """
    lib = _load()
    if lib is None or capacities is None:
        return None
    P = num_shards
    bsp_tile = next((t for t in (128, 64, 32, 16, 8) if nps % t == 0), 0)
    if bsp_tile and not capacities.bsp_pairs:
        return None  # numpy computes its own pair cap in this edge case
    E_s = int(capacities.edges_per_shard)
    L = int(capacities.ell_width)
    Er = int(capacities.remote_edges)
    deltas = np.ascontiguousarray(capacities.deltas, np.int32)
    drows = np.ascontiguousarray(capacities.delta_rows, np.int32)
    if deltas.size == 0:  # ndpointer needs a real buffer even when unused
        deltas = np.zeros(1, np.int32)
        drows = np.zeros(1, np.int32)
        n_deltas = 0
    else:
        n_deltas = int(deltas.size)
    total_b = max(int(np.sum(capacities.delta_rows)), 1)
    bsp_pairs = int(capacities.bsp_pairs) if bsp_tile else 0

    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    src_g = np.zeros((P, E_s), np.int32)
    dst_l = np.zeros((P, E_s), np.int32)
    m = np.zeros((P, E_s), np.uint8)
    lm = np.zeros((P, E_s), np.uint8)
    send_idx = np.zeros((P, total_b), np.int32)
    remote_dst = np.zeros((P, Er), np.int32)
    remote_src_g = np.zeros((P, Er), np.int32)
    remote_slot = np.zeros((P, Er), np.int32)
    remote_mask = np.zeros((P, Er), np.uint8)
    ell_src = np.zeros((P, nps, L), np.int32)
    ell_mask = np.zeros((P, nps, L), np.uint8)
    n_pd = max(bsp_pairs, 1)
    pd = np.zeros((P, n_pd), np.int32)
    ps = np.zeros((P, n_pd), np.int32)
    fi = np.zeros((P, n_pd), np.int32)
    la = np.zeros((P, n_pd), np.int32)

    rc = lib.mrp_build_partition_plan(
        src, dst, int(src.size), nps, P, E_s, L, Er, n_deltas, deltas, drows,
        bsp_tile, bsp_pairs,
        src_g.reshape(-1), dst_l.reshape(-1), m.reshape(-1), lm.reshape(-1),
        send_idx.reshape(-1), remote_dst.reshape(-1),
        remote_src_g.reshape(-1), remote_slot.reshape(-1),
        remote_mask.reshape(-1), ell_src.reshape(-1), ell_mask.reshape(-1),
        pd.reshape(-1), ps.reshape(-1), fi.reshape(-1), la.reshape(-1))
    if rc != 0:
        raise ValueError(f"native partition plan builder: "
                         f"{_PART_ERRORS.get(rc, rc)}")

    out = dict(
        src_global=src_g, dst_local=dst_l, mask=m.astype(bool),
        local_mask=lm.astype(bool), send_idx=send_idx,
        remote_dst=remote_dst, remote_src_global=remote_src_g,
        remote_slot=remote_slot, remote_mask=remote_mask.astype(bool),
        ell_src=ell_src, ell_mask=ell_mask.astype(bool),
        deltas=tuple(capacities.deltas),
        delta_rows=tuple(capacities.delta_rows),
        bsp_tile=bsp_tile,
        bsp_pair_dst=None, bsp_pair_src=None,
        bsp_pair_first=None, bsp_pair_last=None,
        bsp_pair_dst_t=None, bsp_pair_src_t=None,
        bsp_pair_first_t=None, bsp_pair_last_t=None,
    )
    if bsp_tile:
        from mrp_gnn_tpu.graph import derive_bsp_pairs_t
        nt = nps // bsp_tile
        per_t = [derive_bsp_pairs_t(pd[p], ps[p], la[p], nt,
                                    max_pairs=bsp_pairs + nt)
                 for p in range(P)]
        out.update(
            bsp_pair_dst=pd, bsp_pair_src=ps,
            bsp_pair_first=fi, bsp_pair_last=la,
            bsp_pair_dst_t=np.stack([t[0] for t in per_t]),
            bsp_pair_src_t=np.stack([t[1] for t in per_t]),
            bsp_pair_first_t=np.stack([t[2] for t in per_t]),
            bsp_pair_last_t=np.stack([t[3] for t in per_t]),
        )
    return out
