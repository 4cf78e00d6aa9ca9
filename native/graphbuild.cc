// Native graph/partition-plan builder for dynamic swarm batches.
//
// The dynamic-topology pipeline (DataConfig.mobility > 0) rebuilds the
// GraphBatch every step from per-scene robot positions: radius-connectivity
// edge lists, the dst-sorted padded edge list, the ELL neighbour-list view,
// and the tile-pair plan for the block-sparse Pallas kernels. At swarm scale
// that host-side work sits on the input-pipeline critical path, so — like
// the reference's data-loading tier (SURVEY.md section 2.1 "Graph builder /
// batcher", reconstructed; reference mount empty) — it gets a native
// implementation. Plain C ABI + ctypes (no pybind11 in this environment);
// must produce BIT-IDENTICAL plans to the numpy path in
// mrp_gnn_tpu/graph.py (tests/test_graph_native.py).
//
// Layout contract (mirrors graph.build_graph_batch):
//   - scenes are contiguous node blocks: scene s node i -> slot s*N + i;
//   - per scene, edges are emitted in (dst, src) ascending order (numpy
//     np.nonzero row-major order), so the global edge list is dst-sorted
//     without any further sort;
//   - ELL slot of an edge = its rank within the destination's segment;
//   - pair plan grouped by dst tile ascending, src tiles ascending, padded
//     with inert (first=0, last=0) pairs pointing at the last tile.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Error codes (mirrored in mrp_gnn_tpu/data/graph_native.py).
enum {
  MRP_OK = 0,
  MRP_ERR_EDGE_OVERFLOW = -1,
  MRP_ERR_DEG_OVERFLOW = -2,
  MRP_ERR_PAIR_OVERFLOW = -3,
  MRP_ERR_BAD_SHAPE = -4,
};

// Distance of robots i, j in one scene's position block ([N, dim],
// row-major). dim == 1 keeps the historical |pi - pj| form (bit-identical
// to the numpy path's norm over one component in every tested regime);
// dim > 1 matches np.linalg.norm: sqrt of the summed squares.
static inline double robot_dist(const double* p, int dim, int i, int j) {
  if (dim == 1) return std::fabs(p[i] - p[j]);
  double acc = 0.0;
  for (int d = 0; d < dim; ++d) {
    const double delta = p[(size_t)i * dim + d] - p[(size_t)j * dim + d];
    acc += delta * delta;
  }
  return std::sqrt(acc);
}

// Build the full per-batch plan from per-scene robot positions.
//
// pos[S*N*dim]: positions, scene-major then robot-major ([S, N, dim]).
// Outputs must be pre-allocated by the caller at the documented capacities;
// this function zero-fills padding.
int mrp_build_plan(const double* pos, int S, int N, int dim, double radius,
                   int max_nodes, int max_edges, int max_deg, int max_pairs,
                   int tile,
                   int32_t* edge_src, int32_t* edge_dst, uint8_t* edge_mask,
                   int32_t* ell_src, uint8_t* ell_mask,
                   int32_t* pair_dst, int32_t* pair_src,
                   int32_t* pair_first, int32_t* pair_last,
                   int32_t* n_edges_out) {
  if (S <= 0 || N <= 0 || dim <= 0 || S * N > max_nodes
      || max_nodes % tile != 0)
    return MRP_ERR_BAD_SHAPE;

  // Pass 1: per-scene edge counts (parallel), then a prefix sum.
  std::vector<int> counts(S, 0);
#pragma omp parallel for schedule(static)
  for (int s = 0; s < S; ++s) {
    const double* p = pos + (size_t)s * N * dim;
    int c = 0;
    for (int i = 0; i < N; ++i)
      for (int j = 0; j < N; ++j)
        if (i != j && robot_dist(p, dim, i, j) <= radius) ++c;
    counts[s] = c;
  }
  std::vector<int> offs(S + 1, 0);
  for (int s = 0; s < S; ++s) offs[s + 1] = offs[s] + counts[s];
  const int n_edges = offs[S];
  if (n_edges > max_edges) return MRP_ERR_EDGE_OVERFLOW;

  // Pass 2: emit edges in (dst, src) order per scene — global list is then
  // dst-sorted because scene node blocks are contiguous ascending.
  std::memset(edge_src, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(edge_dst, 0, (size_t)max_edges * sizeof(int32_t));
  std::memset(edge_mask, 0, (size_t)max_edges);
#pragma omp parallel for schedule(static)
  for (int s = 0; s < S; ++s) {
    const double* p = pos + (size_t)s * N * dim;
    int w = offs[s];
    const int base = s * N;
    for (int i = 0; i < N; ++i) {       // dst-major
      for (int j = 0; j < N; ++j) {     // src ascending within the segment
        if (i == j || robot_dist(p, dim, i, j) > radius) continue;
        edge_src[w] = base + j;
        edge_dst[w] = base + i;
        edge_mask[w] = 1;
        ++w;
      }
    }
  }

  // ELL view: slot = rank within the destination segment. Segments are the
  // (dst ascending) runs emitted above, so ranks are just positions within
  // each dst's run. Parallel over scenes (each owns its node rows).
  std::memset(ell_src, 0, (size_t)max_nodes * max_deg * sizeof(int32_t));
  std::memset(ell_mask, 0, (size_t)max_nodes * max_deg);
  int deg_overflow = 0;
#pragma omp parallel for schedule(static) reduction(max : deg_overflow)
  for (int s = 0; s < S; ++s) {
    int e = offs[s];
    const int end = offs[s + 1];
    while (e < end) {
      const int d = edge_dst[e];
      int run = e;
      while (run < end && edge_dst[run] == d) ++run;
      const int deg = run - e;
      if (deg > max_deg) {
        deg_overflow = deg;
      } else {
        for (int r = e; r < run; ++r) {
          ell_src[(size_t)d * max_deg + (r - e)] = edge_src[r];
          ell_mask[(size_t)d * max_deg + (r - e)] = 1;
        }
      }
      e = run;
    }
  }
  if (deg_overflow) return MRP_ERR_DEG_OVERFLOW;

  // Tile-pair plan: per dst tile, ascending set of touched src tiles
  // (diagonal fallback for empty tiles), then inert padding.
  const int nt = max_nodes / tile;
  std::vector<std::vector<int>> tile_srcs(nt);
#pragma omp parallel for schedule(static)
  for (int t = 0; t < nt; ++t) {
    std::vector<uint8_t> hit(nt, 0);
    bool any = false;
    for (int v = t * tile; v < (t + 1) * tile; ++v)
      for (int j = 0; j < max_deg; ++j)
        if (ell_mask[(size_t)v * max_deg + j]) {
          hit[ell_src[(size_t)v * max_deg + j] / tile] = 1;
          any = true;
        }
    if (!any) hit[t] = 1;  // diagonal fallback
    for (int s = 0; s < nt; ++s)
      if (hit[s]) tile_srcs[t].push_back(s);
  }
  int w = 0;
  for (int t = 0; t < nt; ++t) {
    const int m = (int)tile_srcs[t].size();
    if (w + m > max_pairs) return MRP_ERR_PAIR_OVERFLOW;
    for (int i = 0; i < m; ++i) {
      pair_dst[w] = t;
      pair_src[w] = tile_srcs[t][i];
      pair_first[w] = (i == 0) ? 1 : 0;
      pair_last[w] = (i == m - 1) ? 1 : 0;
      ++w;
    }
  }
  for (; w < max_pairs; ++w) {  // inert padding
    pair_dst[w] = nt - 1;
    pair_src[w] = nt - 1;
    pair_first[w] = 0;
    pair_last[w] = 0;
  }

  *n_edges_out = n_edges;
  return MRP_OK;
}

// ---------------------------------------------------------------------------
// Per-batch edge-partition plan (mirrors mrp_gnn_tpu/parallel/partition.py
// _plan_arrays, capacities-given path — the dynamic-topology hot path). Must
// be BIT-IDENTICAL to the numpy builder (tests/test_graph_native.py).
//
// Inputs: ONE replica's masked edge list (replica-local ids, dst-sorted),
// shard geometry, and the pinned capacities. Outputs are [P, ...] blocks
// written into caller-allocated arrays (the caller stacks replicas by
// offsetting the pointers). The transposed BSP pair plan is derived in
// Python (graph.derive_bsp_pairs_t) from pd/ps/la — tiny arrays.
//
// Error codes: mirror the numpy ValueErrors.
enum {
  MRP_PART_OK = 0,
  MRP_PART_ERR_EDGES = -10,      // shard edge count > E_s capacity
  MRP_PART_ERR_DEG = -11,        // local in-degree > ELL width capacity
  MRP_PART_ERR_DELTA = -12,      // active delta outside capacity delta set
  MRP_PART_ERR_DELTA_ROWS = -13, // per-delta request rows > capacity width
  MRP_PART_ERR_REMOTE = -14,     // boundary edge count > E_r capacity
  MRP_PART_ERR_PAIRS = -15,      // tile pairs > bsp_pairs capacity
};

int mrp_build_partition_plan(
    const int32_t* src, const int32_t* dst, int n_edges, int nps, int P,
    int E_s, int L, int Er, int n_deltas, const int32_t* deltas,
    const int32_t* delta_rows, int bsp_tile, int bsp_pairs,
    int32_t* src_g, int32_t* dst_l, uint8_t* m, uint8_t* lm,
    int32_t* send_idx, int32_t* remote_dst, int32_t* remote_src_g,
    int32_t* remote_slot, uint8_t* remote_mask,
    int32_t* ell_src, uint8_t* ell_mask,
    int32_t* pd, int32_t* ps, int32_t* fi, int32_t* la) {
  // --- per-shard padded edge lists (original dst-sorted order kept) -------
  std::memset(src_g, 0, (size_t)P * E_s * sizeof(int32_t));
  std::memset(dst_l, 0, (size_t)P * E_s * sizeof(int32_t));
  std::memset(m, 0, (size_t)P * E_s);
  std::memset(lm, 0, (size_t)P * E_s);
  std::vector<int> cursor(P, 0);
  for (int e = 0; e < n_edges; ++e) {
    const int p = dst[e] / nps;
    const int w = cursor[p]++;
    if (w >= E_s) return MRP_PART_ERR_EDGES;
    src_g[(size_t)p * E_s + w] = src[e];
    dst_l[(size_t)p * E_s + w] = dst[e] - p * nps;
    m[(size_t)p * E_s + w] = 1;
    lm[(size_t)p * E_s + w] = (src[e] / nps == p) ? 1 : 0;
  }

  // --- local-edge ELL layout (slot = rank within the row, edge order) -----
  std::memset(ell_src, 0, (size_t)P * nps * L * sizeof(int32_t));
  std::memset(ell_mask, 0, (size_t)P * nps * L);
  {
    std::vector<int> deg(nps);
    for (int p = 0; p < P; ++p) {
      std::fill(deg.begin(), deg.end(), 0);
      for (int w = 0; w < cursor[p]; ++w) {
        if (!lm[(size_t)p * E_s + w]) continue;
        const int row = dst_l[(size_t)p * E_s + w];
        const int slot = deg[row]++;
        if (slot >= L) return MRP_PART_ERR_DEG;
        ell_src[((size_t)p * nps + row) * L + slot] =
            src_g[(size_t)p * E_s + w] - p * nps;
        ell_mask[((size_t)p * nps + row) * L + slot] = 1;
      }
    }
  }

  // --- boundary-exchange plan ---------------------------------------------
  // requests[p][r]: sorted unique GLOBAL rows shard p needs from shard r.
  std::vector<std::vector<std::vector<int32_t>>> requests(
      P, std::vector<std::vector<int32_t>>(P));
  for (int p = 0; p < P; ++p) {
    for (int w = 0; w < cursor[p]; ++w) {
      if (lm[(size_t)p * E_s + w]) continue;
      const int32_t s = src_g[(size_t)p * E_s + w];
      requests[p][s / nps].push_back(s);
    }
    for (int r = 0; r < P; ++r) {
      auto& v = requests[p][r];
      std::sort(v.begin(), v.end());
      v.erase(std::unique(v.begin(), v.end()), v.end());
    }
  }
  // active deltas must be a subset of the capacity ring; widths must fit.
  int total_b = 0;
  for (int i = 0; i < n_deltas; ++i) total_b += delta_rows[i];
  if (total_b < 1) total_b = 1;
  {
    std::vector<int> cap_width(P, -1);  // -1 = delta inactive in capacity
    for (int i = 0; i < n_deltas; ++i) cap_width[deltas[i]] = delta_rows[i];
    for (int p = 0; p < P; ++p)
      for (int r = 0; r < P; ++r) {
        if (r == p || requests[p][r].empty()) continue;
        const int d = ((p - r) % P + P) % P;
        if (cap_width[d] < 0) return MRP_PART_ERR_DELTA;
        if ((int)requests[p][r].size() > cap_width[d])
          return MRP_PART_ERR_DELTA_ROWS;
      }
  }
  std::memset(send_idx, 0, (size_t)P * total_b * sizeof(int32_t));
  {
    int off = 0;
    for (int i = 0; i < n_deltas; ++i) {
      const int d = deltas[i];
      for (int s_dev = 0; s_dev < P; ++s_dev) {
        const int p = (s_dev + d) % P;
        const auto& need = requests[p][s_dev];
        for (size_t j = 0; j < need.size(); ++j)
          send_idx[(size_t)s_dev * total_b + off + j] =
              need[j] - s_dev * nps;
      }
      off += delta_rows[i];
    }
  }

  // --- compact remote (boundary) edge arrays ------------------------------
  std::memset(remote_dst, 0, (size_t)P * Er * sizeof(int32_t));
  std::memset(remote_src_g, 0, (size_t)P * Er * sizeof(int32_t));
  std::memset(remote_slot, 0, (size_t)P * Er * sizeof(int32_t));
  std::memset(remote_mask, 0, (size_t)P * Er);
  {
    std::vector<int> delta_off(P, 0);
    int off = 0;
    for (int i = 0; i < n_deltas; ++i) {
      delta_off[deltas[i]] = off;
      off += delta_rows[i];
    }
    for (int p = 0; p < P; ++p) {
      int k = 0;
      for (int w = 0; w < cursor[p]; ++w) {
        if (lm[(size_t)p * E_s + w]) continue;
        if (k >= Er) return MRP_PART_ERR_REMOTE;
        const int32_t s = src_g[(size_t)p * E_s + w];
        const int r = s / nps;
        const int d = ((p - r) % P + P) % P;
        const auto& need = requests[p][r];
        const int idx = (int)(std::lower_bound(need.begin(), need.end(), s)
                              - need.begin());
        remote_dst[(size_t)p * Er + k] = dst_l[(size_t)p * E_s + w];
        remote_src_g[(size_t)p * Er + k] = s;
        remote_slot[(size_t)p * Er + k] = delta_off[d] + idx;
        remote_mask[(size_t)p * Er + k] = 1;
        ++k;
      }
    }
  }

  // --- per-shard tile-pair plans (dst-major; inert tails at nt-1) ---------
  if (bsp_tile > 0 && bsp_pairs > 0) {
    const int nt = nps / bsp_tile;
    for (int p = 0; p < P; ++p) {
      int w = 0;
      for (int t = 0; t < nt; ++t) {
        std::vector<uint8_t> hit(nt, 0);
        bool any = false;
        for (int v = t * bsp_tile; v < (t + 1) * bsp_tile; ++v)
          for (int j = 0; j < L; ++j)
            if (ell_mask[((size_t)p * nps + v) * L + j]) {
              hit[ell_src[((size_t)p * nps + v) * L + j] / bsp_tile] = 1;
              any = true;
            }
        if (!any) hit[t] = 1;  // diagonal fallback
        int first = 1, last_w = -1;
        for (int s = 0; s < nt; ++s) {
          if (!hit[s]) continue;
          if (w >= bsp_pairs) return MRP_PART_ERR_PAIRS;
          pd[(size_t)p * bsp_pairs + w] = t;
          ps[(size_t)p * bsp_pairs + w] = s;
          fi[(size_t)p * bsp_pairs + w] = first;
          la[(size_t)p * bsp_pairs + w] = 0;
          first = 0;
          last_w = w;
          ++w;
        }
        la[(size_t)p * bsp_pairs + last_w] = 1;
      }
      for (; w < bsp_pairs; ++w) {  // inert padding at the LAST tile
        pd[(size_t)p * bsp_pairs + w] = nt - 1;
        ps[(size_t)p * bsp_pairs + w] = nt - 1;
        fi[(size_t)p * bsp_pairs + w] = 0;
        la[(size_t)p * bsp_pairs + w] = 0;
      }
    }
  }
  return MRP_PART_OK;
}

// Exact pair-count helper so callers can size max_pairs without guessing.
int mrp_count_pairs_upper_bound(int S, int N, int max_nodes, int tile) {
  // Worst case: every scene fully connected; a dst tile touches every tile
  // any of its scenes' nodes lives in. Scene block size N vs tile size:
  const int nt = max_nodes / tile;
  const int span = (N + tile - 1) / tile + 1;  // tiles one scene can straddle
  long total = (long)nt * (span < nt ? span : nt);
  return (int)total;
}

}  // extern "C"
