// Native graph-build kernels: the host-side hot loops of data/graph.py at
// 10M-edge-and-up scale, where numpy's multi-pass array style pays 3-6x in
// memory traffic on the single-core build host (measured: tile selection 65 s,
// transpose argsort 24.6 s, normalization 10.5 s at 87.4M edges —
// scripts/exp_4x_build_phases.py).
//
// The reference's native layer is its C++ parser/engine (src/common/parser.cpp,
// src/seq/*.cpp); this library is the same posture applied to OUR runtime's
// offline build stage. Semantics are bit-exact with the numpy implementations
// (tests/test_native.py):
//   * normalization: 1/sqrt(rowlen(src)*rowlen(dst)) computed in double,
//     rounded once to f32 (matches numpy float64 -> astype(float32));
//   * transpose: stable counting sort by dst (matches np.argsort(dst,
//     kind='stable'));
//   * tile selection: histogram -> candidates >= min_edges -> stable
//     densest-first cap -> ascending id order -> scatter of coefficients into
//     dense [tb, tb] blocks, bf16 (round-to-nearest-even) or f32, with
//     accumulation for duplicate edges in the f32 path.
//
// Build: g++ -O3 -std=c++17 -fPIC -shared (csrc/Makefile; auto-built on first
// use by cuda_gcn_tpu/data/native.py).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// out_coef: malloc'd [nnz] f32. Returns 0 on success.
int gcn_norm_coef(const int64_t* indptr, const int64_t* indices, int64_t n,
                  float** out_coef) {
  const int64_t nnz = indptr[n];
  float* coef = static_cast<float*>(malloc(sizeof(float) * (size_t)nnz));
  if (!coef) return 1;
  std::vector<double> deg((size_t)n);
  for (int64_t i = 0; i < n; ++i) deg[(size_t)i] = (double)(indptr[i + 1] - indptr[i]);
  for (int64_t i = 0; i < n; ++i) {
    const double ds = deg[(size_t)i];
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e) {
      const double dd = deg[(size_t)indices[e]];
      coef[e] = (float)(1.0 / std::sqrt(ds * dd));
    }
  }
  *out_coef = coef;
  return 0;
}

// Stable counting sort of a COO by dst. Outputs malloc'd arrays:
// t_src = dst sorted ascending, t_dst = matching src, t_coef = matching coef.
int gcn_transpose_coo(const int64_t* src, const int64_t* dst, const float* coef,
                      int64_t nnz, int64_t n,
                      int64_t** t_src, int64_t** t_dst, float** t_coef) {
  int64_t* ts = static_cast<int64_t*>(malloc(sizeof(int64_t) * (size_t)nnz));
  int64_t* td = static_cast<int64_t*>(malloc(sizeof(int64_t) * (size_t)nnz));
  float* tc = static_cast<float*>(malloc(sizeof(float) * (size_t)nnz));
  if (!ts || !td || !tc) { free(ts); free(td); free(tc); return 1; }
  std::vector<int64_t> pos((size_t)n + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) pos[(size_t)dst[e] + 1]++;
  for (int64_t i = 0; i < n; ++i) pos[(size_t)i + 1] += pos[(size_t)i];
  for (int64_t e = 0; e < nnz; ++e) {  // forward pass => stable
    const int64_t p = pos[(size_t)dst[e]]++;
    ts[p] = dst[e];
    td[p] = src[e];
    tc[p] = coef[e];
  }
  *t_src = ts;
  *t_dst = td;
  *t_coef = tc;
  return 0;
}

static inline uint16_t f32_to_bf16(float f) {  // round to nearest even
  uint32_t x;
  std::memcpy(&x, &f, 4);
  const uint32_t lsb = (x >> 16) & 1u;
  x += 0x7fffu + lsb;
  return (uint16_t)(x >> 16);
}

// Densest-tile selection (data/graph.py _select_bsr_tiles semantics).
// tiles buffer: bf16 (as_bf16=1, requires unique_edges=1) or f32; malloc'd
// [k * tb * tb]. keep: malloc'd [nnz] bytes, 1 = residual edge. k_out = #tiles.
// When !unique_edges, coefficients of duplicate edges ACCUMULATE (f32 only).
int gcn_select_tiles(const int64_t* src, const int64_t* dst, const float* coef,
                     int64_t nnz, int64_t n, int64_t tb, int64_t min_edges,
                     int64_t max_tiles, int as_bf16, int unique_edges,
                     void** tiles_out, int32_t** rows_out, int32_t** cols_out,
                     uint8_t** keep_out, int64_t* k_out) {
  if (as_bf16 && !unique_edges) return 2;  // bf16 accumulation unsupported
  const int64_t t_blocks = (n + tb - 1) / tb;
  const int64_t n_tiles = t_blocks * t_blocks;
  // tb is 2^k in practice: divisions by a runtime value cost ~87M idivs per
  // pass here; use shifts/masks when possible
  const bool pow2 = tb > 0 && (tb & (tb - 1)) == 0;
  const int sh = pow2 ? __builtin_ctzll((uint64_t)tb) : 0;
  const int64_t msk = tb - 1;
  auto div_tb = [&](int64_t v) { return pow2 ? (v >> sh) : (v / tb); };
  auto mod_tb = [&](int64_t v) { return pow2 ? (v & msk) : (v % tb); };
  std::vector<int32_t> counts((size_t)n_tiles, 0);
  for (int64_t e = 0; e < nnz; ++e)
    counts[(size_t)(div_tb(src[e]) * t_blocks + div_tb(dst[e]))]++;

  std::vector<int64_t> cand;
  for (int64_t t = 0; t < n_tiles; ++t)
    if (counts[(size_t)t] >= min_edges) cand.push_back(t);
  if ((int64_t)cand.size() > max_tiles) {
    // stable densest-first: (count desc, id asc), keep max_tiles, resort by id
    std::stable_sort(cand.begin(), cand.end(), [&](int64_t a, int64_t b) {
      return counts[(size_t)a] > counts[(size_t)b];
    });
    cand.resize((size_t)std::max<int64_t>(max_tiles, 0));
    std::sort(cand.begin(), cand.end());
  }
  const int64_t k = (int64_t)cand.size();

  std::vector<int32_t> rank((size_t)n_tiles, -1);
  for (int64_t i = 0; i < k; ++i) rank[(size_t)cand[(size_t)i]] = (int32_t)i;

  const size_t tile_elems = (size_t)k * (size_t)tb * (size_t)tb;
  const size_t item = as_bf16 ? 2 : 4;
  void* tiles = calloc(tile_elems ? tile_elems : 1, item);
  uint8_t* keep = static_cast<uint8_t*>(malloc((size_t)nnz ? (size_t)nnz : 1));
  int32_t* rows = static_cast<int32_t*>(malloc(sizeof(int32_t) * ((size_t)k ? (size_t)k : 1)));
  int32_t* cols = static_cast<int32_t*>(malloc(sizeof(int32_t) * ((size_t)k ? (size_t)k : 1)));
  if (!tiles || !keep || !rows || !cols) {
    free(tiles); free(keep); free(rows); free(cols);
    return 1;
  }
  for (int64_t i = 0; i < k; ++i) {
    rows[i] = (int32_t)(cand[(size_t)i] / t_blocks);
    cols[i] = (int32_t)(cand[(size_t)i] % t_blocks);
  }
  uint16_t* tb16 = static_cast<uint16_t*>(tiles);
  float* tf32 = static_cast<float*>(tiles);
  for (int64_t e = 0; e < nnz; ++e) {
    const int32_t r = rank[(size_t)(div_tb(src[e]) * t_blocks + div_tb(dst[e]))];
    if (r < 0) {
      keep[e] = 1;
      continue;
    }
    keep[e] = 0;
    const size_t off = (size_t)r * (size_t)tb * (size_t)tb
                       + (size_t)mod_tb(src[e]) * (size_t)tb + (size_t)mod_tb(dst[e]);
    if (as_bf16) tb16[off] = f32_to_bf16(coef[e]);
    else if (unique_edges) tf32[off] = coef[e];
    else tf32[off] += coef[e];
  }
  *tiles_out = tiles;
  *rows_out = rows;
  *cols_out = cols;
  *keep_out = keep;
  *k_out = k;
  return 0;
}

void gcn_build_free(void* p) { free(p); }

}  // extern "C"
