// Batched path-normalized DTW over precomputed frame-distance matrices.
//
// Native replacement for the reference's only compiled component, the Cython
// kernel /root/reference/cpc/eval/ABX/dtw.pyx:16-77: classic O(S1*S2) DP with
// a backtracked warping-path length used to normalize the final cost.
// Parallelized over (i, j) pairs with OpenMP; per-thread scratch reuse.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

float dtw_one(const float* dist, int64_t N, int64_t M, int64_t stride,
              float* cost) {
  cost[0] = dist[0];
  for (int64_t i = 1; i < N; i++)
    cost[i * M] = dist[i * stride] + cost[(i - 1) * M];
  for (int64_t j = 1; j < M; j++) cost[j] = dist[j] + cost[j - 1];
  for (int64_t i = 1; i < N; i++) {
    const float* drow = dist + i * stride;
    float* crow = cost + i * M;
    const float* prow = cost + (i - 1) * M;
    for (int64_t j = 1; j < M; j++) {
      float up = prow[j], diag = prow[j - 1], left = crow[j - 1];
      float m = up < diag ? up : diag;
      if (left < m) m = left;
      crow[j] = drow[j] + m;
    }
  }
  float final_cost = cost[(N - 1) * M + (M - 1)];
  // backtrack path length (dtw.pyx:55-75)
  int64_t i = N - 1, j = M - 1, path_len = 1;
  while (i > 0 && j > 0) {
    float c_up = cost[(i - 1) * M + j];
    float c_left = cost[i * M + j - 1];
    float c_diag = cost[(i - 1) * M + j - 1];
    if (c_diag <= c_left && c_diag <= c_up) {
      i--;
      j--;
    } else if (c_left <= c_up) {
      j--;
    } else {
      i--;
    }
    path_len++;
  }
  if (i == 0) path_len += j;
  if (j == 0) path_len += i;
  return final_cost / (float)path_len;
}

}  // namespace

extern "C" {

// dist: (N1*N2, S1, S2) row-major; sx (N1,), sy (N2,) true lengths;
// out (N1, N2).  When `symmetric`, only the upper triangle (j >= i) is
// computed and mirrored (dtw.pyx:23-36); the diagonal is skipped when
// `symmetric` (parity with ignore_diag=symetric at the reference call site,
// abx_group_computation.py:56-58 — callers pass ignore_diag==symetric).
void cpc_dtw_batch(const float* dist, int S1, int S2, const int64_t* sx,
                   const int64_t* sy, int N1, int N2, bool symmetric,
                   float* out) {
  int64_t n_pairs = (int64_t)N1 * N2;
#pragma omp parallel
  {
    std::vector<float> cost((size_t)S1 * S2);
#pragma omp for schedule(dynamic, 4)
    for (int64_t p = 0; p < n_pairs; p++) {
      int i = (int)(p / N2), j = (int)(p % N2);
      if (symmetric && j < i) continue;
      if (symmetric && i == j) continue;
      const float* d = dist + p * (int64_t)S1 * S2;
      out[(int64_t)i * N2 + j] = dtw_one(d, sx[i], sy[j], S2, cost.data());
    }
  }
  if (symmetric) {
    for (int i = 0; i < N1; i++)
      for (int j = i + 1; j < N2; j++)
        out[(int64_t)j * N2 + i] = out[(int64_t)i * N2 + j];
  }
}

}  // extern "C"
