// Native edit-distance kernels for CER/WER scoring — replaces the
// reference's C deps (sctk/sclite scoring path, the `editdistance` pip
// C extension used by e2e_asr_common.ErrorCalculator).
//
// Build: g++ -O3 -shared -fPIC editdistance.cpp -o libeditdistance.so
// (done automatically by espnet_tpu.native at first import).
#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Levenshtein distance between int sequences.
int64_t edit_distance_i64(const int64_t* a, int64_t n, const int64_t* b,
                          int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const int64_t ai = a[i - 1];
    for (int64_t j = 1; j <= m; ++j) {
      const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batched distances: flattened sequence pairs with offsets.
// refs/hyps: concatenated id arrays; *_off: n_pairs+1 offsets.
void edit_distance_batch_i64(const int64_t* refs, const int64_t* ref_off,
                             const int64_t* hyps, const int64_t* hyp_off,
                             int64_t n_pairs, int64_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    out[k] = edit_distance_i64(refs + ref_off[k], ref_off[k + 1] - ref_off[k],
                               hyps + hyp_off[k], hyp_off[k + 1] - hyp_off[k]);
  }
}

// Alignment op counts (correct, sub, del, ins) via full DP + backtrace.
void align_ops_i64(const int64_t* a, int64_t n, const int64_t* b, int64_t m,
                   int64_t* out4) {
  std::vector<int64_t> d((n + 1) * (m + 1));
  auto at = [&](int64_t i, int64_t j) -> int64_t& { return d[i * (m + 1) + j]; };
  for (int64_t i = 0; i <= n; ++i) at(i, 0) = i;
  for (int64_t j = 0; j <= m; ++j) at(0, j) = j;
  for (int64_t i = 1; i <= n; ++i)
    for (int64_t j = 1; j <= m; ++j)
      at(i, j) = std::min({at(i - 1, j) + 1, at(i, j - 1) + 1,
                           at(i - 1, j - 1) + (a[i - 1] != b[j - 1])});
  int64_t i = n, j = m, c = 0, s = 0, del = 0, ins = 0;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 &&
        at(i, j) == at(i - 1, j - 1) + (a[i - 1] != b[j - 1])) {
      if (a[i - 1] == b[j - 1]) ++c; else ++s;
      --i; --j;
    } else if (i > 0 && at(i, j) == at(i - 1, j) + 1) {
      ++del; --i;
    } else {
      ++ins; --j;
    }
  }
  out4[0] = c; out4[1] = s; out4[2] = del; out4[3] = ins;
}

}  // extern "C"
