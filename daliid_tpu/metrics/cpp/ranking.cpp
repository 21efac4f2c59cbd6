// Market-1501-protocol CMC/mAP ranking — C++ CPU reference kernel.
//
// Mirrors the role of torchreid's Cython kernel (`evaluate_cy`, the only
// native component in the reference's execution path — imported at
// Person-ReID/validateModels.py:16-24 and used via
// torchreid.metrics.evaluate_rank at Person-ReID/validateModels.py:68).
// Exposed over a plain C ABI for ctypes; used in tests as a bit-parity
// oracle for the on-device XLA kernel.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libranking.so ranking.cpp

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// distmat: num_q x num_g row-major float32
// q_pids/q_camids: num_q int64; g_pids/g_camids: num_g int64
// out_cmc: max_rank float64 (CMC curve); out_map: 1 float64
// returns number of valid queries
int64_t evaluate_rank_market(
    const float* distmat,
    const int64_t* q_pids,
    const int64_t* q_camids,
    const int64_t* g_pids,
    const int64_t* g_camids,
    int64_t num_q,
    int64_t num_g,
    int64_t max_rank,
    double* out_cmc,
    double* out_map) {
  std::fill(out_cmc, out_cmc + max_rank, 0.0);
  double ap_sum = 0.0;
  int64_t num_valid = 0;

  std::vector<int64_t> order(num_g);
  std::vector<uint8_t> raw;  // match flags over kept entries, in rank order
  raw.reserve(num_g);

  for (int64_t qi = 0; qi < num_q; ++qi) {
    const float* row = distmat + qi * num_g;
    std::iota(order.begin(), order.end(), int64_t{0});
    std::stable_sort(order.begin(), order.end(),
                     [row](int64_t a, int64_t b) { return row[a] < row[b]; });

    const int64_t qp = q_pids[qi];
    const int64_t qc = q_camids[qi];

    raw.clear();
    int64_t num_rel = 0;
    for (int64_t k = 0; k < num_g; ++k) {
      const int64_t g = order[k];
      const bool same_pid = g_pids[g] == qp;
      if (same_pid && g_camids[g] == qc) continue;  // junk under the protocol
      raw.push_back(same_pid ? 1 : 0);
      num_rel += same_pid ? 1 : 0;
    }
    if (num_rel == 0) continue;  // query has no valid gallery match
    ++num_valid;

    int64_t hits = 0;
    double ap = 0.0;
    const int64_t kept = static_cast<int64_t>(raw.size());
    for (int64_t k = 0; k < kept; ++k) {
      if (raw[k]) {
        ++hits;
        ap += static_cast<double>(hits) / static_cast<double>(k + 1);
      }
      if (k < max_rank && hits > 0) out_cmc[k] += 1.0;
    }
    // Gallery shorter than max_rank: extend the curve with its final value.
    for (int64_t k = kept; k < max_rank; ++k) {
      if (hits > 0) out_cmc[k] += 1.0;
    }
    ap_sum += ap / static_cast<double>(num_rel);
  }

  const double denom = num_valid > 0 ? static_cast<double>(num_valid) : 1.0;
  for (int64_t k = 0; k < max_rank; ++k) out_cmc[k] /= denom;
  *out_map = ap_sum / denom;
  return num_valid;
}

}  // extern "C"
