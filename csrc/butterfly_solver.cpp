// Native greedy slot assignment for the butterfly-routed SpMV
// (squeezellm_tpu/ops/butterfly.py — see that module for the algorithm).
//
// The Python/numpy builder costs 4-17 s per 7B-scale linear on this
// single-core host (~30-60 min per model); the same greedy runs here in
// well under a second per linear: occupancy is a bitset per (level, lane)
// over rows, so a group's free-row scan is 8 bitwise ANDs per word.
//
// C ABI for ctypes. Semantics mirror butterfly._try_assign: entries are
// grouped by (source lane, delta); groups placed largest-first; within a
// group, free rows are matched to entries by class (row k serves output
// row h iff k % oh == h). Returns the number of slot rows used (R), or
// -1 if even max_slack rows cannot place every entry, or -2 if the caller
// buffer (max_rows) is too small for the needed slack.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int LANES = 128;
constexpr int N_ROUNDS = 7;
constexpr int LEVELS = N_ROUNDS + 1;

inline int lane_path(int src_lane, int delta, int level) {
  int lane = src_lane;
  for (int j = 0; j < level; ++j) {
    if ((delta >> j) & 1) lane = (lane + (1 << j)) & (LANES - 1);
  }
  return lane;
}

struct Solver {
  int R = 0;
  int words = 0;
  // occ[level][lane] -> bitset over rows (words_ per bitset)
  std::vector<uint64_t> occ;  // LEVELS * LANES * words

  uint64_t* bits(int level, int lane) {
    return occ.data() + (static_cast<size_t>(level) * LANES + lane) * words;
  }

  void reset(int rows) {
    R = rows;
    words = (rows + 63) / 64;
    occ.assign(static_cast<size_t>(LEVELS) * LANES * words, 0);
  }
};

}  // namespace

extern "C" {

// rows/cols/vals: nnz entries (vals==0 entries must be pre-filtered by the
// caller). oh = padded output rows (multiple of 8), oh_true = exact
// ceil(out/128). Outputs (each max_rows x 128, row-major): chi, vals_out,
// route. Dead slots are zero-filled up to the returned R.
int butterfly_solve(
    int64_t nnz, const int32_t* rows, const int32_t* cols, const float* vals,
    int oh, int oh_true, double slack, double max_slack, int max_rows,
    int32_t* chi_out, float* vals_out, int32_t* route_out) {
  if (nnz == 0) {
    int R = oh;
    if (R > max_rows) return -2;
    std::memset(chi_out, 0, sizeof(int32_t) * R * LANES);
    std::memset(vals_out, 0, sizeof(float) * R * LANES);
    std::memset(route_out, 0, sizeof(int32_t) * R * LANES);
    return R;
  }

  // group by (src_lane, delta)
  std::vector<int32_t> gkey(nnz);
  for (int64_t e = 0; e < nnz; ++e) {
    int sl = cols[e] & (LANES - 1);
    int dl = rows[e] & (LANES - 1);
    int delta = (dl - sl) & (LANES - 1);
    gkey[e] = sl * LANES + delta;
  }
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return gkey[a] < gkey[b]; });
  // group boundaries
  std::vector<std::pair<int64_t, int64_t>> groups;  // [start, end)
  for (int64_t s = 0; s < nnz;) {
    int64_t t = s + 1;
    while (t < nnz && gkey[order[t]] == gkey[order[s]]) ++t;
    groups.emplace_back(s, t);
    s = t;
  }
  std::stable_sort(groups.begin(), groups.end(),
                   [](const auto& a, const auto& b) {
                     return (a.second - a.first) > (b.second - b.first);
                   });

  Solver sv;
  std::vector<int32_t> chosen(nnz);
  std::vector<int32_t> free_rows;
  std::vector<std::vector<int32_t>> by_class;
  std::vector<int64_t> ent_of_class_tmp;

  double s = slack;
  while (true) {
    int n_slabs = std::max<int64_t>(
        1, static_cast<int64_t>(
               (s * static_cast<double>(nnz)) / (LANES * oh_true) + 0.999999));
    int R = n_slabs * oh;
    if (R > max_rows) return -2;
    sv.reset(R);
    bool ok = true;

    for (const auto& [gs, ge] : groups) {
      int64_t e0 = order[gs];
      int sl = cols[e0] & (LANES - 1);
      int delta = ((rows[e0] & (LANES - 1)) - sl) & (LANES - 1);
      int path[LEVELS];
      for (int l = 0; l < LEVELS; ++l) path[l] = lane_path(sl, delta, l);

      // free rows: AND of ~occ at each (level, path lane)
      free_rows.clear();
      const uint64_t* b[LEVELS];
      for (int l = 0; l < LEVELS; ++l) b[l] = sv.bits(l, path[l]);
      for (int w = 0; w < sv.words; ++w) {
        uint64_t used = 0;
        for (int l = 0; l < LEVELS; ++l) used |= b[l][w];
        uint64_t free = ~used;
        if (w == sv.words - 1 && (R & 63)) free &= (1ULL << (R & 63)) - 1;
        while (free) {
          int bit = __builtin_ctzll(free);
          free &= free - 1;
          free_rows.push_back(w * 64 + bit);
        }
      }
      int64_t need = ge - gs;
      if (static_cast<int64_t>(free_rows.size()) < need) {
        ok = false;
        break;
      }
      // bucket free rows by class (k % oh)
      by_class.assign(oh, {});
      for (int32_t r : free_rows) by_class[r % oh].push_back(r);
      // assign entries
      std::vector<size_t> cursor(oh, 0);
      for (int64_t gi = gs; gi < ge && ok; ++gi) {
        int64_t e = order[gi];
        int h = (rows[e] / LANES) % oh;
        auto& lst = by_class[h];
        if (cursor[h] >= lst.size()) {
          ok = false;
          break;
        }
        chosen[e] = lst[cursor[h]++];
      }
      if (!ok) break;
      // claim slots
      for (int64_t gi = gs; gi < ge; ++gi) {
        int32_t k = chosen[order[gi]];
        for (int l = 0; l < LEVELS; ++l)
          sv.bits(l, path[l])[k >> 6] |= 1ULL << (k & 63);
      }
    }

    if (ok) {
      std::memset(chi_out, 0, sizeof(int32_t) * R * LANES);
      std::memset(vals_out, 0, sizeof(float) * R * LANES);
      std::memset(route_out, 0, sizeof(int32_t) * R * LANES);
      for (int64_t e = 0; e < nnz; ++e) {
        int sl = cols[e] & (LANES - 1);
        int delta = ((rows[e] & (LANES - 1)) - sl) & (LANES - 1);
        int32_t k = chosen[e];
        chi_out[static_cast<size_t>(k) * LANES + sl] = cols[e] / LANES;
        vals_out[static_cast<size_t>(k) * LANES + sl] = vals[e];
        for (int j = 0; j < N_ROUNDS; ++j) {
          int lane = lane_path(sl, delta, j + 1);
          int bit = ((delta >> j) & 1) ? (2 * j + 1) : (2 * j);
          route_out[static_cast<size_t>(k) * LANES + lane] |= 1 << bit;
        }
      }
      return R;
    }
    s *= 1.5;
    if (s > max_slack) return -1;
  }
}

}  // extern "C"
