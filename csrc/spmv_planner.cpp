// Two-hop-gather SpMV slot assignment (native twin of ops/spmv.py's
// vectorized numpy greedy; see that module for the constraint model).
//
// Entry (r, c, v) must land in a slot (k, r%128) with k % oh == r/128,
// and the hop-1 field at (k, c%128) must be unset or already equal to the
// entry's source row c/128. Rank-based placement: entries of the same
// (class, dst-lane) bucket start on distinct slabs; conflicted entries
// probe successive slabs.
//
// C ABI (ctypes): returns the number of slot rows written, or -1 if the
// assignment does not fit max_rows at max_slack.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" int64_t spmv_plan(
    int64_t nnz,
    const int32_t* rows,
    const int32_t* cols,
    const float* vals,
    int32_t oh,
    int32_t oh_true,
    double slack,
    double max_slack,
    int64_t max_rows,
    int32_t* meta_out,  // (max_rows, 128)
    float* vals_out     // (max_rows, 128)
) {
    constexpr int LANES = 128;
    if (nnz == 0) {
        std::memset(meta_out, 0, sizeof(int32_t) * oh * LANES);
        std::memset(vals_out, 0, sizeof(float) * oh * LANES);
        return oh;
    }

    std::vector<int32_t> h(nnz), dl(nnz), chirow(nnz), sl(nnz);
    for (int64_t e = 0; e < nnz; ++e) {
        h[e] = rows[e] / LANES;
        dl[e] = rows[e] % LANES;
        chirow[e] = cols[e] / LANES;
        sl[e] = cols[e] % LANES;
    }

    // rank within (class, dst-lane) bucket
    std::vector<int32_t> rank(nnz);
    {
        std::vector<int32_t> count((size_t)oh_true * LANES, 0);
        for (int64_t e = 0; e < nnz; ++e)
            rank[e] = count[(size_t)h[e] * LANES + dl[e]]++;
    }
    int32_t max_bucket = 0;
    for (int64_t e = 0; e < nnz; ++e)
        if (rank[e] + 1 > max_bucket) max_bucket = rank[e] + 1;

    double s = slack;
    while (s <= max_slack) {
        int64_t n_slabs = (int64_t)(s * max_bucket + 0.999999);
        if (n_slabs < 1) n_slabs = 1;
        int64_t R = n_slabs * oh;
        if (R > max_rows) return -1;

        std::vector<uint8_t> occupied((size_t)R * LANES, 0);
        std::vector<int16_t> hop1((size_t)R * LANES, -1);
        std::memset(meta_out, 0, sizeof(int32_t) * R * LANES);
        std::memset(vals_out, 0, sizeof(float) * R * LANES);

        std::vector<int64_t> remaining(nnz);
        for (int64_t e = 0; e < nnz; ++e) remaining[e] = e;
        std::vector<int64_t> next;
        next.reserve(nnz);

        for (int64_t t = 0; t < n_slabs && !remaining.empty(); ++t) {
            next.clear();
            for (int64_t e : remaining) {
                int64_t slab = (rank[e] + t) % n_slabs;
                int64_t k = slab * oh + h[e];
                size_t kd = (size_t)k * LANES + dl[e];
                size_t ks = (size_t)k * LANES + sl[e];
                if (occupied[kd] ||
                    (hop1[ks] != -1 && hop1[ks] != chirow[e])) {
                    next.push_back(e);
                    continue;
                }
                occupied[kd] = 1;
                hop1[ks] = (int16_t)chirow[e];
                // low byte at the SOURCE lane, src-lane field at the slot
                meta_out[ks] = (meta_out[ks] & ~0xFF) | (chirow[e] & 0xFF);
                meta_out[kd] |= (sl[e] & 0x7F) << 8;
                vals_out[kd] = vals[e];
            }
            remaining.swap(next);
        }
        if (remaining.empty()) return R;
        s *= 1.5;
    }
    return -1;
}
