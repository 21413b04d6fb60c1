// Native host-side kernels for kbmod_tpu.
//
// The TPU handles all image-domain compute; these routines cover the
// host-side hot paths that the reference implements in C++/numba:
//   * grid_dedup — best-likelihood-per-spatial-bin selection over raw
//     result sets (the reference's TrajectoryClusterGrid,
//     src/kbmod/filters/clustering_grid.py / trajectory_list.cpp), used as
//     the near-duplicate prefilter over up to hundreds of millions of raw
//     trajectories before they ever reach Python objects.
//   * extract_stamps — NaN-padded stamp cutouts (the reference's numba
//     kernels, src/kbmod/core/stamp_utils.py:403-474).
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Select the best (highest lh; first-seen wins ties) trajectory per
// 4-tuple spatial bin. Bins: (x/bw, y/bw, (x+dt*vx)/bw, (y+dt*vy)/bw) with
// C-truncation, matching the Python reference.
//
// Returns the number of kept indices written to out_idx (caller allocates
// n entries). Kept indices are in ascending order.
int64_t grid_dedup(const int32_t* x, const int32_t* y, const float* vx, const float* vy,
                   const float* lh, int64_t n, double bin_width, double max_time,
                   int64_t* out_idx) {
    std::unordered_map<uint64_t, int64_t> best;  // bin key -> index of best
    best.reserve(static_cast<size_t>(n) * 2);

    auto bin_of = [&](double v) -> int64_t { return static_cast<int64_t>(v / bin_width); };

    for (int64_t i = 0; i < n; ++i) {
        const int64_t bx = bin_of(static_cast<double>(x[i]));
        const int64_t by = bin_of(static_cast<double>(y[i]));
        const int64_t ex = bin_of(static_cast<double>(x[i]) + max_time * static_cast<double>(vx[i]));
        const int64_t ey = bin_of(static_cast<double>(y[i]) + max_time * static_cast<double>(vy[i]));

        // Pack the four (small) bin coordinates into one 64-bit key.
        const uint64_t key = ((static_cast<uint64_t>(bx) & 0xFFFF) << 48) |
                             ((static_cast<uint64_t>(by) & 0xFFFF) << 32) |
                             ((static_cast<uint64_t>(ex) & 0xFFFF) << 16) |
                             (static_cast<uint64_t>(ey) & 0xFFFF);

        auto it = best.find(key);
        if (it == best.end()) {
            best.emplace(key, i);
        } else if (lh[i] > lh[it->second]) {
            it->second = i;
        }
    }

    int64_t count = 0;
    for (const auto& kv : best) {
        out_idx[count++] = kv.second;
    }
    // Ascending order for deterministic output.
    std::vector<int64_t> tmp(out_idx, out_idx + count);
    std::sort(tmp.begin(), tmp.end());
    std::memcpy(out_idx, tmp.data(), sizeof(int64_t) * count);
    return count;
}

// Extract NaN-padded stamps: for each of n trajectories and T times, cut a
// (2r+1)^2 window centered at (xs[i*T + t], ys[i*T + t]) from imgs
// (T, H, W) into out (n, T, S, S).
void extract_stamps(const float* imgs, int64_t T, int64_t H, int64_t W,
                    const int32_t* xs, const int32_t* ys, int64_t n, int32_t radius,
                    float* out) {
    const int64_t S = 2 * static_cast<int64_t>(radius) + 1;
    const float nanv = std::nanf("");

    for (int64_t i = 0; i < n; ++i) {
        for (int64_t t = 0; t < T; ++t) {
            const int64_t cx = xs[i * T + t];
            const int64_t cy = ys[i * T + t];
            float* dst = out + ((i * T + t) * S * S);
            const float* src_img = imgs + t * H * W;
            for (int64_t r = 0; r < S; ++r) {
                const int64_t sy = cy - radius + r;
                float* row_dst = dst + r * S;
                if (sy < 0 || sy >= H) {
                    for (int64_t c = 0; c < S; ++c) row_dst[c] = nanv;
                    continue;
                }
                for (int64_t c = 0; c < S; ++c) {
                    const int64_t sx = cx - radius + c;
                    row_dst[c] = (sx >= 0 && sx < W) ? src_img[sy * W + sx] : nanv;
                }
            }
        }
    }
}

}  // extern "C"
