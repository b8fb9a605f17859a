// mapcore — native host-side map bookkeeping for planarslam_tpu.
//
// The reference's runtime around the compute path is C++ (KeyFrame
// covisibility maintenance `src/KeyFrame.cc` UpdateConnections, MapPlane
// voxel-grid cloud maintenance `src/MapPlane.cc:298-366`,
// Map::PointDistanceFromPlane `src/Map.cc:395`). The TPU build keeps the
// device kernels in XLA and implements these host-side hot loops natively:
// they run every keyframe insertion / plane association on the critical
// path of the tracker and are index-chasing workloads that Python is
// slowest at. Exposed via a plain C ABI for ctypes (no pybind11 in image).
//
// Build: g++ -O2 -shared -fPIC mapcore.cpp -o libmapcore.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" {

// Covisibility weights: for keyframe `kf`, count shared valid map points
// with every other valid keyframe. kf_pt_idx is (n_kf_slots, kp) int32 with
// -1 sentinels. Writes weights into out_w (n_kf_slots).
void covis_update(const int32_t* kf_pt_idx, const uint8_t* kf_valid,
                  const uint8_t* pt_valid, int64_t n_kf, int64_t kp,
                  int64_t kf, int32_t* out_w) {
    std::unordered_set<int32_t> own;
    const int32_t* row = kf_pt_idx + kf * kp;
    own.reserve(kp);
    for (int64_t f = 0; f < kp; ++f) {
        int32_t p = row[f];
        if (p >= 0 && pt_valid[p]) own.insert(p);
    }
    std::unordered_set<int32_t> counted;
    for (int64_t other = 0; other < n_kf; ++other) {
        out_w[other] = 0;
        if (other == kf || !kf_valid[other]) continue;
        const int32_t* orow = kf_pt_idx + other * kp;
        counted.clear();
        int32_t w = 0;
        for (int64_t f = 0; f < kp; ++f) {
            int32_t p = orow[f];
            if (p >= 0 && own.count(p) && counted.insert(p).second) ++w;
        }
        out_w[other] = w;
    }
}

// Voxel-hash downsample: merge `n_new` new points into an existing cloud of
// `n_cur` points (both float32 xyz), keeping at most one point per voxel of
// size `leaf`, capped at `cap` output points (uniform decimation beyond).
// Returns the new count; result written in-place into cloud (cap, 3).
int64_t voxel_merge(float* cloud, int64_t n_cur, const float* pts_new,
                    int64_t n_new, double leaf, int64_t cap) {
    std::unordered_map<uint64_t, int64_t> seen;
    std::vector<float> out;
    out.reserve(3 * (n_cur + n_new));
    seen.reserve(n_cur + n_new);
    auto push = [&](const float* p) {
        int64_t kx = (int64_t)std::floor(p[0] / leaf);
        int64_t ky = (int64_t)std::floor(p[1] / leaf);
        int64_t kz = (int64_t)std::floor(p[2] / leaf);
        uint64_t h = (uint64_t)(kx * 73856093LL) ^ (uint64_t)(ky * 19349663LL)
                     ^ (uint64_t)(kz * 83492791LL);
        if (seen.emplace(h, (int64_t)out.size() / 3).second) {
            out.push_back(p[0]); out.push_back(p[1]); out.push_back(p[2]);
        }
    };
    for (int64_t i = 0; i < n_cur; ++i) push(cloud + 3 * i);
    for (int64_t i = 0; i < n_new; ++i) push(pts_new + 3 * i);
    int64_t n_out = (int64_t)out.size() / 3;
    if (n_out > cap) {
        double step = (double)n_out / (double)cap;
        for (int64_t i = 0; i < cap; ++i) {
            int64_t src = (int64_t)(i * step);
            std::memcpy(cloud + 3 * i, out.data() + 3 * src,
                        3 * sizeof(float));
        }
        return cap;
    }
    std::memcpy(cloud, out.data(), out.size() * sizeof(float));
    return n_out;
}

// Minimum |n.x + d| over a cloud (PlaneMatcher association distance,
// `src/PlaneMatcher.cpp:30-60`). coeffs = (a, b, c, d), normalized inside.
double plane_cloud_min_dist(const float* cloud, int64_t n,
                            const double* coeffs) {
    double nx = coeffs[0], ny = coeffs[1], nz = coeffs[2], d = coeffs[3];
    double nn = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (nn < 1e-12) return 1e30;
    nx /= nn; ny /= nn; nz /= nn; d /= nn;
    double best = 1e30;
    for (int64_t i = 0; i < n; ++i) {
        const float* p = cloud + 3 * i;
        double v = std::fabs(nx * p[0] + ny * p[1] + nz * p[2] + d);
        if (v < best) best = v;
    }
    return best;
}

// Batch plane association (the full PlaneMatcher loop,
// `src/PlaneMatcher.cpp:10-81`): for each frame plane (world coeffs,
// row-major (pf, 4) float64) test against map planes with clouds.
// Outputs per frame plane: direct match id (or -1), parallel id, vertical id.
void associate_planes(const double* frame_coeffs_w, int64_t n_frame,
                      const double* map_coeffs, const uint8_t* map_valid,
                      int64_t n_map, const float* clouds, const int32_t* cloud_n,
                      int64_t cloud_cap, double assoc_angle, double assoc_dist,
                      double ver_th, double par_th,
                      int32_t* out_direct, int32_t* out_par, int32_t* out_ver) {
    for (int64_t i = 0; i < n_frame; ++i) {
        const double* f = frame_coeffs_w + 4 * i;
        double fn = std::sqrt(f[0] * f[0] + f[1] * f[1] + f[2] * f[2]);
        out_direct[i] = out_par[i] = out_ver[i] = -1;
        if (fn < 1e-12) continue;
        double fx = f[0] / fn, fy = f[1] / fn, fz = f[2] / fn;
        double best_dist = 1e30;
        double best_par_cos = par_th, best_ver_cos = ver_th;
        for (int64_t j = 0; j < n_map; ++j) {
            if (!map_valid[j]) continue;
            const double* mco = map_coeffs + 4 * j;
            double mn = std::sqrt(mco[0] * mco[0] + mco[1] * mco[1]
                                  + mco[2] * mco[2]);
            if (mn < 1e-12) continue;
            double cosv = std::fabs((fx * mco[0] + fy * mco[1] + fz * mco[2])
                                    / mn);
            if (cosv > assoc_angle) {
                double dmin = plane_cloud_min_dist(
                    clouds + j * cloud_cap * 3, cloud_n[j], f);
                if (dmin < assoc_dist && dmin < best_dist) {
                    best_dist = dmin;
                    out_direct[i] = (int32_t)j;
                }
            }
            if (cosv > best_par_cos) { best_par_cos = cosv; out_par[i] = (int32_t)j; }
            if (cosv < best_ver_cos) { best_ver_cos = cosv; out_ver[i] = (int32_t)j; }
        }
        // par/ver are kept independently of a direct match (reference
        // PlaneMatcher records mvpParallelPlanes/mvpVerticalPlanes
        // regardless, `src/PlaneMatcher.cpp:48-61`); only the directly
        // matched plane itself is not its own structural partner
        if (out_direct[i] >= 0 && out_par[i] == out_direct[i]) out_par[i] = -1;
        if (out_direct[i] >= 0 && out_ver[i] == out_direct[i]) out_ver[i] = -1;
    }
}

}  // extern "C"
