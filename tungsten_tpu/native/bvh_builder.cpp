// Native binned-SAH BVH builder — the runtime counterpart of the
// reference's BvhBuilder (ref src/core/bvh/BvhBuilder.cpp:28-61: exact
// SAH for small nodes, binned SAH above).  Mirrors the layout produced
// by tungsten_tpu/scene/bvh.py (build_bvh): flattened DFS node arrays
// with right-child/leaf meta + skip pointers, and a leaf-order prim
// permutation.  Exposed through a C ABI for ctypes.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int NUM_BINS = 16;

struct Vec3 {
    float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float surface_area(const Vec3 &lo, const Vec3 &hi) {
    float dx = std::max(hi.x - lo.x, 0.0f);
    float dy = std::max(hi.y - lo.y, 0.0f);
    float dz = std::max(hi.z - lo.z, 0.0f);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
}

struct Builder {
    const Vec3 *pmin;
    const Vec3 *pmax;
    std::vector<Vec3> cent;
    int max_leaf;

    std::vector<Vec3> b_min, b_max;
    std::vector<int32_t> meta;  // 2 ints per node
    std::vector<int32_t> order;

    // Recursive build over an index range [lo, hi) of `ids`;
    // returns the node id.
    int build(std::vector<int32_t> &ids, int lo, int hi) {
        int node_id = (int)meta.size() / 2;
        Vec3 nlo = {std::numeric_limits<float>::infinity(),
                    std::numeric_limits<float>::infinity(),
                    std::numeric_limits<float>::infinity()};
        Vec3 nhi = {-nlo.x, -nlo.y, -nlo.z};
        for (int i = lo; i < hi; ++i) {
            nlo = vmin(nlo, pmin[ids[i]]);
            nhi = vmax(nhi, pmax[ids[i]]);
        }
        b_min.push_back(nlo);
        b_max.push_back(nhi);
        meta.push_back(0);
        meta.push_back(0);

        int n = hi - lo;
        if (n <= max_leaf) {
            meta[node_id * 2 + 0] = (int32_t)order.size();
            meta[node_id * 2 + 1] = n;
            for (int i = lo; i < hi; ++i) order.push_back(ids[i]);
            return node_id;
        }

        // centroid bounds
        Vec3 clo = cent[ids[lo]], chi = cent[ids[lo]];
        for (int i = lo + 1; i < hi; ++i) {
            clo = vmin(clo, cent[ids[i]]);
            chi = vmax(chi, cent[ids[i]]);
        }
        float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
        int axis = 0;
        if (ext[1] > ext[axis]) axis = 1;
        if (ext[2] > ext[axis]) axis = 2;

        int mid;
        if (ext[axis] <= 0.0f) {
            mid = lo + n / 2;
        } else {
            float c0 = axis == 0 ? clo.x : (axis == 1 ? clo.y : clo.z);
            float scale = NUM_BINS * (1.0f - 1e-6f) / ext[axis];
            Vec3 bin_lo[NUM_BINS], bin_hi[NUM_BINS];
            int bin_cnt[NUM_BINS] = {0};
            for (int b = 0; b < NUM_BINS; ++b) {
                bin_lo[b] = {std::numeric_limits<float>::infinity(),
                             std::numeric_limits<float>::infinity(),
                             std::numeric_limits<float>::infinity()};
                bin_hi[b] = {-bin_lo[b].x, -bin_lo[b].y, -bin_lo[b].z};
            }
            auto bin_of = [&](int id) {
                const Vec3 &c = cent[id];
                float cv = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
                int b = (int)((cv - c0) * scale);
                return b < 0 ? 0 : (b >= NUM_BINS ? NUM_BINS - 1 : b);
            };
            for (int i = lo; i < hi; ++i) {
                int b = bin_of(ids[i]);
                bin_lo[b] = vmin(bin_lo[b], pmin[ids[i]]);
                bin_hi[b] = vmax(bin_hi[b], pmax[ids[i]]);
                bin_cnt[b]++;
            }
            Vec3 pre_lo[NUM_BINS], pre_hi[NUM_BINS];
            Vec3 suf_lo[NUM_BINS], suf_hi[NUM_BINS];
            int pre_cnt[NUM_BINS], suf_cnt[NUM_BINS];
            Vec3 alo = bin_lo[0], ahi = bin_hi[0];
            int acnt = 0;
            for (int b = 0; b < NUM_BINS; ++b) {
                alo = b ? vmin(alo, bin_lo[b]) : bin_lo[b];
                ahi = b ? vmax(ahi, bin_hi[b]) : bin_hi[b];
                acnt += bin_cnt[b];
                pre_lo[b] = alo; pre_hi[b] = ahi; pre_cnt[b] = acnt;
            }
            alo = bin_lo[NUM_BINS - 1]; ahi = bin_hi[NUM_BINS - 1]; acnt = 0;
            for (int b = NUM_BINS - 1; b >= 0; --b) {
                alo = b < NUM_BINS - 1 ? vmin(alo, bin_lo[b]) : bin_lo[b];
                ahi = b < NUM_BINS - 1 ? vmax(ahi, bin_hi[b]) : bin_hi[b];
                acnt += bin_cnt[b];
                suf_lo[b] = alo; suf_hi[b] = ahi; suf_cnt[b] = acnt;
            }
            float best = std::numeric_limits<float>::infinity();
            int split = -1;
            for (int b = 0; b < NUM_BINS - 1; ++b) {
                if (pre_cnt[b] == 0 || suf_cnt[b + 1] == 0) continue;
                float cost = surface_area(pre_lo[b], pre_hi[b]) * pre_cnt[b]
                    + surface_area(suf_lo[b + 1], suf_hi[b + 1]) * suf_cnt[b + 1];
                if (cost < best) { best = cost; split = b; }
            }
            if (split < 0) {
                mid = lo + n / 2;
            } else {
                mid = lo;
                for (int i = lo; i < hi; ++i)
                    if (bin_of(ids[i]) <= split) std::swap(ids[mid++], ids[i]);
                if (mid == lo || mid == hi) mid = lo + n / 2;
            }
        }

        build(ids, lo, mid);                       // left = node_id + 1
        int right = build(ids, mid, hi);
        meta[node_id * 2 + 0] = right;             // interior: right child
        meta[node_id * 2 + 1] = 0;
        return node_id;
    }
};

}  // namespace

extern "C" {

// Builds the BVH; the caller provides output buffers sized for the
// worst case (2*n nodes).  Returns the node count (or -1 on error).
// Layout matches scene/bvh.py: bounds (N,3), meta (N,2), skip (N,),
// order (n,).
int trt_build_bvh(const float *prim_min, const float *prim_max, int n,
                  int max_leaf, float *out_min, float *out_max,
                  int32_t *out_meta, int32_t *out_skip, int32_t *out_order) {
    if (n <= 0) return 0;
    Builder b;
    b.pmin = reinterpret_cast<const Vec3 *>(prim_min);
    b.pmax = reinterpret_cast<const Vec3 *>(prim_max);
    b.max_leaf = max_leaf;
    b.cent.resize(n);
    for (int i = 0; i < n; ++i) {
        b.cent[i] = {0.5f * (b.pmin[i].x + b.pmax[i].x),
                     0.5f * (b.pmin[i].y + b.pmax[i].y),
                     0.5f * (b.pmin[i].z + b.pmax[i].z)};
    }
    b.b_min.reserve(2 * n);
    b.b_max.reserve(2 * n);
    b.meta.reserve(4 * n);
    b.order.reserve(n);
    std::vector<int32_t> ids(n);
    for (int i = 0; i < n; ++i) ids[i] = i;
    b.build(ids, 0, n);

    int num = (int)b.b_min.size();
    std::memcpy(out_min, b.b_min.data(), num * 3 * sizeof(float));
    std::memcpy(out_max, b.b_max.data(), num * 3 * sizeof(float));
    std::memcpy(out_meta, b.meta.data(), num * 2 * sizeof(int32_t));
    std::memcpy(out_order, b.order.data(), n * sizeof(int32_t));

    // skip pointers: iterative DFS with explicit "after" values
    std::vector<std::pair<int, int>> walk;
    walk.push_back({0, num});
    while (!walk.empty()) {
        auto [node, after] = walk.back();
        walk.pop_back();
        out_skip[node] = after;
        if (b.meta[node * 2 + 1] == 0) {  // interior
            int right = b.meta[node * 2 + 0];
            walk.push_back({node + 1, right});
            walk.push_back({right, after});
        }
    }
    return num;
}

}  // extern "C"
