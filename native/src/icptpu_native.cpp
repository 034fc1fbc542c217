// Native host-side runtime for icp_tpu.
//
// Holds the work that belongs on the host CPU next to the TPU compute path:
//  * bulk lidar CSV parsing (the data-ingestion analogue of the reference's
//    common/parse_scan.cpp:18-50, including the +/-inf row filter),
//  * an exact median-split k-d tree 1-NN (the host-side oracle counterpart
//    of include/algo/kdtree.h:20-159 — used to validate the on-device
//    Pallas/XLA correspondence kernels, and as a fast CPU fallback).
//
// Exposed as a C ABI consumed via ctypes (icp_tpu/utils/native.py).
// This is an independent implementation, not a copy: flat array-of-indices
// tree (no per-node heap allocations), iterative parsing, squared-distance
// semantics throughout (the reference's Euclidean-distance quirk is
// reproduced in the Python layer where its semantics live).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {

// Parse strictly "x,y" lines (exactly two comma-separated floats, matching
// the Python fallback's `line.partition(",")` semantics); skip non-finite
// rows. Returns the TOTAL number of valid rows seen — callers detect
// overflow by comparing against cap (only the first cap rows are written).
long long icptpu_parse_scan_csv(const char* path, double* out, long long cap) {
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    char line[512];
    long long n = 0;
    while (std::fgets(line, sizeof line, f)) {
        // A row longer than the buffer: consume the remainder so the next
        // fgets starts on a fresh line (the fragment itself is rejected by
        // the strict end-of-line check below unless it happens to be a
        // complete "x,y" prefix — matching whole-line Python reads is why
        // we drain rather than re-parse fragments).
        bool complete = std::strchr(line, '\n') != nullptr;
        if (!complete) {
            int ch;
            while ((ch = std::fgetc(f)) != EOF && ch != '\n') {
            }
            continue;
        }
        char* end = nullptr;
        double x = std::strtod(line, &end);
        if (end == line) continue;
        while (*end == ' ' || *end == '\t') ++end;
        if (*end != ',') continue;  // require the comma separator
        ++end;
        char* end2 = nullptr;
        double y = std::strtod(end, &end2);
        if (end2 == end) continue;
        while (*end2 == ' ' || *end2 == '\t' || *end2 == '\r' || *end2 == '\n') ++end2;
        if (*end2 != '\0') continue;  // trailing junk / extra columns: reject
        if (!std::isfinite(x) || !std::isfinite(y)) continue;
        if (n < cap) {
            out[2 * n] = x;
            out[2 * n + 1] = y;
        }
        ++n;
    }
    std::fclose(f);
    return n;
}

// Threaded batch loader: parse n_paths scan CSVs (null-separated in
// `paths`) into a front-packed, zero-padded (n_paths, capacity, 2) array
// plus per-scan valid counts. Returns 0 on success, -1 if any file failed
// or overflowed capacity (its count is set to -1). This is the host-side
// data-loader for fleet ingestion: file IO and float parsing parallelize
// across a small thread pool while the TPU computes.
int icptpu_parse_scan_batch(const char* paths, long long n_paths,
                            long long capacity, double* out,
                            long long* out_counts) {
    std::vector<const char*> files;
    files.reserve(static_cast<size_t>(n_paths));
    const char* p = paths;
    for (long long i = 0; i < n_paths; ++i) {
        files.push_back(p);
        p += std::strlen(p) + 1;
    }
    std::atomic<long long> next(0);
    std::atomic<int> status(0);
    unsigned n_threads = std::min<unsigned>(
        std::max(1u, std::thread::hardware_concurrency()),
        static_cast<unsigned>(n_paths));
    auto worker = [&]() {
        for (;;) {
            long long i = next.fetch_add(1);
            if (i >= n_paths) return;
            double* dst = out + i * capacity * 2;
            std::memset(dst, 0, sizeof(double) * static_cast<size_t>(capacity) * 2);
            long long n = icptpu_parse_scan_csv(files[static_cast<size_t>(i)], dst, capacity);
            if (n < 0 || n > capacity) {
                out_counts[i] = -1;
                status.store(-1);
            } else {
                out_counts[i] = n;
            }
        }
    };
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return status.load();
}

namespace {

struct KdTree {
    const double* pts;  // (m, dim) row-major
    long long m;
    int dim;
    std::vector<int64_t> order;  // flattened balanced tree: order[k] = point index
    std::vector<int8_t> axis;    // split axis per node slot (-1 = empty)

    void build() {
        order.assign(static_cast<size_t>(m), 0);
        std::iota(order.begin(), order.end(), 0);
        axis.assign(static_cast<size_t>(m), -1);
        build_range(0, m, 0);
    }

    void build_range(long long lo, long long hi, int depth) {
        if (lo >= hi) return;
        int ax = depth % dim;
        long long mid = lo + (hi - lo - 1) / 2;
        std::nth_element(order.begin() + lo, order.begin() + mid, order.begin() + hi,
                         [&](int64_t a, int64_t b) { return pts[a * dim + ax] < pts[b * dim + ax]; });
        axis[static_cast<size_t>(mid)] = static_cast<int8_t>(ax);
        build_range(lo, mid, depth + 1);
        build_range(mid + 1, hi, depth + 1);
    }

    void query(const double* q, long long lo, long long hi,
               int64_t* best, double* best_d2) const {
        if (lo >= hi) return;
        long long mid = lo + (hi - lo - 1) / 2;
        int64_t pi = order[static_cast<size_t>(mid)];
        const double* p = pts + pi * dim;
        double d2 = 0.0;
        for (int d = 0; d < dim; ++d) {
            double diff = q[d] - p[d];
            d2 += diff * diff;
        }
        // Strict improvement, ties keep the earlier (lower-index) hit only if
        // indices compare lower — match first-occurrence argmin semantics.
        if (d2 < *best_d2 || (d2 == *best_d2 && pi < *best)) {
            *best_d2 = d2;
            *best = pi;
        }
        int ax = axis[static_cast<size_t>(mid)];
        double diff = q[ax] - p[ax];
        long long near_lo = diff < 0 ? lo : mid + 1;
        long long near_hi = diff < 0 ? mid : hi;
        long long far_lo = diff < 0 ? mid + 1 : lo;
        long long far_hi = diff < 0 ? hi : mid;
        query(q, near_lo, near_hi, best, best_d2);
        if (diff * diff <= *best_d2) {
            query(q, far_lo, far_hi, best, best_d2);
        }
    }
};

}  // namespace

// Exact 1-NN of each query among targets. Squared distances out.
void icptpu_kdtree_nn(const double* targets, long long m,
                      const double* queries, long long n, int dim,
                      int64_t* out_idx, double* out_d2) {
    KdTree tree;
    tree.pts = targets;
    tree.m = m;
    tree.dim = dim;
    tree.build();
    for (long long i = 0; i < n; ++i) {
        int64_t best = -1;
        double best_d2 = std::numeric_limits<double>::infinity();
        tree.query(queries + i * dim, 0, m, &best, &best_d2);
        out_idx[i] = best;
        out_d2[i] = best_d2;
    }
}

}  // extern "C"
