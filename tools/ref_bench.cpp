// Baseline driver: runs the REFERENCE Vamana implementation
// (/root/reference/index/vamana.h, included at compile time — not copied)
// on the engine's own bench data, so BENCH_r{N}.json numbers can be
// compared against the reference at identical scale/params.
//
// Input: flat little-endian binary written by tools/run_ref_baseline.py:
//   u32 n, u32 dim, u32 nq, then n*dim f32 points, then nq*dim f32 queries.
// Args: <data.bin> <R> <L> <alpha> <ef_search> <k>
// Output: one JSON line {build_sec, search_sec, qps, recall_at_k, n, dim, nq}.
//
// This file is original driver code (same oracle pattern as the
// reference's own test drivers: brute-force truth + recall@k).

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "index/vamana.h"

int main(int argc, char** argv) {
    if (argc != 7) {
        std::fprintf(stderr, "usage: %s data.bin R L alpha ef k\n", argv[0]);
        return 2;
    }
    const char* path = argv[1];
    uint32_t R = std::atoi(argv[2]);
    uint32_t L = std::atoi(argv[3]);
    float alpha = std::atof(argv[4]);
    uint32_t ef = std::atoi(argv[5]);
    uint32_t k = std::atoi(argv[6]);

    FILE* f = std::fopen(path, "rb");
    if (!f) { std::perror("open"); return 1; }
    uint32_t n, dim, nq;
    if (std::fread(&n, 4, 1, f) != 1 || std::fread(&dim, 4, 1, f) != 1 ||
        std::fread(&nq, 4, 1, f) != 1) { return 1; }
    std::vector<float> pts((size_t)n * dim), qs((size_t)nq * dim);
    if (std::fread(pts.data(), 4, pts.size(), f) != pts.size()) return 1;
    if (std::fread(qs.data(), 4, qs.size(), f) != qs.size()) return 1;
    std::fclose(f);

    vamana::Vamana idx(dim, n, alpha, R, L, ef);
    for (uint32_t i = 0; i < n; i++) idx.AddPoint(&pts[(size_t)i * dim], i);

    auto t0 = std::chrono::steady_clock::now();
    idx.BuildIndex();
    auto t1 = std::chrono::steady_clock::now();
    double build_sec = std::chrono::duration<double>(t1 - t0).count();

    // brute-force ground truth (squared L2, ties by id — matches engine spec)
    std::vector<std::vector<uint32_t>> truth(nq);
    for (uint32_t qi = 0; qi < nq; qi++) {
        std::vector<std::pair<float, uint32_t>> d(n);
        const float* q = &qs[(size_t)qi * dim];
        for (uint32_t i = 0; i < n; i++) {
            const float* p = &pts[(size_t)i * dim];
            float s = 0;
            for (uint32_t c = 0; c < dim; c++) { float t = p[c] - q[c]; s += t * t; }
            d[i] = {s, i};
        }
        std::partial_sort(d.begin(), d.begin() + k, d.end());
        truth[qi].reserve(k);
        for (uint32_t j = 0; j < k; j++) truth[qi].push_back(d[j].second);
    }

    std::vector<uint32_t> ids(k);
    std::vector<float> dists(k);
    double hits = 0;
    auto t2 = std::chrono::steady_clock::now();
    for (uint32_t qi = 0; qi < nq; qi++) {
        idx.Search(&qs[(size_t)qi * dim], k, ids.data(), dists.data());
        for (uint32_t j = 0; j < k; j++)
            for (uint32_t t = 0; t < k; t++)
                if (ids[j] == truth[qi][t]) { hits += 1; break; }
    }
    auto t3 = std::chrono::steady_clock::now();
    double search_sec = std::chrono::duration<double>(t3 - t2).count();

    std::printf(
        "{\"build_sec\": %.3f, \"search_sec\": %.4f, \"qps\": %.1f, "
        "\"recall_at_k\": %.4f, \"n\": %u, \"dim\": %u, \"nq\": %u}\n",
        build_sec, search_sec, nq / std::max(search_sec, 1e-9),
        hits / ((double)nq * k), n, dim, nq);
    return 0;
}
