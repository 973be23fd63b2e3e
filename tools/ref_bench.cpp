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

    // min-of-5 build: one fresh index per rep (AddPoint untimed, the
    // same timed region the engine's bench uses), min across reps —
    // the SAME best-of-N protocol bench.py applies to its own numbers,
    // so the recorded ratio is min/min instead of min/single-shot.
    // r14 (VERDICT r13 #1): reps raised 3 -> 5 and the MAX also
    // reported, so the caller can adjudicate the sub-second sf0.1 cell
    // as a ratio BAND [ours_min/ref_max, ours_max/ref_min] instead of
    // a point estimate on a +/-20% denominator.
    const int BUILD_REPS = 5;
    double build_sec = 1e18, build_max = 0.0;
    vamana::Vamana* idx = nullptr;
    for (int rep = 0; rep < BUILD_REPS; rep++) {
        vamana::Vamana* cand = new vamana::Vamana(dim, n, alpha, R, L, ef);
        for (uint32_t i = 0; i < n; i++) cand->AddPoint(&pts[(size_t)i * dim], i);
        auto t0 = std::chrono::steady_clock::now();
        cand->BuildIndex();
        auto t1 = std::chrono::steady_clock::now();
        double sec = std::chrono::duration<double>(t1 - t0).count();
        if (sec < build_sec) build_sec = sec;
        if (sec > build_max) build_max = sec;
        if (rep + 1 < BUILD_REPS) delete cand; else idx = cand;
    }

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

    // min-of-3 search passes over the full query set (recall is
    // identical every pass — the index is fixed)
    const int SEARCH_PASSES = 3;
    std::vector<uint32_t> ids(k);
    std::vector<float> dists(k);
    double hits = 0, search_sec = 1e18;
    for (int pass = 0; pass < SEARCH_PASSES; pass++) {
        hits = 0;
        auto t2 = std::chrono::steady_clock::now();
        for (uint32_t qi = 0; qi < nq; qi++) {
            idx->Search(&qs[(size_t)qi * dim], k, ids.data(), dists.data());
            for (uint32_t j = 0; j < k; j++)
                for (uint32_t t = 0; t < k; t++)
                    if (ids[j] == truth[qi][t]) { hits += 1; break; }
        }
        auto t3 = std::chrono::steady_clock::now();
        double sec = std::chrono::duration<double>(t3 - t2).count();
        if (sec < search_sec) search_sec = sec;
    }

    std::printf(
        "{\"build_sec\": %.3f, \"build_max_sec\": %.3f, "
        "\"search_sec\": %.4f, \"qps\": %.1f, "
        "\"recall_at_k\": %.4f, \"n\": %u, \"dim\": %u, \"nq\": %u, "
        "\"build_reps\": %d, \"search_passes\": %d, \"protocol\": \"min\"}\n",
        build_sec, build_max, search_sec, nq / std::max(search_sec, 1e-9),
        hits / ((double)nq * k), n, dim, nq, BUILD_REPS, SEARCH_PASSES);
    delete idx;
    return 0;
}
