// Sequential LEANN baseline: a faithful C++ re-implementation of the
// reference's single-threaded build + search hot loops, used ONLY to measure
// the native-CPU baseline that BENCH vs_baseline ratios are computed against
// (the Rust reference publishes no numbers and no Rust toolchain exists in
// this environment; C++ -O3 is the closest stand-in for rustc -O).
//
// Algorithm parity (by construction, not translation):
//   * incremental insert over a temp adjacency with ef_construction
//     best-first search        — /root/reference/src/core/leann.rs:560-631
//   * best-first search_layer with visited set + early break
//                              — leann.rs:692-749, 899-988
//   * high-degree-preserving pruning: hubs = top `hub_pct` of candidate
//     degrees, reserve m0/4 slots, fill nearest-first
//                              — leann.rs:761-833
//   * bidirectional edges; neighbor lists pruned to nearest m0 when over
//                              — leann.rs:592-607, 634-658
//   * euclidean distance, 8-wide chunked loop for auto-vectorization
//                              — src/core/distance.rs:92-108,
//                                src/core/embedding/mod.rs:129-200
//
// CLI:
//   ref_baseline build  <vec.f32> <n> <d> <graph.out> [m0] [efc] [report_every]
//   ref_baseline search <graph.bin> <vec.f32> <n> <d> <q.f32> <nq> <ef> <k> <ids.out>
//
// File formats: vectors are row-major f32; graph.bin (v2) = int32 n, m0,
// entry, then n rows of m0 int32 (-1 padded); ids.out = nq rows of k int32.
//
// Entry-point fidelity (round-4 fix): the reference assigns each node a
// random level (level = floor(-ln(U) * ml), ml = 1/ln(30), leann.rs:549-553)
// and moves the single entry point to the newest node that sets a new max
// level (leann.rs:610-613); BOTH insert-time and query-time searches start
// there (leann.rs:669, :889). The original stand-in pinned entry=0 for build
// and search, which at n=512k on the clustered bench workload left node 0
// inside a tiny out-closed island (154 nodes) and recorded recall .002 —
// a harness artifact, not the reference's behavior. The moving entry is now
// implemented exactly, with a fixed RNG seed for reproducibility, and the
// final entry id is persisted in the graph header so search uses it.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <random>
#include <unordered_set>
#include <vector>

using clk = std::chrono::steady_clock;

static float l2(const float* a, const float* b, int d) {
    // 8-wide chunked accumulation, mirroring the reference's
    // SIMD-friendly scalar kernels (embedding/mod.rs CHUNK_SIZE=8).
    float acc[8] = {0};
    int i = 0;
    for (; i + 8 <= d; i += 8)
        for (int j = 0; j < 8; ++j) {
            float t = a[i + j] - b[i + j];
            acc[j] += t * t;
        }
    float s = 0;
    for (int j = 0; j < 8; ++j) s += acc[j];
    for (; i < d; ++i) {
        float t = a[i] - b[i];
        s += t * t;
    }
    return std::sqrt(s);
}

struct Cand {
    float d;
    int id;
};
struct MinCmp {
    bool operator()(const Cand& a, const Cand& b) const { return a.d > b.d; }
};
struct MaxCmp {
    bool operator()(const Cand& a, const Cand& b) const { return a.d < b.d; }
};

// Best-first search over an adjacency list (leann.rs:692-749 / 899-988).
static std::vector<Cand> search_layer(
    const std::vector<std::vector<int>>& adj, const float* x, int d,
    const float* q, int entry, int ef) {
    std::priority_queue<Cand, std::vector<Cand>, MinCmp> candidates;
    std::priority_queue<Cand, std::vector<Cand>, MaxCmp> results;
    std::unordered_set<int> visited;
    float d0 = l2(q, x + (size_t)entry * d, d);
    visited.insert(entry);
    candidates.push({d0, entry});
    results.push({d0, entry});
    while (!candidates.empty()) {
        Cand c = candidates.top();
        candidates.pop();
        if ((int)results.size() >= ef && c.d > results.top().d) break;
        for (int nb : adj[c.id]) {
            if (!visited.insert(nb).second) continue;
            float dn = l2(q, x + (size_t)nb * d, d);
            if ((int)results.size() < ef || dn < results.top().d) {
                candidates.push({dn, nb});
                results.push({dn, nb});
                if ((int)results.size() > ef) results.pop();
            }
        }
    }
    std::vector<Cand> out(results.size());
    for (int i = (int)results.size() - 1; i >= 0; --i) {
        out[i] = results.top();
        results.pop();
    }
    return out;
}

// High-degree-preserving pruning (Algorithm 3, leann.rs:761-833).
static std::vector<int> prune_preserve(
    std::vector<Cand>& cands, const std::vector<std::vector<int>>& adj,
    int m0, float hub_pct) {
    if ((int)cands.size() <= m0) {
        std::vector<int> all;
        for (auto& c : cands) all.push_back(c.id);
        return all;
    }
    std::vector<int> degs(cands.size());
    for (size_t i = 0; i < cands.size(); ++i) degs[i] = (int)adj[cands[i].id].size();
    std::vector<int> sorted_deg = degs;
    std::sort(sorted_deg.begin(), sorted_deg.end(), std::greater<int>());
    int hub_count = (int)std::ceil(hub_pct * (double)cands.size());
    int threshold = hub_count > 0 && hub_count < (int)cands.size()
                        ? sorted_deg[hub_count - 1]
                        : INT32_MAX;
    int hub_slots = std::max(m0 / 4, 1);
    std::vector<int> out;
    std::vector<char> taken(cands.size(), 0);
    if (threshold != INT32_MAX) {
        // hubs by degree descending, up to the reserved slots
        std::vector<size_t> order(cands.size());
        for (size_t i = 0; i < order.size(); ++i) order[i] = i;
        std::sort(order.begin(), order.end(),
                  [&](size_t a, size_t b) { return degs[a] > degs[b]; });
        for (size_t oi : order) {
            if ((int)out.size() >= hub_slots) break;
            if (degs[oi] < threshold) break;
            out.push_back(cands[oi].id);
            taken[oi] = 1;
        }
    }
    std::sort(cands.begin(), cands.end(),
              [](const Cand& a, const Cand& b) { return a.d < b.d; });
    // NOTE: cands reordered; `taken` indexes the pre-sort order, so rebuild
    // membership by id instead.
    std::unordered_set<int> chosen(out.begin(), out.end());
    for (auto& c : cands) {
        if ((int)out.size() >= m0) break;
        if (chosen.count(c.id)) continue;
        out.push_back(c.id);
        chosen.insert(c.id);
    }
    return out;
}

static void prune_to_nearest(std::vector<int>& lst, const float* x, int d,
                             const float* own, int m0) {
    // prune_neighbors_temp: keep nearest m0 (leann.rs:634-658).
    std::vector<Cand> cs;
    cs.reserve(lst.size());
    for (int id : lst) cs.push_back({l2(own, x + (size_t)id * d, d), id});
    std::sort(cs.begin(), cs.end(),
              [](const Cand& a, const Cand& b) { return a.d < b.d; });
    lst.clear();
    for (int i = 0; i < (int)cs.size() && i < m0; ++i) lst.push_back(cs[i].id);
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s build|search ...\n", argv[0]);
        return 2;
    }
    std::string mode = argv[1];
    if (mode == "build") {
        const char* vec_path = argv[2];
        int n = std::atoi(argv[3]);
        int d = std::atoi(argv[4]);
        const char* out_path = argv[5];
        int m0 = argc > 6 ? std::atoi(argv[6]) : 60;
        int efc = argc > 7 ? std::atoi(argv[7]) : 128;
        int report = argc > 8 ? std::atoi(argv[8]) : 16384;
        float hub_pct = 0.02f;

        std::vector<float> x((size_t)n * d);
        FILE* f = std::fopen(vec_path, "rb");
        if (!f || std::fread(x.data(), 4, x.size(), f) != x.size()) {
            std::fprintf(stderr, "bad vectors file\n");
            return 1;
        }
        std::fclose(f);

        std::vector<std::vector<int>> adj(n);
        // Moving entry point with random levels (leann.rs:549-553, 610-613):
        // level = floor(-ln(U) * ml), ml = 1/ln(30); entry moves to the
        // newest node whose level exceeds the running max. Seeded for
        // reproducible baselines.
        std::mt19937_64 rng(42);
        std::uniform_real_distribution<double> unif(
            std::nextafter(0.0, 1.0), 1.0);
        const double ml = 1.0 / std::log(30.0);
        const int max_layers = 16;
        auto random_level = [&]() {
            int lvl = (int)std::floor(-std::log(unif(rng)) * ml);
            return std::min(lvl, max_layers - 1);
        };
        int entry = 0;
        int max_level = random_level();  // node 0 seeds the entry
        auto t0 = clk::now();
        for (int i = 1; i < n; ++i) {
            int level = random_level();
            const float* q = x.data() + (size_t)i * d;
            auto cands = search_layer(adj, x.data(), d, q, entry, efc);
            auto sel = prune_preserve(cands, adj, m0, hub_pct);
            adj[i] = sel;
            for (int nb : sel) {
                adj[nb].push_back(i);
                if ((int)adj[nb].size() > m0)
                    prune_to_nearest(adj[nb], x.data(), d,
                                     x.data() + (size_t)nb * d, m0);
            }
            if (level > max_level) {  // leann.rs:610-613
                entry = i;
                max_level = level;
            }
            if (report > 0 && (i + 1) % report == 0) {
                double secs =
                    std::chrono::duration<double>(clk::now() - t0).count();
                std::printf("progress %d %.3f %.1f\n", i + 1, secs,
                            (i + 1) / secs);
                std::fflush(stdout);
            }
        }
        double secs = std::chrono::duration<double>(clk::now() - t0).count();
        std::printf("build_done n=%d secs=%.3f vps=%.1f\n", n, secs, n / secs);

        FILE* g = std::fopen(out_path, "wb");
        int32_t hdr[3] = {n, m0, entry};
        std::fwrite(hdr, 4, 3, g);
        std::vector<int32_t> row(m0);
        for (int i = 0; i < n; ++i) {
            std::fill(row.begin(), row.end(), -1);
            for (size_t j = 0; j < adj[i].size() && (int)j < m0; ++j)
                row[j] = adj[i][j];
            std::fwrite(row.data(), 4, m0, g);
        }
        std::fclose(g);
        return 0;
    }
    if (mode == "search") {
        const char* graph_path = argv[2];
        const char* vec_path = argv[3];
        int n = std::atoi(argv[4]);
        int d = std::atoi(argv[5]);
        const char* q_path = argv[6];
        int nq = std::atoi(argv[7]);
        int ef = std::atoi(argv[8]);
        int k = std::atoi(argv[9]);
        const char* out_path = argv[10];

        std::vector<float> x((size_t)n * d), q((size_t)nq * d);
        FILE* f = std::fopen(vec_path, "rb");
        if (!f || std::fread(x.data(), 4, x.size(), f) != x.size()) return 1;
        std::fclose(f);
        f = std::fopen(q_path, "rb");
        if (!f || std::fread(q.data(), 4, q.size(), f) != q.size()) return 1;
        std::fclose(f);

        f = std::fopen(graph_path, "rb");
        int32_t hdr[3];
        if (!f || std::fread(hdr, 4, 3, f) != 3 || hdr[0] != n) {
            std::fprintf(stderr, "graph/vector mismatch\n");
            return 1;
        }
        int m0 = hdr[1];
        int entry = hdr[2];
        if (entry < 0 || entry >= n) {
            std::fprintf(stderr, "bad entry point in graph header\n");
            return 1;
        }
        std::vector<std::vector<int>> adj(n);
        std::vector<int32_t> row(m0);
        for (int i = 0; i < n; ++i) {
            if (std::fread(row.data(), 4, m0, f) != (size_t)m0) return 1;
            for (int j = 0; j < m0; ++j)
                if (row[j] >= 0) adj[i].push_back(row[j]);
        }
        std::fclose(f);

        std::vector<int32_t> out((size_t)nq * k, -1);
        // Warm one query (page-in), then time the batch. Queries start at
        // the stored entry point (leann.rs:889).
        search_layer(adj, x.data(), d, q.data(), entry, ef);
        auto t0 = clk::now();
        for (int i = 0; i < nq; ++i) {
            auto res = search_layer(adj, x.data(), d, q.data() + (size_t)i * d,
                                    entry, ef);
            for (int j = 0; j < k && j < (int)res.size(); ++j)
                out[(size_t)i * k + j] = res[j].id;
        }
        double secs = std::chrono::duration<double>(clk::now() - t0).count();
        std::printf("search_done nq=%d ef=%d secs=%.4f qps=%.1f\n", nq, ef,
                    secs, nq / secs);
        FILE* g = std::fopen(out_path, "wb");
        std::fwrite(out.data(), 4, out.size(), g);
        std::fclose(g);
        return 0;
    }
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}
