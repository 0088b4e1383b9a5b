// Native host kernels for graph pointer-chasing passes.
//
// The device (JAX/Pallas) owns the compute path; these C++ kernels cover
// the host-side irregular passes that stay off-device by design (SURVEY
// §7: "graph cleaning is inherently sequential/irregular — accept host
// execution"), replacing the reference's same-purpose C++
// (asg_arc_del_trans Overlaps.cpp:5357, the ma_hit_sub event sweep
// :1931) behind a ctypes ABI. Built by native/build.py with g++ -O3.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Myers transitive reduction over a CSR arc table (vertex = rid<<1|dir).
// Arrays mirror graph/sg.py's StringGraph columns. Already-reduced arcs
// keep providing reachability within the pass, like the reference.
int64_t ht_trans_reduce(int64_t n_vtx,
                        const int64_t* idx_s, const int64_t* idx_n,
                        const uint32_t* av, const int64_t* alen,
                        const uint8_t* seq_del, uint8_t* del_,
                        int64_t fuzz) {
    std::vector<uint8_t> mark(n_vtx, 0);
    int64_t n_reduced = 0;
    for (int64_t v = 0; v < n_vtx; ++v) {
        int64_t s = idx_s[v], n = idx_n[v];
        if (n == 0) continue;
        if (seq_del[v >> 1]) {
            for (int64_t i = 0; i < n; ++i)
                if (!del_[s + i]) { del_[s + i] = 1; ++n_reduced; }
            continue;
        }
        for (int64_t i = 0; i < n; ++i) mark[av[s + i]] = 1;
        int64_t L = alen[s + n - 1] + fuzz;
        for (int64_t i = 0; i < n; ++i) {
            uint32_t w = av[s + i];
            if (mark[w] != 1) continue;
            int64_t ws = idx_s[w], wn = idx_n[w];
            int64_t li = alen[s + i];
            for (int64_t j = 0; j < wn && alen[ws + j] + li <= L; ++j) {
                uint32_t x = av[ws + j];
                if (mark[x]) mark[x] = 2;
            }
        }
        for (int64_t i = 0; i < n; ++i) {
            uint32_t w = av[s + i];
            if (mark[w] == 2 && !del_[s + i]) { del_[s + i] = 1; ++n_reduced; }
            mark[w] = 0;
        }
    }
    return n_reduced;
}

// Longest >=min_dp coverage subregion per read (~ma_hit_sub event sweep).
// events: per read a [qs*2, qe*2+1] list; CSR offsets ev_off per read.
void ht_coverage_sub(int64_t n_reads, const int64_t* ev_off,
                     int64_t* events /* sorted in-place per read */,
                     int64_t min_dp, int64_t* out_s, int64_t* out_e) {
    for (int64_t r = 0; r < n_reads; ++r) {
        int64_t a = ev_off[r], b = ev_off[r + 1];
        std::sort(events + a, events + b);
        int64_t dp = 0, start = 0, bs = 0, be = 0;
        for (int64_t i = a; i < b; ++i) {
            int64_t x = events[i];
            int64_t old = dp;
            dp += (x & 1) ? -1 : 1;
            if (old < min_dp && dp >= min_dp) start = x >> 1;
            else if (old >= min_dp && dp < min_dp) {
                int64_t len = (x >> 1) - start;
                if (len > be - bs) { bs = start; be = x >> 1; }
            }
        }
        out_s[r] = bs;
        out_e[r] = be;
    }
}

}  // extern "C"
