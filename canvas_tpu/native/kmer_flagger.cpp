// Native 35-mer uniqueness flagger (Tools/FlagUniqueKmers).
//
// Flags every genome position whose canonical 35-mer (min of the 70-bit
// 2-bit-packed forward key and its reverse complement, matching the
// reference's 9-byte string key, KmerChecker.GetKeyForKmer,
// KmerChecker.cs:30-105) occurs exactly once genome-wide.
//
// Memory is bounded the same way as the reference's 400M-entry multi-pass
// dictionary (FlagUniqueKmers/Main :231-298): n_passes passes over the
// genome, each keeping only kmers whose key hashes into the pass bucket,
// sorting (key, position) pairs and marking runs of length one.  Key
// extraction is a rolling O(1)/base update, parallelized over contig
// chunks; each pass costs one scan + one sort.
//
// Exposed via ctypes: see canvas_tpu/native/__init__.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#ifdef _OPENMP
#include <parallel/algorithm>
#define SORT __gnu_parallel::sort
#else
#define SORT std::sort
#endif

typedef unsigned __int128 u128;

static const int K = 35;

struct KeyPos {
    u128 key;
    int64_t pos;     // global position (offset into the concatenated genome)
};

static inline int base_code(uint8_t c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return -1;
    }
}

// Extract canonical keys for windows [lo, hi) of one contig (positions are
// window starts; contig spans seq[0..len)).  Keep a key only when
// (key * 0x9E3779B97F4A7C15) >> 32 % n_passes == pass (a cheap multiplicative
// hash so pass buckets are balanced even for skewed genomes).
static void extract_range(const uint8_t* seq, int64_t len, int64_t global_off,
                          int64_t lo, int64_t hi, int n_passes, int pass,
                          std::vector<KeyPos>* out) {
    if (hi > len - K + 1) hi = len - K + 1;
    if (lo >= hi) return;
    const u128 mask70 = (((u128)1) << 70) - 1;
    const int top_shift = 2 * (K - 1);                 // forward MSB weight
    u128 fwd = 0, rev = 0;
    int n_bad = 0;       // count of N bases in the current window
    // prime the first window at lo
    for (int j = 0; j < K; j++) {
        int c = base_code(seq[lo + j]);
        int cc;
        if (c < 0) { n_bad++; cc = 0; } else cc = c;
        fwd = ((fwd << 2) | (u128)cc) & mask70;
        rev |= ((u128)(3 - cc)) << (2 * j);
    }
    for (int64_t i = lo;; i++) {
        if (n_bad == 0) {
            u128 key = fwd < rev ? fwd : rev;
            uint64_t h = (uint64_t)(key ^ (key >> 64));
            h *= 0x9E3779B97F4A7C15ULL;
            if (n_passes <= 1 || (int)((h >> 32) % (uint64_t)n_passes) == pass)
                out->push_back({key, global_off + i});
        }
        if (i + 1 >= hi) break;
        // roll: drop base i, add base i+K
        int c_out = base_code(seq[i]);
        int c_in = base_code(seq[i + K]);
        if (c_out < 0) n_bad--;
        if (c_in < 0) n_bad++;
        int cc_out = c_out < 0 ? 0 : c_out;
        int cc_in = c_in < 0 ? 0 : c_in;
        fwd = ((fwd << 2) | (u128)cc_in) & mask70;
        // rev: remove (3-cc_out) at weight 0 side?  rev holds complement of
        // window reversed: base at window offset j has weight j.  After the
        // shift the old offset-0 base must leave from weight 0 and the new
        // base enters at weight K-1.
        rev = (rev >> 2) | (((u128)(3 - cc_in)) << top_shift);
        (void)cc_out;
    }
}

extern "C" int64_t flag_unique_kmers(
    const uint8_t* seq,          // concatenated contig bytes
    const int64_t* offsets,      // n_contigs+1 offsets into seq
    int32_t n_contigs,
    uint8_t* out_mask,           // same length as seq; 1 = unique start
    int32_t n_passes,
    int32_t n_threads) {
    if (n_passes < 1) n_passes = 1;
    if (n_threads <= 0) {
        n_threads = (int32_t)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 4;
    }
    int64_t total = offsets[n_contigs];
    std::memset(out_mask, 0, (size_t)total);

    for (int pass = 0; pass < n_passes; pass++) {
        // chunk work: (contig, lo, hi) ranges of ~8M windows
        struct Chunk { int contig; int64_t lo, hi; };
        std::vector<Chunk> chunks;
        const int64_t CHUNK = 8 << 20;
        for (int c = 0; c < n_contigs; c++) {
            int64_t len = offsets[c + 1] - offsets[c];
            int64_t n_win = len - K + 1;
            for (int64_t lo = 0; lo < n_win; lo += CHUNK)
                chunks.push_back({c, lo, std::min(lo + CHUNK, n_win)});
        }
        std::vector<std::vector<KeyPos>> results(chunks.size());
        std::atomic<size_t> next(0);
        auto worker = [&]() {
            for (;;) {
                size_t i = next.fetch_add(1);
                if (i >= chunks.size()) break;
                const Chunk& ch = chunks[i];
                extract_range(seq + offsets[ch.contig],
                              offsets[ch.contig + 1] - offsets[ch.contig],
                              offsets[ch.contig], ch.lo, ch.hi,
                              n_passes, pass, &results[i]);
            }
        };
        std::vector<std::thread> pool;
        for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
        for (auto& t : pool) t.join();

        size_t n_keys = 0;
        for (auto& r : results) n_keys += r.size();
        std::vector<KeyPos> all;
        all.reserve(n_keys);
        for (auto& r : results) {
            all.insert(all.end(), r.begin(), r.end());
            std::vector<KeyPos>().swap(r);
        }
        SORT(all.begin(), all.end(),
             [](const KeyPos& a, const KeyPos& b) { return a.key < b.key; });
        for (size_t i = 0; i < all.size();) {
            size_t j = i + 1;
            while (j < all.size() && all[j].key == all[i].key) j++;
            if (j - i == 1) out_mask[all[i].pos] = 1;
            i = j;
        }
    }
    return total;
}
