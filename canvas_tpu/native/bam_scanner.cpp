// Native BAM scanner — the production ingest path for canvas_tpu.
//
// Replaces the Python BGZF/record walk with a streaming multithreaded C++
// pass (the reference's equivalent, Isas.SequencingFiles BamReader, was
// compiled code too):
//   * the file is read in bounded windows; each window's BGZF blocks are
//     decompressed in parallel with zlib raw inflate, so memory stays
//     O(window), not O(file) — a 60x WGS BAM never lives in RAM;
//   * records are scanned once per call for ALL contigs:
//       - scan_read_starts_all: the CanvasBin read-start filter (mapped,
//         pass-filter, non-duplicate, forward, primary, CIGAR >= 35M,
//         proper pair; CanvasBin.cs:239-267), incrementing per-contig
//         observed[] byte arrays (saturating at 255);
//       - pileup_sites_all: the CanvasSNV base pileup (SNVReviewer.cs
//         ProcessBamFile/ProcessReadBases :172-271): MAPQ > min, baseQ >=
//         20, CIGAR M-walk, ref/alt base counting at sorted het sites.
//   * single-contig wrappers keep the older ABI.
//
// Exposed via a C ABI and loaded with ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -o libbam_scanner.so bam_scanner.cpp -lz
//        -lpthread

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr size_t RAW_WINDOW = 32u << 20;  // compressed bytes per read()

struct Block {
    size_t raw_offset;     // within the current raw window
    size_t comp_size;      // total BGZF block size
    size_t uncomp_size;    // ISIZE
    size_t out_offset;     // within the window's decoded append region
};

// Parse BGZF block boundaries available in raw[0:n]; stops at a partial
// trailing block.  Returns bytes consumed (sum of complete block sizes).
static size_t index_blocks(const uint8_t* data, size_t n,
                           std::vector<Block>& blocks, size_t& out_total,
                           bool& bad) {
    size_t pos = 0;
    bad = false;
    while (pos + 18 <= n) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) {
            bad = true;
            break;
        }
        uint16_t xlen;
        std::memcpy(&xlen, data + pos + 10, 2);
        size_t epos = pos + 12;
        size_t eend = epos + xlen;
        if (eend > n) break;  // partial header
        uint32_t bsize = 0;
        while (epos + 4 <= eend) {
            uint8_t si1 = data[epos], si2 = data[epos + 1];
            uint16_t slen;
            std::memcpy(&slen, data + epos + 2, 2);
            if (si1 == 66 && si2 == 67) {
                uint16_t b;
                std::memcpy(&b, data + epos + 4, 2);
                bsize = static_cast<uint32_t>(b) + 1;
            }
            epos += 4 + slen;
        }
        if (bsize == 0) {
            bad = true;
            break;
        }
        if (pos + bsize > n) break;  // partial block
        uint32_t isize;
        std::memcpy(&isize, data + pos + bsize - 4, 4);
        if (isize > 65536) {  // BGZF spec caps uncompressed blocks at 64KB
            bad = true;
            break;
        }
        blocks.push_back({pos, bsize, isize, out_total});
        out_total += isize;
        pos += bsize;
    }
    return pos;
}

// zs must be an initialized raw-inflate stream; it is Reset (not
// re-allocated) per block — inflateInit2/inflateEnd per 64KB BGZF block
// costs ~10% of the scan in allocator traffic.
static bool inflate_block(const uint8_t* raw, const Block& b, uint8_t* dst,
                          z_stream& zs) {
    uint16_t xlen;
    std::memcpy(&xlen, raw + b.raw_offset + 10, 2);
    const uint8_t* payload = raw + b.raw_offset + 12 + xlen;
    size_t payload_len = b.comp_size - 12 - xlen - 8;
    if (inflateReset(&zs) != Z_OK) return false;
    zs.next_in = const_cast<uint8_t*>(payload);
    zs.avail_in = static_cast<uInt>(payload_len);
    zs.next_out = dst + b.out_offset;
    zs.avail_out = static_cast<uInt>(b.uncomp_size);
    int rc = inflate(&zs, Z_FINISH);
    return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0) ||
           (b.uncomp_size == 0);
}

// Streaming BGZF reader: bounded raw window + decoded carry buffer.
//
// Decoding is double-buffered: a prefetch thread reads + indexes +
// inflates window N+1 while the caller walks the records of window N, so
// the (single-threaded) record walk overlaps the (multi-threaded)
// inflate instead of alternating with it.
class BamStream {
  public:
    explicit BamStream(const char* path, int n_threads,
                       size_t window = RAW_WINDOW)
        : nt_(n_threads > 0
                  ? n_threads
                  : static_cast<int>(std::thread::hardware_concurrency())),
          window_(window) {
        if (nt_ < 1) nt_ = 1;
        f_ = std::fopen(path, "rb");
    }
    ~BamStream() {
        join_prefetch();
        if (f_) std::fclose(f_);
    }
    bool ok() const { return f_ != nullptr && !bad_; }

    // Ensure >= want decoded-but-unconsumed bytes (unless EOF).  Returns
    // the number available.
    size_t ensure(size_t want) {
        while (dec_.size() - dec_pos_ < want && !drained()) {
            if (!fill()) break;
        }
        return dec_.size() - dec_pos_;
    }
    const uint8_t* data() const { return dec_.data() + dec_pos_; }
    void consume(size_t n) { dec_pos_ += n; }
    bool failed() const { return bad_; }

  private:
    // done_ is a fill-side snapshot taken AFTER joining the prefetch
    // thread; eof_/raw_len_ themselves are owned by the prefetch thread
    // while it runs and must not be read here concurrently.
    bool drained() const { return done_; }

    // Runs on the prefetch thread: top up the raw window, index its BGZF
    // blocks, inflate them in parallel into pf_out_.  Owns raw_/raw_len_/
    // eof_/f_ while running (fill() joins before touching them).
    void prefetch_job() {
        pf_out_.clear();
        pf_bad_ = false;
        pf_progressed_ = false;
        if (!eof_) {
            size_t old = raw_len_;
            raw_.resize(old + window_);
            size_t got = std::fread(raw_.data() + old, 1, window_, f_);
            raw_len_ = old + got;
            raw_.resize(raw_len_);
            if (got < window_) {
                eof_ = true;
                // a short read from an I/O ERROR must not masquerade as
                // end-of-file (silent partial counts)
                if (std::ferror(f_)) {
                    pf_bad_ = true;
                    return;
                }
            }
            if (got > 0) pf_progressed_ = true;
        }
        if (raw_len_ == 0) return;
        std::vector<Block> blocks;
        size_t out_total = 0;
        bool bad = false;
        size_t consumed = index_blocks(raw_.data(), raw_len_, blocks,
                                       out_total, bad);
        if (bad || (blocks.empty() && eof_)) {
            // at EOF, leftover bytes that cannot form a complete BGZF
            // block mean the file was truncated — fail instead of
            // silently dropping the tail (and everything counted so far
            // looking complete)
            if (bad || raw_len_ > 0) pf_bad_ = true;
            raw_len_ = 0;
            raw_.clear();
            return;
        }
        if (blocks.empty()) return;  // need a bigger window next round
        pf_out_.resize(out_total);
        std::atomic<size_t> next{0};
        std::atomic<bool> ok{true};
        auto worker = [&]() {
            z_stream zs{};
            if (inflateInit2(&zs, -15) != Z_OK) {
                ok.store(false);
                return;
            }
            for (;;) {
                size_t i = next.fetch_add(1);
                if (i >= blocks.size()) break;
                if (blocks[i].uncomp_size == 0) continue;
                if (!inflate_block(raw_.data(), blocks[i], pf_out_.data(),
                                   zs))
                    ok.store(false);
            }
            inflateEnd(&zs);
        };
        int nt = nt_ > static_cast<int>(blocks.size())
                     ? static_cast<int>(blocks.size())
                     : nt_;
        std::vector<std::thread> threads;
        for (int t = 1; t < nt; t++) threads.emplace_back(worker);
        worker();
        for (auto& th : threads) th.join();
        if (!ok.load()) {
            pf_bad_ = true;
            return;
        }
        pf_progressed_ = true;
        // keep the unconsumed raw tail
        std::memmove(raw_.data(), raw_.data() + consumed,
                     raw_len_ - consumed);
        raw_len_ -= consumed;
        raw_.resize(raw_len_);
    }

    void start_prefetch() {
        pf_running_ = true;
        pf_thread_ = std::thread([this]() {
            try {
                prefetch_job();
            } catch (...) {   // e.g. bad_alloc on a corrupt-size block:
                pf_bad_ = true;  // surface as an error, don't terminate()
            }
        });
    }

    void join_prefetch() {
        if (pf_thread_.joinable()) pf_thread_.join();
    }

    bool fill() {
        if (!pf_running_) start_prefetch();
        join_prefetch();
        pf_running_ = false;
        if (pf_bad_) {
            bad_ = true;
            return false;
        }
        bool progressed = pf_progressed_;
        if (!pf_out_.empty()) {
            // compact consumed decoded bytes, append the new window
            if (dec_pos_ > 0) {
                dec_.erase(dec_.begin(),
                           dec_.begin() + static_cast<ptrdiff_t>(dec_pos_));
                dec_pos_ = 0;
            }
            dec_.insert(dec_.end(), pf_out_.begin(), pf_out_.end());
            pf_out_.clear();
        }
        // pipeline the next window while the caller walks this one
        done_ = (eof_ && raw_len_ == 0);
        if (!done_) start_prefetch();
        return progressed;
    }

    FILE* f_ = nullptr;
    int nt_;
    size_t window_ = RAW_WINDOW;
    std::vector<uint8_t> raw_;
    size_t raw_len_ = 0;
    bool eof_ = false;
    bool bad_ = false;
    std::vector<uint8_t> dec_;
    size_t dec_pos_ = 0;
    bool done_ = false;
    // prefetch state (owned by the prefetch thread between start/join)
    std::thread pf_thread_;
    bool pf_running_ = false;
    std::vector<uint8_t> pf_out_;
    bool pf_bad_ = false;
    bool pf_progressed_ = false;
};

constexpr uint16_t FLAG_PROPER = 0x2;
constexpr uint16_t FLAG_UNMAPPED = 0x4;
constexpr uint16_t FLAG_REVERSE = 0x10;
constexpr uint16_t FLAG_SECONDARY = 0x100;
constexpr uint16_t FLAG_FAILQC = 0x200;
constexpr uint16_t FLAG_DUP = 0x400;
constexpr uint16_t FLAG_SUPPL = 0x800;

// Parse the BAM header from a stream; fills lengths/names if non-null.
// Returns n_ref, or -1 on error.  Leaves the stream at the first record.
static int32_t parse_header(BamStream& s, int64_t* lengths, char* names_buf,
                            int64_t names_buf_size, int32_t max_refs) {
    if (s.ensure(12) < 12) return -1;
    if (std::memcmp(s.data(), "BAM\x01", 4) != 0) return -1;
    int32_t l_text;
    std::memcpy(&l_text, s.data() + 4, 4);
    size_t need = 8 + static_cast<size_t>(l_text) + 4;
    if (s.ensure(need) < need) return -1;
    int32_t n_ref;
    std::memcpy(&n_ref, s.data() + 8 + l_text, 4);
    s.consume(need);
    int64_t name_off = 0;
    for (int32_t i = 0; i < n_ref; i++) {
        if (s.ensure(4) < 4) return -1;
        int32_t l_name;
        std::memcpy(&l_name, s.data(), 4);
        size_t entry = 4 + static_cast<size_t>(l_name) + 4;
        if (s.ensure(entry) < entry) return -1;
        if (i < max_refs) {
            if (names_buf && name_off + l_name <= names_buf_size) {
                std::memcpy(names_buf + name_off, s.data() + 4,
                            static_cast<size_t>(l_name));
                name_off += l_name;  // includes the NUL
            }
            int32_t l_ref;
            std::memcpy(&l_ref, s.data() + 4 + l_name, 4);
            if (lengths) lengths[i] = l_ref;
        }
        s.consume(entry);
    }
    return n_ref;
}

// Stream every alignment record, invoking visit(rec_ptr, rec_len).  The
// visitor returns false to stop early.
template <typename Visitor>
static bool for_each_record(BamStream& s, Visitor&& visit) {
    for (;;) {
        if (s.ensure(4) < 4) return !s.failed();
        int32_t block_size;
        std::memcpy(&block_size, s.data(), 4);
        if (block_size < 32) return false;
        size_t need = 4 + static_cast<size_t>(block_size);
        if (s.ensure(need) < need) return !s.failed();
        if (!visit(s.data() + 4, static_cast<size_t>(block_size)))
            return true;
        s.consume(need);
    }
}

}  // namespace

extern "C" {

// One streaming pass accumulating read-start counts for ALL references.
// observed_flat is a single uint8 buffer; ref_offsets[n_refs + 1] are the
// per-reference slices (offsets in positions).  paired_end != 0 requires
// proper pairs; binary_mode != 0 stores 1 instead of incrementing.
// Returns number of kept reads, or -1 on error.
int64_t scan_read_starts_all(const char* path, uint8_t* observed_flat,
                             const int64_t* ref_offsets, int32_t n_refs,
                             int32_t paired_end, int32_t binary_mode,
                             int32_t n_threads) {
    BamStream s(path, n_threads);
    if (!s.ok()) return -1;
    if (parse_header(s, nullptr, nullptr, 0, 0) < 0) return -1;
    int64_t kept = 0;
    bool ok = for_each_record(s, [&](const uint8_t* p, size_t len) {
        if (len < 36) return true;
        int32_t ref_id, pos;
        std::memcpy(&ref_id, p, 4);
        std::memcpy(&pos, p + 4, 4);
        if (ref_id < 0 || ref_id >= n_refs) return true;
        uint8_t l_read_name = p[8];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, p + 12, 2);
        std::memcpy(&flag, p + 14, 2);
        // CanvasBin filter (CanvasBin.cs:239-249)
        if (flag & (FLAG_UNMAPPED | FLAG_FAILQC | FLAG_DUP | FLAG_REVERSE |
                    FLAG_SECONDARY | FLAG_SUPPL))
            return true;
        if (n_cigar == 0) return true;
        uint32_t cigar0;
        std::memcpy(&cigar0, p + 32 + l_read_name, 4);
        if ((cigar0 & 0xF) != 0 /* not M */ || (cigar0 >> 4) < 35)
            return true;
        if (paired_end && !(flag & FLAG_PROPER)) return true;
        int64_t ref_len = ref_offsets[ref_id + 1] - ref_offsets[ref_id];
        if (pos < 0 || pos >= ref_len) return true;
        uint8_t* obs = observed_flat + ref_offsets[ref_id];
        kept++;
        if (binary_mode) {
            obs[pos] = 1;
        } else if (obs[pos] != 255) {
            obs[pos]++;
        }
        return true;
    });
    return ok ? kept : -1;
}

// GCContentWeighted ingest (CanvasBin.cs:261-266): like
// scan_read_starts_all but also records the forward fragment length at
// each kept read start into frag_flat (int16, clamp(tlen, 0, 32767),
// last write wins like the sequential reference loop).
int64_t scan_with_fragments_all(const char* path, uint8_t* observed_flat,
                                int16_t* frag_flat,
                                const int64_t* ref_offsets, int32_t n_refs,
                                int32_t paired_end, int32_t n_threads) {
    BamStream s(path, n_threads);
    if (!s.ok()) return -1;
    if (parse_header(s, nullptr, nullptr, 0, 0) < 0) return -1;
    int64_t kept = 0;
    bool ok = for_each_record(s, [&](const uint8_t* p, size_t len) {
        if (len < 36) return true;
        int32_t ref_id, pos;
        std::memcpy(&ref_id, p, 4);
        std::memcpy(&pos, p + 4, 4);
        if (ref_id < 0 || ref_id >= n_refs) return true;
        uint8_t l_read_name = p[8];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, p + 12, 2);
        std::memcpy(&flag, p + 14, 2);
        if (flag & (FLAG_UNMAPPED | FLAG_FAILQC | FLAG_DUP | FLAG_REVERSE |
                    FLAG_SECONDARY | FLAG_SUPPL))
            return true;
        if (n_cigar == 0) return true;
        uint32_t cigar0;
        std::memcpy(&cigar0, p + 32 + l_read_name, 4);
        if ((cigar0 & 0xF) != 0 || (cigar0 >> 4) < 35) return true;
        if (paired_end && !(flag & FLAG_PROPER)) return true;
        int64_t ref_len = ref_offsets[ref_id + 1] - ref_offsets[ref_id];
        if (pos < 0 || pos >= ref_len) return true;
        kept++;
        int64_t base = ref_offsets[ref_id];
        uint8_t* obs = observed_flat + base;
        if (obs[pos] != 255) obs[pos]++;
        int32_t tlen;
        std::memcpy(&tlen, p + 28, 4);
        if (tlen > 32767) tlen = 32767;
        if (tlen < 0) tlen = 0;
        frag_flat[base + pos] = static_cast<int16_t>(tlen);
        return true;
    });
    return ok ? kept : -1;
}

// Single-reference wrapper (older ABI): one streaming pass, counts only
// target_ref, early-exits once the coordinate-sorted stream passes it.
int64_t scan_read_starts(const char* path, int32_t target_ref,
                         uint8_t* observed, int64_t ref_length,
                         int32_t paired_end, int32_t binary_mode,
                         int32_t n_threads) {
    BamStream s(path, n_threads);
    if (!s.ok()) return -1;
    if (parse_header(s, nullptr, nullptr, 0, 0) < 0) return -1;
    int64_t kept = 0;
    bool ok = for_each_record(s, [&](const uint8_t* p, size_t len) {
        if (len < 36) return true;
        int32_t ref_id, pos;
        std::memcpy(&ref_id, p, 4);
        std::memcpy(&pos, p + 4, 4);
        if (target_ref >= 0 && ref_id > target_ref) return false;
        if (ref_id != target_ref) return true;
        uint8_t l_read_name = p[8];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, p + 12, 2);
        std::memcpy(&flag, p + 14, 2);
        if (flag & (FLAG_UNMAPPED | FLAG_FAILQC | FLAG_DUP | FLAG_REVERSE |
                    FLAG_SECONDARY | FLAG_SUPPL))
            return true;
        if (n_cigar == 0) return true;
        uint32_t cigar0;
        std::memcpy(&cigar0, p + 32 + l_read_name, 4);
        if ((cigar0 & 0xF) != 0 || (cigar0 >> 4) < 35) return true;
        if (paired_end && !(flag & FLAG_PROPER)) return true;
        if (pos < 0 || pos >= ref_length) return true;
        kept++;
        if (binary_mode) {
            observed[pos] = 1;
        } else if (observed[pos] != 255) {
            observed[pos]++;
        }
        return true;
    });
    return ok ? kept : -1;
}

// CanvasSNV pileup (SNVReviewer.cs:172-271) over ALL references in one
// streaming pass.  positions: sorted 0-based site positions, grouped by
// reference via site_offsets[n_refs + 1]; ref_codes/alt_codes: 4-bit BAM
// base codes (A=1, C=2, G=4, T=8) per site.  Counts land in count_ref /
// count_alt (int32, aligned with positions).  Filters: primary mapped
// non-duplicate reads with MAPQ > min_mapq; bases with quality >=
// min_baseq; CIGAR M consumes both, I/S consume read, D consumes
// reference, anything else ends the walk (matches the Python reader and
// SNVReviewer.ProcessReadBases).  Returns processed read count or -1.
int64_t pileup_sites_all(const char* path, const int64_t* positions,
                         const int64_t* site_offsets, int32_t n_refs,
                         const uint8_t* ref_codes, const uint8_t* alt_codes,
                         int32_t* count_ref, int32_t* count_alt,
                         int32_t min_mapq, int32_t min_baseq,
                         int32_t n_threads) {
    BamStream s(path, n_threads);
    if (!s.ok()) return -1;
    if (parse_header(s, nullptr, nullptr, 0, 0) < 0) return -1;
    int64_t used = 0;
    int32_t cur_ref = -1;
    int64_t next_site = 0;   // index into positions, within current ref
    bool ok = for_each_record(s, [&](const uint8_t* p, size_t len) {
        if (len < 36) return true;
        int32_t ref_id, pos;
        std::memcpy(&ref_id, p, 4);
        std::memcpy(&pos, p + 4, 4);
        if (ref_id < 0 || ref_id >= n_refs) return true;
        if (ref_id != cur_ref) {
            if (ref_id < cur_ref) return true;  // unsorted tail record
            cur_ref = ref_id;
            next_site = site_offsets[ref_id];
        }
        const int64_t site_end = site_offsets[ref_id + 1];
        if (next_site >= site_end &&
            ref_id == n_refs - 1)  // nothing left anywhere
            return false;
        uint8_t l_read_name = p[8];
        uint8_t mapq = p[9];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, p + 12, 2);
        std::memcpy(&flag, p + 14, 2);
        int32_t l_seq;
        std::memcpy(&l_seq, p + 16, 4);
        if (flag & (FLAG_UNMAPPED | FLAG_SECONDARY | FLAG_SUPPL | FLAG_DUP))
            return true;
        if (mapq <= min_mapq) return true;
        while (next_site < site_end && positions[next_site] < pos)
            next_site++;
        if (next_site >= site_end) return true;
        if (static_cast<int64_t>(pos) + 1000 < positions[next_site])
            return true;
        const uint8_t* cigar = p + 32 + l_read_name;
        const uint8_t* seq = cigar + 4 * n_cigar;
        const uint8_t* qual = seq + (l_seq + 1) / 2;
        if (static_cast<size_t>(qual - p) + l_seq > len) return true;
        int64_t position = pos;
        int64_t base_index = 0;
        int64_t vi = next_site;
        for (uint16_t c = 0; c < n_cigar; c++) {
            uint32_t cv;
            std::memcpy(&cv, cigar + 4 * c, 4);
            uint32_t op = cv & 0xF;
            int64_t clen = cv >> 4;
            if (op == 0) {  // M: consumes both
                int64_t seg_end = position + clen;
                while (vi < site_end && positions[vi] < position) vi++;
                while (vi < site_end && positions[vi] < seg_end) {
                    int64_t bi = base_index + (positions[vi] - position);
                    if (qual[bi] >= min_baseq) {
                        uint8_t code = seq[bi >> 1];
                        code = (bi & 1) ? (code & 0xF) : (code >> 4);
                        if (code == ref_codes[vi]) count_ref[vi]++;
                        if (code == alt_codes[vi]) count_alt[vi]++;
                    }
                    vi++;
                }
                position = seg_end;
                base_index += clen;
            } else if (op == 1 || op == 4) {  // I / S: consumes read
                base_index += clen;
            } else if (op == 2) {  // D: consumes reference
                position += clen;
            } else {
                break;
            }
        }
        used++;
        return true;
    });
    return ok ? used : -1;
}

// Return the number of references and write their lengths into lengths[]
// (up to max_refs); names are written NUL-separated into names_buf.
int32_t read_bam_header(const char* path, int64_t* lengths, char* names_buf,
                        int64_t names_buf_size, int32_t max_refs) {
    // small window: a header is a few KB-to-MB at the front of the file;
    // the default 32MB window would inflate ~150MB single-threaded first
    BamStream s(path, 1, 256u << 10);
    if (!s.ok()) return -1;
    return parse_header(s, lengths, names_buf, names_buf_size, max_refs);
}

}  // extern "C"
