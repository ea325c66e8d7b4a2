// Native data-plane core: tar shard indexing + MDS sample slicing.
//
// The reference's data plane leans on native code in its dependencies
// (pillow-simd, mosaicml-streaming's C helpers, torchdata loaders —
// reference: sensecore/Dockerfile:26, SURVEY.md §2.2). This library is the
// TPU-host equivalent for the two hot parsing paths:
//
//   1. tar_index(): walk a webdataset tar shard and emit (name, offset,
//      size) for every regular file — Python's `tarfile` is pure Python and
//      dominates shard-read CPU time; this does one pass over the mmap'd
//      header blocks.
//   2. mds_sample_range(): compute the byte range of sample i inside an MDS
//      shard from the u32 offset table (see diffusion_tpu/data/mds.py for
//      the format).
//
// Built by tools/build_native.py into libdataio.so; diffusion_tpu/data/
// native.py loads it via ctypes and falls back to pure Python when absent.

#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

// One tar entry: header offset data for the caller.
struct TarEntry {
    uint64_t name_off;   // offset of the name string within the tar buffer
    uint32_t name_len;
    uint64_t data_off;   // offset of file payload
    uint64_t data_len;
};

static uint64_t parse_octal(const char* p, size_t n) {
    uint64_t v = 0;
    size_t i = 0;
    while (i < n && (p[i] == ' ' || p[i] == '\0')) i++;
    for (; i < n; i++) {
        char c = p[i];
        if (c < '0' || c > '7') break;
        v = (v << 3) | (uint64_t)(c - '0');
    }
    return v;
}

static uint64_t parse_size(const unsigned char* hdr) {
    // GNU/star base-256 extension: high bit of size[0] set
    const unsigned char* sz = hdr + 124;
    if (sz[0] & 0x80) {
        uint64_t v = sz[0] & 0x7f;
        for (int i = 1; i < 12; i++) v = (v << 8) | sz[i];
        return v;
    }
    return parse_octal((const char*)sz, 12);
}

static bool is_zero_block(const unsigned char* p) {
    for (int i = 0; i < 512; i++)
        if (p[i]) return false;
    return true;
}

// Index a tar held in memory (mmap'd by the caller). Fills up to
// `max_entries` TarEntry records; returns the number found, or -1 on a
// malformed archive. Handles ustar/GNU; pax extended headers and long-name
// entries are skipped over (their payloads are not emitted), matching what
// webdataset shards actually contain.
long tar_index(const unsigned char* buf, uint64_t len,
               TarEntry* out, long max_entries) {
    uint64_t pos = 0;
    long n = 0;
    int zero_blocks = 0;
    while (pos + 512 <= len) {
        const unsigned char* hdr = buf + pos;
        if (is_zero_block(hdr)) {
            if (++zero_blocks == 2) break;
            pos += 512;
            continue;
        }
        zero_blocks = 0;
        uint64_t size = parse_size(hdr);
        char typeflag = (char)hdr[156];
        uint64_t data_off = pos + 512;
        uint64_t padded = (size + 511) & ~511ULL;
        if (data_off + padded > len + 512) return -1;  // truncated
        if (typeflag == '0' || typeflag == '\0') {     // regular file
            if (n < max_entries) {
                uint32_t name_len = 0;
                while (name_len < 100 && hdr[name_len]) name_len++;
                out[n].name_off = pos;
                out[n].name_len = name_len;
                out[n].data_off = data_off;
                out[n].data_len = size;
            }
            n++;
        }
        pos = data_off + padded;
    }
    return n;
}

// MDS shard sample range: given the shard buffer, write [start, end) byte
// offsets of sample idx. Returns 0 on success, -1 on bounds error.
int mds_sample_range(const unsigned char* buf, uint64_t len, uint32_t idx,
                     uint64_t* start, uint64_t* end) {
    if (len < 4) return -1;
    uint32_t n;
    std::memcpy(&n, buf, 4);
    if (idx >= n) return -1;
    uint64_t table = 4;
    if (table + 4ULL * (n + 1) > len) return -1;
    uint32_t lo, hi;
    std::memcpy(&lo, buf + table + 4ULL * idx, 4);
    std::memcpy(&hi, buf + table + 4ULL * (idx + 1), 4);
    if (hi < lo || hi > len) return -1;
    *start = lo;
    *end = hi;
    return 0;
}

// Batch variant: fill starts/ends for all n samples at once (amortizes the
// ctypes call overhead for sequential scans).
int mds_sample_table(const unsigned char* buf, uint64_t len,
                     uint64_t* starts, uint64_t* ends, uint32_t max_n) {
    if (len < 4) return -1;
    uint32_t n;
    std::memcpy(&n, buf, 4);
    if (n > max_n) n = max_n;
    for (uint32_t i = 0; i < n; i++) {
        if (mds_sample_range(buf, len, i, &starts[i], &ends[i]) != 0)
            return -1;
    }
    return (int)n;
}

}  // extern "C"
