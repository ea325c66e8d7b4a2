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
#include <cmath>

#ifdef HAVE_JPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif

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

// ---------------------------------------------------------------------------
// Native JPEG decode + LargestCenterSquare resize (the raw-image hot path).
//
// The reference feeds its GPUs from pillow-simd (sensecore/Dockerfile:26) +
// torchvision transforms (datasets/laion/transforms.py:9-21). Here the whole
// decode->resize->normalize chain runs in one C call that releases the GIL
// (ctypes), so thread-pool loader workers scale across host cores without
// process fan-out:
//   - libjpeg(-turbo) DCT-scaled decode (scale_num/8 chosen so the decoded
//     short side stays >= min_short — the PIL `draft()` trick, but exact),
//   - vertical crop via scanline skipping (only the centered square's rows
//     are ever decompressed when the build has jpeg_skip_scanlines),
//   - PIL-parity separable bicubic resample (support scaled by the zoom
//     factor, the antialias behavior of PIL >= 9) of the centered square to
//     (size x size),
//   - [-1, 1] float32 HWC output (the SD train contract,
//     reference datasets/image_caption.py:160-166 Normalize(0.5, 0.5)).
//
// Returns 0 on success; any failure (CMYK, truncated data, absent libjpeg)
// returns <0 and the Python side falls back to the tolerant PIL path.

#ifdef HAVE_JPEG

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = (JpegErr*)cinfo->err;
    longjmp(e->jb, 1);
}

static void jpeg_err_silent(j_common_ptr, int) {}
static void jpeg_err_silent_msg(j_common_ptr) {}

// PIL's bicubic kernel (a = -0.5), support 2.
static inline double bicubic_w(double x) {
    x = std::fabs(x);
    if (x < 1.0) return ((1.5 * x - 2.5) * x) * x + 1.0;
    if (x < 2.0) return ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0;
    return 0.0;
}

// Precompute PIL-style resample coefficients for one axis: output index i
// samples input centered at (crop0 + (i + 0.5) * in_span / out_n) with the
// kernel stretched by max(scale, 1) (antialias on downscale).
// bounds[2*i] = first input index, bounds[2*i+1] = count; weights stride ksize.
static int resample_coeffs(int in_size, double crop0, double in_span,
                           int out_n, int** bounds_out, float** weights_out) {
    double scale = in_span / out_n;
    // integral-aligned identity (DCT scaling often lands exactly on the
    // target): single unit tap per output pixel — the resample loop then
    // degenerates to a crop-copy instead of a 4-5 tap convolution
    bool identity = scale == 1.0 && crop0 == std::floor(crop0);
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = 2.0 * filterscale;
    int ksize = identity ? 1 : (int)std::ceil(support) * 2 + 1;
    int* bounds = (int*)std::malloc(sizeof(int) * 2 * out_n);
    float* weights = (float*)std::malloc(sizeof(float) * ksize * out_n);
    if (!bounds || !weights) { std::free(bounds); std::free(weights); return -1; }
    for (int i = 0; i < out_n; i++) {
        if (identity) {
            int x = (int)crop0 + i;
            if (x >= in_size) x = in_size - 1;
            bounds[2 * i] = x;
            bounds[2 * i + 1] = 1;
            weights[i] = 1.0f;
            continue;
        }
        double center = crop0 + (i + 0.5) * scale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        int n = xmax - xmin;
        if (n > ksize) n = ksize;
        float* w = weights + (size_t)i * ksize;
        double total = 0.0;
        for (int j = 0; j < n; j++) {
            w[j] = (float)bicubic_w((xmin + j + 0.5 - center) / filterscale);
            total += w[j];
        }
        if (total != 0.0)
            for (int j = 0; j < n; j++) w[j] = (float)(w[j] / total);
        bounds[2 * i] = xmin;
        bounds[2 * i + 1] = n;
    }
    *bounds_out = bounds;
    *weights_out = weights;
    return ksize;
}

// Decode `jpg` and write the LargestCenterSquare crop resized to
// (size, size, 3) float32 in [-1, 1] into `out`. `min_short`: smallest
// acceptable decoded short side (DCT-scale headroom; pass `size` for max
// speed, 2*size for PIL-draft quality parity). Returns 0 ok, <0 error.
int jpeg_decode_square(const unsigned char* jpg, uint64_t len, int size,
                       int min_short, float* out) {
    if (size <= 0 || len < 4) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_err_exit;
    err.mgr.emit_message = jpeg_err_silent;
    err.mgr.output_message = jpeg_err_silent_msg;
    unsigned char* row = nullptr;
    float* tmp = nullptr;       // horizontal-resized rows: side_h x size x 3
    int* xb = nullptr; float* xw = nullptr;
    int* yb = nullptr; float* yw = nullptr;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::free(row); std::free(tmp);
        std::free(xb); std::free(xw); std::free(yb); std::free(yw);
        return -2;  // corrupt/truncated stream
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(jpg), len);
    jpeg_read_header(&cinfo, TRUE);
    if (cinfo.jpeg_color_space == JCS_CMYK ||
        cinfo.jpeg_color_space == JCS_YCCK) {
        jpeg_destroy_decompress(&cinfo);
        return -3;  // PIL handles the exotic spaces
    }
    cinfo.out_color_space = JCS_RGB;
    // DCT scaling: smallest n/8 with decoded short side >= min_short
    // (never upscale a source already smaller)
    unsigned full_short = cinfo.image_width < cinfo.image_height
        ? cinfo.image_width : cinfo.image_height;
    if (min_short < size) min_short = size;
    int num = 8;
    for (int n = 1; n < 8; n++) {
        if (full_short * (unsigned)n >= (unsigned)min_short * 8u) {
            num = n;
            break;
        }
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
    jpeg_start_decompress(&cinfo);
    const int W = cinfo.output_width, H = cinfo.output_height;
    if (W < 1 || H < 1 || cinfo.output_components != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return -4;
    }
    // PIL LargestCenterSquare: resize short side to `size` (dims rounded),
    // then center-crop — mapped back to source coordinates so the resample
    // below IS the reference transform in one pass.
    double scale = (double)size / (W < H ? W : H);
    long nw = std::lround(W * scale); if (nw < size) nw = size;
    long nh = std::lround(H * scale); if (nh < size) nh = size;
    long left = (nw - size) / 2, top = (nh - size) / 2;
    double crop_x0 = (double)left * W / nw;
    double span_x = (double)size * W / nw;
    double crop_y0 = (double)top * H / nh;
    double span_y = (double)size * H / nh;

    int kx = resample_coeffs(W, crop_x0, span_x, size, &xb, &xw);
    int ky = resample_coeffs(H, crop_y0, span_y, size, &yb, &yw);
    row = (unsigned char*)std::malloc((size_t)W * 3);
    // rows actually touched by the vertical kernel
    int y_first = ky > 0 ? yb[0] : 0;
    int y_last = ky > 0 ? yb[2 * (size - 1)] + yb[2 * (size - 1) + 1] : 0;
    tmp = (float*)std::malloc(sizeof(float) * (size_t)(y_last - y_first)
                              * size * 3);
    if (kx < 0 || ky < 0 || !row || !tmp) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        std::free(row); std::free(tmp);
        std::free(xb); std::free(xw); std::free(yb); std::free(yw);
        return -5;
    }
#if JPEG_LIB_VERSION >= 62 && defined(LIBJPEG_TURBO_VERSION)
    if (y_first > 0)
        jpeg_skip_scanlines(&cinfo, (JDIMENSION)y_first);
#else
    while ((int)cinfo.output_scanline < y_first) {
        JSAMPROW rp = row;
        jpeg_read_scanlines(&cinfo, &rp, 1);
    }
#endif
    // decode + horizontal resample, one scanline at a time
    while ((int)cinfo.output_scanline < y_last) {
        int y = (int)cinfo.output_scanline;
        JSAMPROW rp = row;
        jpeg_read_scanlines(&cinfo, &rp, 1);
        float* trow = tmp + (size_t)(y - y_first) * size * 3;
        for (int i = 0; i < size; i++) {
            int x0 = xb[2 * i], n = xb[2 * i + 1];
            const float* w = xw + (size_t)i * kx;
            float r = 0, g = 0, b = 0;
            for (int j = 0; j < n; j++) {
                const unsigned char* p = row + (size_t)(x0 + j) * 3;
                r += w[j] * p[0];
                g += w[j] * p[1];
                b += w[j] * p[2];
            }
            trow[i * 3 + 0] = r;
            trow[i * 3 + 1] = g;
            trow[i * 3 + 2] = b;
        }
    }
    jpeg_abort_decompress(&cinfo);  // skip any remaining rows cleanly
    jpeg_destroy_decompress(&cinfo);
    // vertical resample + [-1,1] normalize
    const double inv = 1.0 / 127.5;
    for (int oy = 0; oy < size; oy++) {
        int s0 = yb[2 * oy], n = yb[2 * oy + 1];
        const float* w = yw + (size_t)oy * ky;
        float* orow = out + (size_t)oy * size * 3;
        for (int i = 0; i < size * 3; i++) {
            float acc = 0;
            for (int j = 0; j < n; j++)
                acc += w[j] * tmp[(size_t)(s0 + j - y_first) * size * 3 + i];
            // PIL clips resampled uint8 to [0,255] before ToTensor
            if (acc < 0.0f) acc = 0.0f;
            if (acc > 255.0f) acc = 255.0f;
            orow[i] = (float)(acc * inv - 1.0);
        }
    }
    std::free(row); std::free(tmp);
    std::free(xb); std::free(xw); std::free(yb); std::free(yw);
    return 0;
}

#else  // !HAVE_JPEG

int jpeg_decode_square(const unsigned char*, uint64_t, int, int, float*) {
    return -100;  // built without libjpeg: Python always falls back to PIL
}

#endif  // HAVE_JPEG

}  // extern "C"
