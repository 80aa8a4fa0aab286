// Generic fixed-width columnar record decoder (C++17, multithreaded).
//
// Native runtime component of the TPU framework's data-loading layer: the
// CPU-side hot path when building device-resident line blocks from
// multi-million-line spectroscopic catalogues (HITRAN/GEISA fixed-width
// records; reference layout database/datatypes/fixed_width/hitran.py).
// Python passes a byte buffer viewed as (nlines, stride) plus per-field
// (start, width, kind) column specs; each worker thread decodes a
// contiguous row range for every field (row-major single pass, cache
// friendly). Exposed through a plain C ABI and loaded with ctypes — no
// pybind11 dependency.
//
// Field kinds:
//   0 = float64   (leading/trailing blanks ok; 'D' Fortran exponents ok;
//                  all-blank field -> NaN)
//   1 = int32     (blank -> 0)
//   2 = HITRAN local-iso char code: '1'-'9' -> 1-9, '0' -> 10,
//       'A'-'Z' -> 11+ (2020 extension), blank -> 0

#include <algorithm>
#include <cctype>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

inline double parse_double(const char* p, int width, int64_t* errs) {
    // trim
    const char* end = p + width;
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    while (end > p && (end[-1] == ' ' || end[-1] == '\t' ||
                       end[-1] == '\r' || end[-1] == '\n')) --end;
    if (p == end) return std::numeric_limits<double>::quiet_NaN();

    // Fortran 'D' exponent -> need a local copy with 'E'
    bool has_d = false;
    for (const char* q = p; q < end; ++q)
        if (*q == 'D' || *q == 'd') { has_d = true; break; }

    double v;
    if (!has_d) {
        auto res = std::from_chars(p, end, v);
        if (res.ec == std::errc() && res.ptr == end) return v;
    }
    // slow path: copy, fix D-exponent, strtod
    char tmp[64];
    int n = static_cast<int>(std::min<std::ptrdiff_t>(end - p, 63));
    for (int i = 0; i < n; ++i) {
        char c = p[i];
        tmp[i] = (c == 'D' || c == 'd') ? 'E' : c;
    }
    tmp[n] = '\0';
    char* stop = nullptr;
    v = std::strtod(tmp, &stop);
    if (stop != tmp + n) {
        ++*errs;
        return std::numeric_limits<double>::quiet_NaN();
    }
    return v;
}

inline int32_t parse_int(const char* p, int width, int64_t* errs) {
    const char* end = p + width;
    while (p < end && *p == ' ') ++p;
    while (end > p && (end[-1] == ' ' || end[-1] == '\r' ||
                       end[-1] == '\n')) --end;
    if (p == end) return 0;
    int32_t v = 0;
    auto res = std::from_chars(p, end, v);
    if (res.ec != std::errc() || res.ptr != end) { ++*errs; return 0; }
    return v;
}

inline int32_t parse_iso_char(const char* p, int width) {
    // HITRAN local-iso column is 1 char wide; take the last non-blank
    char c = ' ';
    for (int i = width - 1; i >= 0; --i)
        if (p[i] != ' ') { c = p[i]; break; }
    if (c >= '1' && c <= '9') return c - '0';
    if (c == '0') return 10;
    if (c >= 'A' && c <= 'Z') return c - 'A' + 11;
    if (c >= 'a' && c <= 'z') return c - 'a' + 11;
    return 0;
}

struct FieldSpec {
    int32_t start;
    int32_t width;
    int32_t kind;
    void* out;
};

void decode_rows(const uint8_t* buf, int64_t stride,
                 int64_t row0, int64_t row1,
                 const std::vector<FieldSpec>& fields, int64_t* errs) {
    for (int64_t r = row0; r < row1; ++r) {
        const char* rec = reinterpret_cast<const char*>(buf + r * stride);
        for (const FieldSpec& f : fields) {
            const char* p = rec + f.start;
            switch (f.kind) {
                case 0:
                    static_cast<double*>(f.out)[r] =
                        parse_double(p, f.width, errs);
                    break;
                case 1:
                    static_cast<int32_t*>(f.out)[r] =
                        parse_int(p, f.width, errs);
                    break;
                case 2:
                    static_cast<int32_t*>(f.out)[r] =
                        parse_iso_char(p, f.width);
                    break;
                default:
                    ++*errs;
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode nlines fixed-width records. Returns the number of malformed
// fields encountered (0 = clean parse). Output arrays must be
// preallocated by the caller with nlines elements each.
int64_t ans_parse_fixed(const uint8_t* buf, int64_t stride, int64_t nlines,
                        int32_t nfields, const int32_t* starts,
                        const int32_t* widths, const int32_t* kinds,
                        void** outs, int32_t nthreads) {
    std::vector<FieldSpec> fields(nfields);
    for (int32_t i = 0; i < nfields; ++i)
        fields[i] = {starts[i], widths[i], kinds[i], outs[i]};

    if (nthreads <= 0) {
        nthreads = static_cast<int32_t>(std::thread::hardware_concurrency());
        if (nthreads <= 0) nthreads = 1;
    }
    nthreads = static_cast<int32_t>(
        std::min<int64_t>(nthreads, std::max<int64_t>(nlines / 4096, 1)));

    if (nthreads == 1) {
        int64_t errs = 0;
        decode_rows(buf, stride, 0, nlines, fields, &errs);
        return errs;
    }

    std::vector<int64_t> errs(nthreads, 0);
    std::vector<std::thread> workers;
    workers.reserve(nthreads);
    int64_t chunk = (nlines + nthreads - 1) / nthreads;
    for (int32_t t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = std::min<int64_t>(r0 + chunk, nlines);
        if (r0 >= r1) break;
        workers.emplace_back(decode_rows, buf, stride, r0, r1,
                             std::cref(fields), &errs[t]);
    }
    for (auto& w : workers) w.join();
    int64_t total = 0;
    for (int64_t e : errs) total += e;
    return total;
}

// ABI version tag so the Python side can detect stale builds.
int32_t ans_abi_version(void) { return 1; }

}  // extern "C"
