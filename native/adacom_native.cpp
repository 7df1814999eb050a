// adacom_tpu native host runtime.
//
// C++ counterparts of the engine's host-side hot loops, mirroring where the
// reference keeps its performance-critical code native (the whole reference
// is C++; SURVEY.md §2). Exposed over a C ABI and loaded via ctypes
// (adacom_tpu/native.py); every entry point has a NumPy fallback so the
// engine runs without the .so.
//
// Contents:
//  - vertical-lane FOR bit-packing codec (same layout as ops/bitpack.py:
//    element i -> row i/L, lane i%L; word k of a lane holds bits [32k,32k+32)
//    of the lane's 32 concatenated codes)
//  - filter kernels for the host latency tier (eq/range over u32/i64 ->
//    match indices)
//  - bounded Zipf sampler (rejection-inversion, Hormann & Derflinger),
//    matching the reference's generator (benchmark/micro/succinct/zipf.cpp)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <random>
#include <vector>

extern "C" {

// ----------------------------------------------------------------------
// codec
// ----------------------------------------------------------------------

// codes: n values (already min-subtracted), width w in 1..32,
// words_out: (w, L) row-major with L = ceil(n/32) lanes, zero-initialized
// by the caller.
void adacom_pack_u32(const uint32_t* codes, int64_t n, int width,
                     uint32_t* words_out) {
    const int64_t L = (n + 31) / 32;
    const uint64_t mask = (width == 32) ? 0xFFFFFFFFull
                                        : ((1ull << width) - 1ull);
    for (int64_t lane = 0; lane < L; ++lane) {
        uint64_t acc = 0;
        int shift = 0;
        int k = 0;
        for (int r = 0; r < 32; ++r) {
            const int64_t flat = (int64_t)r * L + lane;  // (32, L) row-major
            uint64_t code = 0;
            if (flat < n) code = codes[flat] & mask;
            acc |= code << shift;
            shift += width;
            if (shift >= 32) {
                words_out[(int64_t)k * L + lane] = (uint32_t)(acc & 0xFFFFFFFFu);
                acc >>= 32;
                shift -= 32;
                ++k;
            }
        }
    }
}

void adacom_unpack_u32(const uint32_t* words, int64_t n, int width,
                       uint32_t* out) {
    const int64_t L = (n + 31) / 32;
    const uint64_t mask = (width == 32) ? 0xFFFFFFFFull
                                        : ((1ull << width) - 1ull);
    for (int64_t lane = 0; lane < L; ++lane) {
        for (int r = 0; r < 32; ++r) {
            const int64_t flat = (int64_t)r * L + lane;
            if (flat >= n) continue;
            const int64_t p = (int64_t)r * width;
            const int64_t k = p >> 5;
            const int off = (int)(p & 31);
            uint64_t code = (uint64_t)words[k * L + lane] >> off;
            if (off + width > 32)
                code |= (uint64_t)words[(k + 1) * L + lane] << (32 - off);
            out[flat] = (uint32_t)(code & mask);
        }
    }
}

// Random-access decode of selected rows (FetchRow parity).
void adacom_gather_u32(const uint32_t* words, int64_t n_lanes, int width,
                       const int64_t* idx, int64_t n_idx, uint32_t* out) {
    const uint64_t mask = (width == 32) ? 0xFFFFFFFFull
                                        : ((1ull << width) - 1ull);
    for (int64_t j = 0; j < n_idx; ++j) {
        const int64_t i = idx[j];
        const int64_t r = i / n_lanes;
        const int64_t lane = i % n_lanes;
        const int64_t p = r * width;
        const int64_t k = p >> 5;
        const int off = (int)(p & 31);
        uint64_t code = (uint64_t)words[k * n_lanes + lane] >> off;
        if (off + width > 32)
            code |= (uint64_t)words[(k + 1) * n_lanes + lane] << (32 - off);
        out[j] = (uint32_t)(code & mask);
    }
}

// ----------------------------------------------------------------------
// host latency-tier filters: return number of matches, fill idx_out
// ----------------------------------------------------------------------

int64_t adacom_filter_eq_u32(const uint32_t* vals, int64_t n, uint32_t v,
                             int64_t* idx_out) {
    // blockwise: a branchless SIMD-friendly "any match?" sweep skips the
    // serial index-emit loop for blocks without hits (selective point
    // lookups match ~1 row per segment)
    int64_t m = 0;
    int64_t i = 0;
    constexpr int64_t B = 512;
    for (; i + B <= n; i += B) {
        uint32_t any = 0;
        for (int64_t j = 0; j < B; ++j) any |= (vals[i + j] == v);
        if (any)
            for (int64_t j = 0; j < B; ++j)
                if (vals[i + j] == v) idx_out[m++] = i + j;
    }
    for (; i < n; ++i)
        if (vals[i] == v) idx_out[m++] = i;
    return m;
}

int64_t adacom_filter_range_u32(const uint32_t* vals, int64_t n, uint32_t lo,
                                uint32_t hi, int64_t* idx_out) {
    // matches lo <= v < hi; same blockwise any-match structure
    int64_t m = 0;
    int64_t i = 0;
    constexpr int64_t B = 512;
    for (; i + B <= n; i += B) {
        uint32_t any = 0;
        for (int64_t j = 0; j < B; ++j)
            any |= (vals[i + j] >= lo) & (vals[i + j] < hi);
        if (any)
            for (int64_t j = 0; j < B; ++j)
                if (vals[i + j] >= lo && vals[i + j] < hi) idx_out[m++] = i + j;
    }
    for (; i < n; ++i)
        if (vals[i] >= lo && vals[i] < hi) idx_out[m++] = i;
    return m;
}

int64_t adacom_filter_eq_i64(const int64_t* vals, int64_t n, int64_t v,
                             int64_t* idx_out) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i)
        if (vals[i] == v) idx_out[m++] = i;
    return m;
}

// Fused decode+filter directly over the packed words (scan over compressed
// data without materializing the column — the AdaCom scan hot loop,
// succinct.cpp:124-144, fused as the TPU kernels do).
int64_t adacom_packed_filter_eq_u32(const uint32_t* words, int64_t n,
                                    int width, uint32_t min_factor,
                                    uint32_t v, int64_t* idx_out) {
    if (v < min_factor) return 0;
    const uint64_t code_target = v - min_factor;
    const uint64_t mask = (width == 32) ? 0xFFFFFFFFull
                                        : ((1ull << width) - 1ull);
    if (code_target > mask) return 0;
    const int64_t L = (n + 31) / 32;
    int64_t m = 0;
    for (int64_t lane = 0; lane < L; ++lane) {
        for (int r = 0; r < 32; ++r) {
            const int64_t flat = (int64_t)r * L + lane;
            if (flat >= n) continue;
            const int64_t p = (int64_t)r * width;
            const int64_t k = p >> 5;
            const int off = (int)(p & 31);
            uint64_t code = (uint64_t)words[k * L + lane] >> off;
            if (off + width > 32)
                code |= (uint64_t)words[(k + 1) * L + lane] << (32 - off);
            if ((code & mask) == code_target) idx_out[m++] = flat;
        }
    }
    return m;
}

// ----------------------------------------------------------------------
// bounded Zipf sampler (reference zipf.cpp parity)
// ----------------------------------------------------------------------

static double zipf_expxm1bx(double x) {
    return (std::abs(x) > 1e-8) ? std::expm1(x) / x
                                : (1.0 + x / 2.0 * (1.0 + x / 3.0 * (1.0 + x / 4.0)));
}
static double zipf_log1pxbx(double x) {
    return (std::abs(x) > 1e-8) ? std::log1p(x) / x
                                : 1.0 - x * (0.5 - x * (1.0 / 3.0 - x * 0.25));
}

void adacom_zipf_sample(uint64_t n, double q, uint64_t seed, int64_t n_out,
                        int64_t* out) {
    auto H = [&](double x) {
        const double lx = std::log(x);
        return zipf_expxm1bx((1.0 - q) * lx) * lx;
    };
    auto h = [&](double x) { return std::exp(-q * std::log(x)); };
    auto H_inv = [&](double x) {
        const double t = std::max(x * (1.0 - q), -1.0);
        return std::exp(zipf_log1pxbx(t) * x);
    };
    const double H_x1 = H(1.5) - 1.0;
    const double H_n = H((double)n + 0.5);
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> dist(H_x1, H_n);
    for (int64_t i = 0; i < n_out; ++i) {
        while (true) {
            const double u = dist(rng);
            const double x = H_inv(u);
            const uint64_t k = (uint64_t)std::clamp(
                std::llround(x), 1ll, (long long)n);
            if (u >= H((double)k + 0.5) - h((double)k)) {
                out[i] = (int64_t)k;
                break;
            }
        }
    }
}

// ----------------------------------------------------------------------
// grouped aggregation hash table (reference GroupedAggregateHashTable,
// src/execution/aggregate_hashtable.cpp: linear probing, power-of-two
// capacity, FindOrCreateGroups). Single 64-bit key column — the engine
// hash-combines multi-column keys into one u64 before calling in.
// ----------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

// Returns n_groups. gid_out[n] gets the group id per row (first-occurrence
// order); first_row_out[n_groups] the row index where each group first
// appeared (caller gathers the unique key values from it).
int64_t adacom_groupby_i64(const int64_t* keys, int64_t n,
                           int64_t* gid_out, int64_t* first_row_out) {
    if (n == 0) return 0;
    uint64_t cap = 16;
    while (cap < (uint64_t)n * 2) cap <<= 1;
    const uint64_t mask = cap - 1;
    std::vector<int64_t> slot_gid(cap, -1);
    std::vector<int64_t> slot_key(cap, 0);
    int64_t n_groups = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t k = keys[i];
        uint64_t pos = splitmix64((uint64_t)k) & mask;
        while (true) {
            int64_t g = slot_gid[pos];
            if (g < 0) {
                slot_gid[pos] = n_groups;
                slot_key[pos] = k;
                first_row_out[n_groups] = i;
                gid_out[i] = n_groups;
                ++n_groups;
                break;
            }
            if (slot_key[pos] == k) {
                gid_out[i] = g;
                break;
            }
            pos = (pos + 1) & mask;  // linear probe
        }
    }
    return n_groups;
}

// exact int64 grouped sum (hugeint-accumulator analogue for decimals)
void adacom_group_sum_i64(const int64_t* gid, const int64_t* vals, int64_t n,
                          int64_t* out /* prezeroed, n_groups */) {
    for (int64_t i = 0; i < n; ++i) out[gid[i]] += vals[i];
}

void adacom_group_sum_f64(const int64_t* gid, const double* vals, int64_t n,
                          double* out) {
    for (int64_t i = 0; i < n; ++i) out[gid[i]] += vals[i];
}

// ----------------------------------------------------------------------
// LSD radix argsort over u64 keys (reference RadixSort,
// src/common/sort/radix_sort.cpp: counting sort per digit). Caller maps
// signed/float keys into order-preserving u64 first. Skips digits whose
// histogram is a single bucket (the reference's zero-byte skip).
// ----------------------------------------------------------------------

void adacom_argsort_u64(const uint64_t* keys, int64_t n, int64_t* idx_out) {
    std::vector<int64_t> tmp(n);
    int64_t* src = idx_out;
    int64_t* dst = tmp.data();
    for (int64_t i = 0; i < n; ++i) src[i] = i;
    int64_t hist[256];
    for (int pass = 0; pass < 8; ++pass) {
        const int shift = pass * 8;
        std::fill(hist, hist + 256, 0);
        for (int64_t i = 0; i < n; ++i)
            ++hist[(keys[src[i]] >> shift) & 0xFF];
        bool single = false;
        for (int b = 0; b < 256; ++b)
            if (hist[b] == n) { single = true; break; }
        if (single) continue;
        int64_t sum = 0;
        for (int b = 0; b < 256; ++b) {
            int64_t c = hist[b];
            hist[b] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; ++i)
            dst[hist[(keys[src[i]] >> shift) & 0xFF]++] = src[i];
        std::swap(src, dst);
    }
    if (src != idx_out)
        std::copy(src, src + n, idx_out);
}

}  // extern "C"
