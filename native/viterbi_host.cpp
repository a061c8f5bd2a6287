// Host-side (CPU) convolutional encoder + Viterbi decoder, C ABI.
//
// The TPU framework's native runtime component: a from-scratch generic C++17
// implementation covering every (K, R) the framework supports with runtime
// parameters instead of the reference's per-config template/SSE kernels
// (behavioural model: the 5-function decoder lifecycle of
// ka9q_libfec_port/viterbi27_sse2.{h,cpp} and the generic templated core of
// the reference's submodule, src/main.cpp:163-187 -- re-implemented, not
// ported).  Roles:
//
//   * an independent third oracle for the JAX/Pallas paths (the reference's
//     cross-implementation validation strategy, SURVEY §4);
//   * the "cpu_native" decoder family in the benchmark harness, giving the
//     TPU columns an in-repo CPU baseline to be compared against;
//   * fast host-side fallback decode for environments without accelerators.
//
// Conventions (identical to the JAX paths):
//   * state = low K-1 bits of the shift register, newest bit at LSB;
//   * expected symbol r for register value v is parity(v & poly[r]) ^ inv[r];
//   * branch penalty for symbol y: expected bit 1 -> high - y, else y - low;
//   * ties keep the low predecessor (decision 0);
//   * int32 path metrics (no renormalisation needed);
//   * bytes are MSB-first; K-1 zero tail bits terminate frames at state 0.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint32_t parity32(uint32_t x) {
    return static_cast<uint32_t>(__builtin_parity(x));
}

struct Code {
    int K;
    int R;
    const int32_t* polys;  // negative => inverted output (SPIRAL extension)
};

inline uint32_t expected_bit(const Code& c, int r, uint32_t reg) {
    int32_t p = c.polys[r];
    uint32_t inv = p < 0 ? 1u : 0u;
    uint32_t ap = static_cast<uint32_t>(p < 0 ? -p : p);
    return parity32(reg & ap) ^ inv;
}

}  // namespace

// ---------------------------------------------------------------------------
// Stateful 5-function lifecycle (create / init / update / chainback / delete),
// the same phase factoring every reference decoder family is normalised to
// (ref: src/ka9q_interface.h:45-55) -- so the harness can time phases of the
// cpu_native family with the same JSON bookkeeping as the TPU backends.
// ---------------------------------------------------------------------------

struct VitHost {
    Code code;
    std::vector<int32_t> polys;
    int32_t soft_high, soft_low, initial_margin;
    uint32_t S, half, W;            // W: 64-bit decision words per step
    std::vector<int32_t> metrics, next;
    std::vector<uint64_t> decisions;  // grows by W words per consumed step
    long steps = 0;
};

extern "C" {

void* vit_host_create(int K, int R, const int32_t* polys,
                      int32_t soft_high, int32_t soft_low,
                      int32_t initial_margin, long max_steps) {
    if (K < 2 || K > 24 || R < 1 || R > 8) return nullptr;
    auto* v = new VitHost();
    v->polys.assign(polys, polys + R);
    v->code = Code{K, R, v->polys.data()};
    v->soft_high = soft_high;
    v->soft_low = soft_low;
    v->initial_margin = initial_margin;
    v->S = 1u << (K - 1);
    v->half = v->S >> 1;
    v->W = (v->S + 63) / 64;
    v->metrics.resize(v->S);
    v->next.resize(v->S);
    v->decisions.reserve(static_cast<size_t>(max_steps) * v->W);
    return v;
}

void vit_host_init(void* h, int starting_state) {
    auto* v = static_cast<VitHost*>(h);
    for (uint32_t s = 0; s < v->S; ++s) v->metrics[s] = v->initial_margin;
    v->metrics[static_cast<uint32_t>(starting_state) & (v->S - 1)] = 0;
    v->decisions.clear();
    v->steps = 0;
}

// Consume n_symbols (= steps * R) soft symbols; resumable in blocks.
void vit_host_update(void* h, const int32_t* symbols, long n_symbols) {
    auto* v = static_cast<VitHost*>(h);
    const Code& c = v->code;
    const long T = n_symbols / c.R;
    const size_t base = v->decisions.size();
    v->decisions.resize(base + static_cast<size_t>(T) * v->W, 0);
    for (long t = 0; t < T; ++t) {
        const int32_t* sym = symbols + t * c.R;
        uint64_t* dw = v->decisions.data() + base + static_cast<size_t>(t) * v->W;
        for (uint32_t s2 = 0; s2 < v->half; ++s2) {
            for (uint32_t b = 0; b < 2; ++b) {
                int32_t pen_lo = 0, pen_hi = 0;
                const uint32_t reg_lo = (s2 << 1) | b;
                const uint32_t reg_hi = reg_lo | (1u << (c.K - 1));
                for (int r = 0; r < c.R; ++r) {
                    const int32_t y = sym[r];
                    pen_lo += expected_bit(c, r, reg_lo) ? (v->soft_high - y) : (y - v->soft_low);
                    pen_hi += expected_bit(c, r, reg_hi) ? (v->soft_high - y) : (y - v->soft_low);
                }
                const int32_t cand_lo = v->metrics[s2] + pen_lo;
                const int32_t cand_hi = v->metrics[s2 + v->half] + pen_hi;
                const uint32_t ns = (s2 << 1) | b;
                if (cand_hi < cand_lo) {
                    v->next[ns] = cand_hi;
                    dw[ns >> 6] |= (1ull << (ns & 63));
                } else {
                    v->next[ns] = cand_lo;
                }
            }
        }
        v->metrics.swap(v->next);
    }
    v->steps += T;
}

// Trace back from endstate, writing n_bytes MSB-first; returns path metric.
long vit_host_chainback(void* h, uint8_t* out_bytes, long n_bytes, int endstate) {
    auto* v = static_cast<VitHost*>(h);
    const int K = v->code.K;
    uint32_t state = static_cast<uint32_t>(endstate) & (v->S - 1);
    const long path_metric = v->metrics[state];
    std::memset(out_bytes, 0, static_cast<size_t>(n_bytes));
    for (long t = v->steps - 1; t >= 0; --t) {
        const uint64_t* dw = v->decisions.data() + static_cast<size_t>(t) * v->W;
        const uint32_t k = (dw[state >> 6] >> (state & 63)) & 1u;
        const long bit_idx = t - (K - 1);
        if (k && bit_idx >= 0 && bit_idx < n_bytes * 8) {
            out_bytes[bit_idx >> 3] |= static_cast<uint8_t>(1u << (7 - (bit_idx & 7)));
        }
        state = (state >> 1) | (k << (K - 2));
    }
    return path_metric;
}

void vit_host_delete(void* h) { delete static_cast<VitHost*>(h); }

// Encode n_bytes (MSB-first) to (8*n_bytes + K-1) * R soft symbols at the
// given rail values.  Returns the symbol count, or -1 on bad args.
long vit_host_encode(int K, int R, const int32_t* polys,
                     const uint8_t* data, long n_bytes,
                     int32_t soft_high, int32_t soft_low,
                     int32_t* out_symbols) {
    if (K < 2 || K > 24 || R < 1 || R > 8) return -1;
    Code c{K, R, polys};
    const uint32_t mask = (K >= 32) ? 0xffffffffu : ((1u << K) - 1u);
    uint32_t reg = 0;
    long t = 0;
    const long total_bits = n_bytes * 8 + (K - 1);
    for (long i = 0; i < total_bits; ++i) {
        uint32_t bit = 0;
        if (i < n_bytes * 8) {
            bit = (data[i >> 3] >> (7 - (i & 7))) & 1u;
        }
        reg = ((reg << 1) | bit) & mask;
        for (int r = 0; r < R; ++r) {
            out_symbols[t++] = expected_bit(c, r, reg) ? soft_high : soft_low;
        }
    }
    return t;
}

// Decode one tail-terminated frame of soft symbols into n_bytes bytes.
// Returns the survivor path metric at the end state, or -1 on bad args.
long vit_host_decode(int K, int R, const int32_t* polys,
                     const int32_t* symbols, long n_symbols,
                     int32_t soft_high, int32_t soft_low,
                     int32_t initial_margin, int starting_state, int endstate,
                     uint8_t* out_bytes, long n_bytes) {
    if (K < 2 || K > 24 || R < 1 || R > 8) return -1;
    const long T = n_symbols / R;
    if (T < K - 1 || n_bytes * 8 > T - (K - 1)) return -1;

    Code c{K, R, polys};
    const uint32_t S = 1u << (K - 1);
    const uint32_t half = S >> 1;

    std::vector<int32_t> metrics(S), next(S);
    for (uint32_t s = 0; s < S; ++s) metrics[s] = initial_margin;
    metrics[static_cast<uint32_t>(starting_state) & (S - 1)] = 0;

    // Bit-packed decisions: bit s of word (t*W + s/64).
    const uint32_t W = (S + 63) / 64;
    std::vector<uint64_t> decisions(static_cast<size_t>(T) * W, 0);

    // Precompute per-(h,b,r) expected bits only for small trellises; compute
    // on the fly above that (K=24's table would be 64 MiB).
    for (long t = 0; t < T; ++t) {
        const int32_t* sym = symbols + t * R;
        uint64_t* dw = decisions.data() + static_cast<size_t>(t) * W;
        for (uint32_t s2 = 0; s2 < half; ++s2) {
            // Predecessors s2 (h=0) and s2 + half (h=1); new state 2*s2 + b.
            for (uint32_t b = 0; b < 2; ++b) {
                int32_t pen_lo = 0, pen_hi = 0;
                const uint32_t reg_lo = (s2 << 1) | b;
                const uint32_t reg_hi = reg_lo | (1u << (K - 1));
                for (int r = 0; r < R; ++r) {
                    const int32_t y = sym[r];
                    pen_lo += expected_bit(c, r, reg_lo) ? (soft_high - y) : (y - soft_low);
                    pen_hi += expected_bit(c, r, reg_hi) ? (soft_high - y) : (y - soft_low);
                }
                const int32_t cand_lo = metrics[s2] + pen_lo;
                const int32_t cand_hi = metrics[s2 + half] + pen_hi;
                const uint32_t ns = (s2 << 1) | b;
                if (cand_hi < cand_lo) {
                    next[ns] = cand_hi;
                    dw[ns >> 6] |= (1ull << (ns & 63));
                } else {
                    next[ns] = cand_lo;
                }
            }
        }
        metrics.swap(next);
    }

    // Traceback from endstate (tail termination => state 0 by default).
    uint32_t state = static_cast<uint32_t>(endstate) & (S - 1);
    const long path_metric = metrics[state];
    std::memset(out_bytes, 0, static_cast<size_t>(n_bytes));
    for (long t = T - 1; t >= 0; --t) {
        const uint64_t* dw = decisions.data() + static_cast<size_t>(t) * W;
        const uint32_t k = (dw[state >> 6] >> (state & 63)) & 1u;
        // Walk output at step t is data bit t - (K - 1).
        const long bit_idx = t - (K - 1);
        if (k && bit_idx >= 0 && bit_idx < n_bytes * 8) {
            out_bytes[bit_idx >> 3] |= static_cast<uint8_t>(1u << (7 - (bit_idx & 7)));
        }
        state = (state >> 1) | (k << (K - 2));
    }
    return path_metric;
}

// XOR-popcount bit error count between two byte buffers
// (semantics of ref: src/util.h:64-73).
long vit_host_bit_errors(const uint8_t* a, const uint8_t* b, long n) {
    long errs = 0;
    for (long i = 0; i < n; ++i) {
        errs += __builtin_popcount(static_cast<unsigned>(a[i] ^ b[i]));
    }
    return errs;
}

}  // extern "C"
