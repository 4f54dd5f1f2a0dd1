// Per-channel int16 quantizer for reduced-precision host->device uploads.
//
// quantize_i16_per_col(x, rows, cols, out):
//   peak_c  = max_r |x[r, c]|            (per column = per channel)
//   out[r,c] = rint(x[r,c] * 32767 / peak_c)
//
// The per-channel scaling cancels exactly in magnitude-squared coherence,
// so the only error is the int16 rounding of the signal itself
// (<= 2^-15 of each channel's peak).  rint() under the default FP
// environment rounds half-to-even, matching numpy's np.round, so the
// native path is bit-identical to the numpy fallback.
//
// Single-threaded on purpose (the CI/bench host has one core); the two
// passes vectorize under -O3 and run at memory bandwidth, replacing a
// ~5-pass numpy pipeline that dominated cohort-null precompute.
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

template <typename OutT, int kFullScale>
void quantize_per_col(const float* x, long long rows, long long cols,
                      OutT* out) {
    std::vector<float> scale(static_cast<size_t>(cols), 1e-30f);
    float* peak = scale.data();
    for (long long r = 0; r < rows; ++r) {
        const float* row = x + r * cols;
        for (long long c = 0; c < cols; ++c) {
            float a = std::fabs(row[c]);
            if (a > peak[c]) peak[c] = a;
        }
    }
    for (long long c = 0; c < cols; ++c)
        scale[static_cast<size_t>(c)] =
            static_cast<float>(kFullScale) / peak[c];
    for (long long r = 0; r < rows; ++r) {
        const float* row = x + r * cols;
        OutT* orow = out + r * cols;
        for (long long c = 0; c < cols; ++c)
            orow[c] = static_cast<OutT>(std::rint(row[c] * scale[c]));
    }
}

}  // namespace

extern "C" {

void quantize_i16_per_col(const float* x, long long rows, long long cols,
                          int16_t* out) {
    quantize_per_col<int16_t, 32767>(x, rows, cols, out);
}

// int8 variant (quarter-precision uploads): error <= 2^-7 of each
// channel's peak.
void quantize_i8_per_col(const float* x, long long rows, long long cols,
                         int8_t* out) {
    quantize_per_col<int8_t, 127>(x, rows, cols, out);
}

}  // extern "C"
