// Native host oracle for the matching-space kernels.
//
// Clean-room C++ implementation of the matcher/confidence semantics
// (reference: src/cpp/matchers/matchers.cpp, src/cpp/featextract/
// featextract.cpp — Boost.Python + SSE there; plain C API + OpenMP +
// builtin popcount here). Used as (a) the golden parity oracle for the
// JAX/Pallas device kernels, (b) a CPU input-pipeline fallback, and
// (c) the reference-equivalent CPU path for throughput baselining.
//
// Conventions (identical to msnets_tpu/ops/oracle_np.py):
//   * all cost volumes are centre-aligned [H, W, D] float32
//   * invalid entries = float(2147483648.0) (float32(RAND_MAX))
//   * valid region: rows [wc, H-w+wc), cols [wc, W-w+wc), d <= col - wc
//     (replicating the reference's `i < H - wsize` loop bounds)
//   * NCC: cost = -(n*S_lr - A_l*A_r) * C_l * C_r, C = 1/sqrt(n*B - A^2)
//     in double; non-finite C -> cost 1
//   * census: Hamming distance over the 121-bit centre<neighbour descriptor
//   * AML: p(d) = exp(-(c-min)^2/sigma) / sum(...); all-invalid row -> 0

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
constexpr float kInvalid = 2147483648.0f;

inline int valid_rows(int H, int w) { return H - w; }   // reference bound
inline int valid_cols(int W, int w) { return W - w; }
}  // namespace

extern "C" {

// Horizontal 3x3 Sobel, zero border, drops last valid row/col like the
// reference (matchers.cpp:538-548).
void msn_sobel(const uint8_t* img, int H, int W, float* out) {
    std::memset(out, 0, sizeof(float) * H * W);
#pragma omp parallel for
    for (int i = 0; i < H - 3; ++i) {
        for (int j = 0; j < W - 3; ++j) {
            const uint8_t* r0 = img + i * W + j;
            const uint8_t* r1 = r0 + W;
            const uint8_t* r2 = r1 + W;
            float v = -(float)r0[0] + (float)r0[2]
                      - 2.0f * r1[0] + 2.0f * r1[2]
                      - (float)r2[0] + (float)r2[2];
            out[(i + 1) * W + (j + 1)] = v;
        }
    }
}

// Census cost volume [H, W, D].
void msn_census(const uint8_t* L, const uint8_t* R, int H, int W,
                int ndisp, int wsize, float* out) {
    const int wc = wsize / 2;
    const long total = (long)H * W * ndisp;
    std::fill(out, out + total, kInvalid);
    const int nbits = wsize * wsize;
    const int nwords = (nbits + 63) / 64;
    const int nr = valid_rows(H, wsize), ncl = valid_cols(W, wsize);
    if (nr <= 0 || ncl <= 0) return;

    // bit-packed descriptors at centre coords, row-major over window
    std::vector<uint64_t> descL((size_t)nr * ncl * nwords),
                          descR((size_t)nr * ncl * nwords);
    auto build = [&](const uint8_t* img, uint64_t* desc) {
#pragma omp parallel for
        for (int i = 0; i < nr; ++i) {
            for (int j = 0; j < ncl; ++j) {
                uint64_t words[4] = {0, 0, 0, 0};
                const uint8_t centre = img[(i + wc) * W + (j + wc)];
                int bit = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v, ++bit)
                        if (centre < img[(i + u) * W + (j + v)])
                            words[bit >> 6] |= 1ull << (bit & 63);
                uint64_t* dst = desc + ((size_t)i * ncl + j) * nwords;
                for (int k = 0; k < nwords; ++k) dst[k] = words[k];
            }
        }
    };
    build(L, descL.data());
    build(R, descR.data());

#pragma omp parallel for
    for (int i = 0; i < nr; ++i) {
        for (int j = 0; j < ncl; ++j) {
            const uint64_t* dl = descL.data() + ((size_t)i * ncl + j) * nwords;
            const int dmax = std::min(ndisp, j + 1);
            float* dst = out + ((long)(i + wc) * W + (j + wc)) * ndisp;
            for (int d = 0; d < dmax; ++d) {
                const uint64_t* dr =
                    descR.data() + ((size_t)i * ncl + (j - d)) * nwords;
                int ham = 0;
                for (int k = 0; k < nwords; ++k)
                    ham += __builtin_popcountll(dl[k] ^ dr[k]);
                dst[d] = (float)ham;
            }
        }
    }
}

// Windowed NCC cost [H, W, D] (double internals, like the reference).
void msn_ncc(const uint8_t* L, const uint8_t* R, int H, int W,
             int ndisp, int wsize, float* out) {
    const int wc = wsize / 2;
    const double n = (double)wsize * wsize;
    std::fill(out, out + (long)H * W * ndisp, kInvalid);
    const int nr = valid_rows(H, wsize), ncl = valid_cols(W, wsize);
    if (nr <= 0 || ncl <= 0) return;

    // window sums / normalizers at window-origin coords [nr+? use full grid]
    std::vector<double> Al((size_t)nr * ncl), Ar((size_t)nr * ncl),
                        Cl((size_t)nr * ncl), Cr((size_t)nr * ncl);
    auto stats = [&](const uint8_t* img, double* A, double* C) {
#pragma omp parallel for
        for (int i = 0; i < nr; ++i) {
            for (int j = 0; j < ncl; ++j) {
                double s = 0, s2 = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v) {
                        double x = img[(i + u) * W + (j + v)];
                        s += x; s2 += x * x;
                    }
                A[(size_t)i * ncl + j] = s;
                C[(size_t)i * ncl + j] = 1.0 / std::sqrt(n * s2 - s * s);
            }
        }
    };
    stats(L, Al.data(), Cl.data());
    stats(R, Ar.data(), Cr.data());

#pragma omp parallel for
    for (int d = 0; d < ndisp; ++d) {
        for (int i = 0; i < nr; ++i) {
            for (int j = d; j < ncl; ++j) {
                double s = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v)
                        s += (double)L[(i + u) * W + (j + v)] *
                             (double)R[(i + u) * W + (j + v - d)];
                const double cl = Cl[(size_t)i * ncl + j];
                const double cr = Cr[(size_t)i * ncl + (j - d)];
                float res;
                if (std::isfinite(cl) && std::isfinite(cr)) {
                    res = (float)(-(n * s - Al[(size_t)i * ncl + j] *
                                    Ar[(size_t)i * ncl + (j - d)]) * cl * cr);
                } else {
                    res = 1.0f;
                }
                out[((long)(i + wc) * W + (j + wc)) * ndisp + d] = res;
            }
        }
    }
}

// Zero-mean SAD cost [H, W, D].
void msn_zsad(const uint8_t* L, const uint8_t* R, int H, int W,
              int ndisp, int wsize, float* out) {
    const int wc = wsize / 2;
    const float n = (float)(wsize * wsize);
    std::fill(out, out + (long)H * W * ndisp, kInvalid);
    const int nr = valid_rows(H, wsize), ncl = valid_cols(W, wsize);
    if (nr <= 0 || ncl <= 0) return;

    std::vector<float> muL((size_t)nr * ncl), muR((size_t)nr * ncl);
    auto means = [&](const uint8_t* img, float* mu) {
#pragma omp parallel for
        for (int i = 0; i < nr; ++i)
            for (int j = 0; j < ncl; ++j) {
                float s = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v)
                        s += img[(i + u) * W + (j + v)];
                mu[(size_t)i * ncl + j] = s / n;
            }
    };
    means(L, muL.data());
    means(R, muR.data());

#pragma omp parallel for
    for (int d = 0; d < ndisp; ++d) {
        for (int i = 0; i < nr; ++i) {
            for (int j = d; j < ncl; ++j) {
                const float k = muL[(size_t)i * ncl + j] -
                                muR[(size_t)i * ncl + (j - d)];
                float s = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v)
                        s += std::fabs((float)L[(i + u) * W + (j + v)] -
                                       (float)R[(i + u) * W + (j + v - d)] - k);
                out[((long)(i + wc) * W + (j + wc)) * ndisp + d] = s;
            }
        }
    }
}

// SAD over Sobel maps [H, W, D].
void msn_sadsob(const float* sl, const float* sr, int H, int W,
                int ndisp, int wsize, float* out) {
    const int wc = wsize / 2;
    std::fill(out, out + (long)H * W * ndisp, kInvalid);
    const int nr = valid_rows(H, wsize), ncl = valid_cols(W, wsize);
    if (nr <= 0 || ncl <= 0) return;
#pragma omp parallel for
    for (int d = 0; d < ndisp; ++d) {
        for (int i = 0; i < nr; ++i) {
            for (int j = d; j < ncl; ++j) {
                double s = 0;
                for (int u = 0; u < wsize; ++u)
                    for (int v = 0; v < wsize; ++v)
                        s += std::fabs((double)sl[(i + u) * W + (j + v)] -
                                       (double)sr[(i + u) * W + (j + v - d)]);
                out[((long)(i + wc) * W + (j + wc)) * ndisp + d] = (float)s;
            }
        }
    }
}

// AML confidence over rows of [n_rows, D].
void msn_aml(const float* vol, long n_rows, int ndisp, float sigma,
             float* out) {
#pragma omp parallel for
    for (long r = 0; r < n_rows; ++r) {
        const float* row = vol + r * ndisp;
        float* dst = out + r * ndisp;
        float mn = row[0];
        for (int d = 1; d < ndisp; ++d) mn = std::min(mn, row[d]);
        if (mn >= kInvalid) {
            for (int d = 0; d < ndisp; ++d) dst[d] = 0.0f;
            continue;
        }
        double denom = 0;
        for (int d = 0; d < ndisp; ++d) {
            double num = (double)row[d] - mn;
            denom += std::exp(-(num * num) / sigma);
        }
        for (int d = 0; d < ndisp; ++d) {
            double num = (double)row[d] - mn;
            dst[d] = (float)(std::exp(-(num * num) / sigma) / denom);
        }
    }
}

// PKRN peak-ratio confidence over rows of [n_rows, D].
void msn_pkrn(const float* vol, long n_rows, int ndisp, float e, float* out) {
#pragma omp parallel for
    for (long r = 0; r < n_rows; ++r) {
        const float* row = vol + r * ndisp;
        float* dst = out + r * ndisp;
        float mn = row[0];
        for (int d = 1; d < ndisp; ++d) mn = std::min(mn, row[d]);
        for (int d = 0; d < ndisp; ++d)
            dst[d] = (mn >= kInvalid) ? 0.0f : (mn + e) / (row[d] + e);
    }
}

// Right-view re-index: R[i,j,d] = L[i, j+d, d]; fill = first element.
void msn_get_right_cost(const float* in, int H, int W, int D, float* out) {
    const float fill = in[0];
    std::fill(out, out + (long)H * W * D, fill);
#pragma omp parallel for
    for (int i = 0; i < H; ++i)
        for (int d = 0; d < D; ++d)
            for (int j = 0; j < W - d; ++j)
                out[((long)i * W + j) * D + d] = in[((long)i * W + j + d) * D + d];
}

// Left-view re-index: Lo[i,j,d] = R[i, j-d, d]; fill = first element.
void msn_get_left_cost(const float* in, int H, int W, int D, float* out) {
    const float fill = in[0];
    std::fill(out, out + (long)H * W * D, fill);
#pragma omp parallel for
    for (int i = 0; i < H; ++i)
        for (int d = 0; d < D; ++d)
            for (int j = d; j < W; ++j)
                out[((long)i * W + j) * D + d] = in[((long)i * W + j - d) * D + d];
}

int msn_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
