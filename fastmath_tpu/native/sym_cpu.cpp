// Native CPU kernels for compact-symmetric batched ops.
//
// This is the host-side native tier of fastmath-tpu — the analog of the
// reference's external jitfields C++ kernels (JIT-compiled via cppyy on
// CPU; reference sym.py:37, docs/md/install.md:8-18). On TPU the Pallas
// kernels (kernels/sym_pallas.py) are the native tier; this extension
// serves CPU-only deployments and host-side pre/post-processing without
// paying XLA dispatch overhead per call.
//
// Layout contract (reference sym.py:8-24): mat rows are
// [diag_0..diag_{n-1}, upper row-major], one matrix per batch element,
// batch-major (AoS): mat (B, NN), vec (B, N).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC sym_cpu.cpp -o libfastmath_sym.so

#include <cstdint>
#include <cmath>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// flat compact index of (i, j) for an n x n symmetric matrix
inline int tri_index(int i, int j, int n) {
    if (i == j) return i;
    if (i > j) { int t = i; i = j; j = t; }
    return n + i * (n - 1) - i * (i - 1) / 2 + (j - i - 1);
}

template <typename T>
void full_from_compact(const T* m, T* a, int n) {
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
            a[i * n + j] = m[tri_index(i, j, n)];
}

// determinant by Laplace expansion for n <= 4 on a dense buffer
template <typename T>
T det_n(const T* a, int n) {
    if (n == 0) return T(1);  // empty minor (cofactor of a 1x1 matrix)
    if (n == 1) return a[0];
    if (n == 2) return a[0] * a[3] - a[1] * a[2];
    if (n == 3)
        return a[0] * (a[4] * a[8] - a[5] * a[7])
             - a[1] * (a[3] * a[8] - a[5] * a[6])
             + a[2] * (a[3] * a[7] - a[4] * a[6]);
    // n == 4: expand along the first row with 3x3 minors
    T det = 0;
    T minor[9];
    for (int c = 0; c < 4; ++c) {
        int mc = 0;
        for (int i = 1; i < 4; ++i)
            for (int j = 0; j < 4; ++j)
                if (j != c) minor[mc++] = a[i * 4 + j];
        T d3 = det_n(minor, 3);
        det += ((c % 2) ? -1 : 1) * a[c] * d3;
    }
    return det;
}

// cofactor(j, i) for dense n x n, n <= 4
template <typename T>
T cofactor(const T* a, int j, int i, int n) {
    T minor[9];
    int mc = 0;
    for (int r = 0; r < n; ++r) {
        if (r == j) continue;
        for (int c = 0; c < n; ++c) {
            if (c == i) continue;
            minor[mc++] = a[r * n + c];
        }
    }
    T d = det_n(minor, n - 1);
    return ((i + j) % 2) ? -d : d;
}

// LDL^T factorization (no pivoting) for general n, in-place on dense
// scratch: a -> L (unit lower, below diag) and D (on the diag)
template <typename T>
void ldl_factor(T* a, int n) {
    for (int j = 0; j < n; ++j) {
        T d = a[j * n + j];
        for (int k = 0; k < j; ++k)
            d -= a[j * n + k] * a[j * n + k] * a[k * n + k];
        a[j * n + j] = d;
        for (int i = j + 1; i < n; ++i) {
            T v = a[i * n + j];
            for (int k = 0; k < j; ++k)
                v -= a[i * n + k] * a[j * n + k] * a[k * n + k];
            a[i * n + j] = v / d;
        }
    }
}

// substitution with a factored LDL^T (x in place)
template <typename T>
void ldl_substitute(const T* a, T* x, int n) {
    // forward: L y = b
    for (int i = 0; i < n; ++i)
        for (int k = 0; k < i; ++k) x[i] -= a[i * n + k] * x[k];
    // diag
    for (int i = 0; i < n; ++i) x[i] /= a[i * n + i];
    // backward: L^T z = y
    for (int i = n - 1; i >= 0; --i)
        for (int k = i + 1; k < n; ++k) x[i] -= a[k * n + i] * x[k];
}

template <typename T>
void ldl_solve(T* a, T* x, int n) {
    ldl_factor(a, n);
    ldl_substitute(a, x, n);
}

template <typename T>
void sym_matvec_impl(const T* mat, const T* vec, T* out,
                     int64_t b, int n) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        const T* v = vec + e * n;
        T* o = out + e * n;
        for (int i = 0; i < n; ++i) {
            T acc = m[i] * v[i];
            for (int j = 0; j < n; ++j)
                if (j != i) acc += m[tri_index(i, j, n)] * v[j];
            o[i] = acc;
        }
    }
}

// fused acc +/- A v (jitfields sym_addmatvec / sym_submatvec,
// reference sym.py:28-35)
template <typename T>
void sym_accmatvec_impl(const T* acc, const T* mat, const T* vec, T* out,
                        int64_t b, int n, T sign) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        const T* v = vec + e * n;
        const T* c = acc + e * n;
        T* o = out + e * n;
        for (int i = 0; i < n; ++i) {
            T mv = m[i] * v[i];
            for (int j = 0; j < n; ++j)
                if (j != i) mv += m[tri_index(i, j, n)] * v[j];
            o[i] = c[i] + sign * mv;
        }
    }
}

template <typename T>
void sym_solve_impl(const T* mat, const T* vec, T* out, int64_t b, int n) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        const T* v = vec + e * n;
        T* o = out + e * n;
        T a[16];
        if (n <= 4) {
            full_from_compact(m, a, n);
            T det = det_n(a, n);
            for (int i = 0; i < n; ++i) {
                T acc = 0;
                for (int j = 0; j < n; ++j)
                    acc += cofactor(a, j, i, n) * v[j];
                o[i] = acc / det;
            }
        } else {
            // general n: dense LDL^T on scratch
            T dense[64 * 64];
            T x[64];
            full_from_compact(m, dense, n);
            std::memcpy(x, v, n * sizeof(T));
            ldl_solve(dense, x, n);
            std::memcpy(o, x, n * sizeof(T));
        }
    }
}

template <typename T>
void sym_invert_impl(const T* mat, T* out, int64_t b, int n) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        T* o = out + e * nn;
        if (n <= 4) {
            T a[16];
            full_from_compact(m, a, n);
            T inv_det = T(1) / det_n(a, n);
            int c = n;
            for (int i = 0; i < n; ++i)
                for (int j = i; j < n; ++j) {
                    T val = cofactor(a, j, i, n) * inv_det;
                    o[i == j ? i : c] = val;
                    if (i != j) ++c;
                }
        } else {
            // general n (<= 64): one LDL^T factorization, n identity
            // columns substituted (the reference's invert is exactly n
            // solves against identity columns, _impl/sym.py:483-493)
            T dense[64 * 64];
            T x[64];
            full_from_compact(m, dense, n);
            ldl_factor(dense, n);
            for (int col = 0; col < n; ++col) {
                for (int i = 0; i < n; ++i) x[i] = (i == col) ? T(1) : T(0);
                ldl_substitute(dense, x, n);
                // fill compact column: slots (i, col) for i <= col
                for (int i = 0; i <= col; ++i)
                    o[tri_index(i, col, n)] = x[i];
            }
        }
    }
}

// --- fused-iteration chains --------------------------------------------
// CPU analogs of the Pallas chain kernels (kernels/sym_pallas.py):
// load/factor the matrix ONCE per batch element, iterate entirely in
// registers/L1 — the same factor-once/iterate-many structure that makes
// the TPU chain kernels VPU-bound instead of HBM-bound.

// x <- A x + c iterated `iters` times (Richardson / Neumann)
template <typename T>
void sym_matvec_chain_impl(const T* mat, const T* vec, const T* add, T* out,
                           int64_t b, int n, int iters) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        const T* c = add + e * n;
        T x[64], y[64];
        std::memcpy(x, vec + e * n, n * sizeof(T));
        for (int t = 0; t < iters; ++t) {
            for (int i = 0; i < n; ++i) {
                T acc = m[i] * x[i];
                for (int j = 0; j < n; ++j)
                    if (j != i) acc += m[tri_index(i, j, n)] * x[j];
                y[i] = acc + c[i];
            }
            std::memcpy(x, y, n * sizeof(T));
        }
        std::memcpy(out + e * n, x, n * sizeof(T));
    }
}

// x <- A \ x + c iterated `iters` times: adjugate precomputed once for
// n <= 4, LDL^T factored once beyond (factor once, substitute many)
template <typename T>
void sym_solve_chain_impl(const T* mat, const T* vec, const T* add, T* out,
                          int64_t b, int n, int iters) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        const T* c = add + e * n;
        T x[64], y[64];
        std::memcpy(x, vec + e * n, n * sizeof(T));
        if (n <= 4) {
            T a[16], adj[16];
            full_from_compact(m, a, n);
            T inv_det = T(1) / det_n(a, n);
            for (int i = 0; i < n; ++i)
                for (int j = 0; j < n; ++j)
                    adj[i * n + j] = cofactor(a, j, i, n);
            for (int t = 0; t < iters; ++t) {
                for (int i = 0; i < n; ++i) {
                    T acc = 0;
                    for (int j = 0; j < n; ++j) acc += adj[i * n + j] * x[j];
                    y[i] = acc * inv_det + c[i];
                }
                std::memcpy(x, y, n * sizeof(T));
            }
        } else {
            T dense[64 * 64];
            full_from_compact(m, dense, n);
            ldl_factor(dense, n);
            for (int t = 0; t < iters; ++t) {
                ldl_substitute(dense, x, n);
                for (int i = 0; i < n; ++i) x[i] += c[i];
            }
        }
        std::memcpy(out + e * n, x, n * sizeof(T));
    }
}

// power iteration: v <- A v / ||A v|| `iters` times, then the Rayleigh
// quotient; writes mu (1 per element) and the unit eigenvector
template <typename T>
void sym_maxeig_impl(const T* mat, const T* vec, T* mu_out, T* v_out,
                     int64_t b, int n, int iters) {
    const int nn = n * (n + 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < b; ++e) {
        const T* m = mat + e * nn;
        T x[64], y[64];
        std::memcpy(x, vec + e * n, n * sizeof(T));
        T nrm2 = 0;
        for (int i = 0; i < n; ++i) nrm2 += x[i] * x[i];
        T inv = nrm2 > 0 ? T(1) / std::sqrt(nrm2) : T(0);
        for (int i = 0; i < n; ++i) x[i] *= inv;
        for (int t = 0; t <= iters; ++t) {
            for (int i = 0; i < n; ++i) {
                T acc = m[i] * x[i];
                for (int j = 0; j < n; ++j)
                    if (j != i) acc += m[tri_index(i, j, n)] * x[j];
                y[i] = acc;
            }
            if (t == iters) break;  // final y = A v feeds the Rayleigh
            nrm2 = 0;
            for (int i = 0; i < n; ++i) nrm2 += y[i] * y[i];
            inv = nrm2 > 0 ? T(1) / std::sqrt(nrm2) : T(0);
            for (int i = 0; i < n; ++i) x[i] = y[i] * inv;
        }
        T mu = 0;
        for (int i = 0; i < n; ++i) mu += x[i] * y[i];
        mu_out[e] = mu;
        std::memcpy(v_out + e * n, x, n * sizeof(T));
    }
}

}  // namespace

extern "C" {

void sym_matvec_chain_f32(const float* m, const float* v, const float* a,
                          float* o, int64_t b, int n, int k)
{ sym_matvec_chain_impl(m, v, a, o, b, n, k); }
void sym_matvec_chain_f64(const double* m, const double* v, const double* a,
                          double* o, int64_t b, int n, int k)
{ sym_matvec_chain_impl(m, v, a, o, b, n, k); }
void sym_solve_chain_f32(const float* m, const float* v, const float* a,
                         float* o, int64_t b, int n, int k)
{ sym_solve_chain_impl(m, v, a, o, b, n, k); }
void sym_solve_chain_f64(const double* m, const double* v, const double* a,
                         double* o, int64_t b, int n, int k)
{ sym_solve_chain_impl(m, v, a, o, b, n, k); }
void sym_maxeig_f32(const float* m, const float* v, float* mu, float* vo,
                    int64_t b, int n, int k)
{ sym_maxeig_impl(m, v, mu, vo, b, n, k); }
void sym_maxeig_f64(const double* m, const double* v, double* mu, double* vo,
                    int64_t b, int n, int k)
{ sym_maxeig_impl(m, v, mu, vo, b, n, k); }

void sym_matvec_f32(const float* m, const float* v, float* o, int64_t b, int n)
{ sym_matvec_impl(m, v, o, b, n); }
void sym_matvec_f64(const double* m, const double* v, double* o, int64_t b, int n)
{ sym_matvec_impl(m, v, o, b, n); }
void sym_addmatvec_f32(const float* a, const float* m, const float* v,
                       float* o, int64_t b, int n)
{ sym_accmatvec_impl(a, m, v, o, b, n, 1.0f); }
void sym_addmatvec_f64(const double* a, const double* m, const double* v,
                       double* o, int64_t b, int n)
{ sym_accmatvec_impl(a, m, v, o, b, n, 1.0); }
void sym_submatvec_f32(const float* a, const float* m, const float* v,
                       float* o, int64_t b, int n)
{ sym_accmatvec_impl(a, m, v, o, b, n, -1.0f); }
void sym_submatvec_f64(const double* a, const double* m, const double* v,
                       double* o, int64_t b, int n)
{ sym_accmatvec_impl(a, m, v, o, b, n, -1.0); }
void sym_solve_f32(const float* m, const float* v, float* o, int64_t b, int n)
{ sym_solve_impl(m, v, o, b, n); }
void sym_solve_f64(const double* m, const double* v, double* o, int64_t b, int n)
{ sym_solve_impl(m, v, o, b, n); }
void sym_invert_f32(const float* m, float* o, int64_t b, int n)
{ sym_invert_impl(m, o, b, n); }
void sym_invert_f64(const double* m, double* o, int64_t b, int n)
{ sym_invert_impl(m, o, b, n); }

int fastmath_num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

void fastmath_set_num_threads(int n) {
#if defined(_OPENMP)
    omp_set_num_threads(n);
#else
    (void)n;
#endif
}

}  // extern "C"
