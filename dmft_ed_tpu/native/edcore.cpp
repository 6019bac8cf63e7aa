// edcore: native host-side combinatorics for large Fock spaces.
//
// The TPU-native analogue of the reference's "native substrate": where the
// reference leans on Fortran loops compiled with -O3 for sector enumeration
// and per-element binary_search indexing (ED_SETUP.f90:886-984, :1307), we
// provide O(1)-amortized enumeration (Gosper), closed-form combinadic
// ranking, and fused per-spin operator COO assembly. These run at setup time
// on the host; their outputs become device constants of the jitted compute
// path.
//
// Build: g++ -O3 -march=native -shared -fPIC edcore.cpp -o libedcore.so
// Interface: plain C ABI consumed via ctypes (native/__init__.py).

#include <cstdint>
#include <cstring>

extern "C" {

// C(n, k) table up to 64 levels, built once per process.
static int64_t binom_tbl[65][65];
static bool binom_init_done = false;

static void binom_init() {
    if (binom_init_done) return;
    for (int n = 0; n <= 64; ++n) {
        binom_tbl[n][0] = 1;
        for (int k = 1; k <= n; ++k)
            binom_tbl[n][k] = binom_tbl[n - 1][k - 1] +
                              (k <= n - 1 ? binom_tbl[n - 1][k] : 0);
        for (int k = n + 1; k <= 64; ++k) binom_tbl[n][k] = 0;
    }
    binom_init_done = true;
}

// All ns-bit integers with popcount n, ascending (Gosper's hack).
// out must hold C(ns, n) entries. Returns the count.
int64_t spin_states(int ns, int n, int64_t* out) {
    binom_init();
    if (n < 0 || n > ns) return 0;
    int64_t dim = binom_tbl[ns][n];
    if (n == 0) { out[0] = 0; return 1; }
    uint64_t v = (1ULL << n) - 1ULL;
    for (int64_t i = 0; i < dim; ++i) {
        out[i] = (int64_t)v;
        uint64_t c = v & (~v + 1ULL);
        uint64_t r = v + c;
        v = (((r ^ v) >> 2) / c) | r;
    }
    return dim;
}

// Colex rank of each fixed-popcount state (combinadic ranking): the
// replacement for the reference's per-element binary_search.
void rank_states(const int64_t* states, int64_t count, int ns,
                 int64_t* out) {
    binom_init();
    for (int64_t s = 0; s < count; ++s) {
        uint64_t x = (uint64_t)states[s];
        int64_t rank = 0;
        int k = 0;
        while (x) {
            int p = __builtin_ctzll(x);
            ++k;
            rank += binom_tbl[p][k];
            x &= x - 1ULL;
        }
        out[s] = rank;
    }
}

// COO of cdg_i c_j on the n-particle basis of ns levels (0-based levels),
// with in-spin Jordan-Wigner signs. rows/cols/sgn must hold up to
// C(ns, n) entries. Returns nnz. i == j gives the diagonal occupation.
int64_t hop_coo(int ns, int n, int i, int j,
                int64_t* rows, int64_t* cols, double* sgn) {
    binom_init();
    int64_t dim = binom_tbl[ns][n];
    if (dim == 0) return 0;
    uint64_t v = (n == 0) ? 0ULL : (1ULL << n) - 1ULL;
    int64_t nnz = 0;
    for (int64_t idx = 0; idx < dim; ++idx) {
        uint64_t s = v;
        if (i == j) {
            if ((s >> i) & 1ULL) {
                rows[nnz] = idx; cols[nnz] = idx; sgn[nnz] = 1.0; ++nnz;
            }
        } else if (((s >> j) & 1ULL) && !((s >> i) & 1ULL)) {
            double g1 = (__builtin_popcountll(s & ((1ULL << j) - 1ULL)) & 1)
                        ? -1.0 : 1.0;
            uint64_t s1 = s & ~(1ULL << j);
            double g2 = (__builtin_popcountll(s1 & ((1ULL << i) - 1ULL)) & 1)
                        ? -1.0 : 1.0;
            uint64_t s2 = s1 | (1ULL << i);
            // rank s2
            uint64_t x = s2;
            int64_t rank = 0;
            int k = 0;
            while (x) {
                int p = __builtin_ctzll(x);
                ++k;
                rank += binom_tbl[p][k];
                x &= x - 1ULL;
            }
            rows[nnz] = rank; cols[nnz] = idx; sgn[nnz] = g1 * g2; ++nnz;
        }
        if (idx + 1 < dim) {
            uint64_t c = v & (~v + 1ULL);
            uint64_t r = v + c;
            v = (((r ^ v) >> 2) / c) | r;
        }
    }
    return nnz;
}

// COO of cdg_i (dagger=1) or c_i (dagger=0): n-particle -> (n±1)-particle.
int64_t ladder_coo(int ns, int n, int i, int dagger,
                   int64_t* rows, int64_t* cols, double* sgn) {
    binom_init();
    int64_t dim = binom_tbl[ns][n];
    if (dim == 0) return 0;
    uint64_t v = (n == 0) ? 0ULL : (1ULL << n) - 1ULL;
    int64_t nnz = 0;
    for (int64_t idx = 0; idx < dim; ++idx) {
        uint64_t s = v;
        bool occ = (s >> i) & 1ULL;
        if ((dagger && !occ) || (!dagger && occ)) {
            double g = (__builtin_popcountll(s & ((1ULL << i) - 1ULL)) & 1)
                       ? -1.0 : 1.0;
            uint64_t s2 = dagger ? (s | (1ULL << i)) : (s & ~(1ULL << i));
            uint64_t x = s2;
            int64_t rank = 0;
            int k = 0;
            while (x) {
                int p = __builtin_ctzll(x);
                ++k;
                rank += binom_tbl[p][k];
                x &= x - 1ULL;
            }
            rows[nnz] = rank; cols[nnz] = idx; sgn[nnz] = g; ++nnz;
        }
        if (idx + 1 < dim) {
            uint64_t c = v & (~v + 1ULL);
            uint64_t r = v + c;
            v = (((r ^ v) >> 2) / c) | r;
        }
    }
    return nnz;
}

}  // extern "C"
