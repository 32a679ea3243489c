/* Native host-side runtime kernels for baby_plonk_tpu.
 *
 * The TPU owns the compute path (JAX/Pallas); this module owns the host
 * runtime hot spots around it, the role the reference's Rust plays for
 * its whole pipeline:
 *   - batched Montgomery multiplication over 64-bit limbs (the host <->
 *     device packing boundary: canonical <-> Montgomery form at 2^20
 *     scale), CIOS as in the reference (scalar.rs:514-588) but batched;
 *   - Keccak-f[1600] for the STROBE-128/merlin Fiat-Shamir transcript.
 *
 * Built as a plain shared library and bound via ctypes (no pybind11 in
 * this environment). All integers are little-endian 64-bit limb vectors.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

typedef unsigned __int128 u128;

/* out[i] = a[i] * b * R^-1 mod m  (R = 2^(64*nl)), CIOS Montgomery.
 * a: n elements of nl limbs; b, m: nl limbs; n0inv = -m^-1 mod 2^64. */
void mont_mul_batch(const uint64_t *a, const uint64_t *b, uint64_t *out,
                    size_t n, const uint64_t *m, uint64_t n0inv, int nl) {
    for (size_t e = 0; e < n; e++) {
        const uint64_t *x = a + e * (size_t)nl;
        uint64_t t[8 + 2]; /* nl <= 8 */
        memset(t, 0, sizeof(uint64_t) * (nl + 2));
        for (int i = 0; i < nl; i++) {
            /* t += x[i] * b */
            u128 carry = 0;
            for (int j = 0; j < nl; j++) {
                u128 cur = (u128)t[j] + (u128)x[i] * b[j] + carry;
                t[j] = (uint64_t)cur;
                carry = cur >> 64;
            }
            u128 cur = (u128)t[nl] + carry;
            t[nl] = (uint64_t)cur;
            t[nl + 1] = (uint64_t)(cur >> 64);
            /* reduce one limb */
            uint64_t mu = t[0] * n0inv;
            carry = ((u128)t[0] + (u128)mu * m[0]) >> 64;
            for (int j = 1; j < nl; j++) {
                u128 c2 = (u128)t[j] + (u128)mu * m[j] + carry;
                t[j - 1] = (uint64_t)c2;
                carry = c2 >> 64;
            }
            cur = (u128)t[nl] + carry;
            t[nl - 1] = (uint64_t)cur;
            t[nl] = t[nl + 1] + (uint64_t)(cur >> 64);
        }
        /* conditional subtract */
        uint64_t borrow = 0;
        uint64_t r[8];
        for (int j = 0; j < nl; j++) {
            u128 cur = (u128)t[j] - m[j] - borrow;
            r[j] = (uint64_t)cur;
            borrow = (cur >> 64) ? 1 : 0;
        }
        int ge = t[nl] || !borrow;
        uint64_t *o = out + e * (size_t)nl;
        for (int j = 0; j < nl; j++)
            o[j] = ge ? r[j] : t[j];
    }
}

/* ---- Keccak-f[1600] ----------------------------------------------------- */

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static inline uint64_t rotl(uint64_t v, int n) {
    n &= 63;
    return n ? (v << n) | (v >> (64 - n)) : v;
}

void keccak_f1600(uint8_t *state) {
    uint64_t A[25];
    memcpy(A, state, 200);
    for (int round = 0; round < 24; round++) {
        uint64_t C[5], D[5], B[25];
        for (int x = 0; x < 5; x++)
            C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
        for (int x = 0; x < 5; x++)
            D[x] = C[(x + 4) % 5] ^ rotl(C[(x + 1) % 5], 1);
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                A[x + 5 * y] ^= D[x];
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                B[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(A[x + 5 * y], ROT[x + 5 * y]);
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                A[x + 5 * y] =
                    B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y]);
        A[0] ^= RC[round];
    }
    memcpy(state, A, 200);
}
