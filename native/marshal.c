/* Host-side bigint <-> limb-tensor marshaling, C implementation.
 *
 * TPU-native replacement for the reference's JNI marshaling layer
 * (FixedBaseMSM.java:171-181 bigIntegerToByteArrayHelperCGBN + the memcpy
 * loops in algebra_msm_FixedBaseMSM.cu): converts between packed
 * little-endian byte strings (python int.to_bytes format) and the
 * limb-major uint32[16, n] device layout, both directions, without a
 * Python-level loop.  Exposed through ctypes (native/__init__.py);
 * bigint.py falls back to pure numpy when the library is absent.
 *
 * Layout: input `bytes_in` is n records of `nbytes` little-endian bytes.
 * Output `limbs_out` is limb-major: limbs_out[limb * n + i] = 16-bit limb
 * `limb` of record i (zero-extended to uint32).
 */

#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

EXPORT void bytes_to_limbs(const uint8_t *bytes_in, int64_t n,
                           int64_t nbytes, int64_t num_limbs,
                           uint32_t *limbs_out) {
    int64_t limbs_avail = nbytes / 2;
    for (int64_t limb = 0; limb < num_limbs; limb++) {
        uint32_t *row = limbs_out + limb * n;
        if (limb >= limbs_avail) {
            memset(row, 0, sizeof(uint32_t) * (size_t)n);
            continue;
        }
        const uint8_t *src = bytes_in + 2 * limb;
        for (int64_t i = 0; i < n; i++) {
            const uint8_t *p = src + i * nbytes;
            row[i] = (uint32_t)p[0] | ((uint32_t)p[1] << 8);
        }
    }
}

EXPORT void limbs_to_bytes(const uint32_t *limbs_in, int64_t n,
                           int64_t num_limbs, uint8_t *bytes_out) {
    int64_t nbytes = num_limbs * 2;
    for (int64_t limb = 0; limb < num_limbs; limb++) {
        const uint32_t *row = limbs_in + limb * n;
        uint8_t *dst = bytes_out + 2 * limb;
        for (int64_t i = 0; i < n; i++) {
            uint8_t *p = dst + i * nbytes;
            uint32_t v = row[i];
            p[0] = (uint8_t)(v & 0xff);
            p[1] = (uint8_t)((v >> 8) & 0xff);
        }
    }
}

/* Montgomery-form-agnostic carry-free validation helper: returns the
 * index of the first record whose limbs exceed 16 bits (corrupt input),
 * or -1 if all canonical. */
EXPORT int64_t validate_limbs(const uint32_t *limbs_in, int64_t n,
                              int64_t num_limbs) {
    for (int64_t limb = 0; limb < num_limbs; limb++) {
        const uint32_t *row = limbs_in + limb * n;
        for (int64_t i = 0; i < n; i++) {
            if (row[i] > 0xffffu) return i;
        }
    }
    return -1;
}
