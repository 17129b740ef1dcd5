/* Fast first-mismatch over int32 arrays — the hot path of radix-tree prefix
 * matching. Native counterpart of the reference's tvm-ffi C++ kernel
 * (/root/reference/python/minisgl/kernel/csrc/src/radix.cpp:19-44,
 * std::mismatch). Loaded from Python via ctypes (minisgl_tpu/utils/compare.py).
 */
#include <stdint.h>
#include <stddef.h>

int64_t first_mismatch_i32(const int32_t *a, const int32_t *b, int64_t n) {
    int64_t i = 0;
    /* 8-wide unrolled compare; -O3 auto-vectorizes this loop */
    for (; i + 8 <= n; i += 8) {
        uint32_t diff = 0;
        for (int j = 0; j < 8; ++j)
            diff |= (uint32_t)(a[i + j] ^ b[i + j]);
        if (diff) break;
    }
    for (; i < n; ++i)
        if (a[i] != b[i]) return i;
    return n;
}
