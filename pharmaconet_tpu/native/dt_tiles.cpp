// Prepack-time conformer distances for tile-store v2.
//
// Computes the [T, C, tile] distance stream the dt kernel variant
// (ops/screen_pallas.score_tiles_fused_dt) consumes, from the packed
// per-tile node-position tables + uv pair encoding the one-hot kernel
// otherwise reconstructs on device. The numpy take_along_axis form of
// this gather runs at ~0.4 us/element on one host core (~1 min per
// 2048-ligand batch — would dominate prepack); this loop is a plain
// sequential gather + 8 flops/row.
//
// Compiled with -ffp-contract=off (see native/__init__.py): no FMA
// contraction, so results are BIT-IDENTICAL to the numpy fallback in
// scoring/screen_tiles.py (same exact f32 sub/mul/add sequence + IEEE
// sqrtf), which keeps the store contents independent of which
// implementation wrote them.
//
// Reference counterpart: none — the reference (PharmacoNet) recomputes
// ligand distances per conformer inside its numba scoring kernels
// (src/pmnet/scoring/match_utils_numba.py:12-86); precomputing them per
// model is only meaningful in this build's prepacked tile-store design.

#include <cmath>
#include <cstdint>

extern "C" void tile_dt(
    int64_t t,            // number of tiles
    int32_t c,            // conformers
    int32_t tile,         // rows per tile
    int32_t cap,          // node slots per tile
    const float* pos,     // [t, 3c, cap] conformer-major (plane = 3*k+axis)
    const int32_t* uv,    // [t, tile] u_loc * cap + v_loc
    float* out            // [t, c, tile]
) {
    for (int64_t ti = 0; ti < t; ++ti) {
        const float* p = pos + ti * (int64_t)(3 * c) * cap;
        const int32_t* uvt = uv + ti * (int64_t)tile;
        float* o = out + ti * (int64_t)c * tile;
        for (int32_t r = 0; r < tile; ++r) {
            const int32_t u = uvt[r] / cap;
            const int32_t v = uvt[r] % cap;
            for (int32_t k = 0; k < c; ++k) {
                const float* pk = p + (int64_t)(3 * k) * cap;
                const float dx = pk[u] - pk[v];
                const float dy = pk[cap + u] - pk[cap + v];
                const float dz = pk[2 * cap + u] - pk[2 * cap + v];
                float d2 = dx * dx;
                d2 = d2 + dy * dy;
                d2 = d2 + dz * dz;
                o[(int64_t)k * tile + r] = sqrtf(d2);
            }
        }
    }
}
