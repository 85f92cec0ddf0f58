// Fused host pack: ligand batch -> final tiled Pallas screening layout.
//
// Replaces the three-pass host pipeline (block_packer [NS,P] row-major
// emission -> prep_args lane-major transpose -> screen_tiles.py numpy
// scatter) with ONE enumeration pass that writes the device arrays in
// their final tiled form:
//
//   gtab  [T, 3, P, tile] f32   (mu, 1/std, w/std lanes, per tile)
//   aux   [T, 7, tile]    f32   (flags_block, flags_pair, end_mn_inv,
//                                end_mn_half, end_fail_gate, thr, is_self)
//   uv    [T, tile]       i32   (u_slot * cap + v_slot into the tile's
//                                node table; 0 on neutral rows)
//   pos   [T, 3*cmax, cap] f32  (per-tile node position table, slots in
//                                ascending global-node order, unused = 0)
//
// Semantics (block/pair enumeration order, thresholds, reciprocals) are
// identical to block_packer.cpp + prep_args.cpp + screen_tiles.py; tests
// enforce array equality against that reference path. Layout rules match
// scoring/screen_tiles.py: per-ligand node budget (conservative), tiles
// pair-aligned so no scan segment crosses a tile boundary.
//
// Threading: ligands are split into contiguous chunks, one SegBuf per
// thread (each segment starts and ends on a tile boundary, so merged
// segments remain a valid layout); the merge is a handful of memcpys.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread pack_tiled.cpp -o libpacktiled.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int NUM_TYPES = 7;
constexpr float INF = std::numeric_limits<float>::infinity();

// aux row indices
enum { AUX_FB = 0, AUX_FP, AUX_MNINV, AUX_MNHALF, AUX_GATE, AUX_THR, AUX_SELF };

struct ModelTables {
    int32_t M, Mn;
    const int32_t* ct_offsets;  // [M*NUM_TYPES + 1]
    const int32_t* ct_nodes;
    const float* mu;      // [Mn, Mn]
    const float* stdv;    // [Mn, Mn]
    const float* weight;  // [Mn]
};

struct LigandBatch {
    int32_t B, ln, cmax;
    const int32_t* lig_cluster_offsets;
    const int32_t* cluster_node_offsets;
    const int32_t* cluster_nodes;
    const int32_t* node_mask_offsets;
    const int32_t* node_masks;
    const int32_t* active_offsets;
    const int32_t* active;
    const int32_t* cand_offsets;
    const int32_t* cands;
    const float* node_pos;  // [B*ln, cmax*3]
};

inline void matched_nodes(const ModelTables& m, int32_t mask, int32_t cluster,
                          std::vector<int32_t>& out) {
    out.clear();
    const int32_t base = cluster * NUM_TYPES;
    for (int t = 0; t < NUM_TYPES; ++t) {
        if (mask & (1 << t)) {
            const int32_t lo = m.ct_offsets[base + t];
            const int32_t hi = m.ct_offsets[base + t + 1];
            for (int32_t k = lo; k < hi; ++k) out.push_back(m.ct_nodes[k]);
        }
    }
}

// One thread's output segment (tile-aligned at both ends).
struct SegBuf {
    int tile = 0, P = 0, cap = 0, threec = 0;
    std::vector<float> gtab;   // [t][3][P][tile]
    std::vector<float> aux;    // [t][7][tile]
    std::vector<int32_t> uv;   // [t][tile]
    std::vector<float> pos;    // [t][3c][cap]
    std::vector<float> pthr;
    std::vector<int32_t> pmeta;       // [np][6]
    std::vector<int64_t> pend;        // [np] segment-local row or -1
    std::vector<int64_t> pslices;     // [ligs][2] segment-local pair ids
    int64_t nst = 0;                  // rows used (tile-aligned when done)
    int64_t maxb = 1, maxp = 1;
    int rc = 0;  // 0 ok, -3 semantic error (node cap / pair span)

    // current-tile scratch: global node id per row side (-1 = neutral)
    std::vector<int32_t> row_u, row_v;
    int64_t tile_base = 0;  // first row of the open tile

    void ensure_tile(int64_t t_needed) {
        const size_t t = (size_t)t_needed;
        if (uv.size() < t * tile) {
            gtab.resize(t * 3 * P * tile);
            aux.resize(t * 7 * tile);
            uv.resize(t * tile);
            pos.resize(t * threec * cap);
        }
    }

    void neutral_row(int64_t row) {
        const int64_t t = row / tile, off = row % tile;
        float* g = &gtab[(t * 3 * P) * tile + off];
        for (int p = 0; p < P; ++p) {
            g[p * tile] = 0.f;                  // mu
            g[(P + p) * tile] = 1.f;            // inv
            g[(2 * P + p) * tile] = 0.f;        // winv
        }
        float* a = &aux[(t * 7) * tile + off];
        a[AUX_FB * tile] = 1.f;
        a[AUX_FP * tile] = 1.f;
        a[AUX_MNINV * tile] = 0.f;
        a[AUX_MNHALF * tile] = 0.f;
        a[AUX_GATE * tile] = 0.f;
        a[AUX_THR * tile] = INF;
        a[AUX_SELF * tile] = 1.f;
        row_u[row - tile_base] = -1;
        row_v[row - tile_base] = -1;
    }

    // assign slots (ascending global node id), write uv + pos table
    void close_tile(const LigandBatch& lb) {
        const int64_t t = tile_base / tile;
        const int64_t rows = nst - tile_base;
        std::vector<int32_t> nodes;
        nodes.reserve(cap);
        for (int64_t r = 0; r < rows; ++r) {
            for (int32_t g : {row_u[r], row_v[r]}) {
                if (g < 0) continue;
                if (std::find(nodes.begin(), nodes.end(), g) == nodes.end())
                    nodes.push_back(g);
            }
        }
        if ((int)nodes.size() > cap) { rc = -3; return; }
        std::sort(nodes.begin(), nodes.end());
        int32_t* uv_row = &uv[t * tile];
        for (int64_t r = 0; r < rows; ++r) {
            if (row_u[r] < 0) { uv_row[r] = 0; continue; }
            const int32_t su = (int32_t)(std::lower_bound(nodes.begin(), nodes.end(), row_u[r]) - nodes.begin());
            const int32_t sv = (int32_t)(std::lower_bound(nodes.begin(), nodes.end(), row_v[r]) - nodes.begin());
            uv_row[r] = su * cap + sv;
        }
        for (int64_t r = rows; r < tile; ++r) uv_row[r] = 0;
        float* pos_t = &pos[t * threec * cap];
        std::memset(pos_t, 0, sizeof(float) * threec * cap);
        for (size_t s = 0; s < nodes.size(); ++s) {
            const float* src = lb.node_pos + (int64_t)nodes[s] * threec;
            for (int k = 0; k < threec; ++k) pos_t[k * cap + s] = src[k];
        }
        tile_base += tile;
        std::fill(row_u.begin(), row_u.end(), -1);
        std::fill(row_v.begin(), row_v.end(), -1);
    }

    // pad (neutral rows) to the next tile boundary and close the tile
    void pad_to_boundary(const LigandBatch& lb) {
        const int64_t in_tile = nst % tile;
        if (in_tile == 0) return;
        ensure_tile(nst / tile + 1);
        for (int64_t k = in_tile; k < tile; ++k) neutral_row(tile_base + k);
        nst = tile_base + tile;
        close_tile(lb);
    }
};

void pack_range(const ModelTables& m, const LigandBatch& lb, int P, int tile,
                int cap, int32_t b0, int32_t b1, SegBuf& o) {
    o.row_u.assign(tile, -1);
    o.row_v.assign(tile, -1);
    std::vector<int32_t> scratch;
    std::vector<char> marked;
    int64_t nodes_in_tile = 0;

    for (int32_t li = b0; li < b1 && o.rc == 0; ++li) {
        o.pslices.push_back((int64_t)o.pthr.size());
        const int32_t clus_base = lb.lig_cluster_offsets[li];
        const int32_t node_base = lb.node_mask_offsets[li];
        const int32_t a_lo = lb.active_offsets[li];
        const int32_t a_hi = lb.active_offsets[li + 1];
        const int32_t n_active = a_hi - a_lo;

        // matched model-node lists per (active cluster, candidate)
        std::vector<std::vector<std::vector<std::pair<int32_t, std::vector<int32_t>>>>>
            matchlists((size_t)n_active);
        for (int32_t i = 0; i < n_active; ++i) {
            const int32_t l = lb.active[a_lo + i];
            const int32_t gc = clus_base + l;
            const int32_t c_lo = lb.cand_offsets[gc];
            const int32_t c_hi = lb.cand_offsets[gc + 1];
            matchlists[i].resize((size_t)(c_hi - c_lo));
            for (int32_t cj = c_lo; cj < c_hi; ++cj) {
                auto& per_cand = matchlists[i][(size_t)(cj - c_lo)];
                const int32_t n_lo = lb.cluster_node_offsets[gc];
                const int32_t n_hi = lb.cluster_node_offsets[gc + 1];
                for (int32_t nk = n_lo; nk < n_hi; ++nk) {
                    const int32_t u = lb.cluster_nodes[nk];
                    matched_nodes(m, lb.node_masks[node_base + u], lb.cands[cj], scratch);
                    if (!scratch.empty()) per_cand.emplace_back(u, scratch);
                }
            }
        }

        // referenced-node count n + total rows r (for the layout decisions)
        marked.assign((size_t)lb.ln, 0);
        int64_t lig_rows = 0;
        auto block_rows = [P](size_t a, size_t b) {
            return (int64_t)((a * b + (size_t)P - 1) / (size_t)P);
        };
        for (int32_t i = 0; i < n_active; ++i) {
            for (auto& mlist : matchlists[i]) {
                if (mlist.size() >= 2) {
                    for (auto& e : mlist) marked[(size_t)e.first] = 1;
                    for (size_t a = 0; a < mlist.size(); ++a)
                        for (size_t b = a + 1; b < mlist.size(); ++b)
                            lig_rows += block_rows(mlist[a].second.size(), mlist[b].second.size());
                }
            }
        }
        for (int32_t i1 = 0; i1 < n_active; ++i1)
            for (int32_t i2 = i1 + 1; i2 < n_active; ++i2)
                for (auto& m1 : matchlists[i1])
                    for (auto& m2 : matchlists[i2]) {
                        if (m1.empty() || m2.empty()) continue;
                        for (auto& e : m1) marked[(size_t)e.first] = 1;
                        for (auto& e : m2) marked[(size_t)e.first] = 1;
                        for (auto& eu : m1)
                            for (auto& ev : m2)
                                lig_rows += block_rows(eu.second.size(), ev.second.size());
                    }
        int64_t n_ref = 0;
        for (char c : marked) n_ref += c;

        // pair emission helpers ------------------------------------------
        auto emit_pair_rows = [&](const std::vector<std::pair<int32_t, std::vector<int32_t>>>* m1,
                                  const std::vector<std::pair<int32_t, std::vector<int32_t>>>* m2,
                                  bool self_pair, float thr, int64_t span) {
            // span == rows this pair will emit (precomputed); pair-align
            if (span == 0) {
                o.pend.push_back(-1);
                return;
            }
            if (span > tile) { o.rc = -3; return; }
            if ((o.nst % tile) + span > tile) o.pad_to_boundary(lb);
            if (o.rc != 0) return;
            const int64_t pair_start = o.nst;
            const float selff = self_pair ? 1.f : 0.f;
            const float gate = self_pair ? 0.f : 1.f;
            bool first_row_of_pair = true;

            auto emit_block = [&](int32_t u, int32_t v,
                                  const std::vector<int32_t>& a_nodes,
                                  const std::vector<int32_t>& b_nodes) {
                const int64_t mn = (int64_t)a_nodes.size() * (int64_t)b_nodes.size();
                const int64_t rows = (mn + P - 1) / P;
                o.maxb = std::max(o.maxb, rows);
                const int64_t g_u = (int64_t)li * lb.ln + u;
                const int64_t g_v = (int64_t)li * lb.ln + v;
                int64_t k = 0, row = -1;
                float* grow = nullptr;  // row base in gtab (mu lane 0)
                float* arow = nullptr;  // row base in aux
                for (int32_t pn : a_nodes) {
                    const float wp = m.weight[pn];
                    const float* mu_row = m.mu + (int64_t)pn * m.Mn;
                    const float* std_row = m.stdv + (int64_t)pn * m.Mn;
                    for (int32_t qn : b_nodes) {
                        const int lane = (int)(k % P);
                        if (lane == 0) {
                            row = o.nst++;
                            const int64_t t = row / tile, off = row % tile;
                            o.ensure_tile(t + 1);
                            grow = &o.gtab[(t * 3 * P) * tile + off];
                            arow = &o.aux[(t * 7) * tile + off];
                            for (int p = 0; p < P; ++p) {
                                grow[p * tile] = 0.f;
                                grow[(P + p) * tile] = 1.f;
                                grow[(2 * P + p) * tile] = 0.f;
                            }
                            arow[AUX_FB * tile] = (k == 0) ? 1.f : 0.f;
                            arow[AUX_FP * tile] = first_row_of_pair ? 1.f : 0.f;
                            first_row_of_pair = false;
                            arow[AUX_MNINV * tile] = 0.f;
                            arow[AUX_MNHALF * tile] = 0.f;
                            arow[AUX_GATE * tile] = 0.f;
                            arow[AUX_THR * tile] = thr;
                            arow[AUX_SELF * tile] = selff;
                            o.row_u[row - o.tile_base] = (int32_t)g_u;
                            o.row_v[row - o.tile_base] = (int32_t)g_v;
                        }
                        grow[lane * tile] = mu_row[qn];
                        const float s = std_row[qn];
                        grow[(P + lane) * tile] = 1.0f / s;
                        grow[(2 * P + lane) * tile] = (wp * m.weight[qn]) / s;
                        ++k;
                    }
                }
                // block-end annotations on the last row
                arow[AUX_MNINV * tile] = 1.0f / (float)std::max<int64_t>(mn, 1);
                arow[AUX_MNHALF * tile] = (float)((mn + 1) / 2);
                arow[AUX_GATE * tile] = gate;
                if (o.nst % tile == 0) o.close_tile(lb);
            };

            if (self_pair) {
                const auto& ml = *m1;
                for (size_t a = 0; a < ml.size(); ++a)
                    for (size_t b = a + 1; b < ml.size(); ++b)
                        emit_block(ml[a].first, ml[b].first, ml[a].second, ml[b].second);
            } else {
                for (const auto& eu : *m1)
                    for (const auto& ev : *m2)
                        emit_block(eu.first, ev.first, eu.second, ev.second);
            }
            o.maxp = std::max(o.maxp, o.nst - pair_start);
            o.pend.push_back(o.nst - 1);
        };

        if (lig_rows == 0) {
            // no emitted rows: pairs still exist in the pair tables
            for (int32_t i = 0; i < n_active; ++i) {
                const int32_t l = lb.active[a_lo + i];
                const int32_t gc = clus_base + l;
                for (int32_t cj = lb.cand_offsets[gc]; cj < lb.cand_offsets[gc + 1]; ++cj) {
                    o.pthr.push_back(INF);
                    o.pmeta.insert(o.pmeta.end(), {li, l, l, lb.cands[cj], lb.cands[cj], 1});
                    o.pend.push_back(-1);
                }
            }
            for (int32_t i1 = 0; i1 < n_active; ++i1) {
                const int32_t l1 = lb.active[a_lo + i1];
                const int32_t gc1 = clus_base + l1;
                for (int32_t i2 = i1 + 1; i2 < n_active; ++i2) {
                    const int32_t l2 = lb.active[a_lo + i2];
                    const int32_t gc2 = clus_base + l2;
                    for (int32_t cj1 = lb.cand_offsets[gc1]; cj1 < lb.cand_offsets[gc1 + 1]; ++cj1)
                        for (int32_t cj2 = lb.cand_offsets[gc2]; cj2 < lb.cand_offsets[gc2 + 1]; ++cj2) {
                            const auto& m1 = matchlists[i1][(size_t)(cj1 - lb.cand_offsets[gc1])];
                            const auto& m2 = matchlists[i2][(size_t)(cj2 - lb.cand_offsets[gc2])];
                            o.pthr.push_back(0.5f * (float)m1.size() * (float)m2.size());
                            o.pmeta.insert(o.pmeta.end(), {li, l1, l2, lb.cands[cj1], lb.cands[cj2], 0});
                            o.pend.push_back(-1);
                        }
                }
            }
            o.pslices.push_back((int64_t)o.pthr.size());
            continue;
        }

        if (n_ref > cap) { o.rc = -3; break; }
        // per-ligand node budget (conservative: full referenced set)
        const int64_t in_tile = o.nst % tile;
        if (in_tile && nodes_in_tile + n_ref > cap) {
            o.pad_to_boundary(lb);
            nodes_in_tile = 0;
        }
        const int64_t start = o.nst;

        // self pairs
        for (int32_t i = 0; i < n_active && o.rc == 0; ++i) {
            const int32_t l = lb.active[a_lo + i];
            const int32_t gc = clus_base + l;
            const int32_t c_lo = lb.cand_offsets[gc];
            for (int32_t cj = c_lo; cj < lb.cand_offsets[gc + 1]; ++cj) {
                const auto& ml = matchlists[i][(size_t)(cj - c_lo)];
                int64_t span = 0;
                for (size_t a = 0; a < ml.size(); ++a)
                    for (size_t b = a + 1; b < ml.size(); ++b)
                        span += block_rows(ml[a].second.size(), ml[b].second.size());
                o.pthr.push_back(INF);
                o.pmeta.insert(o.pmeta.end(), {li, l, l, lb.cands[cj], lb.cands[cj], 1});
                emit_pair_rows(&ml, nullptr, true, INF, span);
                if (o.rc != 0) break;
            }
        }
        // cross pairs
        for (int32_t i1 = 0; i1 < n_active && o.rc == 0; ++i1) {
            const int32_t l1 = lb.active[a_lo + i1];
            const int32_t gc1 = clus_base + l1;
            const int32_t c1_lo = lb.cand_offsets[gc1];
            for (int32_t i2 = i1 + 1; i2 < n_active && o.rc == 0; ++i2) {
                const int32_t l2 = lb.active[a_lo + i2];
                const int32_t gc2 = clus_base + l2;
                const int32_t c2_lo = lb.cand_offsets[gc2];
                for (int32_t cj1 = c1_lo; cj1 < lb.cand_offsets[gc1 + 1] && o.rc == 0; ++cj1) {
                    const auto& m1 = matchlists[i1][(size_t)(cj1 - c1_lo)];
                    for (int32_t cj2 = c2_lo; cj2 < lb.cand_offsets[gc2 + 1] && o.rc == 0; ++cj2) {
                        const auto& m2 = matchlists[i2][(size_t)(cj2 - c2_lo)];
                        int64_t span = 0;
                        for (const auto& eu : m1)
                            for (const auto& ev : m2)
                                span += block_rows(eu.second.size(), ev.second.size());
                        const float thr = 0.5f * (float)m1.size() * (float)m2.size();
                        o.pthr.push_back(thr);
                        o.pmeta.insert(o.pmeta.end(), {li, l1, l2, lb.cands[cj1], lb.cands[cj2], 0});
                        emit_pair_rows(&m1, &m2, false, thr, span);
                    }
                }
            }
        }
        o.pslices.push_back((int64_t)o.pthr.size());

        // node-budget accounting (mirrors screen_tiles.py exactly)
        if (o.nst % tile == 0) nodes_in_tile = 0;
        else if (o.nst / tile != start / tile) nodes_in_tile = n_ref;
        else nodes_in_tile += n_ref;
    }
    if (o.rc == 0) o.pad_to_boundary(lb);  // segment ends tile-aligned
}

}  // namespace

extern "C" int32_t pack_tiled(
    // model tables
    int32_t M, int32_t Mn,
    const int32_t* ct_offsets, const int32_t* ct_nodes,
    const float* mu, const float* stdv, const float* weight,
    // ligand batch (flattened, same as build_blocks) + positions
    int32_t B, int32_t ln, int32_t cmax,
    const int32_t* lig_cluster_offsets,
    const int32_t* cluster_node_offsets,
    const int32_t* cluster_nodes,
    const int32_t* node_mask_offsets,
    const int32_t* node_masks,
    const int32_t* active_offsets,
    const int32_t* active,
    const int32_t* cand_offsets,
    const int32_t* cands,
    const float* node_pos,  // [B*ln, cmax*3]
    // layout params
    int32_t P, int32_t tile, int32_t cap, int32_t threads,
    int64_t t_alloc, int64_t cap_np,
    // outputs
    float* gtab,            // [t_alloc, 3, P, tile]
    float* aux,             // [t_alloc, 7, tile]
    int32_t* uv,            // [t_alloc, tile]
    float* pos_blocks,      // [t_alloc, 3*cmax, cap]
    float* pair_threshold,  // [cap_np]
    int32_t* pair_meta,     // [cap_np, 6]
    int64_t* pair_end_rows, // [cap_np]
    int64_t* pair_slices,   // [B, 2]
    int64_t* out            // [4]: nst, np, max_block, max_pair
) {
    ModelTables model{M, Mn, ct_offsets, ct_nodes, mu, stdv, weight};
    LigandBatch lb{B, ln, cmax, lig_cluster_offsets, cluster_node_offsets,
                   cluster_nodes, node_mask_offsets, node_masks,
                   active_offsets, active, cand_offsets, cands, node_pos};
    const int threec = 3 * cmax;

    const int nthreads = std::max(1, std::min<int>(threads, B));
    std::vector<SegBuf> segs((size_t)nthreads);
    std::vector<std::thread> pool;
    const int32_t chunk = (B + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        SegBuf& s = segs[(size_t)t];
        s.tile = tile; s.P = P; s.cap = cap; s.threec = threec;
        const int32_t b0 = t * chunk, b1 = std::min(B, (t + 1) * chunk);
        if (b0 >= b1) continue;
        if (nthreads == 1) pack_range(model, lb, P, tile, cap, b0, b1, s);
        else pool.emplace_back(pack_range, std::cref(model), std::cref(lb),
                               P, tile, cap, b0, b1, std::ref(s));
    }
    for (auto& th : pool) th.join();

    int64_t nst = 0, np = 0, maxb = 1, maxp = 1;
    for (auto& s : segs) {
        if (s.rc != 0) return s.rc;
        nst += s.nst;
        np += (int64_t)s.pthr.size();
        maxb = std::max(maxb, s.maxb);
        maxp = std::max(maxp, s.maxp);
    }
    out[0] = nst; out[1] = np; out[2] = maxb; out[3] = maxp;
    if (nst > t_alloc * tile) return -1;
    if (np > cap_np) return -2;

    // merge segments (contiguous memcpys; tile-aligned by construction)
    int64_t row_off = 0, np_off = 0, lig_off = 0;
    for (auto& s : segs) {
        const int64_t t0 = row_off / tile, ts = s.nst / tile;
        if (ts) {
            std::memcpy(gtab + t0 * 3 * P * tile, s.gtab.data(),
                        sizeof(float) * ts * 3 * P * tile);
            std::memcpy(aux + t0 * 7 * tile, s.aux.data(),
                        sizeof(float) * ts * 7 * tile);
            std::memcpy(uv + t0 * tile, s.uv.data(), sizeof(int32_t) * ts * tile);
            std::memcpy(pos_blocks + t0 * threec * cap, s.pos.data(),
                        sizeof(float) * ts * threec * cap);
        }
        const int64_t sp = (int64_t)s.pthr.size();
        if (sp) {
            std::memcpy(pair_threshold + np_off, s.pthr.data(), sizeof(float) * sp);
            std::memcpy(pair_meta + np_off * 6, s.pmeta.data(), sizeof(int32_t) * sp * 6);
            for (int64_t i = 0; i < sp; ++i)
                pair_end_rows[np_off + i] =
                    s.pend[(size_t)i] < 0 ? -1 : s.pend[(size_t)i] + row_off;
        }
        const int64_t nl = (int64_t)s.pslices.size() / 2;
        for (int64_t i = 0; i < nl; ++i) {
            pair_slices[(lig_off + i) * 2] = s.pslices[(size_t)(i * 2)] + np_off;
            pair_slices[(lig_off + i) * 2 + 1] = s.pslices[(size_t)(i * 2 + 1)] + np_off;
        }
        row_off += s.nst; np_off += sp; lig_off += nl;
    }

    // neutral-fill the remaining allocated tiles (bucket padding)
    for (int64_t t = nst / tile; t < t_alloc; ++t) {
        float* g = gtab + t * 3 * P * tile;
        for (int64_t i = 0; i < (int64_t)P * tile; ++i) g[i] = 0.f;            // mu
        for (int64_t i = 0; i < (int64_t)P * tile; ++i) g[P * tile + i] = 1.f; // inv
        std::memset(g + 2 * P * tile, 0, sizeof(float) * P * tile);            // winv
        float* a = aux + t * 7 * tile;
        for (int64_t i = 0; i < tile; ++i) a[AUX_FB * tile + i] = 1.f;
        for (int64_t i = 0; i < tile; ++i) a[AUX_FP * tile + i] = 1.f;
        std::memset(a + AUX_MNINV * tile, 0, sizeof(float) * tile * 3);
        for (int64_t i = 0; i < tile; ++i) a[AUX_THR * tile + i] = INF;
        for (int64_t i = 0; i < tile; ++i) a[AUX_SELF * tile + i] = 1.f;
        std::memset(uv + t * tile, 0, sizeof(int32_t) * tile);
        std::memset(pos_blocks + t * threec * cap, 0, sizeof(float) * threec * cap);
    }
    return 0;
}
