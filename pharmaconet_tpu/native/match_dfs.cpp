// Native assignment-tree DFS for graph-match screening.
//
// Consumes the device-computed pair-score table and runs the reference's
// cluster-assignment search (pharmaconet_tpu/scoring/tree.py is the semantic
// reference; tests enforce equal scores):
//   * ligand clusters are assigned, in priority order, to one of their
//     candidate model clusters or to None
//   * a candidate survives at a conformer only while every pairwise score
//     against already-assigned ancestors stays > 0
//   * the None branch is taken when no candidate survives or the best
//     completable match count would stay below MIN_MATCHES (5)
//   * final score = mean over conformers of the best leaf total
//
// Table row layout per ligand (produced by both block packers):
//   [self rows:  for l in active: for m in cands[l]]
//   [cross rows: for i1 < i2: for m1 in cands[l_i1]: for m2 in cands[l_i2]]
//
// Build: g++ -O3 -std=c++17 -shared -fPIC match_dfs.cpp -o libmatchdfs.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int MIN_MATCHES = 5;

struct LigandCtx {
    const float* table;  // [np_lig, cmax] rows for this ligand
    int64_t cmax;
    int c;               // real conformers
    int n_active;
    const int32_t* cand_counts;  // [n_active]
    std::vector<int64_t> self_offset;   // per active cluster -> first self row
    std::vector<std::vector<int64_t>> cross_offset;  // [i1][i2] -> first cross row
    std::vector<float> best;  // [c] running best per conformer
};

// candidate state: accumulated cross scores + alive mask per conformer
struct Entry {
    int cand;              // candidate index within its cluster
    std::vector<float> accum;
    std::vector<uint8_t> alive;
    bool any = true;
};

using Level = std::vector<Entry>;  // entries for one not-yet-assigned cluster

int dfs(LigandCtx& ctx,
        int level,                    // index of the cluster just assigned (-1 at root)
        int chosen_cand,              // candidate index, or -1 for None/root
        bool has_model,               // true if a model cluster was assigned here
        int num_matches,
        const std::vector<float>& ps,       // node conformer totals
        const std::vector<uint8_t>& ps_alive,
        std::vector<Level> match)     // levels (level+1 .. n_active-1), by value
{
    const int c = ctx.c;
    // filter deeper candidates against the newly assigned cluster
    if (has_model) {
        for (int lv = level + 1; lv < ctx.n_active; ++lv) {
            Level& entries = match[lv - (level + 1)];
            for (Entry& e : entries) {
                if (!e.any) continue;
                const int64_t row =
                    ctx.cross_offset[level][lv]
                    + (int64_t)chosen_cand * ctx.cand_counts[lv] + e.cand;
                const float* pair = ctx.table + row * ctx.cmax;
                bool any = false;
                for (int ci = 0; ci < c; ++ci) {
                    if (e.alive[ci] && ps_alive[ci] && pair[ci] > 0.0f) {
                        e.accum[ci] += pair[ci];
                        any = true;
                    } else {
                        e.alive[ci] = 0;
                    }
                }
                e.any = any;
            }
        }
    }

    if (level >= ctx.n_active - 1) {
        // leaf: record conformer totals
        for (int ci = 0; ci < c; ++ci) {
            if (ps_alive[ci] && ps[ci] > ctx.best[ci]) ctx.best[ci] = ps[ci];
        }
        return has_model ? 1 : 0;
    }

    const int child = level + 1;
    Level child_entries = std::move(match[0]);
    std::vector<Level> rest(match.begin() + 1, match.end());

    int max_matches = 0;
    bool any_child = false;
    for (const Entry& e : child_entries) {
        if (!e.any) continue;
        any_child = true;
        std::vector<float> cps(c, 0.0f);
        std::vector<uint8_t> calive(c, 0);
        const int64_t self_row = ctx.self_offset[child] + e.cand;
        const float* self_scores = ctx.table + self_row * ctx.cmax;
        for (int ci = 0; ci < c; ++ci) {
            if (e.alive[ci]) {
                calive[ci] = 1;
                cps[ci] = ps[ci] + self_scores[ci] + e.accum[ci];
            }
        }
        const int nm = dfs(ctx, child, e.cand, true, num_matches + 1, cps, calive, rest);
        if (nm > max_matches) max_matches = nm;
    }
    if (!any_child || num_matches + max_matches < MIN_MATCHES) {
        const int nm = dfs(ctx, child, -1, false, num_matches, ps, ps_alive, rest);
        if (nm > max_matches) max_matches = nm;
    }
    return max_matches + (has_model ? 1 : 0);
}

}  // namespace

extern "C" void match_dfs(
    // batch
    int32_t num_ligands,
    const float* table,          // [np_total, cmax]
    int64_t cmax,
    const int64_t* pair_starts,  // [B] first table row per ligand
    const int32_t* conformers,   // [B]
    const int32_t* active_offsets,  // [B+1] into cand_counts
    const int32_t* cand_counts,     // [sum active] candidates per active cluster
    float* out_scores            // [B]
) {
    for (int32_t li = 0; li < num_ligands; ++li) {
        const int32_t a_lo = active_offsets[li];
        const int32_t a_hi = active_offsets[li + 1];
        const int n_active = a_hi - a_lo;
        const int c = conformers[li];
        if (n_active == 0 || c == 0) {
            out_scores[li] = 0.0f;
            continue;
        }
        LigandCtx ctx;
        ctx.cmax = cmax;
        ctx.c = c;
        ctx.n_active = n_active;
        ctx.cand_counts = cand_counts + a_lo;
        ctx.table = table + pair_starts[li] * cmax;
        ctx.best.assign((size_t)c, 0.0f);

        // row offsets matching the packer's emission order
        ctx.self_offset.resize((size_t)n_active);
        int64_t row = 0;
        for (int l = 0; l < n_active; ++l) {
            ctx.self_offset[(size_t)l] = row;
            row += ctx.cand_counts[l];
        }
        ctx.cross_offset.assign((size_t)n_active, std::vector<int64_t>((size_t)n_active, -1));
        for (int i1 = 0; i1 < n_active; ++i1) {
            for (int i2 = i1 + 1; i2 < n_active; ++i2) {
                ctx.cross_offset[(size_t)i1][(size_t)i2] = row;
                row += (int64_t)ctx.cand_counts[i1] * ctx.cand_counts[i2];
            }
        }

        // initial candidate state: zero accum, all conformers alive
        std::vector<Level> match((size_t)n_active);
        for (int l = 0; l < n_active; ++l) {
            Level& entries = match[(size_t)l];
            entries.resize((size_t)ctx.cand_counts[l]);
            for (int j = 0; j < ctx.cand_counts[l]; ++j) {
                entries[(size_t)j].cand = j;
                entries[(size_t)j].accum.assign((size_t)c, 0.0f);
                entries[(size_t)j].alive.assign((size_t)c, 1);
            }
        }
        std::vector<float> ps((size_t)c, 0.0f);
        std::vector<uint8_t> alive((size_t)c, 1);
        dfs(ctx, -1, -1, false, 0, ps, alive, std::move(match));

        float total = 0.0f;
        for (int ci = 0; ci < c; ++ci) total += ctx.best[ci];
        out_scores[li] = total / (float)c;
    }
}
