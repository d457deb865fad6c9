// Standalone replay driver for captured core_resolve_groups_mt batches
// (core.cpp core_batch_capture).  Statically links core.cpp so the whole
// production DP can run under gprof: the .so is dlopen'd by ctypes in
// production, which gprof cannot instrument.
//
// Build:  g++ -O2 -pg -std=c++14 -ffp-contract=off -o replay_batch \
//             replay_batch.cpp core.cpp abam.cpp -lz
// Run:    ./replay_batch [reps] /tmp/cap_*.bin && gprof -b replay_batch
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

typedef int32_t i32;
typedef int64_t i64;

extern "C" {
void* core_resolve_groups_mt(
    i32 n_groups, i32 nthreads, i32 do_bridge, const i32* grp_nb,
    const i32* nh, const i32* const* fixed_p, const i32* const* coords_p,
    const i32* const* mev_p, const i64* mev_cnt,
    const i32* const* iev_p, const i64* iev_cnt,
    const i32* const* frg_p, const i64* frg_cnt,
    const i32* sample_id, const i32* strand,
    const i64* lpos, const i64* rpos,
    const i64* ins_low, const i64* ins_high,
    const i64* cfg_ints, const double* cfg_dbls);
void core_batch_free(void* h);
}

static const int CFG_NI = 9, CFG_ND = 14;

struct Cap {
    i64 n_groups = 0, do_bridge = 0;
    std::vector<i32> grp_nb, nh, sample_id, strand;
    std::vector<i64> mev_cnt, iev_cnt, frg_cnt, lpos, rpos, ilow, ihigh,
        cfg_ints;
    std::vector<double> cfg_dbls;
    std::vector<std::vector<i32>> fixed, coords, mev, iev, frg;
    std::vector<const i32*> fixed_p, coords_p, mev_p, iev_p, frg_p;
};

template <class T>
static void rd(FILE* fp, std::vector<T>& v, size_t n) {
    v.resize(n);
    if (n && fread(v.data(), sizeof(T), n, fp) != n) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

static bool load(const char* path, Cap& c) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return false;
    i64 hdr[3];
    if (fread(hdr, sizeof(i64), 3, fp) != 3 ||
        hdr[0] != 0x414c424154434801LL) {
        fclose(fp);
        return false;
    }
    c.n_groups = hdr[1];
    c.do_bridge = hdr[2];
    rd(fp, c.grp_nb, c.n_groups);
    size_t nb = 0;
    for (i64 g = 0; g < c.n_groups; g++) nb += (size_t)c.grp_nb[g];
    size_t nc = nb + (size_t)c.n_groups;
    rd(fp, c.nh, nb);
    rd(fp, c.sample_id, nb);
    rd(fp, c.strand, nb);
    rd(fp, c.mev_cnt, nb);
    rd(fp, c.iev_cnt, nb);
    rd(fp, c.frg_cnt, nb);
    rd(fp, c.lpos, nb);
    rd(fp, c.rpos, nb);
    rd(fp, c.ilow, nb);
    rd(fp, c.ihigh, nb);
    rd(fp, c.cfg_ints, nc * CFG_NI);
    rd(fp, c.cfg_dbls, nc * CFG_ND);
    c.fixed.resize(nb);
    c.coords.resize(nb);
    c.mev.resize(nb);
    c.iev.resize(nb);
    c.frg.resize(nb);
    for (size_t b = 0; b < nb; b++) {
        i64 sizes[2];
        if (fread(sizes, sizeof(i64), 2, fp) != 2) {
            fclose(fp);
            return false;
        }
        rd(fp, c.fixed[b], sizes[0]);
        rd(fp, c.coords[b], sizes[1]);
        rd(fp, c.mev[b], 2 * c.mev_cnt[b]);
        rd(fp, c.iev[b], 2 * c.iev_cnt[b]);
        rd(fp, c.frg[b], 2 * c.frg_cnt[b]);
        c.fixed_p.push_back(c.fixed[b].data());
        c.coords_p.push_back(c.coords[b].data());
        c.mev_p.push_back(c.mev[b].data());
        c.iev_p.push_back(c.iev[b].data());
        c.frg_p.push_back(c.frg[b].data());
    }
    fclose(fp);
    return true;
}

int main(int argc, char** argv) {
    int reps = 1, a0 = 1;
    if (argc > 1 && atoi(argv[1]) > 0 && strstr(argv[1], ".bin") == NULL) {
        reps = atoi(argv[1]);
        a0 = 2;
    }
    std::vector<Cap> caps;
    for (int a = a0; a < argc; a++) {
        caps.emplace_back();
        if (!load(argv[a], caps.back())) {
            fprintf(stderr, "load failed: %s\n", argv[a]);
            return 1;
        }
    }
    long groups = 0;
    for (int r = 0; r < reps; r++)
        for (Cap& c : caps) {
            void* h = core_resolve_groups_mt(
                (i32)c.n_groups, 1, (i32)c.do_bridge, c.grp_nb.data(),
                c.nh.data(), c.fixed_p.data(), c.coords_p.data(),
                c.mev_p.data(), c.mev_cnt.data(), c.iev_p.data(),
                c.iev_cnt.data(), c.frg_p.data(), c.frg_cnt.data(),
                c.sample_id.data(), c.strand.data(), c.lpos.data(),
                c.rpos.data(), c.ilow.data(), c.ihigh.data(),
                c.cfg_ints.data(), c.cfg_dbls.data());
            core_batch_free(h);
            groups += c.n_groups;
        }
    printf("replayed %zu captures x %d reps, %ld group-resolves\n",
           caps.size(), reps, groups);
    return 0;
}
