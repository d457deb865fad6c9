/* boost::disjoint_sets shim (union by rank + path compression) for the
 * reference's usage: disjoint_sets<int*, int*>(ranks, parents) with
 * make_set / find_set / link (rnacore/disjoint_set.h,
 * meta/bundle_group.cc). */
#ifndef ALETSCH_SHIM_DISJOINT_SETS_HPP
#define ALETSCH_SHIM_DISJOINT_SETS_HPP

#include <cstddef>

namespace boost {

template <typename RankPA, typename ParentPA>
class disjoint_sets {
public:
    disjoint_sets(RankPA r, ParentPA p) : rank_(r), parent_(p) {}

    void make_set(int x) {
        parent_[x] = x;
        rank_[x] = 0;
    }

    int find_set(int x) {
        int root = x;
        while (parent_[root] != root) root = parent_[root];
        while (parent_[x] != root) {
            int nx = parent_[x];
            parent_[x] = root;
            x = nx;
        }
        return root;
    }

    /* link by rank (boost semantics: link() expects representatives) */
    void link(int x, int y) {
        x = find_set(x);
        y = find_set(y);
        if (x == y) return;
        if (rank_[x] > rank_[y]) {
            parent_[y] = x;
        } else if (rank_[x] < rank_[y]) {
            parent_[x] = y;
        } else {
            parent_[y] = x;
            rank_[x]++;
        }
    }

    void union_set(int x, int y) { link(find_set(x), find_set(y)); }

private:
    RankPA rank_;
    ParentPA parent_;
};

}  // namespace boost

#endif
