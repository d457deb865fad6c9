/* boost::icl interval_map shim for building the reference aletsch binary.
 *
 * Implements the exact icl semantics the reference relies on
 * (rnacore/interval_map.h typedefs, rnacore/interval_map.cc helpers):
 *
 * - right-open intervals over a discrete domain, segments stored in a
 *   std::map keyed by exclusive_less (valid strict weak order because
 *   stored segments are pairwise disjoint);
 * - `+=`/`add` aggregates on overlap with the combiner (inplace_plus for
 *   ints: sum; for std::set values: union), inserts combiner(identity, v)
 *   on gaps, and absorbs identity-valued results (partial_absorber:
 *   zero / empty-set segments are erased);
 * - `-=` is add with the inverse combiner (icl on_invertible::subtract),
 *   so subtracting over a gap creates negative segments -- the reference
 *   depends on the +=/-= algebra cancelling exactly;
 * - joining maps (interval_map) re-join touching equal-valued neighbors
 *   after every operation; split maps (split_interval_map.hpp) keep every
 *   inserted border forever;
 * - find(point) / lower_bound(interval) / upper_bound(interval) follow
 *   the exclusive_less ordering (locate_* helpers in interval_map.cc);
 * - size() is the cardinality (total covered length), while
 *   std::distance(begin(), end()) remains the segment count
 *   (meta/assembler.cc:159 sorts bundles by it).
 */
#ifndef ALETSCH_SHIM_ICL_INTERVAL_MAP_HPP
#define ALETSCH_SHIM_ICL_INTERVAL_MAP_HPP

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <map>
#include <set>
#include <utility>
#include <vector>

namespace boost {
namespace icl {

template <typename T>
class right_open_interval {
public:
    right_open_interval() : l_(), u_() {}
    right_open_interval(T l, T u) : l_(l), u_(u) {}
    T lower() const { return l_; }
    T upper() const { return u_; }
    bool operator==(const right_open_interval& o) const {
        return l_ == o.l_ && u_ == o.u_;
    }

private:
    T l_, u_;
};

template <typename T>
inline T lower(const right_open_interval<T>& i) { return i.lower(); }
template <typename T>
inline T upper(const right_open_interval<T>& i) { return i.upper(); }
template <typename T>
inline T first(const right_open_interval<T>& i) { return i.lower(); }
template <typename T>
inline T last(const right_open_interval<T>& i) { return i.upper() - 1; }
template <typename T>
inline T length(const right_open_interval<T>& i) {
    return i.upper() - i.lower();
}

template <typename T>
struct interval {
    typedef right_open_interval<T> type;
};

/* trait / functor tags accepted by the reference's typedefs */
struct partial_absorber {};
template <typename V> struct inplace_plus {};
template <typename V> struct inter_section {};

namespace detail {

/* combiner: arithmetic sum, or union for std::set values */
template <typename V>
inline V combine_add(const V& a, const V& b) { return a + b; }
template <typename E>
inline std::set<E> combine_add(const std::set<E>& a, const std::set<E>& b) {
    std::set<E> r(a);
    r.insert(b.begin(), b.end());
    return r;
}

template <typename V>
inline V neg_value(const V& v) { return V() - v; }
template <typename E>
inline std::set<E> neg_value(const std::set<E>& v) { return v; }

template <typename IntervalT>
struct exclusive_less {
    bool operator()(const IntervalT& a, const IntervalT& b) const {
        return a.upper() <= b.lower();
    }
};

/* Shared engine for joining and splitting maps. */
template <typename K, typename V, typename IntervalT, bool Joining>
class interval_map_base {
public:
    typedef IntervalT interval_type;
    typedef std::map<IntervalT, V, exclusive_less<IntervalT>> segment_map;
    typedef typename segment_map::const_iterator const_iterator;
    typedef typename segment_map::const_iterator iterator;
    typedef typename segment_map::value_type value_type;

    typedef typename segment_map::const_reverse_iterator
        const_reverse_iterator;

    const_iterator begin() const { return seg_.begin(); }
    const_iterator end() const { return seg_.end(); }
    const_reverse_iterator rbegin() const { return seg_.rbegin(); }
    const_reverse_iterator rend() const { return seg_.rend(); }
    bool empty() const { return seg_.empty(); }
    void clear() { seg_.clear(); }
    void swap(interval_map_base& o) { seg_.swap(o.seg_); }

    /* icl size() == cardinality: total covered length */
    long long size() const {
        long long s = 0;
        for (const auto& kv : seg_)
            s += (long long)kv.first.upper() - (long long)kv.first.lower();
        return s;
    }
    long long iterative_size() const { return (long long)seg_.size(); }

    const_iterator find(K p) const {
        return seg_.find(IntervalT(p, p + 1));
    }
    const_iterator find(const IntervalT& iv) const { return seg_.find(iv); }
    const_iterator lower_bound(const IntervalT& iv) const {
        return seg_.lower_bound(iv);
    }
    const_iterator upper_bound(const IntervalT& iv) const {
        return seg_.upper_bound(iv);
    }

    void add(const IntervalT& iv, const V& v) {
        K l = iv.lower(), u = iv.upper();
        if (!(l < u)) return;
        if (v == V()) return;               /* identity absorbed up front */
        split_at(l);
        split_at(u);
        auto it = seg_.lower_bound(IntervalT(l, u));
        std::vector<IntervalT> dead;
        std::vector<std::pair<IntervalT, V>> born;
        K cur = l;
        while (cur < u) {
            if (it == seg_.end() || it->first.lower() >= u) {
                born.push_back({IntervalT(cur, u), v});
                cur = u;
                break;
            }
            K sl = it->first.lower(), su = it->first.upper();
            if (sl > cur) born.push_back({IntervalT(cur, sl), v});
            V nv = combine_add(it->second, v);
            if (nv == V())
                dead.push_back(it->first);
            else
                mutable_value(it) = nv;
            cur = su;
            ++it;
        }
        for (const auto& k : dead) seg_.erase(k);
        for (auto& kv : born) seg_.insert(kv);
        if (Joining) join_range(l, u);
    }

    void subtract(const IntervalT& iv, const V& v) {
        add(iv, neg_value(v));
    }

    interval_map_base& operator+=(const std::pair<IntervalT, V>& p) {
        add(p.first, p.second);
        return *this;
    }
    interval_map_base& operator-=(const std::pair<IntervalT, V>& p) {
        subtract(p.first, p.second);
        return *this;
    }

    /* whole-map aggregation (bundle combine: mmap += other.mmap) */
    template <typename OtherMap>
    interval_map_base& operator+=(const OtherMap& o) {
        for (auto it = o.begin(); it != o.end(); ++it)
            add(IntervalT(it->first.lower(), it->first.upper()),
                it->second);
        return *this;
    }

private:
    segment_map seg_;

    static V& mutable_value(const_iterator it) {
        /* values are never map keys; in-place mutation is safe */
        return const_cast<V&>(it->second);
    }

    /* cut the segment containing p (strictly inside) into two at p */
    void split_at(K p) {
        auto it = seg_.find(IntervalT(p, p + 1));
        if (it == seg_.end()) return;
        K sl = it->first.lower(), su = it->first.upper();
        if (sl == p) return;
        V val = it->second;
        seg_.erase(it->first);
        seg_.insert({IntervalT(sl, p), val});
        seg_.insert({IntervalT(p, su), val});
    }

    /* joining maps: merge touching equal-valued neighbors around [l, u] */
    void join_range(K l, K u) {
        auto it = seg_.lower_bound(IntervalT(l, u));
        if (it != seg_.begin()) --it;
        while (it != seg_.end()) {
            auto nx = it;
            ++nx;
            if (nx == seg_.end() || it->first.lower() > u) break;
            if (it->first.upper() == nx->first.lower() &&
                it->second == nx->second) {
                IntervalT joined(it->first.lower(), nx->first.upper());
                V val = it->second;
                seg_.erase(it->first);
                seg_.erase(nx->first);
                it = seg_.insert({joined, val}).first;
            } else {
                it = nx;
            }
        }
    }
};

}  // namespace detail

template <typename K, typename V,
          typename Traits = partial_absorber,
          template <class> class Cmp = std::less,
          template <class> class Add = inplace_plus,
          template <class> class Sect = inter_section,
          typename IntervalT = right_open_interval<K>>
class interval_map
    : public detail::interval_map_base<K, V, IntervalT, true> {};

}  // namespace icl
}  // namespace boost

#endif
