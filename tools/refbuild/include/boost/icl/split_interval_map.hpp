/* boost::icl split_interval_map shim; engine in interval_map.hpp (the
 * Joining=false instantiation keeps every inserted border forever). */
#ifndef ALETSCH_SHIM_ICL_SPLIT_INTERVAL_MAP_HPP
#define ALETSCH_SHIM_ICL_SPLIT_INTERVAL_MAP_HPP

#include "boost/icl/interval_map.hpp"

namespace boost {
namespace icl {

template <typename K, typename V,
          typename Traits = partial_absorber,
          template <class> class Cmp = std::less,
          template <class> class Add = inplace_plus,
          template <class> class Sect = inter_section,
          typename IntervalT = right_open_interval<K>>
class split_interval_map
    : public detail::interval_map_base<K, V, IntervalT, false> {};

}  // namespace icl
}  // namespace boost

#endif
