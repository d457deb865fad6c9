/* boost::asio::post shim; see thread_pool.hpp. */
#ifndef ALETSCH_SHIM_ASIO_POST_HPP
#define ALETSCH_SHIM_ASIO_POST_HPP

#include "boost/asio/thread_pool.hpp"

namespace boost {
namespace asio {

template <typename F>
inline void post(thread_pool& pool, F&& f) {
    pool.submit(std::function<void()>(std::forward<F>(f)));
}

}  // namespace asio
}  // namespace boost

#endif
