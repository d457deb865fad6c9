/* boost::asio::thread_pool shim (std::thread-based) for building the
 * reference aletsch binary.  Covers the reference's surface:
 * thread_pool(n), post(pool, fn), pool.join() (meta/incubator.cc). */
#ifndef ALETSCH_SHIM_ASIO_THREAD_POOL_HPP
#define ALETSCH_SHIM_ASIO_THREAD_POOL_HPP

#include <condition_variable>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace boost {
namespace asio {

class thread_pool {
public:
    explicit thread_pool(std::size_t n) : stopping_(false), joined_(false) {
        if (n == 0) n = 1;
        for (std::size_t i = 0; i < n; i++)
            workers_.emplace_back([this] { run(); });
    }

    ~thread_pool() { join(); }

    void submit(std::function<void()> f) {
        {
            std::lock_guard<std::mutex> lk(mu_);
            q_.push_back(std::move(f));
        }
        cv_.notify_one();
    }

    /* wait for all queued work, then stop the workers (asio semantics:
     * join() waits until the pool has no outstanding work) */
    void join() {
        if (joined_) return;
        {
            std::unique_lock<std::mutex> lk(mu_);
            done_cv_.wait(lk, [this] { return q_.empty() && busy_ == 0; });
            stopping_ = true;
        }
        cv_.notify_all();
        for (auto& t : workers_)
            if (t.joinable()) t.join();
        joined_ = true;
    }

private:
    void run() {
        for (;;) {
            std::function<void()> f;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_.wait(lk, [this] { return stopping_ || !q_.empty(); });
                if (q_.empty()) {
                    if (stopping_) return;
                    continue;
                }
                f = std::move(q_.front());
                q_.pop_front();
                busy_++;
            }
            f();
            {
                std::lock_guard<std::mutex> lk(mu_);
                busy_--;
                if (q_.empty() && busy_ == 0) done_cv_.notify_all();
            }
        }
    }

    std::vector<std::thread> workers_;
    std::deque<std::function<void()>> q_;
    std::mutex mu_;
    std::condition_variable cv_, done_cv_;
    int busy_ = 0;
    bool stopping_, joined_;
};

}  // namespace asio
}  // namespace boost

#endif
