#include "http/thread_pool.h"

#include "utils/logging.h"

namespace gabby::http {

ThreadPool::ThreadPool(int workers, int max_queue) {
    if (workers < 1) workers = 1;
    max_queue_ = max_queue > 0 ? static_cast<size_t>(max_queue)
                               : static_cast<size_t>(2 * workers);
    threads_.reserve(workers);
    for (int i = 0; i < workers; i++) {
        threads_.emplace_back([this] { Run(); });
    }
}

ThreadPool::~ThreadPool() {
    {
        std::lock_guard<std::mutex> lock(mu_);
        done_ = true;
    }
    take_cv_.notify_all();
    put_cv_.notify_all();
    for (auto& t : threads_) t.join();
}

bool ThreadPool::Offer(Task task) {
    std::unique_lock<std::mutex> lock(mu_);
    put_cv_.wait(lock, [this] { return done_ || queue_.size() < max_queue_; });
    if (done_) return false;
    queue_.push_back(std::move(task));
    take_cv_.notify_one();
    return true;
}

bool ThreadPool::TryOffer(Task task) {
    {
        std::lock_guard<std::mutex> lock(mu_);
        if (done_ || queue_.size() >= max_queue_) return false;
        queue_.push_back(std::move(task));
    }
    take_cv_.notify_one();
    return true;
}

void ThreadPool::Run() {
    for (;;) {
        Task task;
        {
            std::unique_lock<std::mutex> lock(mu_);
            take_cv_.wait(lock, [this] { return done_ || !queue_.empty(); });
            if (queue_.empty()) {
                if (done_) return;
                continue;
            }
            task = std::move(queue_.front());
            queue_.pop_front();
            put_cv_.notify_one();
        }
        // run OUTSIDE the lock — the whole point of having N workers
        try {
            task();
        } catch (const std::exception& e) {
            LOG(ERROR) << "uncaught exception in worker: " << e.what();
        } catch (...) {
            LOG(ERROR) << "uncaught non-exception in worker";
        }
    }
}

}  // namespace gabby::http
