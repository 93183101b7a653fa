// Fixed-size worker pool with a bounded queue.
//
// Same capability as /root/reference/src/http/thread_pool.h:17-31, with two
// deliberate fixes: workers release the mutex BEFORE running a task (the
// reference executes tasks with the lock held, serializing all request
// handling — /root/reference/src/http/thread_pool.cc:22-28), and the queue
// is bounded so the server can shed load with 429 instead of queueing
// without limit (the reference's acknowledged backpressure TODO,
// /root/reference/README.md:32).
#ifndef GABBY_HTTP_THREAD_POOL_H_
#define GABBY_HTTP_THREAD_POOL_H_

#include <condition_variable>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace gabby::http {

class ThreadPool {
   public:
    using Task = std::function<void()>;

    // `workers` is clamped to >= 1. `max_queue` bounds tasks waiting beyond
    // the ones being executed; 0 means "2 * workers".
    explicit ThreadPool(int workers, int max_queue = 0);
    ~ThreadPool();

    ThreadPool(const ThreadPool&) = delete;
    ThreadPool& operator=(const ThreadPool&) = delete;

    // Blocking enqueue (waits for queue space). Returns false if shutting down.
    bool Offer(Task task);
    // Non-blocking enqueue; false if the queue is full or shutting down.
    bool TryOffer(Task task);

    int workers() const { return static_cast<int>(threads_.size()); }

   private:
    void Run();

    std::mutex mu_;
    std::condition_variable take_cv_;   // workers wait for tasks
    std::condition_variable put_cv_;    // producers wait for space
    std::deque<Task> queue_;
    size_t max_queue_;
    bool done_ = false;
    std::vector<std::thread> threads_;
};

}  // namespace gabby::http

#endif  // GABBY_HTTP_THREAD_POOL_H_
