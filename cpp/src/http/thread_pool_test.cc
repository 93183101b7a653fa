// ThreadPool tests, including proof that tasks run CONCURRENTLY (the
// reference's pool serializes everything by executing under its mutex —
// /root/reference/src/http/thread_pool.cc:22-28 — which these tests would
// catch) and bounded-queue load shedding.
#include "http/thread_pool.h"

#include <atomic>
#include <chrono>
#include <condition_variable>

#include "test/test.h"

namespace gabby::http {
namespace {

TEST(ThreadPool, RunsAllTasks) {
    std::atomic<int> count{0};
    {
        ThreadPool pool(4);
        for (int i = 0; i < 100; i++) {
            EXPECT_TRUE(pool.Offer([&count] { count.fetch_add(1); }));
        }
    }  // destructor drains + joins
    EXPECT_EQ(count.load(), 100);
}

TEST(ThreadPool, TasksRunConcurrently) {
    std::mutex mu;
    std::condition_variable cv;
    int running = 0;
    bool release = false;

    ThreadPool pool(2);
    auto task = [&] {
        std::unique_lock<std::mutex> lock(mu);
        running++;
        cv.notify_all();
        cv.wait(lock, [&] { return release; });
    };
    pool.Offer(task);
    pool.Offer(task);
    {
        // both tasks must be inside their bodies at the same time
        std::unique_lock<std::mutex> lock(mu);
        bool ok = cv.wait_for(lock, std::chrono::seconds(5),
                              [&] { return running == 2; });
        EXPECT_TRUE(ok);
        release = true;
    }
    cv.notify_all();
}

TEST(ThreadPool, TryOfferShedsWhenFull) {
    std::mutex mu;
    std::condition_variable cv;
    std::atomic<bool> started{false};
    bool release = false;

    ThreadPool pool(1, /*max_queue=*/1);
    // guard destructs BEFORE the pool: the blocked task is always freed,
    // even if an assertion below throws
    struct Release {
        std::mutex& mu;
        std::condition_variable& cv;
        bool& release;
        ~Release() {
            {
                std::lock_guard<std::mutex> lock(mu);
                release = true;
            }
            cv.notify_all();
        }
    } guard{mu, cv, release};

    pool.Offer([&] {
        started.store(true);
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return release; });
    });
    while (!started.load()) {  // wait for the worker to occupy itself
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    EXPECT_TRUE(pool.TryOffer([] {}));   // fills the single queue slot
    EXPECT_FALSE(pool.TryOffer([] {}));  // queue full -> shed
}

TEST(ThreadPool, SurvivesThrowingTask) {
    std::atomic<int> count{0};
    {
        ThreadPool pool(1);
        pool.Offer([] { throw std::runtime_error("boom"); });
        pool.Offer([&count] { count.fetch_add(1); });
    }
    EXPECT_EQ(count.load(), 1);
}

TEST(ThreadPool, MinimumOneWorker) {
    ThreadPool pool(0);
    EXPECT_EQ(pool.workers(), 1);
}

}  // namespace
}  // namespace gabby::http
