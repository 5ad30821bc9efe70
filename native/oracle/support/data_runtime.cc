// Threading-surface definitions for the data-layer oracle (original code).
//
// The reference's InternalThread/BlockingQueue live in TUs that drag in
// boost::thread and caffe/parallel.hpp; the oracle never starts the
// prefetch thread (gen_data_fixtures drives DataLayerSetUp + load_batch
// synchronously), so the thread surface is satisfied with no-op
// definitions and a plain std::mutex queue.
#include <condition_variable>
#include <mutex>
#include <string>

#include "caffe/internal_thread.hpp"
#include "caffe/layers/base_data_layer.hpp"
#include "caffe/util/blocking_queue.hpp"

namespace caffe {

// ---- InternalThread (internal_thread.cpp surface; never started) --------

InternalThread::~InternalThread() {}

bool InternalThread::is_started() const { return false; }

bool InternalThread::must_stop() { return false; }

void InternalThread::StartInternalThread() {
  // The oracle drives load_batch synchronously; starting the prefetch
  // thread here would race the deterministic RNG stream.
}

void InternalThread::StopInternalThread() {}

// ---- BlockingQueue<Batch<float>*> (blocking_queue.cpp surface) -----------

template <typename T>
class BlockingQueue<T>::sync {
 public:
  std::mutex mutex_;
  std::condition_variable condition_;
};

template <typename T>
BlockingQueue<T>::BlockingQueue() : sync_(new sync()) {}

template <typename T>
void BlockingQueue<T>::push(const T& t) {
  std::lock_guard<std::mutex> lock(sync_->mutex_);
  queue_.push(t);
  sync_->condition_.notify_one();
}

template <typename T>
bool BlockingQueue<T>::try_pop(T* t) {
  std::lock_guard<std::mutex> lock(sync_->mutex_);
  if (queue_.empty()) return false;
  *t = queue_.front();
  queue_.pop();
  return true;
}

template <typename T>
T BlockingQueue<T>::pop(const std::string& log_on_wait) {
  (void)log_on_wait;
  std::unique_lock<std::mutex> lock(sync_->mutex_);
  sync_->condition_.wait(lock, [this] { return !queue_.empty(); });
  T t = queue_.front();
  queue_.pop();
  return t;
}

template <typename T>
bool BlockingQueue<T>::try_peek(T* t) {
  std::lock_guard<std::mutex> lock(sync_->mutex_);
  if (queue_.empty()) return false;
  *t = queue_.front();
  return true;
}

template <typename T>
T BlockingQueue<T>::peek() {
  std::unique_lock<std::mutex> lock(sync_->mutex_);
  sync_->condition_.wait(lock, [this] { return !queue_.empty(); });
  return queue_.front();
}

template <typename T>
size_t BlockingQueue<T>::size() const {
  std::lock_guard<std::mutex> lock(sync_->mutex_);
  return queue_.size();
}

template class BlockingQueue<Batch<float>*>;
template class BlockingQueue<Batch<double>*>;

}  // namespace caffe
