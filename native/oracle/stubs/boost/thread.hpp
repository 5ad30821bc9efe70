// boost::mutex shim for the oracle build (layer.cpp's forward mutex).
// layer.hpp forward-declares `namespace boost { class mutex; }`, so this must
// be a class (not an alias) with lock()/unlock().
#ifndef ORACLE_STUB_BOOST_THREAD_HPP_
#define ORACLE_STUB_BOOST_THREAD_HPP_

#include <mutex>

namespace boost {

// Thrown by boost's interruption points; the oracle never starts the
// prefetch thread, so this only has to exist for the catch clause in
// base_data_layer.cpp:100 to compile.
class thread_interrupted {};

class mutex {
 public:
  void lock() { m_.lock(); }
  void unlock() { m_.unlock(); }

 private:
  std::mutex m_;
};

}  // namespace boost

#endif  // ORACLE_STUB_BOOST_THREAD_HPP_
