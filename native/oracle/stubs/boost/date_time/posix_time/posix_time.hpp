// boost.posix_time shim for the oracle build: the ptime / microsec_clock /
// time_duration surface used by the reference's util/benchmark.cpp, backed
// by std::chrono. Only the members those TUs touch are provided.
#ifndef ORACLE_STUB_BOOST_POSIX_TIME_HPP_
#define ORACLE_STUB_BOOST_POSIX_TIME_HPP_

#include <chrono>
#include <cstdint>

namespace boost {
namespace posix_time {

class time_duration {
 public:
  explicit time_duration(std::chrono::microseconds us =
                             std::chrono::microseconds(0))
      : us_(us) {}
  int64_t total_microseconds() const { return us_.count(); }
  int64_t total_milliseconds() const { return us_.count() / 1000; }

 private:
  std::chrono::microseconds us_;
};

class ptime {
 public:
  ptime() : tp_() {}
  explicit ptime(std::chrono::steady_clock::time_point tp) : tp_(tp) {}
  friend time_duration operator-(const ptime& a, const ptime& b) {
    return time_duration(
        std::chrono::duration_cast<std::chrono::microseconds>(a.tp_ - b.tp_));
  }

 private:
  std::chrono::steady_clock::time_point tp_;
};

struct microsec_clock {
  static ptime local_time() {
    return ptime(std::chrono::steady_clock::now());
  }
};

}  // namespace posix_time
}  // namespace boost

#endif  // ORACLE_STUB_BOOST_POSIX_TIME_HPP_
