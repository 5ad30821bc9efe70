// Minimal glog-compatible logging shim for the reference-code oracle build.
//
// The oracle (native/oracle/) compiles selected TUs of the reference Caffe
// fork at /root/reference *unmodified* to produce golden fixtures. The
// container has no glog, so this header supplies the small macro surface
// those TUs use: LOG, LOG_IF, DLOG, CHECK, CHECK_{EQ,NE,LE,LT,GE,GT},
// DCHECK_{GE,LT}, plus NOT_IMPLEMENTED's LOG(FATAL) path.
//
// Original code (not derived from glog): messages below FATAL are discarded,
// FATAL prints the buffered message and aborts, matching the semantics the
// reference relies on (CHECK failures must terminate the process).
#ifndef ORACLE_STUB_GLOG_LOGGING_H_
#define ORACLE_STUB_GLOG_LOGGING_H_

#include <cmath>
#include <cstdlib>
#include <cstring>  // reference TUs rely on glog's transitive <cstring>
#include <iostream>
#include <sstream>

namespace oracle_log {

enum Severity { INFO = 0, WARNING = 1, ERROR = 2, FATAL = 3 };

class Msg {
 public:
  explicit Msg(Severity s) : s_(s) {}
  ~Msg() {
    if (s_ == FATAL) {
      std::cerr << "FATAL (oracle CHECK failure): " << ss_.str() << std::endl;
      std::abort();
    }
  }
  template <typename T>
  Msg& operator<<(const T& v) {
    ss_ << v;
    return *this;
  }
  Msg& operator<<(std::ostream& (*manip)(std::ostream&)) {
    ss_ << manip;
    return *this;
  }

 private:
  Severity s_;
  std::ostringstream ss_;
};

// Swallows a Msg in the disabled branch of LOG_IF without evaluating it into
// a dangling expression statement (glog's own Voidify trick).
class Voidify {
 public:
  void operator&(const Msg&) {}
};

}  // namespace oracle_log

#define LOG(severity) ::oracle_log::Msg(::oracle_log::severity)
#define LOG_IF(severity, condition) \
  (!(condition)) ? (void)0 : ::oracle_log::Voidify() & LOG(severity)
#define LOG_EVERY_N(severity, n) LOG(severity)
#define LOG_FIRST_N(severity, n) LOG(severity)
#define DLOG(severity) LOG_IF(severity, false)
#define DLOG_IF(severity, condition) LOG_IF(severity, false)
#define VLOG(level) LOG_IF(INFO, false)

#define CHECK(condition) \
  LOG_IF(FATAL, !(condition)) << "Check failed: " #condition " "
#define CHECK_EQ(a, b) CHECK((a) == (b))
#define CHECK_NE(a, b) CHECK((a) != (b))
#define CHECK_LE(a, b) CHECK((a) <= (b))
#define CHECK_LT(a, b) CHECK((a) < (b))
#define CHECK_GE(a, b) CHECK((a) >= (b))
#define CHECK_GT(a, b) CHECK((a) > (b))
#define CHECK_NOTNULL(p) (p)

#define DCHECK(condition) CHECK(condition)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)

#endif  // ORACLE_STUB_GLOG_LOGGING_H_
