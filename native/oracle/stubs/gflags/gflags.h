// Minimal gflags shim for the oracle build. The reference's common.hpp only
// needs the header to exist and GFLAGS_GFLAGS_H_ to be defined (it otherwise
// aliases `namespace gflags = google;` for ancient gflags). No flags are
// declared by the TUs the oracle compiles.
#ifndef ORACLE_STUB_GFLAGS_H_
#define ORACLE_STUB_GFLAGS_H_

#define GFLAGS_GFLAGS_H_

namespace gflags {}

#endif  // ORACLE_STUB_GFLAGS_H_
