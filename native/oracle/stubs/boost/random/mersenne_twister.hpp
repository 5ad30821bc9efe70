// boost::mt19937 shim for the oracle build. std::mt19937 implements the
// same standardized MT19937 algorithm (identical output stream for a given
// seed), so caffe::rng_t keeps its exact semantics.
#ifndef ORACLE_STUB_BOOST_MT_HPP_
#define ORACLE_STUB_BOOST_MT_HPP_

#include <random>

namespace boost {
typedef std::mt19937 mt19937;
}  // namespace boost

#endif  // ORACLE_STUB_BOOST_MT_HPP_
