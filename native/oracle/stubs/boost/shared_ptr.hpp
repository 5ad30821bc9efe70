// boost::shared_ptr shim for the oracle build: maps to std::shared_ptr.
// The reference only uses reset()/get()/operator->/copy semantics, all of
// which std::shared_ptr provides identically.
#ifndef ORACLE_STUB_BOOST_SHARED_PTR_HPP_
#define ORACLE_STUB_BOOST_SHARED_PTR_HPP_

#include <memory>

namespace boost {
using std::shared_ptr;
}  // namespace boost

#endif  // ORACLE_STUB_BOOST_SHARED_PTR_HPP_
