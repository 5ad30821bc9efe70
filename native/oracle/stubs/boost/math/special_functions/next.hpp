// boost::math::nextafter shim — identical contract to std::nextafter.
#ifndef ORACLE_STUB_BOOST_NEXT_HPP_
#define ORACLE_STUB_BOOST_NEXT_HPP_

#include <cmath>

namespace boost {
namespace math {

template <typename T>
T nextafter(T x, T y) {
  return std::nextafter(x, y);
}

}  // namespace math
}  // namespace boost

#endif  // ORACLE_STUB_BOOST_NEXT_HPP_
