// boost::uniform_int shim (inclusive [a, b] integer distribution) backed by
// std::uniform_int_distribution, which has the same inclusive contract.
#ifndef ORACLE_STUB_BOOST_UNIFORM_INT_HPP_
#define ORACLE_STUB_BOOST_UNIFORM_INT_HPP_

#include <random>

namespace boost {

template <typename IntType = int>
class uniform_int {
 public:
  uniform_int(IntType a, IntType b) : dist_(a, b) {}
  template <typename Engine>
  IntType operator()(Engine& eng) {
    return dist_(eng);
  }

 private:
  std::uniform_int_distribution<IntType> dist_;
};

}  // namespace boost

#endif  // ORACLE_STUB_BOOST_UNIFORM_INT_HPP_
