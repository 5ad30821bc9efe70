// boost.random shim for the oracle build: the distribution + variate_generator
// surface used by the reference's math_functions.cpp, backed by <random>.
// Exact variate sequences may differ from real boost (distribution internals
// are implementation-specified) — irrelevant for fixtures, which always store
// the concrete inputs alongside the outputs.
#ifndef ORACLE_STUB_BOOST_RANDOM_HPP_
#define ORACLE_STUB_BOOST_RANDOM_HPP_

#include <random>

#include "boost/random/mersenne_twister.hpp"
#include "boost/random/uniform_int.hpp"

namespace boost {

template <typename RealType = double>
class uniform_real {
 public:
  uniform_real(RealType a, RealType b) : dist_(a, b) {}
  template <typename Engine>
  RealType operator()(Engine& eng) {
    return dist_(eng);
  }

 private:
  std::uniform_real_distribution<RealType> dist_;
};

template <typename RealType = double>
class normal_distribution {
 public:
  normal_distribution(RealType mean, RealType sigma) : dist_(mean, sigma) {}
  template <typename Engine>
  RealType operator()(Engine& eng) {
    return dist_(eng);
  }

 private:
  std::normal_distribution<RealType> dist_;
};

template <typename RealType = double>
class bernoulli_distribution {
 public:
  explicit bernoulli_distribution(RealType p)
      : dist_(static_cast<double>(p)) {}
  template <typename Engine>
  bool operator()(Engine& eng) {
    return dist_(eng);
  }

 private:
  std::bernoulli_distribution dist_;
};

// The reference instantiates variate_generator<caffe::rng_t*, Dist>: the
// engine is held as a raw pointer and dereferenced per draw.
template <typename EnginePtr, typename Dist>
class variate_generator {
 public:
  variate_generator(EnginePtr eng, Dist dist) : eng_(eng), dist_(dist) {}
  auto operator()() -> decltype(std::declval<Dist&>()(
      *std::declval<EnginePtr&>())) {
    return dist_(*eng_);
  }

 private:
  EnginePtr eng_;
  Dist dist_;
};

}  // namespace boost

#endif  // ORACLE_STUB_BOOST_RANDOM_HPP_
