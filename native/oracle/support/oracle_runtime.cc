// Implementations of the Caffe singleton + RNG facade declared by the
// reference's include/caffe/common.hpp (reference common.cpp pulls in
// glog/gflags/CUDA, which this container lacks, so the oracle supplies its
// own CPU-only definitions of the same interface — original code).
//
// caffe::rng_t is std::mt19937 via the boost shim, which emits the exact
// MT19937 stream boost::mt19937 would for a given seed.
#include <memory>
#include <random>

#include "caffe/common.hpp"
#include "caffe/layer_factory.hpp"
#include "caffe/layers/softmax_layer.hpp"
#include "caffe/util/rng.hpp"

namespace caffe {

// The reference registers Softmax via layer_factory.cpp's engine-dispatching
// creator (layer_factory.cpp:126-137), which pulls in the cuDNN variants we
// don't build. Register the plain CPU class here instead (DetectionLoss
// creates its internal softmax through the registry).
REGISTER_LAYER_CLASS(Softmax);

// Pimpl body for Caffe::RNG (declared private in common.hpp).
class Caffe::RNG::Generator {
 public:
  Generator() : rng_(new caffe::rng_t(std::random_device()())) {}
  explicit Generator(unsigned int seed) : rng_(new caffe::rng_t(seed)) {}
  caffe::rng_t* rng() { return rng_.get(); }

 private:
  shared_ptr<caffe::rng_t> rng_;
};

Caffe::RNG::RNG() : generator_(new Generator()) {}

Caffe::RNG::RNG(unsigned int seed) : generator_(new Generator(seed)) {}

Caffe::RNG::RNG(const RNG& other) : generator_(other.generator_) {}

Caffe::RNG& Caffe::RNG::operator=(const RNG& other) {
  generator_ = other.generator_;
  return *this;
}

void* Caffe::RNG::generator() {
  return static_cast<void*>(generator_->rng());
}

Caffe& Caffe::Get() {
  static Caffe instance;
  return instance;
}

Caffe::Caffe()
    : random_generator_(), mode_(Caffe::CPU), solver_count_(1),
      root_solver_(true) {}

Caffe::~Caffe() {}

void Caffe::set_random_seed(const unsigned int seed) {
  Get().random_generator_.reset(new RNG(seed));
}

void Caffe::SetDevice(const int device_id) {
  (void)device_id;  // CPU-only oracle.
}

void Caffe::DeviceQuery() {}

bool Caffe::CheckDevice(const int device_id) {
  (void)device_id;
  return false;
}

int Caffe::FindDevice(const int start_id) {
  (void)start_id;
  return -1;
}

void GlobalInit(int* pargc, char*** pargv) {
  (void)pargc;
  (void)pargv;
}

}  // namespace caffe
