// Minimal io.cpp surface for the data-layer oracle (original code). The
// reference's util/io.cpp no longer compiles against modern glibc/protobuf
// (missing <unistd.h> include, removed two-arg SetTotalBytesLimit), so the
// four symbols data_transformer.cpp / image_gt_data_layer.cpp actually
// reference are provided here with the same semantics
// (/root/reference/src/caffe/util/io.cpp:70-113,176-201).
#include <fstream>
#include <streambuf>
#include <string>
#include <vector>

#include <google/protobuf/io/coded_stream.h>
#include <google/protobuf/io/zero_copy_stream_impl.h>
#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "caffe/common.hpp"
#include "caffe/proto/caffe.pb.h"
#include "caffe/util/io.hpp"

namespace caffe {

bool ReadProtoFromBinaryFile(const char* filename,
                             google::protobuf::Message* proto) {
  std::ifstream f(filename, std::ios::binary);
  if (!f) return false;
  google::protobuf::io::IstreamInputStream raw(&f);
  google::protobuf::io::CodedInputStream coded(&raw);
  coded.SetTotalBytesLimit(INT_MAX);
  return proto->ParseFromCodedStream(&coded);
}

// io.cpp:113 ReadFileToDatum: raw file bytes into datum.data with
// encoded=true; label defaults to -1 via the io.hpp inline overload.
bool ReadFileToDatum(const string& filename, const int label, Datum* datum) {
  std::ifstream f(filename, std::ios::binary);
  if (!f) return false;
  std::string bytes((std::istreambuf_iterator<char>(f)),
                    std::istreambuf_iterator<char>());
  datum->set_data(bytes);
  datum->set_label(label);
  datum->set_encoded(true);
  return true;
}

// io.cpp:176 DecodeDatumToCVMatNative: imdecode with the stored channels.
cv::Mat DecodeDatumToCVMatNative(const Datum& datum) {
  CHECK(datum.encoded()) << "Datum not encoded";
  const string& data = datum.data();
  std::vector<char> buf(data.begin(), data.end());
  cv::Mat img = cv::imdecode(buf, cv::IMREAD_UNCHANGED);
  CHECK(img.data) << "Could not decode datum";
  return img;
}

// io.cpp:189 DecodeDatumToCVMat: imdecode with forced color/gray.
cv::Mat DecodeDatumToCVMat(const Datum& datum, bool is_color) {
  CHECK(datum.encoded()) << "Datum not encoded";
  const string& data = datum.data();
  std::vector<char> buf(data.begin(), data.end());
  cv::Mat img = cv::imdecode(
      buf, is_color ? cv::IMREAD_COLOR : cv::IMREAD_GRAYSCALE);
  CHECK(img.data) << "Could not decode datum";
  return img;
}

}  // namespace caffe
