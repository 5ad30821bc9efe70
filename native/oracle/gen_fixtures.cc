// Golden-fixture generator: executes the *reference's own* layer code
// (compiled unmodified from /root/reference, see CMakeLists.txt) on
// deterministic random inputs and dumps inputs + outputs as .npy files.
//
// The committed fixtures under tests/assets/golden_ref/ pin mscnn_tpu's ops
// to reference-GENERATED outputs (not to a re-implementation), closing the
// "self-referential golden tests" gap. Covered reference semantics:
//   BoxIOU (3 modes)             util/math_functions.cpp:13-35
//   DecodeBBoxesWithPrior        util/math_functions.cpp:45-75
//   BoxOutput fwd (decode+NMS)   layers/box_output_layer.cpp:39-233
//   ROIPooling fwd (pad_ratio)   layers/roi_pooling_layer.cpp:49-141
//   ROIAlign fwd ((p+1)^2 grid)  layers/roi_align_layer.cpp:49-152
//   DecodeBBox fwd (cascade)     layers/decode_bbox_layer.cpp:54-127
//   DetectionLoss fwd+bwd        layers/detection_loss_layer.cpp:114-470
//   DetectionAccuracy fwd        layers/detection_accuracy_layer.cpp:52-197
//   BboxAccuracy fwd             layers/bbox_accuracy_layer.cpp:37-129
//   Softmax fwd                  layers/softmax_layer.cpp
//
// Usage: gen_fixtures <output_dir>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "caffe/blob.hpp"
#include "caffe/common.hpp"
#include "caffe/layers/accuracy_layer.hpp"
#include "caffe/layers/bbox_accuracy_layer.hpp"
#include "caffe/layers/bnll_layer.hpp"
#include "caffe/layers/box_output_layer.hpp"
#include "caffe/layers/contrastive_loss_layer.hpp"
#include "caffe/layers/eltwise_layer.hpp"
#include "caffe/layers/elu_layer.hpp"
#include "caffe/layers/hinge_loss_layer.hpp"
#include "caffe/layers/lrn_layer.hpp"
#include "caffe/layers/mvn_layer.hpp"
#include "caffe/layers/pooling_layer.hpp"
#include "caffe/layers/power_layer.hpp"
#include "caffe/layers/prelu_layer.hpp"
#include "caffe/layers/concat_layer.hpp"    // spp_layer.hpp needs these
#include "caffe/layers/flatten_layer.hpp"
#include "caffe/layers/split_layer.hpp"
#include "caffe/layers/spp_layer.hpp"
#include "caffe/layers/decode_bbox_layer.hpp"
#include "caffe/layers/detection_accuracy_layer.hpp"
#include "caffe/layers/detection_loss_layer.hpp"
#include "caffe/layers/proposal_target_layer.hpp"
#include "caffe/layers/roi_align_layer.hpp"
#include "caffe/layers/roi_pooling_layer.hpp"
#include "caffe/layers/softmax_layer.hpp"
#include "caffe/proto/caffe.pb.h"
#include "caffe/util/math_functions.hpp"

using caffe::Blob;
using caffe::LayerParameter;
using std::string;
using std::vector;

namespace {

string g_outdir;
std::ostringstream g_manifest;
bool g_first_entry = true;

// ---------------------------------------------------------------- npy I/O

void save_npy(const string& name, const float* data,
              const vector<int64_t>& shape) {
  std::ostringstream dict;
  dict << "{'descr': '<f4', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); ++i) {
    dict << shape[i];
    if (i + 1 < shape.size()) dict << ", ";
  }
  if (shape.size() == 1) dict << ",";
  dict << "), }";
  string header = dict.str();
  // Pad with spaces so magic+len+header is a multiple of 64, ending in \n.
  size_t unpadded = 10 + header.size() + 1;
  size_t padded = (unpadded + 63) / 64 * 64;
  header.append(padded - unpadded, ' ');
  header.push_back('\n');

  int64_t count = 1;
  for (int64_t d : shape) count *= d;

  std::ofstream f(g_outdir + "/" + name, std::ios::binary);
  if (!f) {
    std::cerr << "cannot open " << g_outdir + "/" + name << std::endl;
    std::abort();
  }
  const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
  f.write(reinterpret_cast<const char*>(magic), 8);
  uint16_t hlen = static_cast<uint16_t>(header.size());
  f.write(reinterpret_cast<const char*>(&hlen), 2);
  f.write(header.data(), header.size());
  f.write(reinterpret_cast<const char*>(data), count * sizeof(float));
}

void save_blob(const string& name, const Blob<float>& b) {
  vector<int64_t> shape(b.shape().begin(), b.shape().end());
  save_npy(name, b.cpu_data(), shape);
}

void save_blob_diff(const string& name, const Blob<float>& b) {
  vector<int64_t> shape(b.shape().begin(), b.shape().end());
  save_npy(name, b.cpu_diff(), shape);
}

void manifest_entry(const string& scenario, const string& params_json) {
  if (!g_first_entry) g_manifest << ",\n";
  g_first_entry = false;
  g_manifest << "  \"" << scenario << "\": " << params_json;
}

// --------------------------------------------------------------- RNG glue

class Rng {
 public:
  explicit Rng(uint32_t seed) : eng_(seed) {}
  float uniform(float a, float b) {
    return std::uniform_real_distribution<float>(a, b)(eng_);
  }
  float normal(float mu, float sigma) {
    return std::normal_distribution<float>(mu, sigma)(eng_);
  }
  int integer(int a, int b) {  // inclusive
    return std::uniform_int_distribution<int>(a, b)(eng_);
  }

 private:
  std::mt19937 eng_;
};

void fill_normal(Blob<float>* b, Rng* rng, float mu = 0.f, float sigma = 1.f) {
  float* p = b->mutable_cpu_data();
  for (int i = 0; i < b->count(); ++i) p[i] = rng->normal(mu, sigma);
}

// Synthesizes a reference-format 6-channel label map [num, 6, H, W]:
// ch0 label id, ch1-4 matched-gt (cx, cy, w, h) in image pixels, ch5 IoU.
// Positive cells carry a gt near the cell center at roughly field size;
// ~10% of background cells get IoU >= bg_threshold (ignored bg), matching
// image_gt_data_layer.cpp's rasterization conventions.
void make_label_map(Blob<float>* label, int cls_num, float field_w,
                    float field_h, int rate, Rng* rng) {
  const int num = label->num(), H = label->height(), W = label->width();
  const int spatial = H * W;
  const int dim = label->count() / num;
  float* p = label->mutable_cpu_data();
  for (int i = 0; i < num; ++i) {
    for (int h = 0; h < H; ++h) {
      for (int w = 0; w < W; ++w) {
        const int j = h * W + w;
        float* cell = p + i * dim + j;  // channel stride = spatial
        const float u = rng->uniform(0.f, 1.f);
        if (u < 0.06f) {
          cell[0] = static_cast<float>(rng->integer(1, cls_num - 1));
          cell[1 * spatial] =
              (w + 0.5f) * rate + field_w * rng->uniform(-0.4f, 0.4f);
          cell[2 * spatial] =
              (h + 0.5f) * rate + field_h * rng->uniform(-0.4f, 0.4f);
          cell[3 * spatial] = field_w * std::exp(rng->uniform(-0.6f, 0.6f));
          cell[4 * spatial] = field_h * std::exp(rng->uniform(-0.6f, 0.6f));
          cell[5 * spatial] = rng->uniform(0.5f, 1.0f);
        } else {
          cell[0] = 0.f;
          cell[1 * spatial] = 0.f;
          cell[2 * spatial] = 0.f;
          cell[3 * spatial] = 0.f;
          cell[4 * spatial] = 0.f;
          cell[5 * spatial] = (u < 0.16f) ? rng->uniform(0.25f, 0.95f)
                                          : rng->uniform(0.0f, 0.19f);
        }
      }
    }
  }
}

// ---------------------------------------------------------------- scenarios

void scenario_box_iou() {
  Rng rng(1001);
  const int n = 256;
  vector<float> a(n * 4), b(n * 4);
  for (int i = 0; i < n; ++i) {
    // (x, y, w, h); ~10% degenerate (non-positive w or h) to pin the
    // early-out at math_functions.cpp:16-18.
    for (int k = 0; k < 2; ++k) {
      float* box = (k == 0 ? a.data() : b.data()) + i * 4;
      box[0] = rng.uniform(-20.f, 200.f);
      box[1] = rng.uniform(-20.f, 200.f);
      if (rng.uniform(0.f, 1.f) < 0.1f) {
        box[2] = rng.uniform(-10.f, 0.f);
        box[3] = rng.uniform(-10.f, 10.f);
      } else {
        box[2] = rng.uniform(1.f, 150.f);
        box[3] = rng.uniform(1.f, 150.f);
      }
    }
  }
  vector<float> iou(n), iomu(n), iofu(n);
  for (int i = 0; i < n; ++i) {
    const float* pa = a.data() + i * 4;
    const float* pb = b.data() + i * 4;
    iou[i] = caffe::BoxIOU(pa[0], pa[1], pa[2], pa[3], pb[0], pb[1], pb[2],
                           pb[3], string("IOU"));
    iomu[i] = caffe::BoxIOU(pa[0], pa[1], pa[2], pa[3], pb[0], pb[1], pb[2],
                            pb[3], string("IOMU"));
    iofu[i] = caffe::BoxIOU(pa[0], pa[1], pa[2], pa[3], pb[0], pb[1], pb[2],
                            pb[3], string("IOFU"));
  }
  save_npy("box_iou.a.npy", a.data(), {n, 4});
  save_npy("box_iou.b.npy", b.data(), {n, 4});
  save_npy("box_iou.iou.npy", iou.data(), {n});
  save_npy("box_iou.iomu.npy", iomu.data(), {n});
  save_npy("box_iou.iofu.npy", iofu.data(), {n});
  manifest_entry("box_iou", "{\"n\": 256, \"format\": \"xywh\"}");
}

void scenario_decode_with_prior() {
  Rng rng(1002);
  const int m = 64, bbox_dim = 8;
  vector<caffe::BBox> priors(m);
  vector<float> prior_arr(m * 4), deltas(m * bbox_dim), pred(m * bbox_dim);
  for (int i = 0; i < m; ++i) {
    float x1 = rng.uniform(0.f, 300.f), y1 = rng.uniform(0.f, 150.f);
    float w = rng.uniform(8.f, 120.f), h = rng.uniform(8.f, 120.f);
    priors[i].xmin = x1;
    priors[i].ymin = y1;
    priors[i].xmax = x1 + w;
    priors[i].ymax = y1 + h;
    prior_arr[i * 4] = x1;
    prior_arr[i * 4 + 1] = y1;
    prior_arr[i * 4 + 2] = x1 + w;
    prior_arr[i * 4 + 3] = y1 + h;
    for (int c = 0; c < bbox_dim; ++c) deltas[i * bbox_dim + c] = rng.normal(0.f, 1.0f);
  }
  const float means[4] = {0.f, 0.f, 0.f, 0.f};
  const float stds[4] = {0.1f, 0.1f, 0.2f, 0.2f};
  caffe::DecodeBBoxesWithPrior(deltas.data(), priors, bbox_dim, means, stds,
                               pred.data());
  save_npy("decode_with_prior.priors.npy", prior_arr.data(), {m, 4});
  save_npy("decode_with_prior.deltas.npy", deltas.data(), {m, bbox_dim});
  save_npy("decode_with_prior.pred.npy", pred.data(), {m, bbox_dim});
  manifest_entry("decode_with_prior",
                 "{\"m\": 64, \"bbox_dim\": 8, \"means\": [0,0,0,0], "
                 "\"stds\": [0.1,0.1,0.2,0.2]}");
}

struct BoxOutputConfig {
  string name;
  float fg_thr;
  float iou_thr;
  string nms_type;
  int max_nms_num;
  int max_post_nms_num;
  float min_size;
  bool bbox_norm;
  uint32_t seed;
};

void run_box_output(const BoxOutputConfig& cfg) {
  // 4 scales of the flagship geometry (96x320 input): strides 8/8/16/32.
  const int num = 2, cls_num = 5;
  const int n_scales = 4;
  const int fields_w[n_scales] = {60, 84, 120, 240};
  const int fields_h[n_scales] = {60, 84, 120, 240};
  const int rates[n_scales] = {8, 8, 16, 32};
  const int heights[n_scales] = {12, 12, 6, 3};
  const int widths[n_scales] = {40, 40, 20, 10};

  LayerParameter lp;
  auto* bp = lp.mutable_box_output_param();
  bp->set_fg_thr(cfg.fg_thr);
  bp->set_iou_thr(cfg.iou_thr);
  bp->set_nms_type(cfg.nms_type);
  bp->set_field_whr(2);
  bp->set_field_xyr(2);
  bp->set_max_nms_num(cfg.max_nms_num);
  bp->set_max_post_nms_num(cfg.max_post_nms_num);
  bp->set_min_size(cfg.min_size);
  for (int j = 0; j < n_scales; ++j) {
    bp->add_field_w(fields_w[j]);
    bp->add_field_h(fields_h[j]);
    bp->add_downsample_rate(rates[j]);
  }
  if (cfg.bbox_norm) {
    auto* rp = lp.mutable_bbox_reg_param();
    for (int k = 0; k < 4; ++k) rp->add_bbox_mean(0.f);
    rp->add_bbox_std(0.1f);
    rp->add_bbox_std(0.1f);
    rp->add_bbox_std(0.2f);
    rp->add_bbox_std(0.2f);
  }

  Rng rng(cfg.seed);
  vector<Blob<float>*> bottom;
  for (int j = 0; j < n_scales; ++j) {
    Blob<float>* b = new Blob<float>(num, cls_num + 4, heights[j], widths[j]);
    fill_normal(b, &rng);
    bottom.push_back(b);
    std::ostringstream nm;
    nm << cfg.name << ".head" << j << ".npy";
    save_blob(nm.str(), *b);
  }
  Blob<float> rois, scores;
  vector<Blob<float>*> top{&rois, &scores};

  caffe::BoxOutputLayer<float> layer(lp);
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(cfg.name + ".rois.npy", rois);
  save_blob(cfg.name + ".proposals_score.npy", scores);
  for (Blob<float>* b : bottom) delete b;

  std::ostringstream pj;
  pj << "{\"num\": 2, \"cls_num\": 5, \"fg_thr\": " << cfg.fg_thr
     << ", \"iou_thr\": " << cfg.iou_thr << ", \"nms_type\": \""
     << cfg.nms_type << "\", \"max_nms_num\": " << cfg.max_nms_num
     << ", \"max_post_nms_num\": " << cfg.max_post_nms_num
     << ", \"min_size\": " << cfg.min_size
     << ", \"field_whr\": 2, \"field_xyr\": 2"
     << ", \"bbox_norm\": " << (cfg.bbox_norm ? "true" : "false")
     << ", \"field_w\": [60,84,120,240], \"field_h\": [60,84,120,240]"
     << ", \"downsample_rate\": [8,8,16,32]"
     << ", \"sizes\": [[12,40],[12,40],[6,20],[3,10]]}";
  manifest_entry(cfg.name, pj.str());
}

void scenario_box_output() {
  // Deploy-parity config (mscnn_deploy.prototxt:432-463): fg_thr -5 keeps
  // everything, max_nms_num caps at 2000.
  run_box_output({"box_output_deploy", -5.f, 0.65f, "IOU", 2000, 0, 15.f,
                  false, 2001});
  // Cap/mode/norm exerciser: positive threshold, IOMU mode, post-NMS cap,
  // bbox de-normalization.
  run_box_output({"box_output_caps", 0.5f, 0.5f, "IOMU", 50, 20, 8.f, true,
                  2002});
  // Empty-input path: nothing passes fg_thr -> dummy box (1,1,10,10) and
  // zero score row (box_output_layer.cpp:195-211).
  run_box_output({"box_output_empty", 1e6f, 0.65f, "IOU", 2000, 0, 15.f,
                  false, 2003});
}

void make_rois(Rng* rng, int n, int batch, float max_x, float max_y,
               vector<float>* out, bool include_malformed = false) {
  out->resize(n * 5);
  for (int i = 0; i < n; ++i) {
    float* r = out->data() + i * 5;
    r[0] = static_cast<float>(i % batch);
    float x1 = rng->uniform(0.f, max_x * 0.8f);
    float y1 = rng->uniform(0.f, max_y * 0.8f);
    float w = rng->uniform(6.f, max_x * 0.5f);
    float h = rng->uniform(6.f, max_y * 0.5f);
    r[1] = x1;
    r[2] = y1;
    r[3] = x1 + w;  // may exceed the image: reference clamps bins, not rois
    r[4] = y1 + h;
    if (include_malformed && i % 11 == 10) {
      std::swap(r[1], r[3]);  // x2 < x1 -> malformed (ROIAlign zero path)
    }
  }
}

void scenario_roi_pooling() {
  Rng rng(3001);
  const int num = 2, C = 8, H = 24, W = 32;
  const float spatial_scale = 0.125f;  // image 192x256
  Blob<float> feat(num, C, H, W);
  fill_normal(&feat, &rng);
  save_blob("roi_pooling.feat.npy", feat);

  vector<float> roi_data;
  make_rois(&rng, 24, num, 255.f, 191.f, &roi_data);
  Blob<float> rois(24, 5, 1, 1);
  std::memcpy(rois.mutable_cpu_data(), roi_data.data(),
              roi_data.size() * sizeof(float));
  save_npy("roi_pooling.rois.npy", roi_data.data(), {24, 5});

  for (float pad_ratio : {0.0f, 0.25f}) {
    LayerParameter lp;
    auto* rp = lp.mutable_roi_pooling_param();
    rp->set_pooled_h(7);
    rp->set_pooled_w(7);
    rp->set_spatial_scale(spatial_scale);
    rp->set_pad_ratio(pad_ratio);
    caffe::ROIPoolingLayer<float> layer(lp);
    Blob<float> out;
    vector<Blob<float>*> bottom{&feat, &rois}, top{&out};
    layer.SetUp(bottom, top);
    layer.Forward(bottom, top);
    save_blob(pad_ratio == 0.0f ? "roi_pooling.out_pad0.npy"
                                : "roi_pooling.out_pad025.npy",
              out);
  }
  manifest_entry("roi_pooling",
                 "{\"num\": 2, \"C\": 8, \"H\": 24, \"W\": 32, \"rois\": 24, "
                 "\"pooled\": 7, \"spatial_scale\": 0.125, "
                 "\"pad_ratios\": [0.0, 0.25]}");
}

void scenario_roi_align() {
  Rng rng(3002);
  const int num = 2, C = 8, H = 24, W = 32;
  const float spatial_scale = 0.125f;
  Blob<float> feat(num, C, H, W);
  fill_normal(&feat, &rng);
  save_blob("roi_align.feat.npy", feat);

  vector<float> roi_data;
  make_rois(&rng, 22, num, 255.f, 191.f, &roi_data, /*include_malformed=*/true);
  Blob<float> rois(22, 5, 1, 1);
  std::memcpy(rois.mutable_cpu_data(), roi_data.data(),
              roi_data.size() * sizeof(float));
  save_npy("roi_align.rois.npy", roi_data.data(), {22, 5});

  for (float pad_ratio : {0.0f, 0.25f}) {
    LayerParameter lp;
    auto* rp = lp.mutable_roi_pooling_param();
    rp->set_pooled_h(7);
    rp->set_pooled_w(7);
    rp->set_spatial_scale(spatial_scale);
    rp->set_pad_ratio(pad_ratio);
    caffe::ROIAlignLayer<float> layer(lp);
    Blob<float> out;
    vector<Blob<float>*> bottom{&feat, &rois}, top{&out};
    layer.SetUp(bottom, top);
    layer.Forward(bottom, top);
    save_blob(pad_ratio == 0.0f ? "roi_align.out_pad0.npy"
                                : "roi_align.out_pad025.npy",
              out);
  }
  manifest_entry("roi_align",
                 "{\"num\": 2, \"C\": 8, \"H\": 24, \"W\": 32, \"rois\": 22, "
                 "\"pooled\": 7, \"grid\": 8, \"spatial_scale\": 0.125, "
                 "\"pad_ratios\": [0.0, 0.25], \"malformed_every\": 11}");
}

void run_decode_bbox(const string& name, bool train, float gt_iou_thr,
                     uint32_t seed) {
  Rng rng(seed);
  const int n = 48;
  Blob<float> pred(n, 8, 1, 1), priors(n, 5, 1, 1), gts(n, 6, 1, 1);
  float* pp = priors.mutable_cpu_data();
  float* dp = pred.mutable_cpu_data();
  float* gp = gts.mutable_cpu_data();
  for (int i = 0; i < n; ++i) {
    pp[i * 5] = static_cast<float>(i % 2);
    float x1 = rng.uniform(0.f, 200.f), y1 = rng.uniform(0.f, 120.f);
    pp[i * 5 + 1] = x1;
    pp[i * 5 + 2] = y1;
    pp[i * 5 + 3] = x1 + rng.uniform(10.f, 120.f);
    pp[i * 5 + 4] = y1 + rng.uniform(10.f, 120.f);
    for (int c = 0; c < 8; ++c) dp[i * 8 + c] = rng.normal(0.f, 1.0f);
    gp[i * 6] = static_cast<float>(rng.integer(0, 4));
    gp[i * 6 + 1] = rng.uniform(0.f, 200.f);
    gp[i * 6 + 2] = rng.uniform(0.f, 120.f);
    gp[i * 6 + 3] = gp[i * 6 + 1] + rng.uniform(10.f, 100.f);
    gp[i * 6 + 4] = gp[i * 6 + 2] + rng.uniform(10.f, 100.f);
    gp[i * 6 + 5] = rng.uniform(0.f, 1.f);  // overlap
  }
  save_blob(name + ".bbox_pred.npy", pred);
  save_blob(name + ".priors.npy", priors);
  save_blob(name + ".gts.npy", gts);

  LayerParameter lp;
  lp.set_phase(train ? caffe::TRAIN : caffe::TEST);
  lp.mutable_decode_bbox_param()->set_gt_iou_thr(gt_iou_thr);
  auto* rp = lp.mutable_bbox_reg_param();
  for (int k = 0; k < 4; ++k) rp->add_bbox_mean(0.f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.2f);
  rp->add_bbox_std(0.2f);

  caffe::DecodeBBoxLayer<float> layer(lp);
  Blob<float> out;
  vector<Blob<float>*> bottom{&pred, &priors};
  if (train) bottom.push_back(&gts);
  vector<Blob<float>*> top{&out};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(name + ".decoded.npy", out);

  std::ostringstream pj;
  pj << "{\"n\": 48, \"train\": " << (train ? "true" : "false")
     << ", \"gt_iou_thr\": " << gt_iou_thr
     << ", \"means\": [0,0,0,0], \"stds\": [0.1,0.1,0.2,0.2]}";
  manifest_entry(name, pj.str());
}

void scenario_decode_bbox() {
  run_decode_bbox("decode_bbox_train", true, 0.7f, 4001);
  run_decode_bbox("decode_bbox_test", false, 0.7f, 4002);
}

struct DetLossConfig {
  string name;
  bool objectness;
  bool iou_weighted;
  bool pos_neg_weighted;
  bool bb_smooth;
  float loss_weight;
  uint32_t seed;
};

void run_detection_loss(const DetLossConfig& cfg) {
  const int num = 2, H = 12, W = 20;
  const int cls_num = cfg.objectness ? 2 : 5;
  const int field = 60, rate = 8;
  Rng rng(cfg.seed);

  Blob<float> bottom0(num, cls_num + 4, H, W);
  fill_normal(&bottom0, &rng);
  Blob<float> label(num, 6, H, W);
  // Labels carry raw class ids (possibly > 1); objectness folds them.
  make_label_map(&label, 5, field, field, rate, &rng);
  save_blob(cfg.name + ".bottom0.npy", bottom0);
  save_blob(cfg.name + ".label.npy", label);

  LayerParameter lp;
  lp.set_phase(caffe::TRAIN);
  lp.add_loss_weight(cfg.loss_weight);
  auto* dp = lp.mutable_detection_loss_param();
  dp->set_cls_num(cls_num);
  dp->set_coord_num(4);
  dp->set_lambda(1.f);
  dp->set_field_h(field);
  dp->set_field_w(field);
  dp->set_field_whr(2);
  dp->set_field_xyr(2);
  dp->set_downsample_rate(rate);
  dp->set_bb_smooth(cfg.bb_smooth);
  dp->set_bg_threshold(0.2f);
  dp->set_bg_multiple(2);
  dp->set_sample_mode("bootstrap");
  dp->set_objectness(cfg.objectness);
  dp->set_iou_weighted(cfg.iou_weighted);
  dp->set_pos_neg_weighted(cfg.pos_neg_weighted);
  auto* rp = lp.mutable_bbox_reg_param();
  for (int k = 0; k < 4; ++k) rp->add_bbox_mean(0.f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.2f);
  rp->add_bbox_std(0.2f);

  caffe::DetectionLossLayer<float> layer(lp);
  Blob<float> loss;
  vector<Blob<float>*> bottom{&bottom0, &label}, top{&loss};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(cfg.name + ".loss.npy", loss);

  // Backward: top diff was set to loss_weight by Layer::SetUp.
  vector<bool> propagate{true, false};
  layer.Backward(top, propagate, bottom);
  save_blob_diff(cfg.name + ".grad.npy", bottom0);

  std::ostringstream pj;
  pj << "{\"num\": 2, \"H\": 12, \"W\": 20, \"cls_num\": " << cls_num
     << ", \"field\": 60, \"downsample_rate\": 8, \"lambda\": 1"
     << ", \"field_whr\": 2, \"field_xyr\": 2, \"bg_threshold\": 0.2"
     << ", \"bg_multiple\": 2, \"sample_mode\": \"bootstrap\""
     << ", \"objectness\": " << (cfg.objectness ? "true" : "false")
     << ", \"iou_weighted\": " << (cfg.iou_weighted ? "true" : "false")
     << ", \"pos_neg_weighted\": " << (cfg.pos_neg_weighted ? "true" : "false")
     << ", \"bb_smooth\": " << (cfg.bb_smooth ? "true" : "false")
     << ", \"loss_weight\": " << cfg.loss_weight
     << ", \"means\": [0,0,0,0], \"stds\": [0.1,0.1,0.2,0.2]}";
  manifest_entry(cfg.name, pj.str());
}

void scenario_detection_loss() {
  // Flagship 2nd-stage config (trainval_2nd.prototxt:425-440).
  run_detection_loss({"detection_loss_bootstrap", false, false, true, true,
                      0.9f, 5001});
  // IoU-weighted + L2 coordinate loss variant.
  run_detection_loss({"detection_loss_iouw", false, true, false, false, 1.0f,
                      5002});
  // Objectness mode (cls_num folded to 2).
  run_detection_loss({"detection_loss_objectness", true, false, true, true,
                      1.0f, 5003});
}

void run_detection_accuracy(const string& name, int top_k, uint32_t seed) {
  const int num = 2, H = 12, W = 20, cls_num = 5, field = 60, rate = 8;
  Rng rng(seed);
  Blob<float> bottom0(num, cls_num + 4, H, W);
  fill_normal(&bottom0, &rng);
  Blob<float> label(num, 6, H, W);
  make_label_map(&label, cls_num, field, field, rate, &rng);
  save_blob(name + ".bottom0.npy", bottom0);
  save_blob(name + ".label.npy", label);

  LayerParameter lp;
  auto* ap = lp.mutable_detection_accuracy_param();
  ap->set_cls_num(cls_num);
  ap->set_coord_num(4);
  ap->set_field_h(field);
  ap->set_field_w(field);
  ap->set_downsample_rate(rate);
  ap->set_top_k(top_k);
  ap->set_field_whr(2);
  ap->set_field_xyr(2);
  ap->set_bg_threshold(0.2f);
  auto* rp = lp.mutable_bbox_reg_param();
  for (int k = 0; k < 4; ++k) rp->add_bbox_mean(0.f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.1f);
  rp->add_bbox_std(0.2f);
  rp->add_bbox_std(0.2f);

  caffe::DetectionAccuracyLayer<float> layer(lp);
  Blob<float> acc, iou;
  vector<Blob<float>*> bottom{&bottom0, &label}, top{&acc, &iou};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(name + ".acc.npy", acc);
  save_blob(name + ".iou.npy", iou);

  std::ostringstream pj;
  pj << "{\"num\": 2, \"H\": 12, \"W\": 20, \"cls_num\": 5, \"field\": 60, "
     << "\"downsample_rate\": 8, \"top_k\": " << top_k
     << ", \"field_whr\": 2, \"field_xyr\": 2, \"bg_threshold\": 0.2"
     << ", \"means\": [0,0,0,0], \"stds\": [0.1,0.1,0.2,0.2]}";
  manifest_entry(name, pj.str());
}

void scenario_detection_accuracy() {
  run_detection_accuracy("detection_accuracy_top1", 1, 6001);
  run_detection_accuracy("detection_accuracy_top2", 2, 6002);
}

// ProposalTarget with batch_size == -1 (keep-all, the cascade later-stage
// mode, proposal_target_layer.cpp:166-180): keeps every fg (ov >= fg_thr,
// non-ignored match) and every in-range bg candidate in input order — the
// sampling RNG is never consumed, so the output is fully deterministic.
void run_proposal_target_keepall(const string& name, bool cls_aware,
                                 uint32_t seed) {
  Rng rng(seed);
  const int n_rois = 64, n_gts = 12, num_img = 4;
  const int img_w = 256, img_h = 192, cls_num = 5;

  Blob<float> gts(n_gts, 7, 1, 1);
  float* gp = gts.mutable_cpu_data();
  for (int i = 0; i < n_gts; ++i) {
    gp[i * 7] = static_cast<float>(i % num_img);
    float x1 = rng.uniform(0.f, img_w * 0.6f);
    float y1 = rng.uniform(0.f, img_h * 0.6f);
    gp[i * 7 + 1] = x1;
    gp[i * 7 + 2] = y1;
    gp[i * 7 + 3] = x1 + rng.uniform(16.f, img_w * 0.35f);
    gp[i * 7 + 4] = y1 + rng.uniform(16.f, img_h * 0.35f);
    gp[i * 7 + 5] = static_cast<float>(rng.integer(1, cls_num - 1));
    gp[i * 7 + 6] = (i % 5 == 4) ? 1.f : 0.f;  // some ignored gts
  }

  Blob<float> rois(n_rois, 5, 1, 1);
  float* rp = rois.mutable_cpu_data();
  for (int i = 0; i < n_rois; ++i) {
    rp[i * 5] = static_cast<float>(i % num_img);
    if (i % 3 == 0) {
      // jittered copy of a gt on the same image -> mostly fg
      const float* g = gp + (i % n_gts) * 7;
      rp[i * 5] = g[0];
      rp[i * 5 + 1] = g[1] + rng.uniform(-8.f, 8.f);
      rp[i * 5 + 2] = g[2] + rng.uniform(-8.f, 8.f);
      rp[i * 5 + 3] = g[3] + rng.uniform(-8.f, 8.f);
      rp[i * 5 + 4] = g[4] + rng.uniform(-8.f, 8.f);
    } else {
      float x1 = rng.uniform(0.f, img_w * 0.7f);
      float y1 = rng.uniform(0.f, img_h * 0.7f);
      rp[i * 5 + 1] = x1;
      rp[i * 5 + 2] = y1;
      rp[i * 5 + 3] = x1 + rng.uniform(10.f, img_w * 0.3f);
      rp[i * 5 + 4] = y1 + rng.uniform(10.f, img_h * 0.3f);
    }
  }
  save_blob(name + ".rois.npy", rois);
  save_blob(name + ".gts.npy", gts);

  LayerParameter lp;
  auto* pp = lp.mutable_proposal_target_param();
  pp->set_cls_num(cls_num);
  pp->set_batch_size(-1);
  pp->set_fg_fraction(0.25f);
  pp->set_num_img_per_batch(num_img);
  pp->set_fg_thr(0.6f);
  pp->set_bg_thr_hg(0.5f);
  pp->set_bg_thr_lw(0.1f);
  pp->set_img_width(img_w);
  pp->set_img_height(img_h);
  auto* rg = lp.mutable_bbox_reg_param();
  rg->set_cls_aware(cls_aware);
  for (int k = 0; k < 4; ++k) rg->add_bbox_mean(0.f);
  rg->add_bbox_std(0.1f);
  rg->add_bbox_std(0.1f);
  rg->add_bbox_std(0.2f);
  rg->add_bbox_std(0.2f);

  caffe::ProposalTargetLayer<float> layer(lp);
  Blob<float> out_rois, out_labels, out_targets, out_inw, out_outw, out_mgt;
  vector<Blob<float>*> bottom{&rois, &gts};
  vector<Blob<float>*> top{&out_rois, &out_labels, &out_targets, &out_inw,
                           &out_outw, &out_mgt};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(name + ".out_rois.npy", out_rois);
  save_blob(name + ".out_labels.npy", out_labels);
  save_blob(name + ".out_targets.npy", out_targets);
  save_blob(name + ".out_inside_w.npy", out_inw);
  save_blob(name + ".out_outside_w.npy", out_outw);
  save_blob(name + ".out_match_gt.npy", out_mgt);

  std::ostringstream pj;
  pj << "{\"n_rois\": 64, \"n_gts\": 12, \"num_img\": 4, \"cls_num\": 5"
     << ", \"batch_size\": -1, \"fg_thr\": 0.6, \"bg_thr_hg\": 0.5"
     << ", \"bg_thr_lw\": 0.1, \"img_width\": 256, \"img_height\": 192"
     << ", \"cls_aware\": " << (cls_aware ? "true" : "false")
     << ", \"means\": [0,0,0,0], \"stds\": [0.1,0.1,0.2,0.2]}";
  manifest_entry(name, pj.str());
}

void scenario_proposal_target() {
  run_proposal_target_keepall("proposal_target_keepall_clsaware", true, 8001);
  run_proposal_target_keepall("proposal_target_keepall_agnostic", false, 8002);
}

// BboxAccuracy (bbox_accuracy_layer.cpp:37-129): mean decoded-box IoU vs
// matched gt over fg rows (label > 0), EXCLUDING rows whose match overlap
// exceeds 0.975 — the gt rows ProposalTarget appends as rois — from both
// numerator and denominator (:73-77, :108). top[0] = post-regression IoU,
// top[1] = roi-vs-gt IoU, both -1 when no countable fg row remains.
// The prediction slot is always label*4 (:86), so scenarios keep
// pred_classes > max_label (in the agnostic zoo configs labels are
// binary, making label*4 the class-agnostic slot).
void run_bbox_accuracy(const string& name, int pred_classes, int max_label,
                       bool do_norm, bool all_bg, uint32_t seed) {
  Rng rng(seed);
  const int num = 32;
  const int pred_dim = 4 * pred_classes;
  const int img_w = 640, img_h = 480;

  Blob<float> preds(num, pred_dim, 1, 1);
  float* pp = preds.mutable_cpu_data();
  for (int i = 0; i < preds.count(); ++i) {
    pp[i] = (i % 4 < 2) ? rng.normal(0.f, 1.f) : rng.normal(0.f, 0.8f);
  }

  Blob<float> rois(num, 5, 1, 1);
  Blob<float> gts(num, 6, 1, 1);
  float* rp = rois.mutable_cpu_data();
  float* gp = gts.mutable_cpu_data();
  for (int i = 0; i < num; ++i) {
    float x1 = rng.uniform(0.f, img_w * 0.6f);
    float y1 = rng.uniform(0.f, img_h * 0.6f);
    float w = rng.uniform(24.f, img_w * 0.3f);
    float h = rng.uniform(24.f, img_h * 0.3f);
    rp[i * 5] = 0.f;
    rp[i * 5 + 1] = x1;
    rp[i * 5 + 2] = y1;
    rp[i * 5 + 3] = x1 + w;
    rp[i * 5 + 4] = y1 + h;
    int label = all_bg ? 0 : ((i % 4 == 3) ? 0 : rng.integer(1, max_label));
    float overlap;
    if (i % 4 == 0) {
      // appended-gt row: roi == gt, overlap 1 -> flagged out
      overlap = 1.f;
      gp[i * 6 + 1] = x1;
      gp[i * 6 + 2] = y1;
      gp[i * 6 + 3] = x1 + w;
      gp[i * 6 + 4] = y1 + h;
    } else {
      // one row just past the threshold pins the 0.975 cut itself
      overlap = (i == 1) ? 0.98f : rng.uniform(0.5f, 0.95f);
      gp[i * 6 + 1] = x1 + rng.uniform(-12.f, 12.f);
      gp[i * 6 + 2] = y1 + rng.uniform(-12.f, 12.f);
      gp[i * 6 + 3] = x1 + w + rng.uniform(-12.f, 12.f);
      gp[i * 6 + 4] = y1 + h + rng.uniform(-12.f, 12.f);
    }
    gp[i * 6] = static_cast<float>(label);
    gp[i * 6 + 5] = overlap;
  }
  save_blob(name + ".preds.npy", preds);
  save_blob(name + ".rois.npy", rois);
  save_blob(name + ".gts.npy", gts);

  LayerParameter lp;
  if (do_norm) {
    auto* rpar = lp.mutable_bbox_reg_param();
    for (int k = 0; k < 4; ++k) rpar->add_bbox_mean(0.f);
    rpar->add_bbox_std(0.1f);
    rpar->add_bbox_std(0.1f);
    rpar->add_bbox_std(0.2f);
    rpar->add_bbox_std(0.2f);
  }
  caffe::BboxAccuracyLayer<float> layer(lp);
  Blob<float> post, pre;
  vector<Blob<float>*> bottom{&preds, &rois, &gts}, top{&post, &pre};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob(name + ".post.npy", post);
  save_blob(name + ".pre.npy", pre);

  std::ostringstream pj;
  pj << "{\"num\": " << num << ", \"pred_classes\": " << pred_classes
     << ", \"max_label\": " << max_label
     << ", \"do_norm\": " << (do_norm ? "true" : "false")
     << ", \"means\": [0,0,0,0], \"stds\": [0.1,0.1,0.2,0.2]}";
  manifest_entry(name, pj.str());
}

void scenario_bbox_accuracy() {
  run_bbox_accuracy("bbox_accuracy_clsaware", 5, 4, true, false, 9001);
  run_bbox_accuracy("bbox_accuracy_agnostic", 2, 1, true, false, 9002);
  run_bbox_accuracy("bbox_accuracy_nonorm", 5, 4, false, false, 9003);
  run_bbox_accuracy("bbox_accuracy_empty", 5, 4, true, true, 9004);
}

// ------------------------------------------------- standard-op quirk pins
// Each scenario executes one reference layer forward and dumps bottoms +
// tops; tests/test_golden_ref_ops.py replays them through ops/layers.py /
// ops/conv.py. Focus is on the rounding/edge quirks analytic tests can
// self-confirm but not cross-check: ceil-mode pooling clipping, the AVE
// divisor counting pad-but-not-overhang cells, LRN WITHIN_CHANNEL's
// pooled composition, SPP's kernel/pad derivation.

void run_one(const string& name, caffe::Layer<float>* layer,
             vector<Blob<float>*>& bottom, int n_tops,
             const string& params_json) {
  vector<Blob<float>*> top;
  vector<std::shared_ptr<Blob<float>>> owned;
  for (int i = 0; i < n_tops; ++i) {
    owned.push_back(std::make_shared<Blob<float>>());
    top.push_back(owned.back().get());
  }
  layer->SetUp(bottom, top);
  layer->Forward(bottom, top);
  for (size_t i = 0; i < bottom.size(); ++i)
    save_blob(name + ".bottom" + std::to_string(i) + ".npy", *bottom[i]);
  for (int i = 0; i < n_tops; ++i)
    save_blob(name + ".top" + std::to_string(i) + ".npy", *top[i]);
  manifest_entry(name, params_json);
}

void run_pooling(const string& name, const string& method, int kh, int kw,
                 int sh, int sw, int ph, int pw, bool global_pool,
                 uint32_t seed) {
  Rng rng(seed);
  Blob<float> in(2, 3, 9, 11);
  fill_normal(&in, &rng);
  LayerParameter lp;
  auto* pp = lp.mutable_pooling_param();
  pp->set_pool(method == "MAX" ? caffe::PoolingParameter_PoolMethod_MAX
                               : caffe::PoolingParameter_PoolMethod_AVE);
  if (global_pool) {
    pp->set_global_pooling(true);
  } else {
    if (kh == kw) {
      pp->set_kernel_size(kh);
    } else {
      pp->set_kernel_h(kh);
      pp->set_kernel_w(kw);
    }
    if (sh == sw) {
      pp->set_stride(sh);
    } else {
      pp->set_stride_h(sh);
      pp->set_stride_w(sw);
    }
    if (ph == pw) {
      if (ph) pp->set_pad(ph);
    } else {
      pp->set_pad_h(ph);
      pp->set_pad_w(pw);
    }
  }
  caffe::PoolingLayer<float> layer(lp);
  vector<Blob<float>*> bottom{&in};
  std::ostringstream pj;
  pj << "{\"method\": \"" << method << "\", \"kh\": " << kh
     << ", \"kw\": " << kw << ", \"sh\": " << sh << ", \"sw\": " << sw
     << ", \"ph\": " << ph << ", \"pw\": " << pw
     << ", \"global\": " << (global_pool ? "true" : "false") << "}";
  run_one(name, &layer, bottom, 1, pj.str());
}

void scenario_pooling() {
  run_pooling("pool_max_k3s2p1", "MAX", 3, 3, 2, 2, 1, 1, false, 9101);
  run_pooling("pool_ave_k3s2p1", "AVE", 3, 3, 2, 2, 1, 1, false, 9102);
  // ceil-mode overhang with pad 0: last window clipped -> AVE divisor < k*k
  run_pooling("pool_ave_k3s3p0", "AVE", 3, 3, 3, 3, 0, 0, false, 9103);
  run_pooling("pool_max_k3s3p0", "MAX", 3, 3, 3, 3, 0, 0, false, 9104);
  // rectangular kernel/stride/pad (kernel_h/w fields)
  run_pooling("pool_max_rect", "MAX", 3, 2, 2, 1, 1, 0, false, 9105);
  run_pooling("pool_ave_rect", "AVE", 2, 3, 1, 2, 0, 1, false, 9106);
  run_pooling("pool_max_global", "MAX", 0, 0, 0, 0, 0, 0, true, 9107);
  run_pooling("pool_ave_global", "AVE", 0, 0, 0, 0, 0, 0, true, 9108);
}

void run_lrn(const string& name, bool within, int size, float alpha,
             float beta, float k, uint32_t seed) {
  Rng rng(seed);
  Blob<float> in(2, 7, 5, 6);
  fill_normal(&in, &rng);
  LayerParameter lp;
  auto* np = lp.mutable_lrn_param();
  np->set_local_size(size);
  np->set_alpha(alpha);
  np->set_beta(beta);
  np->set_k(k);
  np->set_norm_region(within
      ? caffe::LRNParameter_NormRegion_WITHIN_CHANNEL
      : caffe::LRNParameter_NormRegion_ACROSS_CHANNELS);
  caffe::LRNLayer<float> layer(lp);
  vector<Blob<float>*> bottom{&in};
  std::ostringstream pj;
  pj << "{\"within\": " << (within ? "true" : "false")
     << ", \"size\": " << size << ", \"alpha\": " << alpha
     << ", \"beta\": " << beta << ", \"k\": " << k << "}";
  run_one(name, &layer, bottom, 1, pj.str());
}

void scenario_lrn() {
  run_lrn("lrn_across", false, 5, 0.8f, 0.75f, 2.0f, 9201);
  run_lrn("lrn_within", true, 3, 0.9f, 0.7f, 1.0f, 9202);
}

void run_mvn(const string& name, bool norm_var, bool across, uint32_t seed) {
  Rng rng(seed);
  Blob<float> in(2, 3, 4, 5);
  fill_normal(&in, &rng, 0.5f, 2.0f);
  LayerParameter lp;
  lp.mutable_mvn_param()->set_normalize_variance(norm_var);
  lp.mutable_mvn_param()->set_across_channels(across);
  caffe::MVNLayer<float> layer(lp);
  vector<Blob<float>*> bottom{&in};
  std::ostringstream pj;
  pj << "{\"normalize_variance\": " << (norm_var ? "true" : "false")
     << ", \"across_channels\": " << (across ? "true" : "false") << "}";
  run_one(name, &layer, bottom, 1, pj.str());
}

void scenario_mvn() {
  run_mvn("mvn_var_within", true, false, 9301);
  run_mvn("mvn_var_across", true, true, 9302);
  run_mvn("mvn_mean_within", false, false, 9303);
  run_mvn("mvn_mean_across", false, true, 9304);
}

void scenario_neurons() {
  // BNLL incl. magnitudes past the kBNLL_THRESHOLD=50 clamp
  {
    Rng rng(9401);
    Blob<float> in(2, 3, 4, 5);
    float* p = in.mutable_cpu_data();
    for (int i = 0; i < in.count(); ++i) p[i] = rng.uniform(-90.f, 90.f);
    LayerParameter lp;
    caffe::BNLLLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&in};
    run_one("bnll", &layer, bottom, 1, "{}");
  }
  // ELU with non-default alpha
  {
    Rng rng(9402);
    Blob<float> in(2, 3, 4, 5);
    fill_normal(&in, &rng);
    LayerParameter lp;
    lp.mutable_elu_param()->set_alpha(0.5f);
    caffe::ELULayer<float> layer(lp);
    vector<Blob<float>*> bottom{&in};
    run_one("elu_a05", &layer, bottom, 1, "{\"alpha\": 0.5}");
  }
  // Power: (shift + scale x)^power, incl. a fractional negative power
  {
    Rng rng(9403);
    Blob<float> in(2, 3, 4, 5);
    float* p = in.mutable_cpu_data();
    for (int i = 0; i < in.count(); ++i) p[i] = rng.uniform(0.1f, 3.f);
    LayerParameter lp;
    lp.mutable_power_param()->set_power(-0.75f);
    lp.mutable_power_param()->set_scale(0.3f);
    lp.mutable_power_param()->set_shift(2.0f);
    caffe::PowerLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&in};
    run_one("power_frac", &layer, bottom, 1,
            "{\"power\": -0.75, \"scale\": 0.3, \"shift\": 2.0}");
  }
  // PReLU per-channel and channel-shared; slopes overwritten post-SetUp
  for (int shared = 0; shared < 2; ++shared) {
    Rng rng(9404 + shared);
    Blob<float> in(2, 4, 3, 5);
    fill_normal(&in, &rng);
    LayerParameter lp;
    lp.mutable_prelu_param()->set_channel_shared(shared);
    caffe::PReLULayer<float> layer(lp);
    vector<Blob<float>*> bottom{&in};
    vector<Blob<float>*> top{nullptr};
    Blob<float> out;
    top[0] = &out;
    layer.SetUp(bottom, top);
    float* sl = layer.blobs()[0]->mutable_cpu_data();
    for (int i = 0; i < layer.blobs()[0]->count(); ++i)
      sl[i] = rng.uniform(0.05f, 0.6f);
    layer.Forward(bottom, top);
    string name = shared ? "prelu_shared" : "prelu_perchannel";
    save_blob(name + ".bottom0.npy", in);
    save_blob(name + ".slopes.npy", *layer.blobs()[0]);
    save_blob(name + ".top0.npy", out);
    std::ostringstream pj;
    pj << "{\"channel_shared\": " << (shared ? "true" : "false") << "}";
    manifest_entry(name, pj.str());
  }
}

void scenario_eltwise() {
  Rng rng(9501);
  Blob<float> a(2, 3, 4, 5), b(2, 3, 4, 5), c(2, 3, 4, 5);
  fill_normal(&a, &rng);
  fill_normal(&b, &rng);
  fill_normal(&c, &rng);
  {
    LayerParameter lp;
    lp.mutable_eltwise_param()->set_operation(
        caffe::EltwiseParameter_EltwiseOp_SUM);
    lp.mutable_eltwise_param()->add_coeff(1.5f);
    lp.mutable_eltwise_param()->add_coeff(-0.5f);
    caffe::EltwiseLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&a, &b};
    run_one("eltwise_sum_coeff", &layer, bottom, 1,
            "{\"operation\": \"sum\", \"coeff\": [1.5, -0.5]}");
  }
  {
    LayerParameter lp;
    lp.mutable_eltwise_param()->set_operation(
        caffe::EltwiseParameter_EltwiseOp_PROD);
    caffe::EltwiseLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&a, &b, &c};
    run_one("eltwise_prod3", &layer, bottom, 1,
            "{\"operation\": \"prod\"}");
  }
  {
    LayerParameter lp;
    lp.mutable_eltwise_param()->set_operation(
        caffe::EltwiseParameter_EltwiseOp_MAX);
    caffe::EltwiseLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&a, &b};
    run_one("eltwise_max", &layer, bottom, 1, "{\"operation\": \"max\"}");
  }
}

void scenario_spp() {
  // odd sizes stress the ceil(kernel)/pad derivation (spp_layer.cpp:19-42)
  Rng rng(9601);
  Blob<float> in(2, 3, 13, 17);
  fill_normal(&in, &rng);
  LayerParameter lp;
  lp.mutable_spp_param()->set_pyramid_height(3);
  caffe::SPPLayer<float> layer(lp);
  vector<Blob<float>*> bottom{&in};
  run_one("spp_h3_max", &layer, bottom, 1,
          "{\"pyramid_height\": 3, \"pool\": \"max\"}");
}

void scenario_losses_std() {
  // Contrastive, modern and legacy forms
  for (int legacy = 0; legacy < 2; ++legacy) {
    Rng rng(9701 + legacy);
    Blob<float> a(8, 4, 1, 1), b(8, 4, 1, 1), y(8, 1, 1, 1);
    fill_normal(&a, &rng);
    fill_normal(&b, &rng, 0.3f, 1.0f);
    float* yp = y.mutable_cpu_data();
    for (int i = 0; i < 8; ++i) yp[i] = static_cast<float>(i % 2);
    LayerParameter lp;
    lp.mutable_contrastive_loss_param()->set_margin(1.0f);
    lp.mutable_contrastive_loss_param()->set_legacy_version(legacy);
    caffe::ContrastiveLossLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&a, &b, &y};
    string name = legacy ? "contrastive_legacy" : "contrastive";
    std::ostringstream pj;
    pj << "{\"margin\": 1.0, \"legacy\": " << (legacy ? "true" : "false")
       << "}";
    run_one(name, &layer, bottom, 1, pj.str());
  }
  // Hinge L1 / L2
  for (int l2 = 0; l2 < 2; ++l2) {
    Rng rng(9703 + l2);
    Blob<float> scores(8, 5, 1, 1), labels(8, 1, 1, 1);
    fill_normal(&scores, &rng);
    float* lb = labels.mutable_cpu_data();
    for (int i = 0; i < 8; ++i) lb[i] = static_cast<float>(rng.integer(0, 4));
    LayerParameter lp;
    lp.mutable_hinge_loss_param()->set_norm(
        l2 ? caffe::HingeLossParameter_Norm_L2
           : caffe::HingeLossParameter_Norm_L1);
    caffe::HingeLossLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&scores, &labels};
    string name = l2 ? "hinge_l2" : "hinge_l1";
    std::ostringstream pj;
    pj << "{\"norm\": \"" << (l2 ? "L2" : "L1") << "\"}";
    run_one(name, &layer, bottom, 1, pj.str());
  }
  // Accuracy: top_k and ignore_label
  for (int variant = 0; variant < 2; ++variant) {
    Rng rng(9705 + variant);
    Blob<float> scores(16, 6, 1, 1), labels(16, 1, 1, 1);
    fill_normal(&scores, &rng);
    float* lb = labels.mutable_cpu_data();
    for (int i = 0; i < 16; ++i) lb[i] = static_cast<float>(rng.integer(0, 5));
    LayerParameter lp;
    if (variant == 0) {
      lp.mutable_accuracy_param()->set_top_k(3);
    } else {
      lp.mutable_accuracy_param()->set_ignore_label(2);
    }
    caffe::AccuracyLayer<float> layer(lp);
    vector<Blob<float>*> bottom{&scores, &labels};
    string name = variant ? "accuracy_ignore2" : "accuracy_top3";
    std::ostringstream pj;
    pj << "{\"top_k\": " << (variant ? 1 : 3)
       << ", \"ignore_label\": " << (variant ? 2 : -1) << "}";
    run_one(name, &layer, bottom, 1, pj.str());
  }
}

void scenario_softmax() {
  Rng rng(7001);
  Blob<float> in(2, 5, 6, 7);
  fill_normal(&in, &rng, 0.f, 2.f);
  save_blob("softmax.in.npy", in);
  LayerParameter lp;
  caffe::SoftmaxLayer<float> layer(lp);
  Blob<float> out;
  vector<Blob<float>*> bottom{&in}, top{&out};
  layer.SetUp(bottom, top);
  layer.Forward(bottom, top);
  save_blob("softmax.out.npy", out);
  manifest_entry("softmax", "{\"shape\": [2,5,6,7], \"axis\": 1}");
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::cerr << "usage: gen_fixtures <output_dir>" << std::endl;
    return 1;
  }
  g_outdir = argv[1];
  caffe::Caffe::set_mode(caffe::Caffe::CPU);
  caffe::Caffe::set_random_seed(42);

  scenario_box_iou();
  scenario_decode_with_prior();
  scenario_box_output();
  scenario_roi_pooling();
  scenario_roi_align();
  scenario_decode_bbox();
  scenario_detection_loss();
  scenario_detection_accuracy();
  scenario_proposal_target();
  scenario_bbox_accuracy();
  scenario_pooling();
  scenario_lrn();
  scenario_mvn();
  scenario_neurons();
  scenario_eltwise();
  scenario_spp();
  scenario_losses_std();
  scenario_softmax();

  std::ofstream mf(g_outdir + "/manifest.json");
  mf << "{\n" << g_manifest.str() << "\n}\n";
  std::cout << "fixtures written to " << g_outdir << std::endl;
  return 0;
}
