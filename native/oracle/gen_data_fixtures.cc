// Data-layer golden-fixture generator: executes the *reference's own*
// ImageGtDataLayer (compiled unmodified from /root/reference, see
// CMakeLists.txt) on deterministic synthetic images + window files and
// dumps the layer's outputs — the augmented data canvas, every per-scale
// 6-channel label map, and the gt_boxes top — as .npy files.
//
// This pins mscnn_tpu's label rasterizer (mscnn_tpu/data/rasterize.py) to
// reference-EXECUTED outputs: the gt_boxes top carries the crop-space
// windows with final ignore flags — exactly the rasterizer's input — so the
// Python test replays it through rasterize_labels and compares the label
// maps cell-for-cell. Covered reference semantics:
//   window-file parse + gt filtering   image_gt_data_layer.cpp:80-230,592-614
//   mirror/resize/crop/zoom chain      image_gt_data_layer.cpp:379-567
//   label rasterization (6ch maps)     image_gt_data_layer.cpp:641-711
//   RONI iou=1 cells (IOFU >= 0.4)     image_gt_data_layer.cpp:668-677
//   out-of-copy-region iou=1 cells     image_gt_data_layer.cpp:655-659
//   force-assign (best cell, IoU>=0.2) image_gt_data_layer.cpp:713-744
//   gt_boxes top [id,x1,y1,x2,y2,l,ig] image_gt_data_layer.cpp:820-839
//
// The prefetch thread is never started: the driver subclass calls
// DataLayerSetUp + load_batch synchronously, so the PrefetchRand stream is
// deterministic under Caffe::set_random_seed.
//
// Usage: gen_data_fixtures <output_dir>
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "caffe/blob.hpp"
#include "caffe/common.hpp"
#include "caffe/layers/base_data_layer.hpp"
#include "caffe/layers/image_gt_data_layer.hpp"
#include "caffe/proto/caffe.pb.h"

using caffe::Blob;
using caffe::LayerParameter;
using std::string;
using std::vector;

namespace {

string g_outdir;
std::ostringstream g_manifest;
bool g_first_entry = true;

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

void manifest_entry(const string& scenario, const string& params_json) {
  if (!g_first_entry) g_manifest << ",\n";
  g_first_entry = false;
  g_manifest << "  \"" << scenario << "\": " << params_json;
}

// Expose the protected single-threaded drive path: DataLayerSetUp parses
// the window file and reshapes the prefetch buffers; load_batch runs the
// full augment+rasterize chain into prefetch_[0]. No thread is started.
class OracleImageGtLayer : public caffe::ImageGtDataLayer<float> {
 public:
  explicit OracleImageGtLayer(const LayerParameter& p)
      : caffe::ImageGtDataLayer<float>(p) {}

  void Setup(const vector<Blob<float>*>& top) {
    vector<Blob<float>*> bottom;
    this->DataLayerSetUp(bottom, top);
  }

  caffe::Batch<float>* LoadBatch() {
    this->load_batch(&this->prefetch_[0]);
    return &this->prefetch_[0];
  }

  int NumLabelBlobs() const { return this->label_blob_num_; }
};

// ------------------------------------------------------------ input synth

struct GtBox {
  int label, ignore, x1, y1, x2, y2;
};
struct RoniBox {
  int x1, y1, x2, y2;
};
struct ImageSpec {
  string path;
  int h, w;
  vector<GtBox> gts;
  vector<RoniBox> ronis;
};

// Deterministic PNG of pixels in [1, 255] — strictly positive so the
// Python test can recover the augmentation copy region from the zero
// border of the data canvas (scale=1, no mean in those scenarios).
void write_image(const string& path, int h, int w, uint32_t seed) {
  std::mt19937 eng(seed);
  std::uniform_int_distribution<int> dist(1, 255);
  cv::Mat img(h, w, CV_8UC3);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img.ptr<uint8_t>(y);
    for (int x = 0; x < w * 3; ++x) row[x] = static_cast<uint8_t>(dist(eng));
  }
  if (!cv::imwrite(path, img)) {
    std::cerr << "cannot write " << path << std::endl;
    std::abort();
  }
}

void write_window_file(const string& path, const vector<ImageSpec>& images) {
  std::ofstream f(path);
  for (size_t i = 0; i < images.size(); ++i) {
    const ImageSpec& im = images[i];
    f << "# " << i << "\n" << im.path << "\n3\n" << im.h << "\n" << im.w
      << "\n" << im.gts.size() << "\n";
    for (const GtBox& g : im.gts)
      f << g.label << " " << g.ignore << " " << g.x1 << " " << g.y1 << " "
        << g.x2 << " " << g.y2 << "\n";
    f << im.ronis.size() << "\n";
    for (const RoniBox& r : im.ronis)
      f << r.x1 << " " << r.y1 << " " << r.x2 << " " << r.y2 << "\n";
  }
}

vector<ImageSpec> make_images(const string& tag, const vector<int>& hs,
                              const vector<int>& ws, bool with_ronis,
                              bool with_empty, uint32_t seed) {
  std::mt19937 eng(seed);
  auto randint = [&](int a, int b) {  // inclusive
    return std::uniform_int_distribution<int>(a, b)(eng);
  };
  vector<ImageSpec> images;
  for (size_t i = 0; i < hs.size(); ++i) {
    ImageSpec im;
    im.h = hs[i];
    im.w = ws[i];
    im.path = g_outdir + "/" + tag + "_im" + std::to_string(i) + ".png";
    write_image(im.path, im.h, im.w, seed * 131 + i);
    if (with_empty && i == 2) {
      images.push_back(im);  // zero-gt image: random crop center path
      continue;
    }
    const int n_gt = randint(2, 5);
    for (int g = 0; g < n_gt; ++g) {
      GtBox b;
      b.label = randint(1, 4);
      b.ignore = randint(0, 9) == 0 ? 1 : 0;
      int bw, bh;
      if (g == 0 && (i == 0 || i == 3)) {
        // one large gt so the coarsest field (96px, stride 32) gets
        // positives too
        bw = randint(80, std::min(110, im.w - 2));
        bh = randint(80, std::min(110, im.h - 2));
      } else if (g == n_gt - 1 && randint(0, 1)) {
        bw = randint(3, 8);  // tiny: exercises the min_gt ignore filter
        bh = randint(3, 8);
      } else {
        bw = randint(14, im.w / 2);
        bh = randint(14, im.h / 2);
      }
      b.x1 = randint(0, im.w - bw - 1);
      b.y1 = randint(0, im.h - bh - 1);
      b.x2 = b.x1 + bw;
      b.y2 = b.y1 + bh;
      im.gts.push_back(b);
    }
    if (with_ronis) {
      const int n_roni = randint(0, 2);
      for (int r = 0; r < n_roni; ++r) {
        RoniBox b;
        int bw = randint(16, im.w / 2), bh = randint(16, im.h / 2);
        b.x1 = randint(0, im.w - bw - 1);
        b.y1 = randint(0, im.h - bh - 1);
        b.x2 = b.x1 + bw;
        b.y2 = b.y1 + bh;
        im.ronis.push_back(b);
      }
    }
    images.push_back(im);
  }
  return images;
}

// Common branch geometry for all scenarios (template 96x128):
// strides (8,8,16,32), field_w (24,32,24,96), field_h (24,48,48,96) —
// square (kitti), tall-1.5:1 (kitti ped/cyc) AND tall-2:1 fields (the
// caltech/citypersons pedestrian template shape), as in the zoo variant
// matrix (SURVEY.md section 2.6b).
const int kRates[4] = {8, 8, 16, 32};
const int kFieldW[4] = {24, 32, 24, 96};
const int kFieldH[4] = {24, 48, 48, 96};

struct ScenarioCfg {
  string name;
  int batch_size;
  bool mirror;
  bool mean_values;       // (104,117,123) when set
  float scale;
  int resize_w, resize_h;  // 0 = unset
  int crop_w, crop_h;      // 0 = unset
  bool do_multiple_scale;
  int min_scale, max_scale;
  float min_whaspect, max_whaspect;  // 0 = unset
  float min_gt_w, min_gt_h;
  uint32_t layer_seed;
};

void run_scenario(const ScenarioCfg& cfg, const vector<ImageSpec>& images,
                  const string& window_file) {
  LayerParameter lp;
  lp.set_phase(caffe::TRAIN);
  auto* gp = lp.mutable_image_gt_data_param();
  gp->set_source(window_file);
  gp->set_batch_size(cfg.batch_size);
  gp->set_scale(cfg.scale);
  gp->set_fg_threshold(0.5f);
  gp->set_min_gt_width(cfg.min_gt_w);
  gp->set_min_gt_height(cfg.min_gt_h);
  gp->set_output_gt_boxes(true);
  gp->set_shuffle(false);
  for (int j = 0; j < 4; ++j) {
    gp->add_downsample_rate(kRates[j]);
    gp->add_field_w(kFieldW[j]);
    gp->add_field_h(kFieldH[j]);
  }
  if (cfg.resize_w > 0) {
    gp->set_resize_width(cfg.resize_w);
    gp->set_resize_height(cfg.resize_h);
  }
  if (cfg.crop_w > 0) {
    gp->set_crop_width(cfg.crop_w);
    gp->set_crop_height(cfg.crop_h);
  }
  if (cfg.do_multiple_scale) {
    gp->set_do_multiple_scale(true);
    gp->set_min_scale(cfg.min_scale);
    gp->set_max_scale(cfg.max_scale);
  }
  if (cfg.min_whaspect > 0) {
    gp->set_min_whaspect(cfg.min_whaspect);
    gp->set_max_whaspect(cfg.max_whaspect);
  }
  auto* tp = lp.mutable_transform_param();
  tp->set_mirror(cfg.mirror);
  if (cfg.mean_values) {
    tp->add_mean_value(104.f);
    tp->add_mean_value(117.f);
    tp->add_mean_value(123.f);
  }

  caffe::Caffe::set_random_seed(cfg.layer_seed);
  OracleImageGtLayer layer(lp);
  vector<Blob<float>*> top;  // data + 4 label maps + gt_boxes
  for (int i = 0; i < 6; ++i) top.push_back(new Blob<float>());
  layer.Setup(top);
  caffe::Batch<float>* batch = layer.LoadBatch();

  save_blob(cfg.name + ".data.npy", batch->data_);
  for (int nn = 0; nn < layer.NumLabelBlobs(); ++nn)
    save_blob(cfg.name + ".label" + std::to_string(nn) + ".npy",
              *batch->labels_[nn]);
  save_blob(cfg.name + ".gt_boxes.npy",
            *batch->labels_[layer.NumLabelBlobs()]);

  // RONIs are only replayable when the geometry is identity (no mirror /
  // resize / zoom); dump them as [img_slot, x1, y1, x2, y2] then.
  if (!cfg.mirror && cfg.resize_w == 0 && !cfg.do_multiple_scale) {
    vector<float> ronis;
    int64_t rows = 0;
    for (int slot = 0; slot < cfg.batch_size; ++slot) {
      const ImageSpec& im = images[slot % images.size()];
      for (const RoniBox& r : im.ronis) {
        ronis.push_back(static_cast<float>(slot));
        ronis.push_back(static_cast<float>(r.x1));
        ronis.push_back(static_cast<float>(r.y1));
        ronis.push_back(static_cast<float>(r.x2));
        ronis.push_back(static_cast<float>(r.y2));
        ++rows;
      }
    }
    save_npy(cfg.name + ".ronis.npy", ronis.data(), {rows, 5});
  }

  std::ostringstream pj;
  pj << "{\"batch_size\": " << cfg.batch_size
     << ", \"template_h\": " << batch->data_.height()
     << ", \"template_w\": " << batch->data_.width()
     << ", \"mirror\": " << (cfg.mirror ? "true" : "false")
     << ", \"mean_values\": " << (cfg.mean_values ? "[104,117,123]" : "null")
     << ", \"scale\": " << cfg.scale
     << ", \"fg_threshold\": 0.5"
     << ", \"min_gt_width\": " << cfg.min_gt_w
     << ", \"min_gt_height\": " << cfg.min_gt_h
     << ", \"downsample_rate\": [8,8,16,32]"
     << ", \"field_w\": [24,32,24,96], \"field_h\": [24,48,48,96]"
     << ", \"do_multiple_scale\": "
     << (cfg.do_multiple_scale ? "true" : "false") << "}";
  manifest_entry(cfg.name, pj.str());
  for (Blob<float>* b : top) delete b;
}

void scenario_identity_roni() {
  // Geometry identity: image == template 96x128, no resize/zoom/mirror, so
  // crop-space RONIs equal the window-file RONIs and the copy region is the
  // full canvas. Pins rasterization incl. RONI iou=1 cells.
  vector<int> hs(6, 96), ws(6, 128);
  auto images = make_images("identity", hs, ws, /*ronis=*/true,
                            /*empty=*/true, 9101);
  string wf = g_outdir + "/identity_windows.txt";
  write_window_file(wf, images);
  ScenarioCfg cfg{};
  cfg.name = "datalayer_identity";
  cfg.batch_size = 4;
  cfg.mirror = false;
  cfg.mean_values = false;
  cfg.scale = 1.f;
  cfg.min_gt_w = 10.f;
  cfg.min_gt_h = 10.f;
  cfg.layer_seed = 4242;
  run_scenario(cfg, images, wf);
}

void scenario_aug() {
  // Full mirror+resize+crop chain, rescale >= template in both dims so the
  // copy region stays full. gt_boxes is the transform witness: the Python
  // test replays it through the rasterizer with no RONIs.
  vector<int> hs{100, 120, 90, 110, 96, 105};
  vector<int> ws{160, 140, 150, 170, 128, 165};
  auto images = make_images("aug", hs, ws, /*ronis=*/false,
                            /*empty=*/false, 9202);
  string wf = g_outdir + "/aug_windows.txt";
  write_window_file(wf, images);
  ScenarioCfg cfg{};
  cfg.name = "datalayer_aug";
  cfg.batch_size = 4;
  cfg.mirror = true;
  cfg.mean_values = true;
  cfg.scale = 0.25f;
  cfg.resize_w = 192;
  cfg.resize_h = 96;
  cfg.crop_w = 128;
  cfg.crop_h = 96;
  cfg.min_gt_w = 8.f;
  cfg.min_gt_h = 8.f;
  cfg.layer_seed = 4343;
  run_scenario(cfg, images, wf);
}

void scenario_zoom() {
  // Octave zoom + aspect jitter (do_multiple_scale): zoom-out produces
  // rescale < template, i.e. a partial copy region with a zero border. The
  // Python test recovers the copy rect from the strictly-positive pixels
  // (scale=1, no mean) and checks the out-of-region iou=1 cells.
  vector<int> hs{140, 150, 135, 145, 140, 138};
  vector<int> ws{180, 170, 185, 175, 190, 180};
  auto images = make_images("zoom", hs, ws, /*ronis=*/false,
                            /*empty=*/false, 9303);
  string wf = g_outdir + "/zoom_windows.txt";
  write_window_file(wf, images);
  ScenarioCfg cfg{};
  cfg.name = "datalayer_zoom";
  cfg.batch_size = 6;
  cfg.mirror = true;
  cfg.mean_values = false;
  cfg.scale = 1.f;
  cfg.crop_w = 128;
  cfg.crop_h = 96;
  cfg.do_multiple_scale = true;
  cfg.min_scale = 24;
  cfg.max_scale = 96;
  cfg.min_whaspect = 0.7f;
  cfg.max_whaspect = 1.4f;
  cfg.min_gt_w = 8.f;
  cfg.min_gt_h = 8.f;
  cfg.layer_seed = 4444;
  run_scenario(cfg, images, wf);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::cerr << "usage: gen_data_fixtures <output_dir>" << std::endl;
    return 1;
  }
  g_outdir = argv[1];
  caffe::Caffe::set_mode(caffe::Caffe::CPU);

  scenario_identity_roni();
  scenario_aug();
  scenario_zoom();

  std::ofstream mf(g_outdir + "/manifest.json");
  mf << "{\n" << g_manifest.str() << "\n}\n";
  std::cout << "data fixtures written to " << g_outdir << std::endl;
  return 0;
}
