// Native data-loading core: window-file dataset -> augmented, fixed-shape
// training batches, produced by a background worker pool.
//
// This is the TPU-native replacement for the reference's C++ data pipeline
// (/root/reference/src/caffe/layers/image_gt_data_layer.cpp prefetch thread,
// src/caffe/util/blocking_queue.cpp, src/caffe/internal_thread.cpp): the
// same mirror / resize / octave-scale / aspect / gt-centered-crop
// augmentation chain runs here in C++ (OpenCV) on a pool of workers feeding
// a bounded batch queue; label rasterization is NOT done here — it runs on
// device from the gt boxes (mscnn_tpu/data/rasterize.py).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <fcntl.h>
#include <unistd.h>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <memory>
#include <mutex>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WindowImage {
  std::string path;
  int channels = 3, height = 0, width = 0;
  // packed-record shard mode: image bytes live at [rec_off, rec_off+rec_len)
  // of the shard file instead of at `path` (see data/records.py layout)
  uint64_t rec_off = 0;
  uint32_t rec_len = 0;
  // rows: label, ignore, x1, y1, x2, y2
  std::vector<std::array<float, 6>> gts;
  // rows: x1, y1, x2, y2
  std::vector<std::array<float, 4>> ronis;
  bool has_fg() const {
    for (auto& g : gts)
      if (g[1] == 0.0f) return true;
    return false;
  }
};

struct LoaderConfig {
  int batch_size = 4;
  int template_h = 576, template_w = 768;
  int resize_h = 0, resize_w = 0;  // 0 = no resize
  int max_gts = 64, max_ronis = 16;
  int mirror = 1;
  float mean_b = 104.f, mean_g = 117.f, mean_r = 123.f;
  float scale = 1.f;
  int do_multiple_scale = 0;
  int min_scale = 0, max_scale = 0;
  float min_whaspect = 0.f, max_whaspect = 0.f;  // 0/0 = disabled
  float min_gt_w = 0.f, min_gt_h = 0.f;
  int fg_img_multiple = 1;
  int shuffle = 1;
  uint64_t seed = 1704;
  int num_workers = 2;
  int queue_depth = 3;
  // emit the canvas as raw uint8 (pre mean-subtract); normalization
  // happens on device — 4x less H2D traffic, bit-identical values
  int emit_uint8 = 0;
};

struct Batch {
  std::vector<float> image;        // [B, H, W, 3] (float mode)
  std::vector<uint8_t> image_u8;   // [B, H, W, 3] (emit_uint8 mode)
  std::vector<float> gt_boxes;     // [B, G, 7]
  std::vector<uint8_t> gt_valid;   // [B, G]
  std::vector<float> ronis;        // [B, Rn, 4]
  std::vector<uint8_t> roni_valid; // [B, Rn]
  std::vector<float> copy_region;  // [B, 4]
};

void affine_boxes(std::vector<std::array<float, 6>>& gts, float fx, float fy,
                  float dx, float dy) {
  for (auto& g : gts) {
    g[2] = g[2] * fx + dx;
    g[4] = g[4] * fx + dx;
    g[3] = g[3] * fy + dy;
    g[5] = g[5] * fy + dy;
  }
}

void affine_ronis(std::vector<std::array<float, 4>>& rs, float fx, float fy,
                  float dx, float dy) {
  for (auto& r : rs) {
    r[0] = r[0] * fx + dx;
    r[2] = r[2] * fx + dx;
    r[1] = r[1] * fy + dy;
    r[3] = r[3] * fy + dy;
  }
}

class Loader {
 public:
  // rec_fd >= 0 switches image reads to pread+imdecode from the record
  // shard (the loader takes ownership of the descriptor).
  Loader(std::vector<WindowImage> images, LoaderConfig cfg, int rec_fd = -1)
      : images_(std::move(images)), cfg_(cfg), rec_fd_(rec_fd),
        rng_(cfg.seed) {
    for (size_t i = 0; i < images_.size(); ++i) {
      int mult = images_[i].has_fg() ? cfg_.fg_img_multiple : 1;
      for (int m = 0; m < mult; ++m) index_list_.push_back(i);
    }
    reshuffle();
    for (int w = 0; w < cfg_.num_workers; ++w)
      workers_.emplace_back([this, w] { worker_loop(w); });
  }

  ~Loader() {
    stop_.store(true);
    cv_free_.notify_all();
    cv_full_.notify_all();
    for (auto& t : workers_) t.join();
    if (rec_fd_ >= 0) ::close(rec_fd_);
  }

  // Blocks until a batch is ready, then moves it out.
  std::unique_ptr<Batch> next() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_full_.wait(lk, [this] { return !queue_.empty() || !error_.empty(); });
    if (!error_.empty()) return nullptr;
    auto b = std::move(queue_.front());
    queue_.pop_front();
    cv_free_.notify_one();
    return b;
  }

  std::string error() {
    std::lock_guard<std::mutex> lk(mu_);
    return error_;
  }

 private:
  void reshuffle() {
    order_.resize(index_list_.size());
    for (size_t i = 0; i < order_.size(); ++i) order_[i] = i;
    if (cfg_.shuffle)
      std::shuffle(order_.begin(), order_.end(), rng_);
    pos_ = 0;
  }

  // Hand the caller the next sample index + a private RNG seed. Serialized
  // so the epoch order is deterministic regardless of worker interleaving.
  std::pair<size_t, uint64_t> next_sample_locked() {
    if (pos_ >= order_.size()) reshuffle();
    size_t idx = index_list_[order_[pos_++]];
    return {idx, rng_()};
  }

  void worker_loop(int /*wid*/) {
    while (!stop_.load()) {
      // claim a batch worth of samples
      std::vector<std::pair<size_t, uint64_t>> picks;
      {
        std::lock_guard<std::mutex> lk(mu_);
        for (int i = 0; i < cfg_.batch_size; ++i)
          picks.push_back(next_sample_locked());
      }
      auto batch = std::make_unique<Batch>();
      const int B = cfg_.batch_size, H = cfg_.template_h, W = cfg_.template_w;
      const int G = cfg_.max_gts, Rn = cfg_.max_ronis;
      if (cfg_.emit_uint8)
        batch->image_u8.assign((size_t)B * H * W * 3, 0);
      else
        batch->image.assign((size_t)B * H * W * 3, 0.f);
      batch->gt_boxes.assign((size_t)B * G * 7, 0.f);
      batch->gt_valid.assign((size_t)B * G, 0);
      batch->ronis.assign((size_t)B * Rn * 4, 0.f);
      batch->roni_valid.assign((size_t)B * Rn, 0);
      batch->copy_region.assign((size_t)B * 4, 0.f);

      bool ok = true;
      for (int b = 0; b < B && ok; ++b)
        ok = load_one(picks[b].first, picks[b].second, *batch, b);
      if (!ok) return;  // error_ set

      std::unique_lock<std::mutex> lk(mu_);
      cv_free_.wait(lk, [this] {
        return (int)queue_.size() < cfg_.queue_depth || stop_.load();
      });
      if (stop_.load()) return;
      queue_.push_back(std::move(batch));
      cv_full_.notify_one();
    }
  }

  bool load_one(size_t img_idx, uint64_t seed, Batch& out, int slot) {
    std::mt19937_64 rng(seed);
    auto rnd = [&rng](int n) { return (int)(rng() % (uint64_t)n); };

    const WindowImage& wi = images_[img_idx];
    cv::Mat img;
    if (rec_fd_ >= 0) {
      // pread is thread-safe on a shared descriptor: one open per shard,
      // no per-image filesystem lookups (the LMDB-path property)
      std::vector<uint8_t> buf(wi.rec_len);
      ssize_t n = ::pread(rec_fd_, buf.data(), wi.rec_len,
                          (off_t)wi.rec_off);
      if (n == (ssize_t)wi.rec_len)
        img = cv::imdecode(buf, cv::IMREAD_COLOR);
    } else {
      img = cv::imread(wi.path, cv::IMREAD_COLOR);
    }
    if (img.empty()) {
      std::lock_guard<std::mutex> lk(mu_);
      error_ = "could not read image " + wi.path;
      cv_full_.notify_all();
      return false;
    }
    auto gts = wi.gts;
    auto ronis = wi.ronis;

    const int TH = cfg_.template_h, TW = cfg_.template_w;

    // mirror
    if (cfg_.mirror && rnd(2)) {
      cv::flip(img, img, 1);
      float w = (float)img.cols;
      for (auto& g : gts) {
        float x1 = w - g[2], x2 = w - g[4];
        g[2] = x2;
        g[4] = x1;
      }
      for (auto& r : ronis) {
        float x1 = w - r[0], x2 = w - r[2];
        r[0] = x2;
        r[2] = x1;
      }
    }

    // dataset-level resize
    if (cfg_.resize_h > 0 && cfg_.resize_w > 0 &&
        (cfg_.resize_h != img.rows || cfg_.resize_w != img.cols)) {
      float fx = (float)cfg_.resize_w / img.cols;
      float fy = (float)cfg_.resize_h / img.rows;
      cv::resize(img, img, cv::Size(cfg_.resize_w, cfg_.resize_h), 0, 0,
                 cv::INTER_LINEAR);
      affine_boxes(gts, fx, fy, 0, 0);
      affine_ronis(ronis, fx, fy, 0, 0);
    }

    int img_h = img.rows, img_w = img.cols;

    // crop center: random gt center, else random position
    int sel_id = -1;
    float cx, cy;
    if (!gts.empty()) {
      sel_id = rnd((int)gts.size());
      cx = (gts[sel_id][2] + gts[sel_id][4]) / 2.f;
      cy = (gts[sel_id][3] + gts[sel_id][5]) / 2.f;
    } else {
      cx = img_w >= TW ? rnd(img_w - TW + 1) + TW / 2.f : img_w / 2.f;
      cy = img_h >= TH ? rnd(img_h - TH + 1) + TH / 2.f : img_h / 2.f;
    }

    // octave multi-scale zoom (image_gt_data_layer.cpp:442-497)
    float fx = 1.f, fy = 1.f;
    if (cfg_.do_multiple_scale && cfg_.min_scale > 0 && cfg_.max_scale > 0 &&
        !gts.empty() && rnd(2)) {
      const float octave = 2.f;
      float order = std::log2((float)cfg_.max_scale / cfg_.min_scale);
      int num_scale = (int)std::lround(octave * order + 1);
      float bb_w = gts[sel_id][4] - gts[sel_id][2];
      float bb_h = gts[sel_id][5] - gts[sel_id][3];
      float bb_area = bb_w * bb_h;
      float max_iou = 0.f, match_scale = 0.f;
      for (int s = 0; s < num_scale; ++s) {
        float sc = s / octave;
        float fa = cfg_.min_scale * std::pow(2.f, sc);
        fa *= fa;
        float iou = std::min(bb_area, fa) / std::max(bb_area, fa);
        if (iou > max_iou) {
          max_iou = iou;
          match_scale = sc;
        }
      }
      float rs = (rnd(num_scale) / octave) - match_scale;
      float f = std::pow(2.f, rs);
      fx = fy = f;
      bool whaspect = cfg_.max_whaspect > cfg_.min_whaspect;
      if (whaspect && rnd(2)) {
        const float interval = 0.05f;
        int intervals =
            (int)std::lround((cfg_.max_whaspect - cfg_.min_whaspect) / interval);
        float aspect = rnd(intervals) * interval + cfg_.min_whaspect;
        float mult = aspect / (bb_w / bb_h);
        if (rnd(2)) {
          float tw = bb_w * fx * mult;
          if (tw >= cfg_.min_scale * 0.8f && tw <= cfg_.max_scale * 1.2f)
            fx *= mult;
        } else {
          float th = bb_h * fy / mult;
          if (th >= cfg_.min_scale * 0.8f && th <= cfg_.max_scale * 1.2f)
            fy /= mult;
        }
      }
    }

    int rescale_h = (int)std::lround(img_h * fy);
    int rescale_w = (int)std::lround(img_w * fx);
    if (fx != 1.f || fy != 1.f) {
      if (fx > 1.5f || fy > 1.5f) {
        int crop_w = std::min((int)std::lround(1.2f * img_w / fx), img_w);
        int crop_h = std::min((int)std::lround(1.2f * img_h / fy), img_h);
        int x1 = std::max((int)std::lround(cx - crop_w * 0.5f), 0);
        int y1 = std::max((int)std::lround(cy - crop_h * 0.5f), 0);
        x1 -= std::max(x1 + crop_w - img_w, 0);
        y1 -= std::max(y1 + crop_h - img_h, 0);
        img = img(cv::Rect(x1, y1, crop_w, crop_h)).clone();
        cx -= x1;
        cy -= y1;
        affine_boxes(gts, 1, 1, (float)-x1, (float)-y1);
        affine_ronis(ronis, 1, 1, (float)-x1, (float)-y1);
        rescale_w = (int)std::lround(img.cols * fx);
        rescale_h = (int)std::lround(img.rows * fy);
      }
      cv::resize(img, img, cv::Size(rescale_w, rescale_h), 0, 0,
                 cv::INTER_LINEAR);
    }
    affine_boxes(gts, fx, fy, 0, 0);
    affine_ronis(ronis, fx, fy, 0, 0);

    // paste offsets with +-10 px jitter
    int noise_x = rnd(20) - 10, noise_y = rnd(20) - 10;
    auto offsets = [](int rescale, int tmpl, float center, int noise, int& src,
                      int& dst, int& copy) {
      if (rescale < tmpl) {
        copy = rescale;
        src = (int)std::lround((tmpl - rescale) / 2.0) + noise;
        src = std::min(std::max(src, 0), tmpl - rescale);
        dst = 0;
      } else if (rescale > tmpl) {
        copy = tmpl;
        src = 0;
        dst = (int)std::lround(center) + noise - (int)std::lround(tmpl / 2.0);
        dst = std::min(std::max(dst, 0), rescale - tmpl);
      } else {
        copy = tmpl;
        src = 0;
        dst = 0;
      }
    };
    int src_x, dst_x, copy_w, src_y, dst_y, copy_h;
    offsets(rescale_w, TW, cx * fx, noise_x, src_x, dst_x, copy_w);
    offsets(rescale_h, TH, cy * fy, noise_y, src_y, dst_y, copy_h);

    affine_boxes(gts, 1, 1, (float)(src_x - dst_x), (float)(src_y - dst_y));
    affine_ronis(ronis, 1, 1, (float)(src_x - dst_x), (float)(src_y - dst_y));

    // paste + mean-subtract (only inside the copy region, rest stays 0);
    // emit_uint8 pastes the raw bytes instead (device-side normalize)
    const int TWW = TW;
    if (cfg_.emit_uint8) {
      uint8_t* u8_out = out.image_u8.data() + (size_t)slot * TH * TW * 3;
      for (int y = 0; y < copy_h; ++y)
        std::memcpy(u8_out + ((size_t)(y + src_y) * TWW + src_x) * 3,
                    img.ptr<uint8_t>(y + dst_y) + (size_t)dst_x * 3,
                    (size_t)copy_w * 3);
    } else {
      float* img_out = out.image.data() + (size_t)slot * TH * TW * 3;
      const float mean[3] = {cfg_.mean_b, cfg_.mean_g, cfg_.mean_r};
      for (int y = 0; y < copy_h; ++y) {
        const uint8_t* row = img.ptr<uint8_t>(y + dst_y);
        float* orow = img_out + ((size_t)(y + src_y) * TWW + src_x) * 3;
        for (int x = 0; x < copy_w; ++x)
          for (int c = 0; c < 3; ++c)
            orow[x * 3 + c] =
                ((float)row[(x + dst_x) * 3 + c] - mean[c]) * cfg_.scale;
      }
    }

    // ignore rules + emit gt rows (img_id, x1, y1, x2, y2, label, ignored)
    float* gt_out = out.gt_boxes.data() + (size_t)slot * cfg_.max_gts * 7;
    uint8_t* gv = out.gt_valid.data() + (size_t)slot * cfg_.max_gts;
    int ng = std::min((int)gts.size(), cfg_.max_gts);
    for (int i = 0; i < ng; ++i) {
      float x1 = gts[i][2], y1 = gts[i][3], x2 = gts[i][4], y2 = gts[i][5];
      float gcx = (x1 + x2) / 2.f, gcy = (y1 + y2) / 2.f;
      float ignore = gts[i][1];
      if (gcx < 0 || gcx >= TW || gcy < 0 || gcy >= TH) ignore = 1.f;
      if ((x2 - x1 + 1) < cfg_.min_gt_w) ignore = 1.f;
      if ((y2 - y1 + 1) < cfg_.min_gt_h) ignore = 1.f;
      gt_out[i * 7 + 0] = (float)slot;
      gt_out[i * 7 + 1] = x1;
      gt_out[i * 7 + 2] = y1;
      gt_out[i * 7 + 3] = x2;
      gt_out[i * 7 + 4] = y2;
      gt_out[i * 7 + 5] = gts[i][0];
      gt_out[i * 7 + 6] = ignore;
      gv[i] = 1;
    }
    float* rn_out = out.ronis.data() + (size_t)slot * cfg_.max_ronis * 4;
    uint8_t* rv = out.roni_valid.data() + (size_t)slot * cfg_.max_ronis;
    int nr = std::min((int)ronis.size(), cfg_.max_ronis);
    for (int i = 0; i < nr; ++i) {
      for (int k = 0; k < 4; ++k) rn_out[i * 4 + k] = ronis[i][k];
      rv[i] = 1;
    }
    float* cr = out.copy_region.data() + (size_t)slot * 4;
    cr[0] = (float)src_x;
    cr[1] = (float)src_y;
    cr[2] = (float)copy_w;
    cr[3] = (float)copy_h;
    return true;
  }

  std::vector<WindowImage> images_;
  LoaderConfig cfg_;
  int rec_fd_ = -1;
  std::vector<size_t> index_list_;
  std::vector<size_t> order_;
  size_t pos_ = 0;
  std::mt19937_64 rng_;

  std::mutex mu_;
  std::condition_variable cv_free_, cv_full_;
  std::deque<std::unique_ptr<Batch>> queue_;
  std::string error_;
  std::atomic<bool> stop_{false};
  std::vector<std::thread> workers_;
};

std::vector<WindowImage> parse_window_file(const std::string& path,
                                           const std::string& root) {
  std::ifstream in(path);
  if (!in.good()) throw std::runtime_error("cannot open window file " + path);
  std::vector<WindowImage> out;
  std::string hashtag;
  int image_index;
  while (in >> hashtag >> image_index) {
    if (hashtag != "#")
      throw std::runtime_error("bad window file (expected '#')");
    WindowImage wi;
    in >> wi.path;
    wi.path = root + wi.path;
    in >> wi.channels >> wi.height >> wi.width;
    int num_gts;
    in >> num_gts;
    wi.gts.resize(num_gts);
    for (int i = 0; i < num_gts; ++i)
      in >> wi.gts[i][0] >> wi.gts[i][1] >> wi.gts[i][2] >> wi.gts[i][3] >>
          wi.gts[i][4] >> wi.gts[i][5];
    int num_roni;
    in >> num_roni;
    wi.ronis.resize(num_roni);
    for (int i = 0; i < num_roni; ++i)
      in >> wi.ronis[i][0] >> wi.ronis[i][1] >> wi.ronis[i][2] >>
          wi.ronis[i][3];
    out.push_back(std::move(wi));
  }
  return out;
}

// Packed record shard (data/records.py wire layout): header "MSCR" + u32
// version, records of (u32 meta_len, meta, u32 img_len, img bytes), footer
// of u64 offsets + u64 count + "MSCX".  Fills rec_off/rec_len so workers
// pread+imdecode instead of per-file imread.
std::vector<WindowImage> parse_record_shard(const std::string& path,
                                            int* out_fd) {
  int fd = ::open(path.c_str(), O_RDONLY);
  if (fd < 0) throw std::runtime_error("cannot open record shard " + path);
  auto fail = [&](const std::string& msg) {
    ::close(fd);
    throw std::runtime_error(path + ": " + msg);
  };
  auto read_at = [&](void* dst, size_t n, uint64_t off) {
    if (::pread(fd, dst, n, (off_t)off) != (ssize_t)n)
      fail("short read");
  };
  char head[8];
  read_at(head, 8, 0);
  if (std::memcmp(head, "MSCR", 4) != 0) fail("bad magic");
  uint32_t version;
  std::memcpy(&version, head + 4, 4);
  if (version != 1) fail("unsupported shard version");
  off_t fsize = ::lseek(fd, 0, SEEK_END);
  if (fsize < 20) fail("truncated shard");
  char tail[12];
  read_at(tail, 12, (uint64_t)fsize - 12);
  if (std::memcmp(tail + 8, "MSCX", 4) != 0) fail("bad end magic");
  uint64_t count;
  std::memcpy(&count, tail, 8);
  std::vector<uint64_t> offsets(count);
  read_at(offsets.data(), 8 * count, (uint64_t)fsize - 12 - 8 * count);

  std::vector<WindowImage> out;
  out.reserve(count);
  for (uint64_t off : offsets) {
    uint32_t meta_len;
    read_at(&meta_len, 4, off);
    std::vector<uint8_t> meta(meta_len);
    read_at(meta.data(), meta_len, off + 4);
    uint32_t img_len;
    read_at(&img_len, 4, off + 4 + meta_len);

    WindowImage wi;
    wi.rec_off = off + 8 + meta_len;
    wi.rec_len = img_len;
    size_t p = 0;
    auto need = [&](size_t n) { if (p + n > meta.size()) fail("bad meta"); };
    uint16_t plen;
    need(2);
    std::memcpy(&plen, &meta[p], 2);
    p += 2;
    need(plen);
    wi.path.assign((const char*)&meta[p], plen);
    p += plen;
    uint16_t channels;
    uint32_t height, width;
    need(10);
    std::memcpy(&channels, &meta[p], 2);
    std::memcpy(&height, &meta[p + 2], 4);
    std::memcpy(&width, &meta[p + 6], 4);
    p += 10;
    wi.channels = channels;
    wi.height = (int)height;
    wi.width = (int)width;
    uint32_t ng;
    need(4);
    std::memcpy(&ng, &meta[p], 4);
    p += 4;
    need((size_t)ng * 24);
    wi.gts.resize(ng);
    std::memcpy(wi.gts.data(), &meta[p], (size_t)ng * 24);
    p += (size_t)ng * 24;
    uint32_t nr;
    need(4);
    std::memcpy(&nr, &meta[p], 4);
    p += 4;
    need((size_t)nr * 16);
    wi.ronis.resize(nr);
    std::memcpy(wi.ronis.data(), &meta[p], (size_t)nr * 16);
    out.push_back(std::move(wi));
  }
  *out_fd = fd;
  return out;
}

std::string g_last_error;

}  // namespace

extern "C" {

// Mirrors LoaderConfig field-for-field; keep in sync with native_loader.py.
struct CLoaderConfig {
  int batch_size, template_h, template_w, resize_h, resize_w;
  int max_gts, max_ronis, mirror;
  float mean_b, mean_g, mean_r, scale;
  int do_multiple_scale, min_scale, max_scale;
  float min_whaspect, max_whaspect, min_gt_w, min_gt_h;
  int fg_img_multiple, shuffle;
  uint64_t seed;
  int num_workers, queue_depth;
  int emit_uint8;
};

static LoaderConfig to_loader_config(const CLoaderConfig* c);

void* mscnn_loader_create(const char* window_file, const char* root_folder,
                          const CLoaderConfig* c) {
  try {
    auto images = parse_window_file(window_file, root_folder);
    return new Loader(std::move(images), to_loader_config(c));
  } catch (const std::exception& e) {
    g_last_error = e.what();
    return nullptr;
  }
}

// Like mscnn_loader_create but over a packed record shard
// (data/records.py): one descriptor, pread + imdecode workers.
void* mscnn_loader_create_records(const char* records_file,
                                  const CLoaderConfig* c) {
  try {
    int fd = -1;
    auto images = parse_record_shard(records_file, &fd);
    return new Loader(std::move(images), to_loader_config(c), fd);
  } catch (const std::exception& e) {
    g_last_error = e.what();
    return nullptr;
  }
}

static LoaderConfig to_loader_config(const CLoaderConfig* c) {
  {
    LoaderConfig cfg;
    cfg.batch_size = c->batch_size;
    cfg.template_h = c->template_h;
    cfg.template_w = c->template_w;
    cfg.resize_h = c->resize_h;
    cfg.resize_w = c->resize_w;
    cfg.max_gts = c->max_gts;
    cfg.max_ronis = c->max_ronis;
    cfg.mirror = c->mirror;
    cfg.mean_b = c->mean_b;
    cfg.mean_g = c->mean_g;
    cfg.mean_r = c->mean_r;
    cfg.scale = c->scale;
    cfg.do_multiple_scale = c->do_multiple_scale;
    cfg.min_scale = c->min_scale;
    cfg.max_scale = c->max_scale;
    cfg.min_whaspect = c->min_whaspect;
    cfg.max_whaspect = c->max_whaspect;
    cfg.min_gt_w = c->min_gt_w;
    cfg.min_gt_h = c->min_gt_h;
    cfg.fg_img_multiple = c->fg_img_multiple;
    cfg.shuffle = c->shuffle;
    cfg.seed = c->seed;
    cfg.num_workers = c->num_workers;
    cfg.queue_depth = c->queue_depth;
    cfg.emit_uint8 = c->emit_uint8;
    return cfg;
  }
}

// Copies the next ready batch into caller-provided buffers.
// Returns 0 on success, -1 on loader error (see mscnn_loader_error).
int mscnn_loader_next(void* handle, float* image, float* gt_boxes,
                      uint8_t* gt_valid, float* ronis, uint8_t* roni_valid,
                      float* copy_region) {
  Loader* l = static_cast<Loader*>(handle);
  auto b = l->next();
  if (!b) {
    g_last_error = l->error();
    return -1;
  }
  if (!b->image_u8.empty()) {
    g_last_error = "loader was created with emit_uint8; use mscnn_loader_next_u8";
    return -1;
  }
  std::memcpy(image, b->image.data(), b->image.size() * sizeof(float));
  std::memcpy(gt_boxes, b->gt_boxes.data(),
              b->gt_boxes.size() * sizeof(float));
  std::memcpy(gt_valid, b->gt_valid.data(), b->gt_valid.size());
  std::memcpy(ronis, b->ronis.data(), b->ronis.size() * sizeof(float));
  std::memcpy(roni_valid, b->roni_valid.data(), b->roni_valid.size());
  std::memcpy(copy_region, b->copy_region.data(),
              b->copy_region.size() * sizeof(float));
  return 0;
}

// uint8-image variant of mscnn_loader_next (emit_uint8 loaders only).
int mscnn_loader_next_u8(void* handle, uint8_t* image, float* gt_boxes,
                         uint8_t* gt_valid, float* ronis,
                         uint8_t* roni_valid, float* copy_region) {
  Loader* l = static_cast<Loader*>(handle);
  auto b = l->next();
  if (!b) {
    g_last_error = l->error();
    return -1;
  }
  if (b->image_u8.empty()) {
    g_last_error = "loader was not created with emit_uint8";
    return -1;
  }
  std::memcpy(image, b->image_u8.data(), b->image_u8.size());
  std::memcpy(gt_boxes, b->gt_boxes.data(),
              b->gt_boxes.size() * sizeof(float));
  std::memcpy(gt_valid, b->gt_valid.data(), b->gt_valid.size());
  std::memcpy(ronis, b->ronis.data(), b->ronis.size() * sizeof(float));
  std::memcpy(roni_valid, b->roni_valid.data(), b->roni_valid.size());
  std::memcpy(copy_region, b->copy_region.data(),
              b->copy_region.size() * sizeof(float));
  return 0;
}

void mscnn_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

const char* mscnn_loader_last_error() { return g_last_error.c_str(); }

}  // extern "C"
