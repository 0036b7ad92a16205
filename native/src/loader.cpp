// Native asynchronous image loader: PNG/PGM grayscale decode + a
// multithreaded prefetch queue.
//
// TPU-native equivalent of the reference's IO-side runtime — the ROS
// image callback queue + MsgSynchronizer feeding Tracking
// (/root/reference/Examples/ROS/ORB_VIO/src/ros_vio.cc:122-162,
//  src/MsgSync/MsgSynchronizer.cc:70-166): decode happens off the
// critical path so the tracking step never waits on host IO. Ordered
// delivery is preserved (frame i is returned before frame i+1) while up
// to `n_threads` decodes run ahead, bounded by `capacity` slots.
//
// C ABI (extern "C") for ctypes; handles are opaque. No global state.

#include <png.h>

#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<float> px;  // grayscale [0,255]
  bool ok = false;
};

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

bool decode_png(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize everything to 8-bit grayscale.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB ||
      color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // ITU-R BT.709 weights
  png_read_update_info(png, info);

  std::vector<uint8_t> row(png_get_rowbytes(png, info));
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->px.resize(static_cast<size_t>(h) * w);
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->px.data() + static_cast<size_t>(y) * w;
    for (png_uint_32 x = 0; x < w; ++x) dst[x] = static_cast<float>(row[x]);
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  out->ok = true;
  return true;
}

// Binary PGM (P5), 8-bit — TUM depth/gray fallback format.
bool decode_pgm(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  char magic[3] = {0};
  int w = 0, h = 0, maxv = 0;
  if (std::fscanf(fp, "%2s", magic) != 1 || std::strcmp(magic, "P5") != 0) {
    std::fclose(fp);
    return false;
  }
  // skip whitespace/comments
  auto next_int = [&](int* v) {
    int c;
    while ((c = std::fgetc(fp)) != EOF) {
      if (c == '#') {
        while ((c = std::fgetc(fp)) != EOF && c != '\n') {
        }
      } else if (!std::isspace(c)) {
        std::ungetc(c, fp);
        return std::fscanf(fp, "%d", v) == 1;
      }
    }
    return false;
  };
  if (!next_int(&w) || !next_int(&h) || !next_int(&maxv) || maxv > 255) {
    std::fclose(fp);
    return false;
  }
  std::fgetc(fp);  // single whitespace after maxval
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h);
  if (std::fread(buf.data(), 1, buf.size(), fp) != buf.size()) {
    std::fclose(fp);
    return false;
  }
  std::fclose(fp);
  out->h = h;
  out->w = w;
  out->px.resize(buf.size());
  for (size_t i = 0; i < buf.size(); ++i)
    out->px[i] = static_cast<float>(buf[i]);
  out->ok = true;
  return true;
}

bool decode_any(const std::string& path, Image* out) {
  if (decode_png(path.c_str(), out)) return true;
  return decode_pgm(path.c_str(), out);
}

// ---------------------------------------------------------------------------
// Prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int capacity;

  std::mutex mu;
  std::condition_variable cv_workers, cv_consumer;
  std::map<int, Image> ready;  // decoded, waiting for ordered delivery
  Image staged;                // delivered frame awaiting loader_fetch
  std::atomic<int> next_to_claim{0};
  int next_to_deliver = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_workers.notify_all();
    cv_consumer.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker() {
    for (;;) {
      int idx = next_to_claim.fetch_add(1);
      if (idx >= static_cast<int>(paths.size())) return;
      Image im;
      decode_any(paths[idx], &im);
      std::unique_lock<std::mutex> lk(mu);
      // Bound read-ahead: wait while the ready window is full and our
      // frame is far ahead of the consumer.
      cv_workers.wait(lk, [&] {
        return stop || idx < next_to_deliver + capacity;
      });
      if (stop) return;
      ready.emplace(idx, std::move(im));
      cv_consumer.notify_all();
    }
  }

  // Blocks until frame `next_to_deliver` is decoded; returns it.
  bool next(Image* out) {
    std::unique_lock<std::mutex> lk(mu);
    int want = next_to_deliver;
    if (want >= static_cast<int>(paths.size())) return false;
    cv_consumer.wait(lk, [&] { return stop || ready.count(want) > 0; });
    if (stop) return false;
    *out = std::move(ready[want]);
    ready.erase(want);
    next_to_deliver = want + 1;
    cv_workers.notify_all();
    return true;
  }
};

}  // namespace

extern "C" {

// paths: '\n'-joined file list. Returns opaque handle.
void* loader_create(const char* paths, int n_threads, int capacity) {
  auto* L = new Loader();
  const char* p = paths;
  while (*p) {
    const char* e = std::strchr(p, '\n');
    size_t len = e ? static_cast<size_t>(e - p) : std::strlen(p);
    if (len) L->paths.emplace_back(p, len);
    p += len + (e ? 1 : 0);
  }
  L->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int loader_count(void* h) {
  return static_cast<int>(static_cast<Loader*>(h)->paths.size());
}

// Peek dims of the next frame then copy it out. Two-phase so the caller
// can allocate exactly; -1 when exhausted, 0 on decode failure. The frame
// is staged between the dims call and the fetch call.
int loader_next_dims(void* h, int* hw) {
  auto* L = static_cast<Loader*>(h);
  Image im;
  if (!L->next(&im)) return -1;
  hw[0] = im.h;
  hw[1] = im.w;
  int ok = im.ok ? 1 : 0;
  std::lock_guard<std::mutex> lk(L->mu);
  L->staged = std::move(im);
  return ok;
}

int loader_fetch(void* h, float* out, int h_out, int w_out) {
  auto* L = static_cast<Loader*>(h);
  std::lock_guard<std::mutex> lk(L->mu);
  Image& im = L->staged;
  if (!im.ok || im.h != h_out || im.w != w_out) return 0;
  std::memcpy(out, im.px.data(), sizeof(float) * im.px.size());
  im = Image();
  return 1;
}

// One-shot synchronous decode (no queue): probe dims, then decode into a
// caller-allocated buffer with decode_image.
int decode_image_dims(const char* path, int* hw) {
  Image im;
  if (!decode_any(path, &im)) return 0;
  hw[0] = im.h;
  hw[1] = im.w;
  return 1;
}

int decode_image(const char* path, float* out, int h, int w) {
  Image im;
  if (!decode_any(path, &im) || im.h != h || im.w != w) return 0;
  std::memcpy(out, im.px.data(), sizeof(float) * im.px.size());
  return 1;
}

void loader_free(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
