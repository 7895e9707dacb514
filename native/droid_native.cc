// droid_native — native host-side data pipeline for droid_slam_tpu.
//
// TPU-native counterpart of the reference's host data layer (cv2 decode +
// undistort/remap/resize inside the Python stream generators,
// /root/reference/demo.py:25-60, evaluation_scripts/test_*.py, and the
// torch DataLoader's C++ worker pool used by train.py). The TPU framework
// keeps device work in XLA; this file owns the host side: image decode
// (libjpeg/libpng), geometric remap (undistortion/stereo rectification via
// precomputed float maps), bilinear/nearest resize, and a multithreaded
// ordered prefetch pipeline so frame preprocessing overlaps device compute.
//
// Exposed as a plain C ABI consumed via ctypes
// (droid_slam_tpu/data/native_loader.py). No Python.h dependency.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -ljpeg -lpng -lz)

#include <cmath>
#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

// Decoded image: data is malloc'd; caller frees via dn_free.
struct DNImage {
  uint8_t* data;   // u8 RGB (channels=3) or u16 grayscale (channels=1)
  int32_t h, w, channels, bytes_per_channel;
};

static bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf), m = s.size();
  if (m < n) return false;
  for (size_t i = 0; i < n; i++)
    if (tolower(s[m - n + i]) != suf[i]) return false;
  return true;
}

// libjpeg's default error_exit calls exit(); install a longjmp handler so a
// truncated/corrupt JPEG returns failure instead of killing the process.
struct DNJpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void dn_jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(((DNJpegErr*)cinfo->err)->jb, 1);
}

static bool decode_jpeg(const char* path, DNImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  DNJpegErr jerr;
  uint8_t* volatile buf = nullptr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = dn_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  buf = (uint8_t*)malloc((size_t)h * w * 3);
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = buf + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  out->data = buf;
  out->h = h;
  out->w = w;
  out->channels = 3;
  out->bytes_per_channel = 1;
  return true;
}

static bool decode_png(const char* path, DNImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return false;
  }
  uint8_t* volatile pbuf = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    free(pbuf);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  bool is_depth16 = (depth == 16 && (color == PNG_COLOR_TYPE_GRAY));
  if (is_depth16) {
    png_set_swap(png);  // PNG is big-endian; we want host little-endian u16
  } else {
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
  }
  int passes = png_set_interlace_handling(png);
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  int ch = is_depth16 ? 1 : 3;
  int bpc = is_depth16 ? 2 : 1;
  uint8_t* buf = (uint8_t*)malloc((size_t)h * w * ch * bpc);
  pbuf = buf;
  // png_read_row keeps no C++ objects live across a libpng longjmp
  for (int p = 0; p < passes; p++)
    for (int y = 0; y < h; y++) png_read_row(png, buf + (size_t)y * rowbytes, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out->data = buf;
  out->h = h;
  out->w = w;
  out->channels = ch;
  out->bytes_per_channel = bpc;
  return true;
}

// Decode by extension. Returns 0 on success.
int dn_decode(const char* path, DNImage* out) {
  std::string p(path);
  bool ok = false;
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) ok = decode_jpeg(path, out);
  else if (has_suffix(p, ".png")) ok = decode_png(path, out);
  else { // try both
    ok = decode_png(path, out) || decode_jpeg(path, out);
  }
  return ok ? 0 : -1;
}

void dn_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// geometry: bilinear remap + resize
// ---------------------------------------------------------------------------

// Bilinear remap of u8 RGB: out[y, x] = src(mapx[y,x], mapy[y,x]); zero fill
// outside. Matches cv2.remap(..., INTER_LINEAR, BORDER_CONSTANT).
void dn_remap_u8(const uint8_t* src, int sh, int sw, const float* mapx,
                 const float* mapy, uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; y++) {
    for (int x = 0; x < dw; x++) {
      float fx = mapx[(size_t)y * dw + x];
      float fy = mapy[(size_t)y * dw + x];
      int ix = (int)floorf(fx), iy = (int)floorf(fy);
      float ax = fx - ix, ay = fy - iy;
      uint8_t* o = dst + ((size_t)y * dw + x) * 3;
      if (ix < -1 || iy < -1 || ix >= sw || iy >= sh) {
        o[0] = o[1] = o[2] = 0;
        continue;
      }
      for (int c = 0; c < 3; c++) {
        float acc = 0.f;
        for (int dy = 0; dy < 2; dy++) {
          int yy = iy + dy;
          if (yy < 0 || yy >= sh) continue;
          float wy = dy ? ay : 1.f - ay;
          for (int dx = 0; dx < 2; dx++) {
            int xx = ix + dx;
            if (xx < 0 || xx >= sw) continue;
            float wx = dx ? ax : 1.f - ax;
            acc += wy * wx * src[((size_t)yy * sw + xx) * 3 + c];
          }
        }
        float v = acc + 0.5f;
        o[c] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// Bilinear resize of u8 RGB (pixel-area mapping matching cv2.resize default).
void dn_resize_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                  int dw) {
  float sy = (float)sh / dh, sx = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int iy = (int)floorf(fy);
    float ay = fy - iy;
    int iy1 = iy + 1;
    int cy0 = iy < 0 ? 0 : (iy >= sh ? sh - 1 : iy);
    int cy1 = iy1 < 0 ? 0 : (iy1 >= sh ? sh - 1 : iy1);
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int ix = (int)floorf(fx);
      float ax = fx - ix;
      int ix1 = ix + 1;
      int cx0 = ix < 0 ? 0 : (ix >= sw ? sw - 1 : ix);
      int cx1 = ix1 < 0 ? 0 : (ix1 >= sw ? sw - 1 : ix1);
      const uint8_t* p00 = src + ((size_t)cy0 * sw + cx0) * 3;
      const uint8_t* p01 = src + ((size_t)cy0 * sw + cx1) * 3;
      const uint8_t* p10 = src + ((size_t)cy1 * sw + cx0) * 3;
      const uint8_t* p11 = src + ((size_t)cy1 * sw + cx1) * 3;
      uint8_t* o = dst + ((size_t)y * dw + x) * 3;
      for (int c = 0; c < 3; c++) {
        float v = (1 - ay) * ((1 - ax) * p00[c] + ax * p01[c]) +
                  ay * ((1 - ax) * p10[c] + ax * p11[c]);
        o[c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Nearest-neighbor resize of f32 single-channel (depth maps).
void dn_resize_nearest_f32(const float* src, int sh, int sw, float* dst,
                           int dh, int dw) {
  float sy = (float)sh / dh, sx = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    int yy = (int)((y + 0.5f) * sy);
    if (yy >= sh) yy = sh - 1;
    for (int x = 0; x < dw; x++) {
      int xx = (int)((x + 0.5f) * sx);
      if (xx >= sw) xx = sw - 1;
      dst[(size_t)y * dw + x] = src[(size_t)yy * sw + xx];
    }
  }
}

// ---------------------------------------------------------------------------
// threaded ordered prefetch pipeline
// ---------------------------------------------------------------------------
//
// Workers pull file indices, run decode → [remap] → [resize] → BGR? no —
// decode is already RGB → crop, and publish into an ordered slot table; the
// consumer pops frames strictly in submission order (bounded window so memory
// stays O(capacity)).

struct DNFrame {
  uint8_t* data = nullptr;  // u8 RGB [h, w, 3]
  int h = 0, w = 0;
  int status = -1;  // 0 ok
};

struct DNPipeline {
  std::vector<std::string> paths;
  // transform spec
  std::vector<float> mapx, mapy;  // optional remap at source size
  int remap_h = 0, remap_w = 0;   // map dims (== output of remap)
  int out_h = 0, out_w = 0;       // optional resize target (0 = keep)
  int crop_top = 0, crop_left = 0, crop_bottom = 0, crop_right = 0;

  std::vector<DNFrame> slots;
  std::vector<char> done;
  std::atomic<size_t> next_job{0};
  size_t next_pop = 0;
  size_t window = 32;  // max frames in flight ahead of the consumer
  std::mutex mu;
  std::condition_variable cv_done, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  ~DNPipeline() {
    stop = true;
    cv_space.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    for (auto& f : slots)
      if (f.data) free(f.data);
  }

  void run_worker() {
    for (;;) {
      size_t i = next_job.fetch_add(1);
      if (i >= paths.size() || stop) return;
      // bound how far ahead of the consumer we run
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop || i < next_pop + window; });
        if (stop) return;
      }
      DNFrame fr = process(paths[i]);
      {
        std::lock_guard<std::mutex> lk(mu);
        slots[i] = fr;
        done[i] = 1;
      }
      cv_done.notify_all();
    }
  }

  DNFrame process(const std::string& path) {
    DNFrame fr;
    DNImage img = {};  // zero-init: decode failure must not leave data dangling
    if (dn_decode(path.c_str(), &img) != 0 || img.channels != 3) {
      if (img.data) free(img.data);
      return fr;
    }
    uint8_t* cur = img.data;
    int h = img.h, w = img.w;
    if (!mapx.empty()) {
      uint8_t* out = (uint8_t*)malloc((size_t)remap_h * remap_w * 3);
      dn_remap_u8(cur, h, w, mapx.data(), mapy.data(), out, remap_h, remap_w);
      free(cur);
      cur = out;
      h = remap_h;
      w = remap_w;
    }
    if (out_h > 0 && (out_h != h || out_w != w)) {
      uint8_t* out = (uint8_t*)malloc((size_t)out_h * out_w * 3);
      dn_resize_u8(cur, h, w, out, out_h, out_w);
      free(cur);
      cur = out;
      h = out_h;
      w = out_w;
    }
    if (crop_top || crop_left || crop_bottom || crop_right) {
      int nh = h - crop_top - crop_bottom, nw = w - crop_left - crop_right;
      uint8_t* out = (uint8_t*)malloc((size_t)nh * nw * 3);
      for (int y = 0; y < nh; y++)
        memcpy(out + (size_t)y * nw * 3,
               cur + ((size_t)(y + crop_top) * w + crop_left) * 3,
               (size_t)nw * 3);
      free(cur);
      cur = out;
      h = nh;
      w = nw;
    }
    fr.data = cur;
    fr.h = h;
    fr.w = w;
    fr.status = 0;
    return fr;
  }
};

// Create a pipeline. paths: '\n'-joined file list. mapx/mapy may be null.
void* dn_pipeline_create(const char* paths_joined, int n_paths,
                         const float* mapx, const float* mapy, int remap_h,
                         int remap_w, int out_h, int out_w, int crop_top,
                         int crop_left, int crop_bottom, int crop_right,
                         int n_threads, int window) {
  auto* p = new DNPipeline();
  const char* s = paths_joined;
  for (int i = 0; i < n_paths; i++) {
    const char* e = strchr(s, '\n');
    if (!e) e = s + strlen(s);
    p->paths.emplace_back(s, e - s);
    s = (*e) ? e + 1 : e;
  }
  if (mapx && mapy) {
    p->mapx.assign(mapx, mapx + (size_t)remap_h * remap_w);
    p->mapy.assign(mapy, mapy + (size_t)remap_h * remap_w);
    p->remap_h = remap_h;
    p->remap_w = remap_w;
  }
  p->out_h = out_h;
  p->out_w = out_w;
  p->crop_top = crop_top;
  p->crop_left = crop_left;
  p->crop_bottom = crop_bottom;
  p->crop_right = crop_right;
  p->window = window > 0 ? window : 32;
  p->slots.resize(p->paths.size());
  p->done.assign(p->paths.size(), 0);
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; i++)
    p->workers.emplace_back([p] { p->run_worker(); });
  return p;
}

// Pop the next frame in submission order into caller buffer (must be at
// least h*w*3; query dims first with dn_pipeline_peek). Returns 0 ok,
// -1 decode error, -2 end of stream.
int dn_pipeline_peek(void* hp, int* h, int* w) {
  auto* p = (DNPipeline*)hp;
  if (p->next_pop >= p->paths.size()) return -2;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done[p->next_pop] != 0; });
  DNFrame& fr = p->slots[p->next_pop];
  if (fr.status != 0) return -1;
  *h = fr.h;
  *w = fr.w;
  return 0;
}

int dn_pipeline_pop(void* hp, uint8_t* out) {
  auto* p = (DNPipeline*)hp;
  if (p->next_pop >= p->paths.size()) return -2;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done[p->next_pop] != 0; });
  DNFrame& fr = p->slots[p->next_pop];
  int status = fr.status;
  if (status == 0) memcpy(out, fr.data, (size_t)fr.h * fr.w * 3);
  if (fr.data) {
    free(fr.data);
    fr.data = nullptr;
  }
  p->next_pop++;
  lk.unlock();
  p->cv_space.notify_all();
  return status;
}

void dn_pipeline_destroy(void* hp) { delete (DNPipeline*)hp; }

}  // extern "C"
