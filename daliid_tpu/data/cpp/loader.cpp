// Native threaded JPEG ingest: decode + bicubic resize to a fixed shape.
//
// The reference feeds its models from 8 Python DataLoader worker processes
// doing PIL decode+resize (Person-ReID/getFeatures.py:52,
// train_encodersKIT.py:82-83). This is the C++ equivalent for the TPU
// runtime's host side: a std::thread pool decodes with libjpeg and
// resamples with a separable Keys bicubic (a = -0.5, support widened by the
// scale factor when minifying — the same strategy PIL's resize uses), writing
// straight into one preallocated uint8 HWC batch buffer.
//
// C ABI for ctypes. Build:
//   g++ -O3 -std=c++17 -shared -fPIC -o libloader.so loader.cpp -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Keys cubic kernel, a = -0.5 (PIL's BICUBIC filter).
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Separable resample of one axis: in (n_in) -> out (n_out), per row of a
// planar f32 buffer laid out [rows][n][channels].
void resample_axis(const float* src, float* dst, int rows, int n_in, int n_out,
                   int channels, int src_stride, int dst_stride) {
  const double scale = static_cast<double>(n_in) / n_out;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;

  std::vector<int> starts(n_out);
  std::vector<int> counts(n_out);
  std::vector<double> weights;
  std::vector<int> offsets(n_out);

  for (int xx = 0; xx < n_out; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min<double>(n_in, std::ceil(center + support)));
    offsets[xx] = static_cast<int>(weights.size());
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double w = cubic((x + 0.5 - center) / filterscale);
      weights.push_back(w);
      total += w;
    }
    if (total != 0.0) {
      for (size_t k = offsets[xx]; k < weights.size(); ++k) weights[k] /= total;
    }
    starts[xx] = xmin;
    counts[xx] = xmax - xmin;
  }

  for (int r = 0; r < rows; ++r) {
    const float* in_row = src + static_cast<size_t>(r) * src_stride;
    float* out_row = dst + static_cast<size_t>(r) * dst_stride;
    for (int xx = 0; xx < n_out; ++xx) {
      const double* w = nullptr;
      const int cnt = counts[xx];
      const int x0 = starts[xx];
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int k = 0; k < cnt; ++k) {
          acc += weights[offsets[xx] + k] * in_row[(x0 + k) * channels + c];
        }
        out_row[xx * channels + c] = static_cast<float>(acc);
      }
      (void)w;
    }
  }
}

int decode_one(const char* path, int out_h, int out_w, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;  // 3 after JCS_RGB
  std::vector<uint8_t> raw(static_cast<size_t>(w) * h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = raw.data() + static_cast<size_t>(cinfo.output_scanline) * w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (w == out_w && h == out_h) {
    for (size_t i = 0; i < raw.size(); ++i) out[i] = raw[i];
    return 0;
  }

  // f32 planar-interleaved resample: width pass then height pass
  std::vector<float> src_f(raw.begin(), raw.end());
  std::vector<float> mid(static_cast<size_t>(h) * out_w * ch);
  resample_axis(src_f.data(), mid.data(), h, w, out_w, ch, w * ch, out_w * ch);

  // height pass: operate on columns — transpose view by striding
  std::vector<float> mid_t(static_cast<size_t>(out_w) * h * ch);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < out_w; ++x)
      for (int c = 0; c < ch; ++c)
        mid_t[(static_cast<size_t>(x) * h + y) * ch + c] =
            mid[(static_cast<size_t>(y) * out_w + x) * ch + c];
  std::vector<float> out_t(static_cast<size_t>(out_w) * out_h * ch);
  resample_axis(mid_t.data(), out_t.data(), out_w, h, out_h, ch, h * ch, out_h * ch);

  for (int y = 0; y < out_h; ++y)
    for (int x = 0; x < out_w; ++x)
      for (int c = 0; c < ch; ++c) {
        float v = out_t[(static_cast<size_t>(x) * out_h + y) * ch + c];
        out[(static_cast<size_t>(y) * out_w + x) * ch + c] =
            static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, std::round(v))));
      }
  return 0;
}

}  // namespace

extern "C" {

// paths: n null-terminated strings; out: n * out_h * out_w * 3 uint8 buffer;
// statuses: n ints (0 = ok). Returns count of failures.
int decode_resize_batch(const char** paths, int64_t n, int out_h, int out_w,
                        uint8_t* out, int* statuses, int num_threads) {
  std::atomic<int64_t> next{0};
  std::atomic<int> failures{0};
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto work = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      const int rc = decode_one(paths[i], out_h, out_w, out + i * img_bytes);
      statuses[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };

  const int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
