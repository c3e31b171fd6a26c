// stgcma host-IO native library: WAV decode + mono downmix + DC removal +
// fixed-grid segment slicing, plus JPEG/PNG frame decode (libjpeg-turbo /
// libpng) with optional bilinear resize — multithreaded over a batch of
// files.
//
// This is the host-side hot path of the data loader (the reference leans on
// torchaudio's C++ decoder — AVE/dataloader.py:208 — and PIL/torchvision
// image decode — AVE/dataloader.py:304-344; here decode feeds the
// TPU-resident fbank/transform frontend). Exposed as a C ABI consumed via
// ctypes (stgcma_tpu/data/native_io.py); pure-Python PIL/scipy fallback when
// absent.
//
// Build: make -C native   (produces libstgcma_host.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
  bool ok = false;
};

uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

// Minimal RIFF/WAVE parser: PCM 8/16/24/32-bit and float32, any channel count
// (downmixed to mono by averaging, matching waveform.mean(dim=0)).
WavData decode_wav(const char* path) {
  WavData out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44) { fclose(f); return out; }
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != size_t(size)) { fclose(f); return out; }
  fclose(f);

  if (memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return out;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= size_t(size)) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (!memcmp(hdr, "fmt ", 4) && chunk_len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && chunk_len >= 40)  // WAVE_FORMAT_EXTENSIBLE
        fmt = rd_u16(body + 24);
    } else if (!memcmp(hdr, "data", 4)) {
      data = body;
      data_len = std::min<uint32_t>(chunk_len, uint32_t(size - pos - 8));
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!data || !channels || !rate) return out;

  size_t bytes_per = bits / 8;
  if (!bytes_per) return out;
  size_t n_frames = data_len / (bytes_per * channels);
  out.samples.resize(n_frames);
  const float inv_ch = 1.0f / channels;

  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = data + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        v = int16_t(s[0] | (s[1] << 8)) / 32768.0f;
      } else if (bits == 32) {
        v = int32_t(rd_u32(s)) / 2147483648.0f;
      } else if (bits == 24) {
        int32_t raw = (s[0] << 8) | (s[1] << 16) | (int32_t(s[2]) << 24);
        v = (raw >> 8) / 8388608.0f;
      } else if (bits == 8) {
        v = (int(s[0]) - 128) / 128.0f;
      }
      acc += v;
    }
    out.samples[i] = acc * inv_ch;
  }
  out.sample_rate = int(rate);
  out.ok = true;
  return out;
}

// Slice one decoded waveform into `num_segments` windows of `seg_samples`,
// zero-padded, with linspace starts over [0, L - seg - margin] (the
// reference's per-second slicing grid), after removing the global mean.
void segment_into(const WavData& w, float* dst, int num_segments,
                  int seg_samples, float margin_s) {
  const int64_t L = int64_t(w.samples.size());
  double mean = 0.0;
  for (float v : w.samples) mean += v;
  mean = L ? mean / double(L) : 0.0;

  int64_t hi = L - (seg_samples + int64_t(margin_s * w.sample_rate));
  if (hi < 0) hi = 0;
  for (int s = 0; s < num_segments; ++s) {
    int64_t start = num_segments > 1 ? int64_t(double(hi) * s / (num_segments - 1))
                                     : 0;
    float* seg = dst + int64_t(s) * seg_samples;
    for (int i = 0; i < seg_samples; ++i) {
      int64_t idx = start + i;
      seg[i] = idx < L ? float(w.samples[idx] - mean) : 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// image decode (JPEG via libjpeg-turbo, PNG via libpng) -> RGB8
// ---------------------------------------------------------------------------

struct ImageData {
  std::vector<uint8_t> rgb;  // H*W*3
  int w = 0, h = 0;
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

ImageData decode_jpeg(const uint8_t* data, size_t len) {
  ImageData out;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.rgb.resize(size_t(out.w) * out.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.rgb.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

ImageData decode_png(const uint8_t* data, size_t len) {
  ImageData out;
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data, len)) return out;
  img.format = PNG_FORMAT_RGB;  // palette/gray/alpha all normalized to RGB8
  out.w = img.width;
  out.h = img.height;
  out.rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out.rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    out.ok = false;
    return out;
  }
  out.ok = true;
  return out;
}

ImageData decode_image_file(const char* path) {
  ImageData out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 8) { fclose(f); return out; }
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != size_t(size)) { fclose(f); return out; }
  fclose(f);
  if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), size);
  if (buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G')
    return decode_png(buf.data(), size);
  return out;
}

// PIL-equivalent BILINEAR resize: separable triangle filter whose support
// scales with the downscale ratio (antialiased, matching PIL's resample
// semantics — the reference's transforms resize through PIL). The TPU
// pipeline does the protocol-accurate resizes; this only runs when a decoded
// frame's native size differs from the requested buffer size.
struct ResampleTaps {
  std::vector<int> lo;        // per-output-pixel first input index
  std::vector<int> n;         // taps per output pixel
  std::vector<float> w;       // flattened weights, max_taps stride
  int max_taps = 0;
};

ResampleTaps triangle_taps(int in_size, int out_size) {
  ResampleTaps t;
  double scale = double(in_size) / out_size;
  double support = scale < 1.0 ? 1.0 : scale;  // triangle support 1, scaled
  t.max_taps = int(ceil(support * 2)) + 2;
  t.lo.resize(out_size);
  t.n.resize(out_size);
  t.w.assign(size_t(out_size) * t.max_taps, 0.f);
  double inv = scale < 1.0 ? 1.0 : 1.0 / scale;
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, int(center - support + 0.5));
    int hi = std::min(in_size, int(center + support + 0.5));
    double sum = 0.0;
    for (int k = lo; k < hi; ++k) {
      double x = (k - center + 0.5) * inv;
      double wt = x < 0 ? 1.0 + x : 1.0 - x;  // triangle(|x|), support 1
      if (wt < 0) wt = 0;
      t.w[size_t(i) * t.max_taps + (k - lo)] = float(wt);
      sum += wt;
    }
    if (sum > 0)
      for (int k = 0; k < hi - lo; ++k)
        t.w[size_t(i) * t.max_taps + k] = float(
            t.w[size_t(i) * t.max_taps + k] / sum);
    t.lo[i] = lo;
    t.n[i] = hi - lo;
  }
  return t;
}

void resize_bilinear_rgb(const ImageData& src, uint8_t* dst, int th, int tw) {
  ResampleTaps tx = triangle_taps(src.w, tw);
  ResampleTaps ty = triangle_taps(src.h, th);
  // horizontal pass: (h, w, 3) u8 -> (h, tw, 3) f32
  std::vector<float> tmp(size_t(src.h) * tw * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.rgb.data() + size_t(y) * src.w * 3;
    float* orow = tmp.data() + size_t(y) * tw * 3;
    for (int x = 0; x < tw; ++x) {
      float acc[3] = {0, 0, 0};
      const float* wt = tx.w.data() + size_t(x) * tx.max_taps;
      for (int k = 0; k < tx.n[x]; ++k) {
        const uint8_t* p = row + size_t(tx.lo[x] + k) * 3;
        acc[0] += wt[k] * p[0];
        acc[1] += wt[k] * p[1];
        acc[2] += wt[k] * p[2];
      }
      orow[x * 3] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass -> u8
  for (int y = 0; y < th; ++y) {
    const float* wt = ty.w.data() + size_t(y) * ty.max_taps;
    uint8_t* orow = dst + size_t(y) * tw * 3;
    for (int x = 0; x < tw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < ty.n[y]; ++k)
        acc += wt[k] * tmp[size_t(ty.lo[y] + k) * tw * 3 + x];
      orow[x] = uint8_t(std::min(std::max(acc + 0.5f, 0.0f), 255.0f));
    }
  }
}

}  // namespace

extern "C" {

// Decode a batch of jpg/png files into a packed (batch, th, tw, 3) uint8
// buffer, multithreaded. Frames whose native size already matches (th, tw)
// are copied verbatim (bit-exact vs PIL — both use libjpeg-turbo/libpng);
// others are bilinearly resized on the host. Failed decodes are zero-filled
// and flagged 0 in ok_flags. Returns the number of successful decodes.
int stgcma_decode_image_batch(const char** paths, int batch, int th, int tw,
                              uint8_t* out, uint8_t* ok_flags,
                              int num_threads) {
  std::atomic<int> next(0), n_ok(0);
  const size_t per_item = size_t(th) * tw * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      ImageData im = decode_image_file(paths[i]);
      uint8_t* dst = out + size_t(i) * per_item;
      if (im.ok) {
        if (im.w == tw && im.h == th)
          memcpy(dst, im.rgb.data(), per_item);
        else
          resize_bilinear_rgb(im, dst, th, tw);
        ok_flags[i] = 1;
        n_ok.fetch_add(1);
      } else {
        memset(dst, 0, per_item);
        ok_flags[i] = 0;
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, batch));
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return n_ok.load();
}

// Single-image decode at native size. Writes RGB8 into out (capacity
// max_bytes); returns bytes written, 0 on decode failure, or -needed if the
// buffer is too small. *w/*h receive the native size.
int64_t stgcma_decode_image(const char* path, uint8_t* out, int64_t max_bytes,
                            int* w, int* h) {
  ImageData im = decode_image_file(path);
  if (!im.ok) return 0;
  *w = im.w;
  *h = im.h;
  int64_t need = int64_t(im.rgb.size());
  if (need > max_bytes) return -need;
  memcpy(out, im.rgb.data(), need);
  return need;
}

// Decode a batch of wav files into (batch, num_segments, seg_samples) float32.
// Returns the number of successfully decoded files; failed entries are
// zero-filled and flagged in `ok_flags` (callers substitute fallback values,
// mirroring the reference's corrupted-sample handling, AVE/dataloader.py:246).
int stgcma_decode_wav_batch(const char** paths, int batch,
                            int num_segments, int seg_samples, float margin_s,
                            float* out, uint8_t* ok_flags, int num_threads) {
  std::atomic<int> next(0), n_ok(0);
  const int64_t per_item = int64_t(num_segments) * seg_samples;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      WavData w = decode_wav(paths[i]);
      float* dst = out + i * per_item;
      if (w.ok && !w.samples.empty()) {
        segment_into(w, dst, num_segments, seg_samples, margin_s);
        ok_flags[i] = 1;
        n_ok.fetch_add(1);
      } else {
        memset(dst, 0, per_item * sizeof(float));
        ok_flags[i] = 0;
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, batch));
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return n_ok.load();
}

// Single-file decode: returns sample count written (<= max_samples),
// 0 on failure; *sample_rate receives the file's rate.
int64_t stgcma_decode_wav(const char* path, float* out, int64_t max_samples,
                          int* sample_rate) {
  WavData w = decode_wav(path);
  if (!w.ok) return 0;
  int64_t n = std::min<int64_t>(w.samples.size(), max_samples);
  memcpy(out, w.samples.data(), n * sizeof(float));
  *sample_rate = w.sample_rate;
  return n;
}

}  // extern "C"
