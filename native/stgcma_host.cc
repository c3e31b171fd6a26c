// stgcma host-IO native library: WAV decode + mono downmix + DC removal +
// fixed-grid segment slicing, multithreaded over a batch of files.
//
// This is the host-side hot path of the data loader (the reference leans on
// torchaudio's C++ decoder — AVE/dataloader.py:208; here decode feeds the
// TPU-resident fbank frontend). Exposed as a C ABI consumed via ctypes
// (stgcma_tpu/data/native_io.py); pure-Python scipy fallback when absent.
//
// Build: make -C native   (produces libstgcma_host.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

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

}  // namespace

extern "C" {

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
