// Native audio front-end: WAV decode, polyphase resample, batched crop fill.
//
// The reference's data path leans on torchaudio's native sox_io decoder and
// Resample kernels inside DataLoader worker processes
// (/root/reference/data.py:13-15,84-85). This module is the framework's
// native equivalent: PCM16/24/32 WAV decode, windowed-sinc polyphase
// resampling (kernel supplied by the Python side so host/device paths share
// coefficients), and a pthread-parallel batch builder that decodes, resamples,
// crops/pads and writes straight into the caller's pinned numpy buffer —
// one C call per training batch.
//
// Build: g++ -O2 -shared -fPIC -pthread -o libaudioio.so audioio.cc

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

bool read_wav(const char* path, Wav* out, bool normalize) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto rd_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto rd_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };
  char tag[4];
  uint32_t riff_size;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) ||
      !rd_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
      std::memcmp(tag, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  bool got_fmt = false, got_data = false;
  std::vector<uint8_t> data;
  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t size;
    if (!rd_u32(&size)) break;
    if (!std::memcmp(tag, "fmt ", 4)) {
      uint32_t byte_rate;
      uint16_t block_align;
      if (!rd_u16(&format) || !rd_u16(&channels) || !rd_u32(&sr) ||
          !rd_u32(&byte_rate) || !rd_u16(&block_align) || !rd_u16(&bits)) break;
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      got_fmt = true;
    } else if (!std::memcmp(tag, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) break;
      got_data = true;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (got_fmt && got_data) break;
  }
  std::fclose(f);
  if (!got_fmt || !got_data || channels == 0) return false;
  if (format != 1 && format != 0xFFFE) return false;  // PCM only
  const size_t bytes_per = bits / 8;
  const size_t n_frames = data.size() / (bytes_per * channels);
  out->samples.resize(n_frames);
  out->sample_rate = int(sr);
  const double scale = normalize ? std::pow(2.0, bits - 1) : 1.0;
  for (size_t i = 0; i < n_frames; i++) {
    double acc = 0;
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = data.data() + (i * channels + c) * bytes_per;
      int32_t v = 0;
      if (bits == 16) {
        v = int16_t(p[0] | (p[1] << 8));
      } else if (bits == 24) {
        v = (p[0] << 8 | p[1] << 16 | p[2] << 24) >> 8;
      } else if (bits == 32) {
        v = int32_t(p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24));
      } else {
        return false;
      }
      acc += double(v);
    }
    out->samples[i] = float(acc / channels / scale);
  }
  return true;
}

// polyphase resample with a caller-provided kernel bank
// kernels: (n_phases, klen) row-major; input padded (width, width+orig)
std::vector<float> resample(const std::vector<float>& x, const float* kernels,
                            int n_phases, int klen, int width, int orig) {
  const int64_t n = int64_t(x.size());
  const int64_t target = (n_phases * n + orig - 1) / orig;
  std::vector<float> xp(n + width + width + orig, 0.0f);
  std::memcpy(xp.data() + width, x.data(), n * sizeof(float));
  const int64_t n_frames = (int64_t(xp.size()) - klen) / orig + 1;
  std::vector<float> out;
  out.reserve(n_frames * n_phases);
  for (int64_t t = 0; t < n_frames; t++) {
    const float* base = xp.data() + t * orig;
    for (int ph = 0; ph < n_phases; ph++) {
      const float* k = kernels + ph * klen;
      double acc = 0;
      for (int i = 0; i < klen; i++) acc += double(base[i]) * double(k[i]);
      out.push_back(float(acc));
    }
  }
  if (int64_t(out.size()) > target) out.resize(target);
  return out;
}

struct BatchError {
  bool failed = false;
  char msg[256] = {0};
};

}  // namespace

extern "C" {

// Decode one wav to caller buffer (call with out=null to query length).
// Returns sample count, or -1 on error. Output resampled when kernels given.
int64_t audioio_load(const char* path, int normalize, const float* kernels,
                     int n_phases, int klen, int width, int orig,
                     float* out, int64_t out_cap) {
  Wav w;
  if (!read_wav(path, &w, normalize != 0)) return -1;
  std::vector<float>* result = &w.samples;
  std::vector<float> res;
  if (kernels != nullptr && n_phases > 0) {
    res = resample(w.samples, kernels, n_phases, klen, width, orig);
    result = &res;
  }
  if (out != nullptr) {
    int64_t n = std::min<int64_t>(result->size(), out_cap);
    std::memcpy(out, result->data(), n * sizeof(float));
  }
  return int64_t(result->size());
}

// Fill a training batch: for each item decode clean+noisy, resample, crop
// [start, start+crop) (right-pad zeros when short), write into
// clean_out/noisy_out (batch, crop) row-major. paths are
// null-separated "clean\0noisy\0" pairs via two arrays of char*.
// starts: per-item crop offsets (already sampled by the host RNG; -1 means
// "use 0"). Returns 0 on success, -(1+item) on failure of that item.
int audioio_fill_batch(const char** clean_paths, const char** noisy_paths,
                       const int64_t* starts, int batch, int64_t crop,
                       int normalize, const float* kernels, int n_phases,
                       int klen, int width, int orig, int n_threads,
                       float* clean_out, float* noisy_out) {
  std::vector<int> errors(batch, 0);
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; i++) {
      Wav wc, wn;
      if (!read_wav(clean_paths[i], &wc, normalize != 0) ||
          !read_wav(noisy_paths[i], &wn, normalize != 0)) {
        errors[i] = 1;
        continue;
      }
      std::vector<float> c = wc.samples, n = wn.samples;
      if (kernels != nullptr && n_phases > 0) {
        c = resample(c, kernels, n_phases, klen, width, orig);
        n = resample(n, kernels, n_phases, klen, width, orig);
      }
      if (c.size() != n.size()) {
        errors[i] = 2;
        continue;
      }
      int64_t start = starts ? starts[i] : 0;
      if (start < 0) start = 0;
      float* co = clean_out + int64_t(i) * crop;
      float* no = noisy_out + int64_t(i) * crop;
      for (int64_t j = 0; j < crop; j++) {
        int64_t s = start + j;
        bool in = s < int64_t(c.size());
        co[j] = in ? c[s] : 0.0f;
        no[j] = in ? n[s] : 0.0f;
        if (in && (!std::isfinite(c[s]) || !std::isfinite(n[s]))) errors[i] = 3;
      }
    }
  };
  n_threads = std::max(1, std::min(n_threads, batch));
  std::vector<std::thread> threads;
  int per = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int b = t * per, e = std::min(batch, b + per);
    if (b < e) threads.emplace_back(work, b, e);
  }
  for (auto& t : threads) t.join();
  for (int i = 0; i < batch; i++)
    if (errors[i]) return -(1 + i);
  return 0;
}

int audioio_version(void) { return 1; }

}  // extern "C"
