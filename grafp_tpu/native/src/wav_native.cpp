// Native audio host ops: RIFF/WAVE decode + windowed-sinc resample.
//
// The torchaudio/libsox role of the reference (modules/data.py:45-57)
// on the host side of the TPU pipeline. Exposed as a C ABI consumed via
// ctypes (grafp_tpu/native/wav_native.py); the Python implementations in
// grafp_tpu/data are the correctness references and fallbacks.
//
// Decode supports PCM u8/s16/s24/s32 and IEEE float32/64, arbitrary
// channel counts, plain and WAVE_FORMAT_EXTENSIBLE headers.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success. Caller frees *out with wav_free.
// Layout: interleaved frames, (n_frames x n_channels) floats.
int wav_read(const char* path, float** out, int* n_frames, int* n_channels,
             int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize < 44) { fclose(f); return -2; }
  std::vector<uint8_t> data((size_t)fsize);
  if (fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f);
    return -3;
  }
  fclose(f);

  if (memcmp(data.data(), "RIFF", 4) || memcmp(data.data() + 8, "WAVE", 4))
    return -4;

  uint16_t audio_fmt = 0, n_ch = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* body = nullptr;
  uint32_t body_sz = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)fsize) {
    const uint8_t* cid = data.data() + pos;
    uint32_t csz;
    memcpy(&csz, data.data() + pos + 4, 4);
    if (pos + 8 + csz > (size_t)fsize) csz = (uint32_t)(fsize - pos - 8);
    const uint8_t* chunk = data.data() + pos + 8;
    if (!memcmp(cid, "fmt ", 4) && csz >= 16) {
      memcpy(&audio_fmt, chunk, 2);
      memcpy(&n_ch, chunk + 2, 2);
      memcpy(&sr, chunk + 4, 4);
      memcpy(&bits, chunk + 14, 2);
      if (audio_fmt == 0xFFFE && csz >= 40) memcpy(&audio_fmt, chunk + 24, 2);
    } else if (!memcmp(cid, "data", 4)) {
      body = chunk;
      body_sz = csz;
    }
    pos += 8 + csz + (csz & 1);
  }
  if (!body || !sr || !n_ch) return -5;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return -6;
  size_t total = body_sz / (bytes_per * n_ch);
  float* buf = (float*)malloc(sizeof(float) * total * n_ch);
  if (!buf) return -7;

  size_t n = total * n_ch;
  if (audio_fmt == 3 && bits == 32) {
    memcpy(buf, body, n * 4);
  } else if (audio_fmt == 3 && bits == 64) {
    for (size_t i = 0; i < n; i++) {
      double v;
      memcpy(&v, body + i * 8, 8);
      buf[i] = (float)v;
    }
  } else if (bits == 16) {
    const int16_t* p = (const int16_t*)body;
    for (size_t i = 0; i < n; i++) buf[i] = p[i] / 32768.0f;
  } else if (bits == 8) {
    for (size_t i = 0; i < n; i++) buf[i] = (body[i] - 128) / 128.0f;
  } else if (bits == 24) {
    for (size_t i = 0; i < n; i++) {
      int32_t v = body[i * 3] | (body[i * 3 + 1] << 8) | (body[i * 3 + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      buf[i] = v / 8388608.0f;
    }
  } else if (bits == 32) {
    const int32_t* p = (const int32_t*)body;
    for (size_t i = 0; i < n; i++) buf[i] = (float)(p[i] / 2147483648.0);
  } else {
    free(buf);
    return -8;
  }

  *out = buf;
  *n_frames = (int)total;
  *n_channels = (int)n_ch;
  *sample_rate = (int)sr;
  return 0;
}

void wav_free(float* p) { free(p); }

// Windowed-sinc polyphase resample, same kernel as
// grafp_tpu/data/resample.py (torchaudio sinc_interp_hann,
// lowpass_filter_width=6, rolloff=0.99). orig/new must be gcd-reduced
// by the caller. Output buffer must hold ceil(n * new / orig) floats.
int resample_sinc(const float* x, int n, int orig, int new_freq, float* out,
                  int out_cap) {
  const int lp = 6;
  const double rolloff = 0.99;
  double base_freq = (orig < new_freq ? orig : new_freq) * rolloff;
  int width = (int)ceil(lp * orig / base_freq);
  int taps = 2 * width + orig;
  long target = (long)ceil((double)new_freq * n / orig);
  if (target > out_cap) return -1;

  // kernel bank: (new_freq, taps)
  std::vector<float> kern((size_t)new_freq * taps);
  double scale = base_freq / orig;
  for (int ph = 0; ph < new_freq; ph++) {
    for (int j = 0; j < taps; j++) {
      double idx = (double)(j - width) / orig;
      double t = -(double)ph / new_freq + idx;
      t *= base_freq;
      if (t < -lp) t = -lp;
      if (t > lp) t = lp;
      double w = cos(t * M_PI / lp / 2.0);
      w *= w;
      double tp = t * M_PI;
      double s = (tp == 0.0) ? 1.0 : sin(tp) / tp;
      kern[(size_t)ph * taps + j] = (float)(s * w * scale);
    }
  }

  // padded input: width zeros, signal, width+orig zeros
  std::vector<float> xp((size_t)n + 2 * width + orig, 0.0f);
  memcpy(xp.data() + width, x, sizeof(float) * n);

  long num_frames = ((long)xp.size() - taps) / orig + 1;
  long k = 0;
  for (long fr = 0; fr < num_frames && k < target; fr++) {
    const float* seg = xp.data() + fr * orig;
    for (int ph = 0; ph < new_freq && k < target; ph++, k++) {
      const float* kr = kern.data() + (size_t)ph * taps;
      double acc = 0.0;
      for (int j = 0; j < taps; j++) acc += (double)seg[j] * kr[j];
      out[k] = (float)acc;
    }
  }
  return (int)target;
}

}  // extern "C"
