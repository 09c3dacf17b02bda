// Native audio decode/resample kernels for the avex-tpu data loader.
//
// The reference delegates audio IO to torchaudio/soundfile (C/C++ under the
// hood); this module is the avex-tpu equivalent: a small, dependency-free
// C++ library exposed over a C ABI and loaded via ctypes. It handles the
// host-side hot loop of dataset reading — RIFF/WAV parsing (PCM16/24/32 +
// float32), channel mixdown, and windowed-sinc resampling — so Python never
// touches samples one by one.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_native.cpp -o libavexaudio.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Parse a RIFF/WAV buffer. Returns 0 on success.
// On success *sample_rate / *channels / *frames describe the data; when
// `out` is non-null it receives frames*channels float32 samples in [-1, 1]
// (caller sizes it from a first metadata-only call with out == nullptr).
int avex_decode_wav(const uint8_t* data, int64_t len,
                    float* out, int64_t out_capacity,
                    int32_t* sample_rate, int32_t* channels, int64_t* frames) {
    if (len < 44 || std::memcmp(data, "RIFF", 4) != 0 || std::memcmp(data + 8, "WAVE", 4) != 0)
        return -1;

    int64_t pos = 12;
    int16_t audio_format = 0, num_channels = 0, bits = 0;
    int32_t rate = 0;
    const uint8_t* pcm = nullptr;
    int64_t pcm_len = 0;

    while (pos + 8 <= len) {
        const uint8_t* chunk_id = data + pos;
        uint32_t chunk_size;
        std::memcpy(&chunk_size, data + pos + 4, 4);
        const uint8_t* body = data + pos + 8;
        if (pos + 8 + (int64_t)chunk_size > len) chunk_size = (uint32_t)(len - pos - 8);

        if (std::memcmp(chunk_id, "fmt ", 4) == 0 && chunk_size >= 16) {
            std::memcpy(&audio_format, body, 2);
            std::memcpy(&num_channels, body + 2, 2);
            std::memcpy(&rate, body + 4, 4);
            std::memcpy(&bits, body + 14, 2);
            if (audio_format == (int16_t)0xFFFE && chunk_size >= 40) {
                // WAVE_FORMAT_EXTENSIBLE: true format lives in the GUID.
                std::memcpy(&audio_format, body + 24, 2);
            }
        } else if (std::memcmp(chunk_id, "data", 4) == 0) {
            pcm = body;
            pcm_len = chunk_size;
        }
        pos += 8 + chunk_size + (chunk_size & 1);  // chunks are word-aligned
    }

    if (!pcm || num_channels <= 0 || rate <= 0) return -2;
    const int bytes_per_sample = bits / 8;
    if (bytes_per_sample <= 0) return -3;
    const int64_t total_samples = pcm_len / bytes_per_sample;
    const int64_t n_frames = total_samples / num_channels;

    *sample_rate = rate;
    *channels = num_channels;
    *frames = n_frames;
    if (out == nullptr) return 0;  // metadata-only query
    if (out_capacity < n_frames * num_channels) return -4;

    if (audio_format == 1 && bits == 16) {
        const int16_t* src = reinterpret_cast<const int16_t*>(pcm);
        const float scale = 1.0f / 32768.0f;
        for (int64_t i = 0; i < total_samples; ++i) out[i] = src[i] * scale;
    } else if (audio_format == 1 && bits == 32) {
        const int32_t* src = reinterpret_cast<const int32_t*>(pcm);
        const float scale = 1.0f / 2147483648.0f;
        for (int64_t i = 0; i < total_samples; ++i) out[i] = src[i] * scale;
    } else if (audio_format == 1 && bits == 24) {
        const float scale = 1.0f / 8388608.0f;
        for (int64_t i = 0; i < total_samples; ++i) {
            const uint8_t* p = pcm + 3 * i;
            int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16));
            if (v & 0x800000) v |= ~0xFFFFFF;  // sign-extend
            out[i] = v * scale;
        }
    } else if (audio_format == 3 && bits == 32) {
        std::memcpy(out, pcm, total_samples * sizeof(float));
    } else {
        return -5;  // unsupported encoding
    }
    return 0;
}

// Average interleaved channels into mono.
void avex_mix_to_mono(const float* in, int64_t frames, int32_t channels, float* out) {
    if (channels == 1) { std::memcpy(out, in, frames * sizeof(float)); return; }
    const float inv = 1.0f / channels;
    for (int64_t f = 0; f < frames; ++f) {
        float acc = 0.0f;
        for (int32_t c = 0; c < channels; ++c) acc += in[f * channels + c];
        out[f] = acc * inv;
    }
}

// Windowed-sinc (Hann, `taps` half-width) resampler, mono float32.
// n_out should be floor(n_in * sr_out / sr_in).
void avex_resample(const float* in, int64_t n_in, int32_t sr_in,
                   float* out, int64_t n_out, int32_t sr_out, int32_t taps) {
    if (sr_in == sr_out) {
        std::memcpy(out, in, std::min(n_in, n_out) * sizeof(float));
        return;
    }
    const double ratio = (double)sr_in / (double)sr_out;
    // Low-pass at the lower Nyquist when downsampling.
    const double cutoff = ratio > 1.0 ? 1.0 / ratio : 1.0;
    const double support = taps;
    for (int64_t i = 0; i < n_out; ++i) {
        const double center = i * ratio;
        const int64_t lo = std::max<int64_t>(0, (int64_t)std::ceil(center - support / cutoff));
        const int64_t hi = std::min<int64_t>(n_in - 1, (int64_t)std::floor(center + support / cutoff));
        double acc = 0.0, wsum = 0.0;
        for (int64_t j = lo; j <= hi; ++j) {
            const double x = (j - center) * cutoff;
            double w;
            if (std::fabs(x) < 1e-9) {
                w = 1.0;
            } else if (std::fabs(x) >= support) {
                continue;
            } else {
                const double px = M_PI * x;
                const double sinc = std::sin(px) / px;
                const double hann = 0.5 + 0.5 * std::cos(px / support);
                w = sinc * hann;
            }
            acc += in[j] * w;
            wsum += w;
        }
        out[i] = wsum > 1e-12 ? (float)(acc / wsum) : 0.0f;
    }
}

}  // extern "C"
