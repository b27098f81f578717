// oscen_host — native host-runtime for oscen_tpu.
//
// The reference implements its entire control runtime natively (Rust);
// here the host-side control plane — the code that runs per block on the
// CPU while the TPU renders — is C++: MIDI parsing, LRU voice allocation
// (reference voice_allocator.rs semantics), event packing/sorting, and the
// offline windowed-sinc asset resampler (reference asset/resample.rs).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: g++ -O3 -march=native -shared -fPIC -o _oscen_host.so oscen_host.cpp
//
// Python fallbacks exist for every entry point; tests assert parity.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ------------------------------------------------------------------- //
// MIDI parsing (reference midi.rs:147-171)
// kind: 0 = ignored, 1 = note-on, 2 = note-off
// ------------------------------------------------------------------- //
void oscen_parse_midi(const uint8_t* bytes, int32_t len, int32_t* kind,
                      int32_t* note, float* velocity) {
    *kind = 0;
    *note = 0;
    *velocity = 0.0f;
    if (len < 3) return;
    const uint8_t status = bytes[0] & 0xF0;
    if (status == 0x80) {
        *kind = 2;
        *note = bytes[1];
    } else if (status == 0x90) {
        if (bytes[2] == 0) {
            *kind = 2;  // note-on velocity 0 == note-off
            *note = bytes[1];
        } else {
            *kind = 1;
            *note = bytes[1];
            float v = (float)bytes[2] / 127.0f;
            *velocity = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        }
    }
}

// ------------------------------------------------------------------- //
// LRU voice allocator (reference voice_allocator.rs:44-136)
// ------------------------------------------------------------------- //
struct VoiceState {
    bool active = false;
    bool released = false;
    int32_t note = -1;
    uint64_t age = 0;
};

struct Allocator {
    std::vector<VoiceState> voices;
    uint64_t current_age = 0;
};

void* oscen_alloc_create(int32_t num_voices) {
    auto* a = new Allocator();
    a->voices.resize(num_voices);
    return a;
}

void oscen_alloc_destroy(void* p) { delete static_cast<Allocator*>(p); }

void oscen_alloc_reset(void* p) {
    auto* a = static_cast<Allocator*>(p);
    for (auto& v : a->voices) v = VoiceState{};
    a->current_age = 0;
}

int32_t oscen_alloc_note_on(void* p, int32_t note) {
    auto* a = static_cast<Allocator*>(p);
    const int32_t n = (int32_t)a->voices.size();
    // free voice first
    for (int32_t i = 0; i < n; ++i) {
        if (!a->voices[i].active) {
            a->voices[i] = {true, false, note, a->current_age++};
            return i;
        }
    }
    // steal: released-then-oldest (LRU)
    int32_t best = 0;
    auto key = [&](int32_t i) {
        const auto& v = a->voices[i];
        return std::make_pair(v.released ? 0 : 1, v.age);
    };
    for (int32_t i = 1; i < n; ++i)
        if (key(i) < key(best)) best = i;
    a->voices[best] = {true, false, note, a->current_age++};
    return best;
}

int32_t oscen_alloc_note_off(void* p, int32_t note) {
    auto* a = static_cast<Allocator*>(p);
    const int32_t n = (int32_t)a->voices.size();
    for (int32_t i = 0; i < n; ++i) {
        auto& v = a->voices[i];
        if (v.active && !v.released && v.note == note) {
            v.released = true;  // keep active through the release phase
            v.note = -1;
            return i;
        }
    }
    return -1;
}

// ------------------------------------------------------------------- //
// Event packing: stable-sort (offset) + truncate to capacity
// (the staging the generated process_block does, codegen/mod.rs:782-799)
// ------------------------------------------------------------------- //
void oscen_pack_events(const int32_t* offsets, const float* values,
                       int32_t n, int32_t capacity, int32_t* out_off,
                       float* out_val, uint8_t* out_valid) {
    std::vector<int32_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
        return offsets[a] < offsets[b];
    });
    const int32_t m = std::min(n, capacity);
    for (int32_t i = 0; i < capacity; ++i) {
        if (i < m) {
            out_off[i] = offsets[order[i]];
            out_val[i] = values[order[i]];
            out_valid[i] = 1;
        } else {
            out_off[i] = 0;
            out_val[i] = 0.0f;
            out_valid[i] = 0;
        }
    }
}

// ------------------------------------------------------------------- //
// Offline windowed-sinc resampler (reference asset/resample.rs:47-103):
// 32 zero-crossings, Blackman window, per-output weight normalization.
// ------------------------------------------------------------------- //
static inline float sinc_f(float x) {
    if (x == 0.0f) return 1.0f;
    const float px = (float)M_PI * x;
    return std::sin(px) / px;
}

static inline float blackman_f(float t) {
    if (std::fabs(t) > 1.0f) return 0.0f;
    const float phase = (float)M_PI * (t + 1.0f);
    const float c = std::cos(phase);
    return 0.42f - 0.5f * c + 0.08f * (2.0f * c * c - 1.0f);
}

int64_t oscen_resample_out_len(int64_t n_in, int32_t src, int32_t dst) {
    return (int64_t)std::llround((double)n_in * (double)dst / (double)src);
}

void oscen_resample_channel(const float* in, int64_t n_in, int32_t src,
                            int32_t dst, float* out, int64_t n_out) {
    if (n_in == 0 || n_out == 0) return;
    if (src == dst) {
        std::memcpy(out, in, sizeof(float) * std::min(n_in, n_out));
        return;
    }
    const double ratio = (double)dst / (double)src;
    const float cutoff = (float)std::min(ratio, 1.0);
    const float radius = 32.0f / cutoff;
    const double inv_ratio = 1.0 / ratio;
    const float inv_radius = 1.0f / radius;

    for (int64_t n = 0; n < n_out; ++n) {
        const double pos = (double)n * inv_ratio;
        int64_t first = (int64_t)std::ceil(pos - radius);
        int64_t last = (int64_t)std::floor(pos + radius);
        if (first < 0) first = 0;
        if (last > n_in - 1) last = n_in - 1;
        float acc = 0.0f, wsum = 0.0f;
        for (int64_t i = first; i <= last; ++i) {
            const float dist = (float)(pos - (double)i);
            const float w = sinc_f(cutoff * dist)
                * blackman_f(dist * inv_radius);
            acc += w * in[i];
            wsum += w;
        }
        out[n] = (wsum != 0.0f) ? acc / wsum : 0.0f;
    }
}

}  // extern "C"
