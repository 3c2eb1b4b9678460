// Native runtime components: WAV/IQ block reader, SPSC ring buffer,
// int8/int16 sample quantizer.
//
// The reference implements its data path in C++ (stream buffers
// core/src/dsp/stream.h, WAV reading core/src/utils/wav.cpp +
// source_modules/file_source int16->float conversion, network
// quantization core/src/dsp/compression/sample_stream_compressor.h).
// These are the host-side (non-XLA) equivalents, exposed with a C ABI
// and bound from Python via ctypes (sdrplusplusbrown_tpu/native.py),
// with a numpy fallback when the library is not built.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------
// WAV reader (RIFF PCM8/16/32 + float32, mono/stereo)

struct WavFile {
    FILE* f = nullptr;
    uint16_t format = 0;     // 1 = PCM, 3 = float
    uint16_t channels = 0;
    uint32_t samplerate = 0;
    uint16_t bits = 0;
    long data_offset = 0;
    uint64_t frames = 0;     // frames = samples per channel
};

static uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16)
        | ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
    return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

void* wav_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) != 0
        || memcmp(hdr + 8, "WAVE", 4) != 0) {
        fclose(f);
        return nullptr;
    }
    WavFile* w = new WavFile();
    w->f = f;
    uint8_t ch[8];
    while (fread(ch, 1, 8, f) == 8) {
        uint32_t size = rd_u32(ch + 4);
        if (memcmp(ch, "fmt ", 4) == 0) {
            uint8_t fmt[16];
            size_t n = size < 16 ? size : 16;
            if (fread(fmt, 1, n, f) != n) break;
            w->format = rd_u16(fmt);
            w->channels = rd_u16(fmt + 2);
            w->samplerate = rd_u32(fmt + 4);
            w->bits = rd_u16(fmt + 14);
            if (size > n) fseek(f, (long)(size - n), SEEK_CUR);
        } else if (memcmp(ch, "data", 4) == 0) {
            w->data_offset = ftell(f);
            uint32_t bytes_per_frame = w->channels * (w->bits / 8);
            if (bytes_per_frame)
                w->frames = size / bytes_per_frame;
            fseek(f, (long)(size + (size & 1)), SEEK_CUR);
        } else {
            fseek(f, (long)(size + (size & 1)), SEEK_CUR);
        }
    }
    if (!w->data_offset || !w->channels || !w->bits) {
        fclose(f);
        delete w;
        return nullptr;
    }
    return w;
}

void wav_info(void* h, uint32_t* samplerate, uint16_t* channels,
              uint64_t* frames, uint16_t* bits, uint16_t* format) {
    WavFile* w = (WavFile*)h;
    *samplerate = w->samplerate;
    *channels = w->channels;
    *frames = w->frames;
    *bits = w->bits;
    *format = w->format;
}

// Read `count` frames starting at `start`, converted to float32
// interleaved (reference file_source int16->float via 1/32768,
// source_modules/file_source/src/main.cpp:416-429).
// Returns frames actually read.
int64_t wav_read_f32(void* h, uint64_t start, int64_t count, float* out) {
    WavFile* w = (WavFile*)h;
    if (start >= w->frames) return 0;
    if ((uint64_t)count > w->frames - start) count = (int64_t)(w->frames - start);
    int ch = w->channels;
    int bps = w->bits / 8;
    long off = w->data_offset + (long)(start * (uint64_t)(ch * bps));
    if (fseek(w->f, off, SEEK_SET) != 0) return 0;
    int64_t vals = count * ch;

    if (w->format == 3 && w->bits == 32) {
        return (int64_t)fread(out, sizeof(float) * ch, count, w->f);
    }
    if (w->format == 1 && w->bits == 16) {
        int16_t* tmp = (int16_t*)malloc(vals * sizeof(int16_t));
        int64_t got = (int64_t)fread(tmp, sizeof(int16_t) * ch, count, w->f);
        const float s = 1.0f / 32768.0f;
        for (int64_t i = 0; i < got * ch; i++) out[i] = tmp[i] * s;
        free(tmp);
        return got;
    }
    if (w->format == 1 && w->bits == 8) {
        uint8_t* tmp = (uint8_t*)malloc(vals);
        int64_t got = (int64_t)fread(tmp, (size_t)ch, count, w->f);
        const float s = 1.0f / 128.0f;
        for (int64_t i = 0; i < got * ch; i++)
            out[i] = ((float)tmp[i] - 128.0f) * s;
        free(tmp);
        return got;
    }
    if (w->format == 1 && w->bits == 32) {
        int32_t* tmp = (int32_t*)malloc(vals * sizeof(int32_t));
        int64_t got = (int64_t)fread(tmp, sizeof(int32_t) * ch, count, w->f);
        const float s = 1.0f / 2147483648.0f;
        for (int64_t i = 0; i < got * ch; i++) out[i] = tmp[i] * s;
        free(tmp);
        return got;
    }
    return 0;
}

void wav_close(void* h) {
    WavFile* w = (WavFile*)h;
    if (w->f) fclose(w->f);
    delete w;
}

// ---------------------------------------------------------------------
// Lock-free SPSC ring buffer of float32 (the host-side stream decoupler;
// reference: core/src/dsp/stream.h double-buffer rendezvous +
// buffer/frame_buffer.h ring)

struct Ring {
    float* data;
    size_t capacity;                   // power of two
    std::atomic<uint64_t> head{0};     // written
    std::atomic<uint64_t> tail{0};     // read
};

void* ring_create(size_t capacity) {
    size_t cap = 1;
    while (cap < capacity) cap <<= 1;
    Ring* r = new Ring();
    r->data = (float*)malloc(cap * sizeof(float));
    r->capacity = cap;
    return r;
}

size_t ring_write(void* h, const float* src, size_t n) {
    Ring* r = (Ring*)h;
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    size_t free_space = r->capacity - (size_t)(head - tail);
    if (n > free_space) n = free_space;
    size_t mask = r->capacity - 1;
    for (size_t i = 0; i < n; i++) r->data[(head + i) & mask] = src[i];
    r->head.store(head + n, std::memory_order_release);
    return n;
}

size_t ring_read(void* h, float* dst, size_t n) {
    Ring* r = (Ring*)h;
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    size_t avail = (size_t)(head - tail);
    if (n > avail) n = avail;
    size_t mask = r->capacity - 1;
    for (size_t i = 0; i < n; i++) dst[i] = r->data[(tail + i) & mask];
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

size_t ring_available(void* h) {
    Ring* r = (Ring*)h;
    return (size_t)(r->head.load(std::memory_order_acquire)
                    - r->tail.load(std::memory_order_acquire));
}

void ring_free(void* h) {
    Ring* r = (Ring*)h;
    free(r->data);
    delete r;
}

// ---------------------------------------------------------------------
// Sample quantizer (network path hot loop; reference
// compression/sample_stream_compressor.h)

float quantize_i8(const float* in, int64_t n, int8_t* out) {
    float maxv = 1e-30f;
    for (int64_t i = 0; i < n; i++) {
        float a = fabsf(in[i]);
        if (a > maxv) maxv = a;
    }
    float s = 127.0f / maxv;
    for (int64_t i = 0; i < n; i++) {
        float v = in[i] * s;
        out[i] = (int8_t)(v < -128.f ? -128.f : (v > 127.f ? 127.f : v));
    }
    return maxv;
}

void dequantize_i8(const int8_t* in, int64_t n, float scale, float* out) {
    const float s = scale / 127.0f;
    for (int64_t i = 0; i < n; i++) out[i] = in[i] * s;
}

float quantize_i16(const float* in, int64_t n, int16_t* out) {
    float maxv = 1e-30f;
    for (int64_t i = 0; i < n; i++) {
        float a = fabsf(in[i]);
        if (a > maxv) maxv = a;
    }
    float s = 32767.0f / maxv;
    for (int64_t i = 0; i < n; i++) {
        float v = in[i] * s;
        out[i] = (int16_t)(v < -32768.f ? -32768.f
                           : (v > 32767.f ? 32767.f : v));
    }
    return maxv;
}

}  // extern "C"
