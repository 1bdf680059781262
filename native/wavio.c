/* Fast host-side WAV decoding for the data pipeline.
 *
 * The training host in this deployment has a single CPU core; Python-side
 * WAV parsing (scipy RIFF handling + dtype conversion) is measurable
 * per-utterance overhead against the prefetch thread. This is a minimal
 * dependency-free RIFF/PCM reader:
 *
 *   - wav_info(path, &n_samples, &sample_rate, &channels): header probe
 *   - wav_read_f32(path, out, max_samples): decode to mono float32 in [-1,1]
 *     (16/24/32-bit PCM and 32-bit IEEE float; channels averaged)
 *
 * Exposed to Python via ctypes (speech_masters_thesis_tpu/native/__init__.py);
 * the loader falls back to scipy if the shared library is unavailable.
 *
 * Counterpart of the reference's librosa.load usage (reference
 * datasets/ljspeech.py:72) for the PCM WAV corpus.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    uint16_t format;      /* 1 = PCM, 3 = IEEE float */
    uint16_t channels;
    uint32_t sample_rate;
    uint16_t bits;
    long data_offset;
    uint32_t data_bytes;
} WavHeader;

static int parse_header(FILE *f, WavHeader *h) {
    uint8_t riff[12];
    if (fread(riff, 1, 12, f) != 12) return -1;
    if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0) return -2;

    memset(h, 0, sizeof(*h));
    uint8_t chunk[8];
    int have_fmt = 0;
    while (fread(chunk, 1, 8, f) == 8) {
        uint32_t size = (uint32_t)chunk[4] | ((uint32_t)chunk[5] << 8) |
                        ((uint32_t)chunk[6] << 16) | ((uint32_t)chunk[7] << 24);
        if (memcmp(chunk, "fmt ", 4) == 0) {
            uint8_t fmt[16];
            if (size < 16 || fread(fmt, 1, 16, f) != 16) return -3;
            h->format = (uint16_t)(fmt[0] | (fmt[1] << 8));
            h->channels = (uint16_t)(fmt[2] | (fmt[3] << 8));
            h->sample_rate = (uint32_t)fmt[4] | ((uint32_t)fmt[5] << 8) |
                             ((uint32_t)fmt[6] << 16) | ((uint32_t)fmt[7] << 24);
            h->bits = (uint16_t)(fmt[14] | (fmt[15] << 8));
            if (size > 16 && fseek(f, (long)(size - 16), SEEK_CUR) != 0) return -3;
            have_fmt = 1;
        } else if (memcmp(chunk, "data", 4) == 0) {
            h->data_offset = ftell(f);
            h->data_bytes = size;
            if (!have_fmt) return -4;
            return 0;
        } else {
            /* chunks are word-aligned */
            long skip = (long)size + (size & 1u);
            if (fseek(f, skip, SEEK_CUR) != 0) return -5;
        }
    }
    return -6;
}

/* Returns 0 on success; fills sample count (per channel), rate, channels. */
int wav_info(const char *path, long *n_samples, int *sample_rate, int *channels) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    WavHeader h;
    int rc = parse_header(f, &h);
    fclose(f);
    if (rc != 0) return rc;
    if (h.channels == 0 || h.bits == 0) return -7;
    long frame_bytes = (long)h.channels * (h.bits / 8);
    *n_samples = (long)h.data_bytes / frame_bytes;
    *sample_rate = (int)h.sample_rate;
    *channels = (int)h.channels;
    return 0;
}

/* Decodes up to max_samples mono samples into out; returns count or <0. */
long wav_read_f32(const char *path, float *out, long max_samples) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    WavHeader h;
    int rc = parse_header(f, &h);
    if (rc != 0) { fclose(f); return rc; }

    int bytes_per = h.bits / 8;
    long frame_bytes = (long)h.channels * bytes_per;
    long total = (long)h.data_bytes / frame_bytes;
    if (total > max_samples) total = max_samples;

    if (fseek(f, h.data_offset, SEEK_SET) != 0) { fclose(f); return -8; }

    const long CHUNK = 1 << 16;
    uint8_t *buf = (uint8_t *)malloc((size_t)(CHUNK * frame_bytes));
    if (!buf) { fclose(f); return -9; }

    long done = 0;
    while (done < total) {
        long want = total - done;
        if (want > CHUNK) want = CHUNK;
        long got = (long)fread(buf, (size_t)frame_bytes, (size_t)want, f);
        if (got <= 0) break;
        for (long i = 0; i < got; i++) {
            float acc = 0.0f;
            for (int c = 0; c < h.channels; c++) {
                const uint8_t *p = buf + (size_t)(i * frame_bytes + c * bytes_per);
                float v = 0.0f;
                if (h.format == 3 && h.bits == 32) {
                    float fv;
                    memcpy(&fv, p, 4);
                    v = fv;
                } else if (h.bits == 16) {
                    int16_t s = (int16_t)(p[0] | (p[1] << 8));
                    v = (float)s / 32768.0f;
                } else if (h.bits == 24) {
                    int32_t s = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                          (uint32_t)p[2] << 24) >> 8;
                    v = (float)s / 8388608.0f;
                } else if (h.bits == 32) {
                    int32_t s;
                    memcpy(&s, p, 4);
                    v = (float)s / 2147483648.0f;
                } else if (h.bits == 8) {
                    v = ((float)p[0] - 128.0f) / 128.0f;
                }
                acc += v;
            }
            float x = acc / (float)h.channels;
            if (x > 1.0f) x = 1.0f;
            if (x < -1.0f) x = -1.0f;
            out[done + i] = x;
        }
        done += got;
    }
    free(buf);
    fclose(f);
    return done;
}

/* Writes 16-bit PCM mono; returns 0 on success. */
int wav_write_i16(const char *path, const float *audio, long n_samples, int sample_rate) {
    FILE *f = fopen(path, "wb");
    if (!f) return -1;
    uint32_t data_bytes = (uint32_t)(n_samples * 2);
    uint32_t riff_size = 36 + data_bytes;
    uint32_t byte_rate = (uint32_t)sample_rate * 2;
    uint8_t header[44];
    memcpy(header, "RIFF", 4);
    memcpy(header + 4, &riff_size, 4);
    memcpy(header + 8, "WAVEfmt ", 8);
    uint32_t fmt_size = 16;
    memcpy(header + 16, &fmt_size, 4);
    uint16_t fmt = 1, channels = 1, block = 2, bits = 16;
    memcpy(header + 20, &fmt, 2);
    memcpy(header + 22, &channels, 2);
    memcpy(header + 24, &sample_rate, 4);
    memcpy(header + 28, &byte_rate, 4);
    memcpy(header + 32, &block, 2);
    memcpy(header + 34, &bits, 2);
    memcpy(header + 36, "data", 4);
    memcpy(header + 40, &data_bytes, 4);
    if (fwrite(header, 1, 44, f) != 44) { fclose(f); return -2; }

    const long CHUNK = 1 << 16;
    int16_t *buf = (int16_t *)malloc((size_t)CHUNK * 2);
    if (!buf) { fclose(f); return -3; }
    long done = 0;
    while (done < n_samples) {
        long want = n_samples - done;
        if (want > CHUNK) want = CHUNK;
        for (long i = 0; i < want; i++) {
            float x = audio[done + i];
            if (x > 1.0f) x = 1.0f;
            if (x < -1.0f) x = -1.0f;
            buf[i] = (int16_t)(x * 32767.0f);
        }
        if (fwrite(buf, 2, (size_t)want, f) != (size_t)want) {
            free(buf);
            fclose(f);
            return -4;
        }
        done += want;
    }
    free(buf);
    fclose(f);
    return 0;
}
