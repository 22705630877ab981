// Native host-side data plane for rwkv_tpu. See rwkv_native.h.
//
// Numerics contract: the block codecs are bit-exact with ggml's reference
// quantizers (and with rwkv_tpu/io/quant.py, which is validated against the
// reference's committed fixtures byte-for-byte). FP16 conversion is IEEE
// round-to-nearest-even.

#include "rwkv_native.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <memory>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// Error handling
// ---------------------------------------------------------------------------

static thread_local std::string g_last_error;

static int set_error(const char *msg) {
    g_last_error = msg ? msg : "";
    return -1;
}

extern "C" RWKV_NATIVE_API const char *rwkv_native_last_error(void) {
    return g_last_error.c_str();
}

// ---------------------------------------------------------------------------
// FP16 <-> FP32 (IEEE, round-to-nearest-even)
// ---------------------------------------------------------------------------

static inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    const uint32_t sign = (x >> 16) & 0x8000u;
    uint32_t mant = x & 0x007FFFFFu;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    if (((x >> 23) & 0xFF) == 0xFF) {  // inf/nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x0200u | (mant >> 13) : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;  // underflow -> 0
        // subnormal: shift with round-to-nearest-even
        mant |= 0x00800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

static inline float f16_to_f32(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    const uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FFu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) {
            x = sign;
        } else {  // subnormal
            int e = -1;
            do {
                e++;
                mant <<= 1;
            } while (!(mant & 0x400u));
            mant &= 0x3FFu;
            x = sign | (uint32_t)(127 - 15 - e) << 23 | (mant << 13);
        }
    } else if (exp == 0x1F) {
        x = sign | 0x7F800000u | (mant << 13);
    } else {
        x = sign | (exp - 15 + 127) << 23 | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

// ---------------------------------------------------------------------------
// Block quantization codecs (QK = 32)
// ---------------------------------------------------------------------------

enum {
    DT_F32 = 0, DT_F16 = 1, DT_Q4_0 = 2, DT_Q4_1 = 3,
    DT_Q5_0 = 7, DT_Q5_1 = 8, DT_Q8_0 = 9,
};

static const int QK = 32;

static int64_t block_bytes(uint32_t dtype) {
    switch (dtype) {
        case DT_F32:  return 4 * QK;
        case DT_F16:  return 2 * QK;
        case DT_Q4_0: return 2 + 16;
        case DT_Q4_1: return 2 + 2 + 16;
        case DT_Q5_0: return 2 + 4 + 16;
        case DT_Q5_1: return 2 + 2 + 4 + 16;
        case DT_Q8_0: return 2 + 32;
        default:      return -1;
    }
}

extern "C" RWKV_NATIVE_API int64_t rwkv_quant_row_size(uint32_t dtype, int64_t n) {
    int64_t bb = block_bytes(dtype);
    if (bb < 0) return -1;
    if (dtype == DT_F32) return n * 4;
    if (dtype == DT_F16) return n * 2;
    if (n % QK) return -1;
    return (n / QK) * bb;
}

// Signed absmax, first occurrence winning on strict '>' (ggml semantics).
static inline float signed_absmax(const float *x) {
    float amax = 0.0f, smax = 0.0f;
    for (int i = 0; i < QK; i++) {
        float a = std::fabs(x[i]);
        if (a > amax) { amax = a; smax = x[i]; }
    }
    return smax;
}

static void enc_q4_0(const float *x, uint8_t *dst) {
    const float smax = signed_absmax(x);
    const float d = smax / -8.0f;
    const float id = d ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d);
    std::memcpy(dst, &dh, 2);
    for (int j = 0; j < 16; j++) {
        int xi0 = (int)(x[j] * id + 8.5f);
        int xi1 = (int)(x[j + 16] * id + 8.5f);
        if (xi0 > 15) xi0 = 15;
        if (xi1 > 15) xi1 = 15;
        dst[2 + j] = (uint8_t)(xi0 | (xi1 << 4));
    }
}

static void enc_q4_1(const float *x, uint8_t *dst) {
    float mn = x[0], mx = x[0];
    for (int i = 1; i < QK; i++) {
        if (x[i] < mn) mn = x[i];
        if (x[i] > mx) mx = x[i];
    }
    const float d = (mx - mn) / 15.0f;
    const float id = d ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
    std::memcpy(dst, &dh, 2);
    std::memcpy(dst + 2, &mh, 2);
    for (int j = 0; j < 16; j++) {
        int xi0 = (int)((x[j] - mn) * id + 0.5f);
        int xi1 = (int)((x[j + 16] - mn) * id + 0.5f);
        if (xi0 > 15) xi0 = 15;
        if (xi1 > 15) xi1 = 15;
        dst[4 + j] = (uint8_t)(xi0 | (xi1 << 4));
    }
}

static void enc_q5_0(const float *x, uint8_t *dst) {
    const float smax = signed_absmax(x);
    const float d = smax / -16.0f;
    const float id = d ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d);
    std::memcpy(dst, &dh, 2);
    uint32_t qh = 0;
    for (int j = 0; j < 16; j++) {
        int xi0 = (int)(x[j] * id + 16.5f);
        int xi1 = (int)(x[j + 16] * id + 16.5f);
        if (xi0 > 31) xi0 = 31;
        if (xi1 > 31) xi1 = 31;
        dst[6 + j] = (uint8_t)((xi0 & 0xF) | ((xi1 & 0xF) << 4));
        qh |= (uint32_t)((xi0 >> 4) & 1) << j;
        qh |= (uint32_t)((xi1 >> 4) & 1) << (j + 16);
    }
    std::memcpy(dst + 2, &qh, 4);
}

static void enc_q5_1(const float *x, uint8_t *dst) {
    float mn = x[0], mx = x[0];
    for (int i = 1; i < QK; i++) {
        if (x[i] < mn) mn = x[i];
        if (x[i] > mx) mx = x[i];
    }
    const float d = (mx - mn) / 31.0f;
    const float id = d ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
    std::memcpy(dst, &dh, 2);
    std::memcpy(dst + 2, &mh, 2);
    uint32_t qh = 0;
    for (int j = 0; j < 16; j++) {
        int xi0 = (int)((x[j] - mn) * id + 0.5f);
        int xi1 = (int)((x[j + 16] - mn) * id + 0.5f);
        if (xi0 > 31) xi0 = 31;
        if (xi1 > 31) xi1 = 31;
        dst[8 + j] = (uint8_t)((xi0 & 0xF) | ((xi1 & 0xF) << 4));
        qh |= (uint32_t)((xi0 >> 4) & 1) << j;
        qh |= (uint32_t)((xi1 >> 4) & 1) << (j + 16);
    }
    std::memcpy(dst + 4, &qh, 4);
}

static void enc_q8_0(const float *x, uint8_t *dst) {
    float amax = 0.0f;
    for (int i = 0; i < QK; i++) {
        float a = std::fabs(x[i]);
        if (a > amax) amax = a;
    }
    const float d = amax / 127.0f;
    const float id = d ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d);
    std::memcpy(dst, &dh, 2);
    for (int i = 0; i < QK; i++) {
        ((int8_t *)(dst + 2))[i] = (int8_t)std::roundf(x[i] * id);
    }
}

static void dec_block(uint32_t dtype, const uint8_t *src, float *out) {
    switch (dtype) {
        case DT_Q4_0: {
            uint16_t dh; std::memcpy(&dh, src, 2);
            float d = f16_to_f32(dh);
            for (int j = 0; j < 16; j++) {
                out[j] = ((src[2 + j] & 0xF) - 8) * d;
                out[j + 16] = ((src[2 + j] >> 4) - 8) * d;
            }
            break;
        }
        case DT_Q4_1: {
            uint16_t dh, mh;
            std::memcpy(&dh, src, 2); std::memcpy(&mh, src + 2, 2);
            float d = f16_to_f32(dh), m = f16_to_f32(mh);
            for (int j = 0; j < 16; j++) {
                out[j] = (src[4 + j] & 0xF) * d + m;
                out[j + 16] = (src[4 + j] >> 4) * d + m;
            }
            break;
        }
        case DT_Q5_0: {
            uint16_t dh; std::memcpy(&dh, src, 2);
            uint32_t qh; std::memcpy(&qh, src + 2, 4);
            float d = f16_to_f32(dh);
            for (int j = 0; j < 16; j++) {
                int q0 = (src[6 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
                int q1 = (src[6 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
                out[j] = (q0 - 16) * d;
                out[j + 16] = (q1 - 16) * d;
            }
            break;
        }
        case DT_Q5_1: {
            uint16_t dh, mh;
            std::memcpy(&dh, src, 2); std::memcpy(&mh, src + 2, 2);
            uint32_t qh; std::memcpy(&qh, src + 4, 4);
            float d = f16_to_f32(dh), m = f16_to_f32(mh);
            for (int j = 0; j < 16; j++) {
                int q0 = (src[8 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
                int q1 = (src[8 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
                out[j] = q0 * d + m;
                out[j + 16] = q1 * d + m;
            }
            break;
        }
        case DT_Q8_0: {
            uint16_t dh; std::memcpy(&dh, src, 2);
            float d = f16_to_f32(dh);
            const int8_t *q = (const int8_t *)(src + 2);
            for (int i = 0; i < QK; i++) out[i] = q[i] * d;
            break;
        }
        default: break;
    }
}

typedef void (*enc_fn)(const float *, uint8_t *);

static enc_fn encoder_for(uint32_t dtype) {
    switch (dtype) {
        case DT_Q4_0: return enc_q4_0;
        case DT_Q4_1: return enc_q4_1;
        case DT_Q5_0: return enc_q5_0;
        case DT_Q5_1: return enc_q5_1;
        case DT_Q8_0: return enc_q8_0;
        default:      return nullptr;
    }
}

static void parallel_blocks(int64_t n_blocks, int n_threads,
                            const std::function<void(int64_t, int64_t)> &fn) {
    if (n_threads <= 1 || n_blocks < 1024) {
        fn(0, n_blocks);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (n_blocks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * per, hi = std::min<int64_t>(n_blocks, lo + per);
        if (lo >= hi) break;
        threads.emplace_back([=, &fn] { fn(lo, hi); });
    }
    for (auto &th : threads) th.join();
}

extern "C" RWKV_NATIVE_API int rwkv_quantize_block_data(
    uint32_t dtype, const float *src, uint8_t *dst, int64_t n, int n_threads) {
    enc_fn enc = encoder_for(dtype);
    if (!enc) return set_error("unsupported quant dtype");
    if (n % QK) return set_error("element count not a multiple of 32");
    const int64_t bb = block_bytes(dtype);
    parallel_blocks(n / QK, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++) enc(src + b * QK, dst + b * bb);
    });
    return 0;
}

extern "C" RWKV_NATIVE_API int rwkv_dequantize_block_data(
    uint32_t dtype, const uint8_t *src, float *dst, int64_t n, int n_threads) {
    if (!encoder_for(dtype)) return set_error("unsupported quant dtype");
    if (n % QK) return set_error("element count not a multiple of 32");
    const int64_t bb = block_bytes(dtype);
    parallel_blocks(n / QK, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++) dec_block(dtype, src + b * bb, dst + b * QK);
    });
    return 0;
}

// ---------------------------------------------------------------------------
// ggmf file inspection + streaming requantization
// ---------------------------------------------------------------------------

struct FileCloser {
    void operator()(FILE *f) const { if (f) std::fclose(f); }
};
using FilePtr = std::unique_ptr<FILE, FileCloser>;

extern "C" RWKV_NATIVE_API int rwkv_ggmf_read_header(const char *path,
                                                     rwkv_ggmf_header *out) {
    FilePtr f(std::fopen(path, "rb"));
    if (!f) return set_error("failed to open file");
    if (std::fread(out, sizeof(*out), 1, f.get()) != 1)
        return set_error("truncated header");
    if (out->magic != 0x67676d66u) return set_error("bad magic");
    if (out->version < 100 || out->version > 101) return set_error("bad version");
    return 0;
}

static int read_tensor_record(FILE *f, rwkv_ggmf_tensor_info *info, bool skip_data) {
    uint32_t head[3];
    size_t got = std::fread(head, 4, 3, f);
    if (got == 0) return 1;  // clean EOF
    if (got != 3) return set_error("truncated tensor header");
    uint32_t dims = head[0], key_len = head[1], dtype = head[2];
    if (dims < 1 || dims > 3) return set_error("invalid dim count");
    if (key_len >= sizeof(info->name)) return set_error("tensor name too long");
    uint32_t sizes[4] = {1, 1, 1, 1};
    if (std::fread(sizes, 4, dims, f) != dims) return set_error("truncated dims");
    if (std::fread(info->name, 1, key_len, f) != key_len)
        return set_error("truncated name");
    info->name[key_len] = 0;
    info->dtype = dtype;
    info->n_dims = dims;
    int64_t n = 1;
    for (uint32_t i = 0; i < dims; i++) {
        // disk order is innermost-first; expose numpy order
        info->shape[i] = sizes[dims - 1 - i];
        n *= sizes[i];
    }
    int64_t nbytes = rwkv_quant_row_size(dtype, n);
    if (nbytes < 0) return set_error("unsupported tensor dtype");
    info->nbytes = (uint64_t)nbytes;
#ifdef _WIN32
    info->offset = (uint64_t)_ftelli64(f);
#else
    info->offset = (uint64_t)ftello(f);
#endif
    if (skip_data) {
#ifdef _WIN32
        _fseeki64(f, (int64_t)info->nbytes, SEEK_CUR);
#else
        fseeko(f, (off_t)info->nbytes, SEEK_CUR);
#endif
    }
    return 0;
}

extern "C" RWKV_NATIVE_API int64_t rwkv_ggmf_scan(const char *path,
                                                  rwkv_ggmf_tensor_info *infos,
                                                  int64_t max_infos) {
    FilePtr f(std::fopen(path, "rb"));
    if (!f) return set_error("failed to open file");
    rwkv_ggmf_header hdr;
    if (std::fread(&hdr, sizeof(hdr), 1, f.get()) != 1)
        return set_error("truncated header");
    int64_t count = 0;
    rwkv_ggmf_tensor_info tmp;
    for (;;) {
        rwkv_ggmf_tensor_info *dst =
            (infos && count < max_infos) ? &infos[count] : &tmp;
        int rc = read_tensor_record(f.get(), dst, true);
        if (rc == 1) break;
        if (rc != 0) return -1;
        count++;
    }
    return count;
}

// Quantization skip-list (reference rwkv_quantize.inc:1-13).
static bool tensor_needs_quant(const char *name) {
    if (!std::strcmp(name, "emb.weight") || !std::strcmp(name, "head.weight"))
        return false;
    static const char *subs[] = {
        "att.v1", "att.v2", "att.g1", "att.g2", "att.a1",
        "att.a2", "att.w1", "att.w2", "att.r_k",
    };
    for (const char *s : subs)
        if (std::strstr(name, s)) return false;
    return true;
}

extern "C" RWKV_NATIVE_API int rwkv_quantize_model_file(
    const char *in_path, const char *out_path, uint32_t target,
    int n_threads, uint64_t *orig_bytes, uint64_t *new_bytes) {
    if (!encoder_for(target)) return set_error("target is not a quantized format");
    FilePtr fin(std::fopen(in_path, "rb"));
    if (!fin) return set_error("failed to open input");
    FilePtr fout(std::fopen(out_path, "wb"));
    if (!fout) return set_error("failed to open output");

    rwkv_ggmf_header hdr;
    if (std::fread(&hdr, sizeof(hdr), 1, fin.get()) != 1)
        return set_error("truncated header");
    if (hdr.magic != 0x67676d66u) return set_error("bad magic");
    if (hdr.data_type != DT_F32 && hdr.data_type != DT_F16)
        return set_error("input must be FP32 or FP16");
    rwkv_ggmf_header out_hdr = hdr;
    out_hdr.version = 101;
    out_hdr.data_type = target;
    std::fwrite(&out_hdr, sizeof(out_hdr), 1, fout.get());

    uint64_t orig_total = 0, new_total = 0;
    std::vector<uint8_t> raw;
    std::vector<float> f32buf;
    std::vector<uint8_t> packed;

    for (;;) {
        rwkv_ggmf_tensor_info info;
        int rc = read_tensor_record(fin.get(), &info, false);
        if (rc == 1) break;
        if (rc != 0) return -1;

        raw.resize(info.nbytes);
        if (std::fread(raw.data(), 1, info.nbytes, fin.get()) != info.nbytes)
            return set_error("truncated tensor data");

        int64_t n = 1;
        for (uint32_t i = 0; i < info.n_dims; i++) n *= info.shape[i];

        uint32_t out_dtype = info.dtype;
        const uint8_t *out_data = raw.data();
        uint64_t out_size = info.nbytes;

        bool quantize = info.n_dims == 2 &&
                        (info.dtype == DT_F32 || info.dtype == DT_F16) &&
                        tensor_needs_quant(info.name) && (n % QK) == 0;
        if (quantize) {
            const float *src;
            if (info.dtype == DT_F16) {
                f32buf.resize(n);
                const uint16_t *h = (const uint16_t *)raw.data();
                for (int64_t i = 0; i < n; i++) f32buf[i] = f16_to_f32(h[i]);
                src = f32buf.data();
            } else {
                src = (const float *)raw.data();
            }
            out_size = (uint64_t)rwkv_quant_row_size(target, n);
            packed.resize(out_size);
            if (rwkv_quantize_block_data(target, src, packed.data(), n, n_threads))
                return -1;
            out_dtype = target;
            out_data = packed.data();
        }

        uint32_t head[3] = {info.n_dims, (uint32_t)std::strlen(info.name), out_dtype};
        std::fwrite(head, 4, 3, fout.get());
        for (uint32_t i = 0; i < info.n_dims; i++) {
            uint32_t dim = info.shape[info.n_dims - 1 - i];  // back to disk order
            std::fwrite(&dim, 4, 1, fout.get());
        }
        std::fwrite(info.name, 1, std::strlen(info.name), fout.get());
        std::fwrite(out_data, 1, out_size, fout.get());
        orig_total += info.nbytes;
        new_total += out_size;
    }
    if (orig_bytes) *orig_bytes = orig_total;
    if (new_bytes) *new_bytes = new_total;
    return 0;
}

// ---------------------------------------------------------------------------
// World trie tokenizer
// ---------------------------------------------------------------------------

struct TrieNode {
    int32_t children[256];
    int32_t token = -1;  // token id terminating here, if any
    TrieNode() { std::memset(children, 0xFF, sizeof(children)); }
};

struct rwkv_trie_tokenizer {
    std::vector<TrieNode> nodes;
    std::vector<std::string> id_to_token;  // indexed by token id
    int max_token_len = 0;

    void add(const std::string &tok, int32_t id) {
        int32_t cur = 0;
        for (unsigned char c : tok) {
            if (nodes[cur].children[c] < 0) {
                nodes[cur].children[c] = (int32_t)nodes.size();
                nodes.emplace_back();
            }
            cur = nodes[cur].children[c];
        }
        nodes[cur].token = id;
        if ((int)tok.size() > max_token_len) max_token_len = (int)tok.size();
    }
};

static void utf8_append(std::string *s, unsigned cp) {
    if (cp < 0x80) {
        s->push_back((char)cp);
    } else if (cp < 0x800) {
        s->push_back((char)(0xC0 | (cp >> 6)));
        s->push_back((char)(0x80 | (cp & 0x3F)));
    } else if (cp < 0x10000) {
        s->push_back((char)(0xE0 | (cp >> 12)));
        s->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
        s->push_back((char)(0x80 | (cp & 0x3F)));
    } else {
        s->push_back((char)(0xF0 | (cp >> 18)));
        s->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
        s->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
        s->push_back((char)(0x80 | (cp & 0x3F)));
    }
}

// Parse a python string/bytes literal (the vocab file's token field).
// In a str literal, \xNN is codepoint U+00NN (UTF-8 encoded to 1-2 bytes);
// in a bytes literal it is the raw byte NN.
static bool parse_py_literal(const std::string &lit, std::string *out) {
    size_t i = 0;
    bool is_bytes = false;
    if (i < lit.size() && (lit[i] == 'b' || lit[i] == 'B')) {
        is_bytes = true;
        i++;
    }
    if (i >= lit.size()) return false;
    char quote = lit[i];
    if (quote != '\'' && quote != '"') return false;
    i++;
    std::string s;
    while (i < lit.size() && lit[i] != quote) {
        char c = lit[i];
        if (c != '\\') {
            s.push_back(c);
            i++;
            continue;
        }
        i++;
        if (i >= lit.size()) return false;
        char e = lit[i++];
        switch (e) {
            case 'n': s.push_back('\n'); break;
            case 't': s.push_back('\t'); break;
            case 'r': s.push_back('\r'); break;
            case '0': s.push_back('\0'); break;
            case 'a': s.push_back('\a'); break;
            case 'b': s.push_back('\b'); break;
            case 'f': s.push_back('\f'); break;
            case 'v': s.push_back('\v'); break;
            case '\\': s.push_back('\\'); break;
            case '\'': s.push_back('\''); break;
            case '"': s.push_back('"'); break;
            case 'x': {
                if (i + 2 > lit.size()) return false;
                unsigned v = (unsigned)std::stoul(lit.substr(i, 2), nullptr, 16);
                i += 2;
                if (is_bytes) s.push_back((char)v);
                else utf8_append(&s, v);
                break;
            }
            case 'u': {
                if (i + 4 > lit.size()) return false;
                unsigned cp = (unsigned)std::stoul(lit.substr(i, 4), nullptr, 16);
                i += 4;
                utf8_append(&s, cp);
                break;
            }
            case 'U': {
                if (i + 8 > lit.size()) return false;
                unsigned cp = (unsigned)std::stoul(lit.substr(i, 8), nullptr, 16);
                i += 8;
                utf8_append(&s, cp);
                break;
            }
            default:
                return false;
        }
    }
    if (i >= lit.size()) return false;
    *out = s;
    return true;
}

extern "C" RWKV_NATIVE_API rwkv_trie_tokenizer *rwkv_tokenizer_init(
    const char *vocab_path) {
    FilePtr f(std::fopen(vocab_path, "rb"));
    if (!f) { set_error("failed to open vocab file"); return nullptr; }
    auto tok = std::make_unique<rwkv_trie_tokenizer>();
    tok->nodes.emplace_back();  // root

    std::string line;
    char buf[8192];
    while (std::fgets(buf, sizeof(buf), f.get())) {
        line.assign(buf);
        while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
            line.pop_back();
        if (line.empty()) continue;
        size_t sp1 = line.find(' ');
        size_t sp2 = line.rfind(' ');
        if (sp1 == std::string::npos || sp2 == sp1) {
            set_error("malformed vocab line");
            return nullptr;
        }
        int32_t id = (int32_t)std::strtol(line.c_str(), nullptr, 10);
        std::string token;
        if (!parse_py_literal(line.substr(sp1 + 1, sp2 - sp1 - 1), &token)) {
            set_error("failed to parse vocab token literal");
            return nullptr;
        }
        long expect_len = std::strtol(line.c_str() + sp2 + 1, nullptr, 10);
        if ((long)token.size() != expect_len) {
            set_error("vocab token length mismatch");
            return nullptr;
        }
        if (id >= (int32_t)tok->id_to_token.size())
            tok->id_to_token.resize(id + 1);
        tok->id_to_token[id] = token;
        tok->add(token, id);
    }
    return tok.release();
}

extern "C" RWKV_NATIVE_API void rwkv_tokenizer_free(rwkv_trie_tokenizer *tok) {
    delete tok;
}

extern "C" RWKV_NATIVE_API int64_t rwkv_tokenizer_encode(
    rwkv_trie_tokenizer *tok, const uint8_t *text, int64_t text_len,
    int32_t *out_tokens, int64_t max_tokens) {
    int64_t n_out = 0;
    int64_t pos = 0;
    while (pos < text_len) {
        int32_t cur = 0;
        int32_t best_token = -1;
        int64_t best_len = 0;
        int64_t i = pos;
        while (i < text_len) {
            cur = tok->nodes[cur].children[text[i]];
            if (cur < 0) break;
            i++;
            if (tok->nodes[cur].token >= 0) {
                best_token = tok->nodes[cur].token;
                best_len = i - pos;
            }
        }
        if (best_token < 0) { set_error("untokenizable byte"); return -1; }
        if (n_out >= max_tokens) { set_error("output buffer too small"); return -1; }
        out_tokens[n_out++] = best_token;
        pos += best_len;
    }
    return n_out;
}

extern "C" RWKV_NATIVE_API int64_t rwkv_tokenizer_decode(
    rwkv_trie_tokenizer *tok, const int32_t *tokens, int64_t n_tokens,
    uint8_t *out, int64_t max_out) {
    int64_t n = 0;
    for (int64_t i = 0; i < n_tokens; i++) {
        int32_t id = tokens[i];
        if (id < 0 || id >= (int32_t)tok->id_to_token.size()) {
            set_error("token id out of range");
            return -1;
        }
        const std::string &s = tok->id_to_token[id];
        if (n + (int64_t)s.size() > max_out) {
            set_error("output buffer too small");
            return -1;
        }
        std::memcpy(out + n, s.data(), s.size());
        n += (int64_t)s.size();
    }
    return n;
}
