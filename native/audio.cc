// Native audio decoder: FLAC (subset, 16/24-bit, mono/stereo and generic
// multichannel) and RIFF WAV (PCM 8/16/24/32 and float32).
//
// Role: the data-loader decode path of the framework.  The reference used
// python-soundfile (libsndfile) for decode (/root/reference/cpc/dataset.py:264).
// This is a from-scratch implementation of the FLAC format (constant /
// verbatim / fixed / LPC subframes, Rice-coded residuals, stereo
// decorrelation), validated bit-exactly against the MD5 signature stored in
// each file's STREAMINFO block.
//
// Exposed C ABI (see cpc_audio_tpu/ops/native.py):
//   cpc_audio_info(path, &rate, &channels)          -> n_frames
//   cpc_decode_audio(path, &rate, &channels, &data) -> n_frames (malloc'd)
//   cpc_decode_verify(path)                         -> 1 md5-ok / 0 / <0 err
//   cpc_free(ptr)

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// MD5 (RFC 1321) — used to verify decoded FLAC audio against STREAMINFO.
// ---------------------------------------------------------------------------
struct MD5 {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe, d = 0x10325476;
  uint64_t total = 0;
  uint8_t buf[64];
  size_t buf_len = 0;

  static uint32_t rol(uint32_t x, int s) { return (x << s) | (x >> (32 - s)); }

  void block(const uint8_t* p) {
    static const uint32_t K[64] = {
        0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf,
        0x4787c62a, 0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af,
        0xffff5bb1, 0x895cd7be, 0x6b901122, 0xfd987193, 0xa679438e,
        0x49b40821, 0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
        0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8, 0x21e1cde6,
        0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
        0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122,
        0xfde5380c, 0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
        0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05, 0xd9d4d039,
        0xe6db99e5, 0x1fa27cf8, 0xc4ac5665, 0xf4292244, 0x432aff97,
        0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92, 0xffeff47d,
        0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
        0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
    static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                              7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                              5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                              4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                              6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                              6, 10, 15, 21};
    uint32_t m[16];
    for (int i = 0; i < 16; i++)
      m[i] = (uint32_t)p[i * 4] | ((uint32_t)p[i * 4 + 1] << 8) |
             ((uint32_t)p[i * 4 + 2] << 16) | ((uint32_t)p[i * 4 + 3] << 24);
    uint32_t A = a, B = b, C = c, D = d;
    for (int i = 0; i < 64; i++) {
      uint32_t f;
      int g;
      if (i < 16) {
        f = (B & C) | (~B & D);
        g = i;
      } else if (i < 32) {
        f = (D & B) | (~D & C);
        g = (5 * i + 1) & 15;
      } else if (i < 48) {
        f = B ^ C ^ D;
        g = (3 * i + 5) & 15;
      } else {
        f = C ^ (B | ~D);
        g = (7 * i) & 15;
      }
      uint32_t tmp = D;
      D = C;
      C = B;
      B = B + rol(A + f + K[i] + m[g], S[i]);
      A = tmp;
    }
    a += A;
    b += B;
    c += C;
    d += D;
  }

  void update(const uint8_t* p, size_t n) {
    total += n;
    if (buf_len) {
      size_t take = 64 - buf_len < n ? 64 - buf_len : n;
      memcpy(buf + buf_len, p, take);
      buf_len += take;
      p += take;
      n -= take;
      if (buf_len == 64) {
        block(buf);
        buf_len = 0;
      }
    }
    while (n >= 64) {
      block(p);
      p += 64;
      n -= 64;
    }
    if (n) {
      memcpy(buf, p, n);
      buf_len = n;
    }
  }

  void final(uint8_t out[16]) {
    uint64_t bits = total * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t zero = 0;
    while (buf_len != 56) update(&zero, 1);
    uint8_t len[8];
    for (int i = 0; i < 8; i++) len[i] = (uint8_t)(bits >> (8 * i));
    total -= 9;  // don't count padding
    update(len, 8);
    uint32_t h[4] = {a, b, c, d};
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++) out[i * 4 + j] = (uint8_t)(h[i] >> (8 * j));
  }
};

// ---------------------------------------------------------------------------
// MSB-first bit reader over a whole-file buffer.
// ---------------------------------------------------------------------------
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) {
      error = true;
      return 0;
    }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1;
    if (++bit_pos == 8) {
      bit_pos = 0;
      byte_pos++;
    }
    return b;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_pos >= size) {
        error = true;
        return v;
      }
      int avail = 8 - bit_pos;
      int take = n < avail ? n : avail;
      uint32_t chunk =
          (data[byte_pos] >> (avail - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      bit_pos += take;
      n -= take;
      if (bit_pos == 8) {
        bit_pos = 0;
        byte_pos++;
      }
    }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) v |= ~((1ull << n) - 1);
    return (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) q++;
    return q;
  }

  void align_byte() {
    if (bit_pos) {
      bit_pos = 0;
      byte_pos++;
    }
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
  uint8_t md5[16] = {0};
  bool has_md5 = false;
};

// Fixed-predictor coefficients (FLAC spec).
void fixed_predict(int order, std::vector<int64_t>& s, int n_warm) {
  int n = (int)s.size();
  switch (order) {
    case 0:
      break;
    case 1:
      for (int i = n_warm; i < n; i++) s[i] += s[i - 1];
      break;
    case 2:
      for (int i = n_warm; i < n; i++) s[i] += 2 * s[i - 1] - s[i - 2];
      break;
    case 3:
      for (int i = n_warm; i < n; i++)
        s[i] += 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3];
      break;
    case 4:
      for (int i = n_warm; i < n; i++)
        s[i] += 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4];
      break;
  }
}

bool read_residual(BitReader& br, int order, int block_size,
                   std::vector<int64_t>& out) {
  int method = (int)br.read_bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int porder = (int)br.read_bits(4);
  int n_part = 1 << porder;
  int part_size = block_size >> porder;
  if (part_size == 0) return false;
  int idx = order;
  for (int p = 0; p < n_part; p++) {
    int count = part_size - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(pbits);
    if (param == escape) {
      int raw_bits = (int)br.read_bits(5);
      for (int i = 0; i < count; i++) out[idx++] = br.read_signed(raw_bits);
    } else {
      for (int i = 0; i < count; i++) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t v = ((uint64_t)q << param) | r;
        out[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
      }
    }
    if (br.error) return false;
  }
  return idx == block_size;
}

bool read_subframe(BitReader& br, int block_size, int bps,
                   std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // padding
  int type = (int)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + (int)br.read_unary();
  bps -= wasted;
  out.assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED
    int order = type - 8;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    if (!read_residual(br, order, block_size, out)) return false;
    fixed_predict(order, out, order);
  } else if (type >= 32) {  // LPC
    int order = (type & 31) + 1;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; i++) coef[i] = br.read_signed(precision);
    if (!read_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < block_size; i++) out[i] <<= wasted;
  return !br.error;
}

// Decode all frames.  If `samples` is null, only counts frames (info mode).
// Returns total decoded inter-channel frames or -1.
int64_t decode_flac_stream(const uint8_t* data, size_t size, StreamInfo* info,
                           std::vector<float>* samples, bool* md5_ok) {
  if (size < 4 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  bool last = false;
  while (!last) {
    if (pos + 4 > size) return -1;
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int type = hdr & 0x7f;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return -1;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      info->sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) |
                          (p[12] >> 4);
      info->channels = ((p[12] >> 1) & 0x7) + 1;
      info->bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      info->total_samples = ((uint64_t)(p[13] & 0xF) << 32) |
                            ((uint64_t)p[14] << 24) | ((uint64_t)p[15] << 16) |
                            ((uint64_t)p[16] << 8) | p[17];
      memcpy(info->md5, p + 18, 16);
      for (int i = 0; i < 16; i++)
        if (info->md5[i]) info->has_md5 = true;
    }
    pos += len;
  }
  if (info->sample_rate == 0 || info->channels == 0) return -1;

  if (!samples) return (int64_t)info->total_samples;

  MD5 md5;
  BitReader br(data, size);
  br.byte_pos = pos;
  int ch = info->channels;
  samples->reserve((size_t)info->total_samples * ch);
  std::vector<std::vector<int64_t>> chans(ch);
  std::vector<uint8_t> md5buf;
  int64_t total = 0;

  while (br.byte_pos < size) {
    // frame sync
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return -1;
    br.read_bit();  // reserved
    br.read_bit();  // blocking strategy
    int bs_code = (int)br.read_bits(4);
    int sr_code = (int)br.read_bits(4);
    int ch_asgn = (int)br.read_bits(4);
    int ss_code = (int)br.read_bits(3);
    br.read_bit();  // reserved
    // UTF-8 coded frame/sample number
    uint32_t first = (uint32_t)br.read_bits(8);
    int extra = 0;
    if (first >= 0xFE)
      extra = 6;
    else if (first >= 0xFC)
      extra = 5;
    else if (first >= 0xF8)
      extra = 4;
    else if (first >= 0xF0)
      extra = 3;
    else if (first >= 0xE0)
      extra = 2;
    else if (first >= 0xC0)
      extra = 1;
    for (int i = 0; i < extra; i++) br.read_bits(8);

    int block_size;
    switch (bs_code) {
      case 1: block_size = 192; break;
      case 2: case 3: case 4: case 5:
        block_size = 576 << (bs_code - 2); break;
      case 6: block_size = (int)br.read_bits(8) + 1; break;
      case 7: block_size = (int)br.read_bits(16) + 1; break;
      default:
        if (bs_code >= 8) block_size = 256 << (bs_code - 8);
        else return -1;
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps;
    switch (ss_code) {
      case 0: bps = info->bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }
    br.read_bits(8);  // header CRC-8

    int n_ch = ch_asgn < 8 ? ch_asgn + 1 : 2;
    if (n_ch != ch) return -1;
    for (int c = 0; c < n_ch; c++) {
      int sub_bps = bps;
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!read_subframe(br, block_size, sub_bps, chans[c])) return -1;
    }
    br.align_byte();
    br.read_bits(16);  // frame CRC-16
    if (br.error) return -1;

    // stereo decorrelation
    if (ch_asgn == 8) {  // left/side
      for (int i = 0; i < block_size; i++)
        chans[1][i] = chans[0][i] - chans[1][i];
    } else if (ch_asgn == 9) {  // right/side
      for (int i = 0; i < block_size; i++)
        chans[0][i] = chans[0][i] + chans[1][i];
    } else if (ch_asgn == 10) {  // mid/side
      for (int i = 0; i < block_size; i++) {
        int64_t side = chans[1][i];
        int64_t mid = (chans[0][i] << 1) | (side & 1);
        chans[0][i] = (mid + side) >> 1;
        chans[1][i] = (mid - side) >> 1;
      }
    }

    // emit interleaved floats + MD5 of little-endian raw samples
    float scale = 1.0f / (float)(1ll << (info->bps - 1));
    int bytes = (info->bps + 7) / 8;
    md5buf.resize((size_t)block_size * ch * bytes);
    size_t mp = 0;
    for (int i = 0; i < block_size; i++)
      for (int c = 0; c < ch; c++) {
        int64_t v = chans[c][i];
        samples->push_back((float)v * scale);
        for (int b = 0; b < bytes; b++) md5buf[mp++] = (uint8_t)(v >> (8 * b));
      }
    md5.update(md5buf.data(), mp);
    total += block_size;
    if (info->total_samples && (uint64_t)total >= info->total_samples) break;
  }

  if (md5_ok) {
    uint8_t digest[16];
    md5.final(digest);
    *md5_ok = info->has_md5 && memcmp(digest, info->md5, 16) == 0;
  }
  return total;
}

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------
int64_t decode_wav(const uint8_t* data, size_t size, StreamInfo* info,
                   std::vector<float>* samples) {
  if (size < 44 || memcmp(data, "RIFF", 4) || memcmp(data + 8, "WAVE", 4))
    return -1;
  size_t pos = 12;
  int fmt = 0, channels = 0, bps = 0;
  uint32_t rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  while (pos + 8 <= size) {
    uint32_t len;
    memcpy(&len, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (!memcmp(data + pos, "fmt ", 4) && len >= 16) {
      fmt = body[0] | (body[1] << 8);
      channels = body[2] | (body[3] << 8);
      memcpy(&rate, body + 4, 4);
      bps = body[14] | (body[15] << 8);
    } else if (!memcmp(data + pos, "data", 4)) {
      pcm = body;
      pcm_len = len < size - (pos + 8) ? len : size - (pos + 8);
    }
    pos += 8 + len + (len & 1);
  }
  if (!pcm || !channels || !rate) return -1;
  info->sample_rate = rate;
  info->channels = channels;
  info->bps = bps;
  int bytes = bps / 8;
  int64_t n = (int64_t)(pcm_len / (bytes * channels));
  info->total_samples = n;
  if (!samples) return n;
  samples->resize((size_t)n * channels);
  for (int64_t i = 0; i < n * channels; i++) {
    const uint8_t* p = pcm + i * bytes;
    float v;
    if (fmt == 3 && bps == 32) {
      memcpy(&v, p, 4);
    } else if (bps == 16) {
      int16_t s;
      memcpy(&s, p, 2);
      v = s / 32768.0f;
    } else if (bps == 8) {
      v = ((int)p[0] - 128) / 128.0f;
    } else if (bps == 24) {
      int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
      v = (s >> 8) / 8388608.0f;
    } else if (bps == 32) {
      int32_t s;
      memcpy(&s, p, 4);
      v = s / 2147483648.0f;
    } else {
      return -1;
    }
    (*samples)[i] = v;
  }
  return n;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) buf.clear();
  fclose(f);
  return buf;
}

// ---------------------------------------------------------------------------
// MP3 via the system's libmpg123 (dlopen'd lazily; the Common Voice eval
// pipeline consumes mp3 — reference adjust_sample_rate.py:63-90 used
// torchaudio).  Only the stable public C ABI is declared here.
// ---------------------------------------------------------------------------
namespace mp3 {

typedef void mh;  // mpg123_handle
struct Api {
  int (*init)(void);
  mh* (*new_)(const char*, int*);
  int (*param)(mh*, int, long, double);
  int (*open)(mh*, const char*);
  int (*getformat)(mh*, long*, int*, int*);
  int (*format_none)(mh*);
  int (*format)(mh*, long, int, int);
  int (*rates)(const long**, size_t*);
  int (*read)(mh*, void*, size_t, size_t*);
  int (*close)(mh*);
  void (*del)(mh*);
  bool ok = false;
};

constexpr int MPG123_OK = 0;
constexpr int MPG123_DONE = -12;
constexpr int MPG123_NEW_FORMAT = -11;
constexpr int MPG123_ADD_FLAGS = 2;
constexpr long MPG123_QUIET = 0x20;
constexpr int MPG123_ENC_FLOAT_32 = 0x200;

const Api& api() {
  static Api a = [] {
    Api r{};
    void* lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!lib) lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_GLOBAL);
    if (!lib) return r;
    r.init = (int (*)(void))dlsym(lib, "mpg123_init");
    r.new_ = (mh * (*)(const char*, int*)) dlsym(lib, "mpg123_new");
    r.param = (int (*)(mh*, int, long, double))dlsym(lib, "mpg123_param");
    r.open = (int (*)(mh*, const char*))dlsym(lib, "mpg123_open");
    r.getformat =
        (int (*)(mh*, long*, int*, int*))dlsym(lib, "mpg123_getformat");
    r.format_none = (int (*)(mh*))dlsym(lib, "mpg123_format_none");
    r.format = (int (*)(mh*, long, int, int))dlsym(lib, "mpg123_format");
    r.rates = (int (*)(const long**, size_t*))dlsym(lib, "mpg123_rates");
    r.read = (int (*)(mh*, void*, size_t, size_t*))dlsym(lib, "mpg123_read");
    r.close = (int (*)(mh*))dlsym(lib, "mpg123_close");
    r.del = (void (*)(mh*))dlsym(lib, "mpg123_delete");
    r.ok = r.new_ && r.param && r.open && r.getformat && r.format_none &&
           r.format && r.rates && r.read && r.close && r.del;
    if (r.ok && r.init) r.init();
    return r;
  }();
  return a;
}

int64_t decode(const char* path, StreamInfo* info,
               std::vector<float>* samples) {
  const Api& a = api();
  if (!a.ok) return -3;  // libmpg123 unavailable
  int err = 0;
  mh* h = a.new_(nullptr, &err);
  if (!h) return -1;
  a.param(h, MPG123_ADD_FLAGS, MPG123_QUIET, 0.0);
  // Force float32 output for every rate BEFORE open — after open the
  // first frame's format is already locked and silently stays s16.
  const long* rates = nullptr;
  size_t n_rates = 0;
  a.rates(&rates, &n_rates);
  a.format_none(h);
  constexpr int MPG123_MONO_STEREO = 3;
  for (size_t i = 0; i < n_rates; i++)
    a.format(h, rates[i], MPG123_MONO_STEREO, MPG123_ENC_FLOAT_32);
  if (a.open(h, path) != MPG123_OK) {
    a.del(h);
    return -1;
  }
  long rate = 0;
  int channels = 0, enc = 0;
  if (a.getformat(h, &rate, &channels, &enc) != MPG123_OK || rate <= 0 ||
      enc != MPG123_ENC_FLOAT_32) {
    a.close(h);
    a.del(h);
    return -1;
  }
  std::vector<float> pcm;
  std::vector<float> chunk(16384);
  for (;;) {
    size_t done = 0;
    int rc = a.read(h, chunk.data(), chunk.size() * sizeof(float), &done);
    if (done) pcm.insert(pcm.end(), chunk.data(),
                         chunk.data() + done / sizeof(float));
    if (rc == MPG123_NEW_FORMAT) {
      a.getformat(h, &rate, &channels, &enc);
      continue;
    }
    if (rc == MPG123_DONE) break;
    if (rc != MPG123_OK) {
      if (pcm.empty()) {
        a.close(h);
        a.del(h);
        return -1;
      }
      break;  // salvage what decoded (truncated file)
    }
  }
  a.close(h);
  a.del(h);
  if (!channels) return -1;
  info->sample_rate = (uint32_t)rate;
  info->channels = channels;
  info->bps = 32;
  int64_t n = (int64_t)(pcm.size() / channels);
  info->total_samples = n;
  if (samples) *samples = std::move(pcm);
  return n;
}

}  // namespace mp3

bool looks_like_mp3(const uint8_t* data, size_t size) {
  if (size < 3) return false;
  if (!memcmp(data, "ID3", 3)) return true;
  // MPEG audio sync: 11 set bits, layer III
  return size >= 2 && data[0] == 0xFF && (data[1] & 0xE0) == 0xE0;
}

}  // namespace

extern "C" {

long long cpc_audio_info(const char* path, int* sample_rate, int* channels) {
  auto buf = read_file(path);
  if (buf.empty()) return -2;
  StreamInfo info;
  int64_t n;
  if (buf.size() > 4 && !memcmp(buf.data(), "fLaC", 4))
    n = decode_flac_stream(buf.data(), buf.size(), &info, nullptr, nullptr);
  else if (buf.size() > 12 && !memcmp(buf.data(), "RIFF", 4))
    n = decode_wav(buf.data(), buf.size(), &info, nullptr);
  else if (looks_like_mp3(buf.data(), buf.size()))
    n = mp3::decode(path, &info, nullptr);
  else
    n = decode_wav(buf.data(), buf.size(), &info, nullptr);
  if (n < 0) return (long long)n;
  *sample_rate = (int)info.sample_rate;
  *channels = info.channels;
  return n;
}

long long cpc_decode_audio(const char* path, int* sample_rate, int* channels,
                           float** out) {
  auto buf = read_file(path);
  if (buf.empty()) return -2;
  StreamInfo info;
  std::vector<float> samples;
  int64_t n;
  if (buf.size() > 4 && !memcmp(buf.data(), "fLaC", 4))
    n = decode_flac_stream(buf.data(), buf.size(), &info, &samples, nullptr);
  else if (buf.size() > 12 && !memcmp(buf.data(), "RIFF", 4))
    n = decode_wav(buf.data(), buf.size(), &info, &samples);
  else if (looks_like_mp3(buf.data(), buf.size()))
    n = mp3::decode(path, &info, &samples);
  else
    n = decode_wav(buf.data(), buf.size(), &info, &samples);
  if (n < 0) return (long long)n;
  *sample_rate = (int)info.sample_rate;
  *channels = info.channels;
  *out = (float*)malloc(samples.size() * sizeof(float));
  memcpy(*out, samples.data(), samples.size() * sizeof(float));
  return n;
}

// 1 = decoded and MD5 matches STREAMINFO; 0 = decoded, no/failed MD5;
// negative = decode error.
int cpc_decode_verify(const char* path) {
  auto buf = read_file(path);
  if (buf.empty()) return -2;
  if (buf.size() <= 4 || memcmp(buf.data(), "fLaC", 4)) return -3;
  StreamInfo info;
  std::vector<float> samples;
  bool ok = false;
  int64_t n = decode_flac_stream(buf.data(), buf.size(), &info, &samples, &ok);
  if (n < 0) return -1;
  return ok ? 1 : 0;
}

void cpc_free(float* p) { free(p); }

}  // extern "C"
