// owc_flac — native FLAC decoder for the TPU Whisper framework.
//
// Role: LibriSpeech ships .flac; the reference decodes it through HF
// `datasets`/libsndfile (`data_utils.py:8-41`). This image has no FLAC
// library, so the host runtime decodes natively. Same algorithm as the
// pure-Python reference decoder (`audio/flac.py`, RFC 9639 layout); the two
// are pinned bit-identical by tests/test_flac.py::test_native_decoder_parity.
// Frame CRCs are parsed, not verified (matching the Python decoder).
//
// C ABI (ctypes; see runtime_native.py::flac_decode):
//   owc_flac_open(buf, n)      -> handle (nullptr on any parse error)
//   owc_flac_info(h, &sr,&ch,&bits)
//   owc_flac_samples(h)        -> per-channel sample count
//   owc_flac_data(h)           -> interleaved int32 (n, ch), valid until close
//   owc_flac_close(h)

#include <cstdint>
#include <cstring>
#include <memory>
#include <new>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* buf;
  int64_t n;
  int64_t pos = 0;  // byte position
  int bit = 0;      // bits consumed within buf[pos]
  bool fail = false;

  BitReader(const uint8_t* b, int64_t len, int64_t p = 0)
      : buf(b), n(len), pos(p) {}

  uint64_t read(int k) {
    uint64_t out = 0;
    while (k > 0) {
      if (pos >= n) { fail = true; return 0; }
      int avail = 8 - bit;
      int take = k < avail ? k : avail;
      uint8_t byte = buf[pos];
      out = (out << take) |
            ((byte >> (avail - take)) & ((1u << take) - 1));
      bit += take;
      k -= take;
      if (bit == 8) { bit = 0; ++pos; }
    }
    return out;
  }

  int64_t read_signed(int k) {
    uint64_t v = read(k);
    if (k > 0 && (v & (uint64_t{1} << (k - 1))))
      return static_cast<int64_t>(v) - (int64_t{1} << k);
    return static_cast<int64_t>(v);
  }

  // count 0 bits up to the terminating 1 (RFC 9639 unary)
  int64_t read_unary() {
    int64_t q = 0;
    for (;;) {
      if (pos >= n) { fail = true; return 0; }
      int rem = 8 - bit;
      uint8_t chunk = buf[pos] & ((1u << rem) - 1);
      if (chunk == 0) {
        q += rem;
        bit = 0;
        ++pos;
        continue;
      }
      int msb = 31 - __builtin_clz(chunk);  // position of first 1
      int lead = rem - 1 - msb;             // zeros before it
      q += lead;
      bit += lead + 1;
      if (bit == 8) { bit = 0; ++pos; }
      return q;
    }
  }

  void align() {
    if (bit) { bit = 0; ++pos; }
  }

  bool at_end() const { return pos >= n; }
};

bool read_utf8_number(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.read(8);
  if (br.fail) return false;
  if (b0 < 0x80) { *out = b0; return true; }
  int follow = 0;
  for (uint64_t mask = 0x40; b0 & mask; mask >>= 1) ++follow;
  if (follow < 1 || follow > 6) return false;
  uint64_t v = b0 & ((uint64_t{1} << (6 - follow)) - 1);
  for (int i = 0; i < follow; ++i) {
    uint64_t b = br.read(8);
    if (br.fail || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

const int kBlocksize[16] = {-1,  192,  576,   1152,  2304, 4608, -2, -3,
                            256, 512,  1024,  2048,  4096, 8192, 16384, 32768};

const int8_t kFixedCoefs[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int blocksize, int order,
                     std::vector<int64_t>& out) {
  int method = static_cast<int>(br.read(2));
  if (br.fail || method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = (1u << pbits) - 1;
  int porder = static_cast<int>(br.read(4));
  int n_part = 1 << porder;
  if ((blocksize % n_part) != 0 || (blocksize >> porder) <= order)
    return false;
  out.resize(blocksize - order);
  int64_t w = 0;
  for (int p = 0; p < n_part; ++p) {
    int count = (blocksize >> porder) - (p == 0 ? order : 0);
    uint32_t param = static_cast<uint32_t>(br.read(pbits));
    if (param == escape) {
      int raw = static_cast<int>(br.read(5));
      if (raw == 0) {
        for (int i = 0; i < count; ++i) out[w++] = 0;
      } else {
        for (int i = 0; i < count; ++i) out[w++] = br.read_signed(raw);
      }
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = static_cast<uint64_t>(br.read_unary());
        uint64_t v = (q << param) | br.read(param);
        out[w++] = static_cast<int64_t>(v >> 1) ^
                   -static_cast<int64_t>(v & 1);  // zigzag
      }
    }
    if (br.fail) return false;
  }
  return !br.fail;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& s) {
  if (br.read(1)) return false;  // padding bit must be 0
  int ftype = static_cast<int>(br.read(6));
  int wasted = 0;
  if (br.read(1)) wasted = static_cast<int>(br.read_unary()) + 1;
  if (br.fail) return false;
  int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 33) return false;
  s.resize(blocksize);
  std::vector<int64_t> res;
  if (ftype == 0) {  // constant
    int64_t v = br.read_signed(ebps);
    for (int i = 0; i < blocksize; ++i) s[i] = v;
  } else if (ftype == 1) {  // verbatim
    for (int i = 0; i < blocksize; ++i) s[i] = br.read_signed(ebps);
  } else if (ftype >= 8 && ftype <= 12) {  // fixed order 0-4
    int order = ftype - 8;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(ebps);
    if (!decode_residual(br, blocksize, order, res)) return false;
    const int8_t* c = kFixedCoefs[order];
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += c[j] * s[i - 1 - j];
      s[i] = res[i - order] + pred;
    }
  } else if (ftype >= 32) {  // LPC order 1-32
    int order = (ftype & 31) + 1;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(ebps);
    int precision = static_cast<int>(br.read(4)) + 1;
    if (precision == 16) return false;  // 0b1111 invalid
    int shift = static_cast<int>(br.read_signed(5));
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int j = 0; j < order; ++j) coefs[j] = br.read_signed(precision);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coefs[j] * s[i - 1 - j];
      s[i] = res[i - order] + (pred >> shift);
    }
  } else {
    return false;  // reserved type
  }
  if (br.fail) return false;
  if (wasted)
    for (int i = 0; i < blocksize; ++i) s[i] <<= wasted;
  return true;
}

struct FlacStream {
  int32_t sample_rate = 0;
  int32_t channels = 0;
  int32_t bits = 0;
  int64_t total_samples = 0;  // STREAMINFO; 0 = unknown
  std::vector<int32_t> data;  // interleaved (n, ch)
};

FlacStream* decode(const uint8_t* buf, int64_t n) {
  if (n < 42 || std::memcmp(buf, "fLaC", 4) != 0) return nullptr;
  auto st = std::make_unique<FlacStream>();
  int64_t pos = 4;
  bool have_info = false;
  for (;;) {  // metadata blocks
    if (pos + 4 > n) return nullptr;
    uint8_t hdr = buf[pos];
    bool last = hdr & 0x80;
    int btype = hdr & 0x7F;
    int64_t length = (int64_t{buf[pos + 1]} << 16) |
                     (int64_t{buf[pos + 2]} << 8) | buf[pos + 3];
    if (pos + 4 + length > n) return nullptr;
    if (btype == 0 && length >= 34) {  // STREAMINFO
      BitReader br(buf + pos + 4, length);
      br.read(16); br.read(16);
      br.read(24); br.read(24);
      st->sample_rate = static_cast<int32_t>(br.read(20));
      st->channels = static_cast<int32_t>(br.read(3)) + 1;
      st->bits = static_cast<int32_t>(br.read(5)) + 1;
      st->total_samples = static_cast<int64_t>(br.read(36));
      have_info = true;
    }
    pos += 4 + length;
    if (last) break;
  }
  if (!have_info) return nullptr;
  if (st->total_samples)
    st->data.reserve(st->total_samples * st->channels);

  BitReader br(buf, n, pos);
  std::vector<int64_t> sub[2];
  std::vector<std::vector<int64_t>> subs;
  while (!br.at_end()) {
    if (br.read(14) != 0x3FFE) return nullptr;  // frame sync
    br.read(1);  // reserved
    br.read(1);  // blocking strategy
    int bs_code = static_cast<int>(br.read(4));
    int sr_code = static_cast<int>(br.read(4));
    int chan_code = static_cast<int>(br.read(4));
    int ss_code = static_cast<int>(br.read(3));
    br.read(1);  // reserved
    uint64_t ignored;
    if (!read_utf8_number(br, &ignored)) return nullptr;
    int blocksize;
    if (bs_code == 0) return nullptr;
    else if (bs_code == 6) blocksize = static_cast<int>(br.read(8)) + 1;
    else if (bs_code == 7) blocksize = static_cast<int>(br.read(16)) + 1;
    else blocksize = kBlocksize[bs_code];
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    else if (sr_code == 15) return nullptr;
    int bps;
    switch (ss_code) {
      case 0: bps = st->bits; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return nullptr;
    }
    br.read(8);  // header CRC-8 (not verified)
    if (br.fail) return nullptr;

    int n_ch;
    if (chan_code < 8) {
      n_ch = chan_code + 1;
      subs.resize(n_ch);
      for (int c = 0; c < n_ch; ++c)
        if (!decode_subframe(br, blocksize, bps, subs[c])) return nullptr;
    } else if (chan_code <= 10) {
      n_ch = 2;
      subs.resize(2);
      // side channel carries +1 bit
      int bps0 = bps + (chan_code == 9 ? 1 : 0);
      int bps1 = bps + (chan_code == 9 ? 0 : 1);
      if (!decode_subframe(br, blocksize, bps0, sub[0])) return nullptr;
      if (!decode_subframe(br, blocksize, bps1, sub[1])) return nullptr;
      subs[0].resize(blocksize);
      subs[1].resize(blocksize);
      for (int i = 0; i < blocksize; ++i) {
        int64_t a = sub[0][i], b = sub[1][i];
        if (chan_code == 8) {          // left/side
          subs[0][i] = a;
          subs[1][i] = a - b;
        } else if (chan_code == 9) {   // right/side (a=side, b=right)
          subs[0][i] = a + b;
          subs[1][i] = b;
        } else {                       // mid/side
          int64_t mid = (a << 1) | (b & 1);
          subs[0][i] = (mid + b) >> 1;
          subs[1][i] = (mid - b) >> 1;
        }
      }
    } else {
      return nullptr;  // reserved channel assignment
    }
    if (n_ch != st->channels) return nullptr;
    br.align();
    br.read(16);  // frame CRC-16 (not verified)
    if (br.fail) return nullptr;
    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < n_ch; ++c)
        st->data.push_back(static_cast<int32_t>(subs[c][i]));
  }
  if (st->total_samples &&
      st->data.size() >
          static_cast<size_t>(st->total_samples * st->channels))
    st->data.resize(st->total_samples * st->channels);
  return st.release();
}

}  // namespace

extern "C" {

void* owc_flac_open(const uint8_t* buf, int64_t n) {
  try {
    return decode(buf, n);
  } catch (const std::bad_alloc&) {
    return nullptr;
  }
}

int owc_flac_info(void* h, int32_t* sr, int32_t* ch, int32_t* bits) {
  auto* st = static_cast<FlacStream*>(h);
  *sr = st->sample_rate;
  *ch = st->channels;
  *bits = st->bits;
  return 0;
}

int64_t owc_flac_samples(void* h) {
  auto* st = static_cast<FlacStream*>(h);
  return st->channels ? static_cast<int64_t>(st->data.size()) / st->channels
                      : 0;
}

const int32_t* owc_flac_data(void* h) {
  return static_cast<FlacStream*>(h)->data.data();
}

void owc_flac_close(void* h) { delete static_cast<FlacStream*>(h); }

}  // extern "C"
