// Native FLAC decoder (subset-complete: everything LibriSpeech-style
// streams use — CONSTANT/VERBATIM/FIXED/LPC subframes, 4- and 5-bit Rice
// partitions with raw escapes, wasted bits, all four stereo assignments,
// fixed and variable blocking, 8..32-bit samples).
//
// The reference obtains FLAC decoding from torchaudio/ffmpeg via lhotse
// (/root/reference/src/data/local_datasets.py:196-214); this framework's
// data layer is dependency-free, so the codec is implemented here and
// exposed through a C ABI consumed with ctypes (ts_asr_whisper_tpu/data/
// flac.py). Validated by byte-exact round trips against an independent
// pure-Python encoder (tests/flac_writer.py).
//
// Build: part of libtsaw_native.so (native/Makefile).

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  long len;        // bytes
  long byte_pos;
  int bit_pos;     // 0..7, bits already consumed in current byte
  bool error;

  explicit BitReader(const uint8_t* d, long n)
      : data(d), len(n), byte_pos(0), bit_pos(0), error(false) {}

  bool eof() const { return byte_pos >= len; }

  uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    while (n > 0) {
      if (byte_pos >= len) { error = true; return 0; }
      int avail = 8 - bit_pos;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      uint32_t bits = (data[byte_pos] >> shift) & ((1u << take) - 1);
      v = (v << take) | bits;
      bit_pos += take;
      if (bit_pos == 8) { bit_pos = 0; ++byte_pos; }
      n -= take;
    }
    return v;
  }

  int64_t read_signed(int n) {
    if (n == 0) return 0;
    uint64_t v = read_bits(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  // count zero bits up to the terminating 1 (rice quotient / unary)
  uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (byte_pos >= len) { error = true; return 0; }
      if (read_bits(1)) return q;
      ++q;
      if (q > 1u << 24) { error = true; return 0; }  // corrupt stream guard
    }
  }

  void align() {
    if (bit_pos) { bit_pos = 0; ++byte_pos; }
  }
};

// FLAC UTF-8-style coded number (frame/sample index, up to 36 bits)
bool read_utf8_number(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.read_bits(8);
  if (br.error) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { *out = b0; return true; }
  else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
  else if (b0 == 0xFE) { extra = 6; v = 0; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint64_t b = br.read_bits(8);
    if (br.error || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int order, int block_size,
                     int64_t* res /* block_size entries, order.. filled */) {
  int method = (int)br.read_bits(2);
  if (method > 1 || br.error) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int porder = (int)br.read_bits(4);
  int partitions = 1 << porder;
  if (block_size % partitions) return false;
  int psize = block_size >> porder;
  int idx = order;
  for (int p = 0; p < partitions; ++p) {
    int count = psize - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(plen);
    if (br.error) return false;
    if (param == escape) {
      int raw_bits = (int)br.read_bits(5);
      for (int i = 0; i < count; ++i)
        res[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = br.read_unary();
        uint64_t u = (q << param) | br.read_bits((int)param);
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     int64_t* out /* block_size */) {
  if (br.read_bits(1) != 0) return false;  // reserved pad bit
  int type = (int)br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = (int)br.read_unary() + 1;
  if (br.error) return false;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = type - 8;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, order, block_size, out)) return false;
    const int* c = kFixedCoefs[order];
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)c[j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC, order = type - 31
    int order = type - 31;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int prec = (int)br.read_bits(4) + 1;
    if (prec == 16) return false;  // 1111 invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(prec);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (br.error) return false;
  if (wasted)
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return true;
}

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bps = 0;
  long total_samples = 0;
  long audio_offset = 0;  // byte offset of the first frame
};

bool parse_stream_info(const uint8_t* data, long len, StreamInfo* si) {
  if (len < 42 || memcmp(data, "fLaC", 4) != 0) return false;
  long pos = 4;
  bool last = false;
  while (!last) {
    if (pos + 4 > len) return false;
    last = (data[pos] & 0x80) != 0;
    int type = data[pos] & 0x7F;
    long blen = ((long)data[pos + 1] << 16) | ((long)data[pos + 2] << 8)
        | data[pos + 3];
    pos += 4;
    if (pos + blen > len) return false;
    if (type == 0) {  // STREAMINFO
      BitReader br(data + pos, blen);
      br.read_bits(16);  // min blocksize
      br.read_bits(16);  // max blocksize
      br.read_bits(24);  // min framesize
      br.read_bits(24);  // max framesize
      si->sample_rate = (int)br.read_bits(20);
      si->channels = (int)br.read_bits(3) + 1;
      si->bps = (int)br.read_bits(5) + 1;
      si->total_samples = (long)br.read_bits(36);
      if (br.error) return false;
    }
    pos += blen;
  }
  si->audio_offset = pos;
  return si->sample_rate > 0;
}

const int kBlockSizes[16] = {0,    192,  576,  1152, 2304, 4608, -1, -2,
                             256,  512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                              22050, 24000, 32000,  44100,  48000, 96000,
                              -1,    -2,    -3,     0};

}  // namespace

extern "C" {

// Parse STREAMINFO: returns 0 on success.
int flac_stream_info(const uint8_t* data, long len, int* sample_rate,
                     int* channels, int* bps, long* total_samples) {
  StreamInfo si;
  if (!parse_stream_info(data, len, &si)) return -1;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bps = si.bps;
  *total_samples = si.total_samples;
  return 0;
}

// Decode the whole stream into interleaved int32 samples (sign-extended to
// the stream's bit depth). Returns samples-per-channel decoded, -1 on a
// corrupt/unsupported stream, or -2 when out_capacity is too small (the
// caller should retry with a larger buffer — streams with an unset
// STREAMINFO total can only be sized by decoding).
long flac_decode(const uint8_t* data, long len, int32_t* out,
                 long out_capacity /* total int32 slots */) {
  StreamInfo si;
  if (!parse_stream_info(data, len, &si)) return -1;
  BitReader br(data + si.audio_offset, len - si.audio_offset);

  static thread_local int64_t* chan_buf = nullptr;
  static thread_local long chan_cap = 0;

  long done = 0;  // samples per channel
  while (!br.eof()) {
    // frame header
    br.align();
    if (br.byte_pos >= br.len) break;
    uint64_t sync = br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) {
      // tolerate trailing non-frame bytes (appended tags/padding) once at
      // least one frame decoded; a bad first sync is a corrupt stream
      if (done > 0) break;
      return -1;
    }
    br.read_bits(1);                       // reserved
    br.read_bits(1);                       // blocking strategy
    int bs_code = (int)br.read_bits(4);
    int sr_code = (int)br.read_bits(4);
    int ch_code = (int)br.read_bits(4);
    int ss_code = (int)br.read_bits(3);
    br.read_bits(1);                       // reserved
    uint64_t frame_no;
    if (!read_utf8_number(br, &frame_no)) return -1;

    int block_size;
    if (bs_code == 6) block_size = (int)br.read_bits(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read_bits(16) + 1;
    else if (bs_code == 0) return -1;
    else block_size = kBlockSizes[bs_code];

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    else if (sr_code == 15) return -1;

    int channels;
    int assignment = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code < 8) { channels = ch_code + 1; }
    else if (ch_code == 8) { channels = 2; assignment = 1; }
    else if (ch_code == 9) { channels = 2; assignment = 2; }
    else if (ch_code == 10) { channels = 2; assignment = 3; }
    else return -1;
    if (channels != si.channels) return -1;

    int bps;
    switch (ss_code) {
      case 0: bps = si.bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }
    br.read_bits(8);  // header CRC-8 (not verified: encoder-side concern)

    long need = (long)block_size * channels;
    if (need > chan_cap) {
      delete[] chan_buf;
      chan_buf = new int64_t[need];
      chan_cap = need;
    }

    for (int c = 0; c < channels; ++c) {
      int sub_bps = bps;
      if ((assignment == 1 && c == 1) || (assignment == 2 && c == 0) ||
          (assignment == 3 && c == 1))
        sub_bps += 1;  // the side channel carries one extra bit
      if (!decode_subframe(br, block_size, sub_bps,
                           chan_buf + (long)c * block_size))
        return -1;
    }
    br.align();
    br.read_bits(16);  // frame CRC-16 (not verified)
    if (br.error) return -1;

    // stereo decorrelation
    int64_t* ch0 = chan_buf;
    int64_t* ch1 = chan_buf + block_size;
    if (assignment == 1) {        // left/side: R = L - side
      for (int i = 0; i < block_size; ++i) ch1[i] = ch0[i] - ch1[i];
    } else if (assignment == 2) { // right/side: L = side + R
      for (int i = 0; i < block_size; ++i) ch0[i] = ch0[i] + ch1[i];
    } else if (assignment == 3) { // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = ch1[i];
        int64_t mid = (ch0[i] << 1) | (side & 1);
        ch0[i] = (mid + side) >> 1;
        ch1[i] = (mid - side) >> 1;
      }
    }

    long take = block_size;
    if (si.total_samples && done + take > si.total_samples)
      take = si.total_samples - done;  // final partial block
    if ((done + take) * channels > out_capacity) return -2;
    for (long i = 0; i < take; ++i)
      for (int c = 0; c < channels; ++c)
        out[(done + i) * channels + c] =
            (int32_t)chan_buf[(long)c * block_size + i];
    done += take;
    if (si.total_samples && done >= si.total_samples) break;
  }
  return done;
}

}  // extern "C"
