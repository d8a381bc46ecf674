// Native bitstream parsing helpers for swiftvideo_tpu.
//
// Role parity with the reference's native shim
// (/root/reference/Sources/CSwiftVideo/shim.cpp): an Exp-Golomb bit reader,
// H.264 SPS frame-size extraction, AAC AudioSpecificConfig parsing, and a
// self-test hook. Implemented from the ITU-T H.264 (07/2021) 7.3.2.1.1 and
// ISO/IEC 14496-3 AudioSpecificConfig bitstream definitions.
//
// Build: make -C csrc  ->  libsvbitstream.so, loaded via ctypes
// (swiftvideo_tpu/codec/bitstream.py), which also carries a pure-Python
// fallback with identical behavior.

#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// Bit reader over a byte buffer, MSB first, with optional H.264
// emulation-prevention-byte (00 00 03) removal done up front.
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size, bool strip_epb) {
    if (strip_epb) {
      buf_.reserve(size);
      int zeros = 0;
      for (size_t i = 0; i < size; ++i) {
        const uint8_t b = data[i];
        if (zeros >= 2 && b == 0x03) {
          zeros = 0;
          continue;  // drop emulation prevention byte
        }
        zeros = (b == 0) ? zeros + 1 : 0;
        buf_.push_back(b);
      }
    } else {
      buf_.assign(data, data + size);
    }
  }

  bool ok() const { return !overrun_; }

  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (pos_ >= buf_.size() * 8) {
        overrun_ = true;
        return 0;
      }
      const uint8_t byte = buf_[pos_ >> 3];
      v = (v << 1) | ((byte >> (7 - (pos_ & 7))) & 1);
      ++pos_;
    }
    return v;
  }

  // Unsigned Exp-Golomb: count leading zeros, read that many more bits.
  uint32_t ue() {
    int zeros = 0;
    while (bits(1) == 0 && !overrun_ && zeros < 32) ++zeros;
    if (overrun_) return 0;
    if (zeros == 32) {
      // 32+ leading zeros encodes a value >= 2^32-1 — no legal SPS/PPS
      // field; treat as corrupt (1u << 32 would be UB and diverge from
      // the Python fallback)
      overrun_ = true;
      return 0;
    }
    uint32_t v = (1u << zeros) - 1 + bits(zeros);
    return v;
  }

  // Signed Exp-Golomb.
  int32_t se() {
    const uint32_t k = ue();
    return (k & 1) ? static_cast<int32_t>((k + 1) / 2)
                   : -static_cast<int32_t>(k / 2);
  }

 private:
  std::vector<uint8_t> buf_;
  size_t pos_ = 0;
  bool overrun_ = false;
};

void skip_scaling_list(BitReader& br, int size) {
  int last = 8, next = 8;
  for (int i = 0; i < size; ++i) {
    if (next != 0) {
      next = (last + br.se() + 256) % 256;
    }
    last = (next == 0) ? last : next;
  }
}

}  // namespace

extern "C" {

// Parse an H.264 sequence parameter set NAL payload (with or without the
// one-byte NAL header) and return the coded frame size. Returns 0 on
// success, negative on parse failure.
int h264_sps_frame_size(const uint8_t* data, int64_t size, int32_t* width,
                        int32_t* height) {
  if (data == nullptr || size < 4 || width == nullptr || height == nullptr) {
    return -1;
  }
  // Skip the NAL header byte if present (forbidden_zero_bit==0, type==7).
  size_t off = ((data[0] & 0x1F) == 7) ? 1 : 0;
  BitReader br(data + off, static_cast<size_t>(size) - off, true);

  const uint32_t profile_idc = br.bits(8);
  br.bits(8);  // constraint flags + reserved
  br.bits(8);  // level_idc
  br.ue();     // seq_parameter_set_id

  uint32_t chroma_format_idc = 1;
  switch (profile_idc) {
    case 100: case 110: case 122: case 244: case 44: case 83:
    case 86: case 118: case 128: case 138: case 139: case 134: case 135: {
      chroma_format_idc = br.ue();
      if (chroma_format_idc == 3) br.bits(1);  // separate_colour_plane_flag
      br.ue();    // bit_depth_luma_minus8
      br.ue();    // bit_depth_chroma_minus8
      br.bits(1); // qpprime_y_zero_transform_bypass_flag
      if (br.bits(1)) {  // seq_scaling_matrix_present_flag
        const int lists = (chroma_format_idc != 3) ? 8 : 12;
        for (int i = 0; i < lists; ++i) {
          if (br.bits(1)) skip_scaling_list(br, i < 6 ? 16 : 64);
        }
      }
      break;
    }
    default:
      break;
  }

  br.ue();  // log2_max_frame_num_minus4
  const uint32_t poc_type = br.ue();
  if (poc_type == 0) {
    br.ue();  // log2_max_pic_order_cnt_lsb_minus4
  } else if (poc_type == 1) {
    br.bits(1);  // delta_pic_order_always_zero_flag
    br.se();     // offset_for_non_ref_pic
    br.se();     // offset_for_top_to_bottom_field
    const uint32_t cycles = br.ue();
    for (uint32_t i = 0; i < cycles && br.ok(); ++i) br.se();
  }
  br.ue();     // max_num_ref_frames
  br.bits(1);  // gaps_in_frame_num_value_allowed_flag

  const uint32_t pic_width_in_mbs_minus1 = br.ue();
  const uint32_t pic_height_in_map_units_minus1 = br.ue();
  const uint32_t frame_mbs_only_flag = br.bits(1);
  if (!frame_mbs_only_flag) br.bits(1);  // mb_adaptive_frame_field_flag
  br.bits(1);                            // direct_8x8_inference_flag

  uint32_t crop_l = 0, crop_r = 0, crop_t = 0, crop_b = 0;
  if (br.bits(1)) {  // frame_cropping_flag
    crop_l = br.ue();
    crop_r = br.ue();
    crop_t = br.ue();
    crop_b = br.ue();
  }
  if (!br.ok()) return -2;

  // Crop units per chroma format (H.264 table 6-1).
  uint32_t sub_w = 1, sub_h = 1;
  if (chroma_format_idc == 1) { sub_w = 2; sub_h = 2; }
  else if (chroma_format_idc == 2) { sub_w = 2; sub_h = 1; }
  const uint32_t unit_x = (chroma_format_idc == 0) ? 1 : sub_w;
  const uint32_t unit_y =
      ((chroma_format_idc == 0) ? 1 : sub_h) * (2 - frame_mbs_only_flag);

  *width = static_cast<int32_t>((pic_width_in_mbs_minus1 + 1) * 16 -
                                (crop_l + crop_r) * unit_x);
  *height = static_cast<int32_t>((2 - frame_mbs_only_flag) *
                                     (pic_height_in_map_units_minus1 + 1) * 16 -
                                 (crop_t + crop_b) * unit_y);
  return 0;
}

static const int32_t kAacRates[16] = {96000, 88200, 64000, 48000, 44100, 32000,
                                      24000, 22050, 16000, 12000, 11025, 8000,
                                      7350,  0,     0,     0};

// Parse an AudioSpecificConfig: channels, sample rate (including 24-bit
// explicit rates), samples per frame (960 when the GA frameLengthFlag is
// set, else 1024). Returns 0 on success.
int aac_parse_asc(const uint8_t* data, int64_t size, int32_t* channels,
                  int32_t* sample_rate, int32_t* samples_per_frame) {
  if (data == nullptr || size < 2 || channels == nullptr ||
      sample_rate == nullptr || samples_per_frame == nullptr) {
    return -1;
  }
  BitReader br(data, static_cast<size_t>(size), false);
  uint32_t aot = br.bits(5);
  if (aot == 31) aot = 32 + br.bits(6);
  uint32_t freq_index = br.bits(4);
  int32_t rate = (freq_index == 15) ? static_cast<int32_t>(br.bits(24))
                                    : kAacRates[freq_index & 0xF];
  uint32_t chan_config = br.bits(4);

  // SBR/PS explicit signaling: extensionAudioObjectType 5 overrides rate.
  if (aot == 5 || aot == 29) {
    uint32_t ext_freq = br.bits(4);
    rate = (ext_freq == 15) ? static_cast<int32_t>(br.bits(24))
                            : kAacRates[ext_freq & 0xF];
    aot = br.bits(5);
    if (aot == 31) aot = 32 + br.bits(6);
  }

  int32_t frame_len = 1024;
  // GASpecificConfig for the AAC family: frameLengthFlag selects 960.
  switch (aot) {
    case 1: case 2: case 3: case 4: case 6: case 7: case 17:
    case 19: case 20: case 21: case 22: case 23:
      if (br.bits(1)) frame_len = 960;
      break;
    default:
      break;
  }
  if (!br.ok()) return -2;
  *channels = (chan_config == 7) ? 8 : static_cast<int32_t>(chan_config);
  *sample_rate = rate;
  *samples_per_frame = frame_len;
  return 0;
}

// Fill a buffer with cryptographically random-ish bytes (std::random_device).
void sv_generate_random_bytes(uint8_t* out, int64_t size) {
  static thread_local std::mt19937_64 gen{std::random_device{}()};
  int64_t i = 0;
  for (; i + 8 <= size; i += 8) {
    const uint64_t v = gen();
    std::memcpy(out + i, &v, 8);
  }
  if (i < size) {
    const uint64_t v = gen();
    std::memcpy(out + i, &v, static_cast<size_t>(size - i));
  }
}

// Self-test: decode a canned Exp-Golomb sequence and fold the values.
// Expected return: 254 (checked by tests/test_bitstream.py, mirroring the
// reference's busTests.golombTest contract).
int test_golomb_dec() {
  // ue values 11, 240, 2 encoded MSB-first, followed by se value 1.
  // 11 -> 0001100 ; 240 -> 000000011110001 ; 2 -> 011 ; se(1)=ue(1) -> 010
  static const uint8_t buf[] = {0b00011000, 0b00000011, 0b11000101, 0b10100000};
  BitReader br(buf, sizeof(buf), false);
  const uint32_t a = br.ue();   // 11
  const uint32_t b = br.ue();   // 240
  const uint32_t c = br.ue();   // 2
  const int32_t d = br.se();    // 1
  return static_cast<int>(a + b + c + d);  // 254
}

}  // extern "C"
