// RTMP chunk-stream deserializer — native fast path for the hot ingest
// loop (swiftvideo_tpu/net/rtmp/chunks.py::ChunkDeserializer is the
// behavioral spec and the fallback; this implementation mirrors it
// byte-for-byte, including the RFC1982-style rollover arithmetic, the
// wire-tracked extended-timestamp flag, and the pending-byte cap).
//
// Role parity: the reference offloads its network hot path to SwiftNIO's
// native transport (/root/reference/Sources/SwiftVideo/rtmp/deserialize.swift
// runs on NIO event loops); here the per-wire-chunk parse work moves to
// C++ while session logic stays in Python.
//
// Contract (one message per poll, so callers can apply control messages
// — SetChunkSize — between polls exactly like the Python path):
//   h = sv_rtmp_dechunk_new(chunk_size, max_pending)
//   sv_rtmp_dechunk_append(h, bytes, len)
//   r = sv_rtmp_dechunk_poll(h, hdr28, &payload, &plen)
//       1 -> one complete message (payload valid until the next call on h)
//       0 -> need more bytes
//      -1 -> protocol error (sv_rtmp_dechunk_error)
//   sv_rtmp_dechunk_set_chunk_size(h, n)
//   sv_rtmp_dechunk_free(h)
//
// hdr28 layout (little-endian, no padding surprises — written bytewise):
//   u32 chunk_stream_id | u32 msg_stream_id | u32 msg_length |
//   u8 msg_type | u8 extended | u16 pad | i64 timestamp | u32 ts_delta

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Partial {
  uint32_t msg_stream_id = 0;
  uint32_t msg_length = 0;
  uint8_t msg_type = 0;
  int64_t timestamp = 0;  // absolute, rollover-extended (can exceed 2^32)
  uint32_t timestamp_delta = 0;
  bool extended = false;  // wire-tracked: last header used extended encoding
  std::vector<uint8_t> data;
};

struct Dechunker {
  uint32_t in_chunk_size;
  uint64_t max_pending;
  std::unordered_map<uint32_t, Partial> partials;
  std::vector<uint8_t> buf;
  size_t pos = 0;  // read offset; compacted on stall
  std::vector<uint8_t> payload;  // last completed message's payload
  std::string err;
};

inline uint32_t be24(const uint8_t* p) {
  return (uint32_t(p[0]) << 16) | (uint32_t(p[1]) << 8) | p[2];
}
inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | p[3];
}
inline uint32_t le32(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}
inline uint16_t le16(const uint8_t* p) {
  return uint16_t(p[0]) | (uint16_t(p[1]) << 8);
}

// Read the be24 timestamp/delta field at offset `pos` (relative to the
// chunk start) plus the optional extended word that follows the fixed
// `need`-byte message header.  Returns false to stall.
inline bool read_ts(const uint8_t* c, size_t avail, size_t pos, size_t need,
                    uint32_t* ts, size_t* hdr_len, bool* ext) {
  if (avail < pos + need) return false;
  uint32_t v = be24(c + pos);
  if (v == 0xFFFFFF) {
    if (avail < pos + need + 4) return false;
    *ts = be32(c + pos + need);
    *hdr_len = need + 4;
    *ext = true;
    return true;
  }
  *ts = v;
  *hdr_len = need;
  *ext = false;
  return true;
}

// Parse one wire chunk at d->pos.  Returns consumed byte count (0 =>
// stall); *done set when a message completed (its partial is *out).
size_t try_parse(Dechunker* d, bool* done, Partial** out, uint32_t* out_csid) {
  *done = false;
  const uint8_t* c = d->buf.data() + d->pos;
  size_t avail = d->buf.size() - d->pos;
  if (avail == 0) return 0;
  uint8_t b0 = c[0];
  unsigned fmt = (b0 & 0xC0) >> 6;
  uint32_t csid = b0 & 0x3F;
  size_t pos = 1;
  if (csid == 0) {
    if (avail < 2) return 0;
    csid = uint32_t(c[1]) + 64;
    pos = 2;
  } else if (csid == 1) {
    if (avail < 3) return 0;
    csid = uint32_t(le16(c + 1)) + 64;  // 3-byte form is biased (spec 5.3.1.1)
    pos = 3;
  }
  auto it = d->partials.find(csid);
  Partial* prev = (it == d->partials.end()) ? nullptr : &it->second;
  uint32_t ts = 0;
  size_t hdr_len = 0;
  bool ext = false;
  size_t body_pos, take;

  switch (fmt) {
    case 0: {
      if (!read_ts(c, avail, pos, 11, &ts, &hdr_len, &ext)) return 0;
      uint32_t length = be24(c + pos + 3);
      uint8_t msg_type = c[pos + 6];
      uint32_t msid = le32(c + pos + 7);
      body_pos = pos + hdr_len;
      take = length < d->in_chunk_size ? length : d->in_chunk_size;
      if (avail < body_pos + take) return 0;
      int64_t timestamp;
      if (prev != nullptr) {
        // RFC1982 serial arithmetic (deserialize.swift:92-101; spec
        // modulus 2^32, deviating from the reference's % 0xffffffff)
        uint32_t prev_serial = uint32_t(uint64_t(prev->timestamp) &
                                        0xFFFFFFFFull);
        if (prev_serial > ts && (prev_serial - ts) > 0x7FFFFFFFu) {
          timestamp = prev->timestamp + int64_t(ts) +
                      (int64_t(0x100000000ll) - int64_t(prev_serial));
        } else {
          timestamp = prev->timestamp + (int64_t(ts) - int64_t(prev_serial));
        }
      } else {
        timestamp = int64_t(ts);
        prev = &d->partials[csid];
      }
      prev->msg_stream_id = msid;
      prev->msg_length = length;
      prev->msg_type = msg_type;
      prev->timestamp = timestamp;
      prev->timestamp_delta = 0;
      prev->extended = ext;  // what the WIRE said, not value-derived
      prev->data.assign(c + body_pos, c + body_pos + take);
      break;
    }
    case 1: {
      if (prev == nullptr) return 0;
      if (!read_ts(c, avail, pos, 7, &ts, &hdr_len, &ext)) return 0;
      uint32_t length = be24(c + pos + 3);
      uint8_t msg_type = c[pos + 6];
      body_pos = pos + hdr_len;
      take = length < d->in_chunk_size ? length : d->in_chunk_size;
      if (avail < body_pos + take) return 0;
      prev->msg_length = length;
      prev->msg_type = msg_type;
      prev->timestamp += int64_t(ts);
      prev->timestamp_delta = ts;
      prev->extended = ext;
      prev->data.assign(c + body_pos, c + body_pos + take);
      break;
    }
    case 2: {
      if (prev == nullptr) return 0;
      if (!read_ts(c, avail, pos, 3, &ts, &hdr_len, &ext)) return 0;
      body_pos = pos + hdr_len;
      take = prev->msg_length < d->in_chunk_size ? prev->msg_length
                                                 : d->in_chunk_size;
      if (avail < body_pos + take) return 0;
      prev->timestamp += int64_t(ts);
      prev->timestamp_delta = ts;
      prev->extended = ext;
      prev->data.assign(c + body_pos, c + body_pos + take);
      break;
    }
    default: {  // fmt == 3: continuation / header repeat
      if (prev == nullptr) return 0;
      body_pos = pos + (prev->extended ? 4 : 0);
      size_t already = prev->data.size();
      size_t remain = prev->msg_length - already;
      take = remain < d->in_chunk_size ? remain : d->in_chunk_size;
      if (avail < body_pos + take) return 0;
      if (already == 0)  // new message repeating the previous header
        prev->timestamp += int64_t(prev->timestamp_delta);
      prev->data.insert(prev->data.end(), c + body_pos, c + body_pos + take);
      break;
    }
  }
  if (prev->data.size() == prev->msg_length) {
    *done = true;
    *out = prev;
    *out_csid = csid;
  }
  return body_pos + take;
}

inline void put_u32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v); p[1] = uint8_t(v >> 8);
  p[2] = uint8_t(v >> 16); p[3] = uint8_t(v >> 24);
}
inline void put_i64(uint8_t* p, int64_t v) {
  uint64_t u = uint64_t(v);
  for (int i = 0; i < 8; i++) p[i] = uint8_t(u >> (8 * i));
}

}  // namespace

extern "C" {

void* sv_rtmp_dechunk_new(uint32_t chunk_size, uint64_t max_pending) {
  Dechunker* d = new Dechunker();
  d->in_chunk_size = chunk_size;
  d->max_pending = max_pending;
  return d;
}

void sv_rtmp_dechunk_free(void* h) { delete static_cast<Dechunker*>(h); }

void sv_rtmp_dechunk_set_chunk_size(void* h, uint32_t n) {
  static_cast<Dechunker*>(h)->in_chunk_size = n;
}

void sv_rtmp_dechunk_append(void* h, const uint8_t* data, uint64_t len) {
  Dechunker* d = static_cast<Dechunker*>(h);
  d->buf.insert(d->buf.end(), data, data + len);
}

// 1 = message (hdr28 + payload set), 0 = need more bytes, -1 = error.
int sv_rtmp_dechunk_poll(void* h, uint8_t* hdr28, const uint8_t** payload,
                         uint64_t* plen) {
  Dechunker* d = static_cast<Dechunker*>(h);
  for (;;) {
    bool done = false;
    Partial* p = nullptr;
    uint32_t csid = 0;
    size_t consumed = try_parse(d, &done, &p, &csid);
    if (consumed == 0) {
      if (d->pos) {  // compact only when parsing stalls (Python parity)
        d->buf.erase(d->buf.begin(), d->buf.begin() + long(d->pos));
        d->pos = 0;
      }
      if (d->buf.size() > d->max_pending) {
        d->err = "rtmp inbound buffer exceeded " +
                 std::to_string(d->max_pending) +
                 " bytes without a parseable chunk (protocol violation "
                 "or desync)";
        return -1;
      }
      return 0;
    }
    d->pos += consumed;
    if (done) {
      put_u32(hdr28 + 0, csid);
      put_u32(hdr28 + 4, p->msg_stream_id);
      put_u32(hdr28 + 8, p->msg_length);
      hdr28[12] = p->msg_type;
      hdr28[13] = p->extended ? 1 : 0;
      hdr28[14] = 0;
      hdr28[15] = 0;
      put_i64(hdr28 + 16, p->timestamp);
      put_u32(hdr28 + 24, p->timestamp_delta);
      d->payload.swap(p->data);
      p->data.clear();
      *payload = d->payload.data();
      *plen = d->payload.size();
      return 1;
    }
  }
}

const char* sv_rtmp_dechunk_error(void* h) {
  return static_cast<Dechunker*>(h)->err.c_str();
}

// bytes appended but not yet consumed by a parse (bounded-buffer checks)
uint64_t sv_rtmp_dechunk_pending(void* h) {
  Dechunker* d = static_cast<Dechunker*>(h);
  return d->buf.size() - d->pos;
}

}  // extern "C"
