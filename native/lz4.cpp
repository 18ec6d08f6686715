// LZ4 block + frame codec (decompression and a greedy compressor).
//
// Needed for AEDAT-4 event recordings: iniVation DV writes packet
// payloads LZ4-frame-compressed by default (reference consumes them via
// the `aedat` python package, /root/reference/v2e/aedat_to_csv.py:16-45,
// which is not available in this image). Implemented from the public
// LZ4 block/frame format specs; no LZ4 source code is vendored.
//
// C ABI (ctypes): see events/aedat4.py for the Python side.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint32_t kFrameMagic = 0x184D2204u;

inline uint16_t read_le16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t read_le32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
inline void write_le16(uint8_t* p, uint16_t v) {
  p[0] = static_cast<uint8_t>(v);
  p[1] = static_cast<uint8_t>(v >> 8);
}
inline void write_le32(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v);
  p[1] = static_cast<uint8_t>(v >> 8);
  p[2] = static_cast<uint8_t>(v >> 16);
  p[3] = static_cast<uint8_t>(v >> 24);
}

// xxHash32 (public domain algorithm) — needed for the frame descriptor
// header checksum byte.
uint32_t xxh32(const uint8_t* p, size_t len, uint32_t seed) {
  constexpr uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                     P4 = 668265263u, P5 = 374761393u;
  auto rotl = [](uint32_t v, int r) { return (v << r) | (v >> (32 - r)); };
  const uint8_t* const end = p + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* const limit = end - 16;
    do {
      v1 = rotl(v1 + read_le32(p) * P2, 13) * P1; p += 4;
      v2 = rotl(v2 + read_le32(p) * P2, 13) * P1; p += 4;
      v3 = rotl(v3 + read_le32(p) * P2, 13) * P1; p += 4;
      v4 = rotl(v4 + read_le32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint32_t>(len);
  while (p + 4 <= end) {
    h = rotl(h + read_le32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl(h + (*p++) * P5, 11) * P1;
  }
  h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
  return h;
}

// Decompress one raw LZ4 block. ``prefix_len`` is the number of
// already-decompressed bytes immediately BEFORE ``dst`` that match
// offsets may reach into (block-LINKED frames — the default mode of
// standard lz4-frame encoders — chain their 64KB blocks this way; for
// independent blocks pass 0). Returns bytes written, -1 if ``dst_cap``
// is too small, or -2 on malformed input.
int64_t block_decompress(const uint8_t* src, size_t src_len, uint8_t* dst,
                         size_t dst_cap, size_t prefix_len) {
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_cap;

  while (ip < iend) {
    const uint8_t token = *ip++;
    // literals
    size_t lit_len = token >> 4;
    if (lit_len == 15) {
      uint8_t s;
      do {
        if (ip >= iend) return -2;
        s = *ip++;
        lit_len += s;
      } while (s == 255);
    }
    if (static_cast<size_t>(iend - ip) < lit_len) return -2;
    if (static_cast<size_t>(oend - op) < lit_len) return -1;
    std::memcpy(op, ip, lit_len);
    ip += lit_len;
    op += lit_len;
    if (ip >= iend) break;  // last sequence is literals-only

    // match
    if (iend - ip < 2) return -2;
    const size_t offset = read_le16(ip);
    ip += 2;
    if (offset == 0 || offset > static_cast<size_t>(op - dst) + prefix_len)
      return -2;
    size_t match_len = (token & 0x0F);
    if (match_len == 15) {
      uint8_t s;
      do {
        if (ip >= iend) return -2;
        s = *ip++;
        match_len += s;
      } while (s == 255);
    }
    match_len += 4;
    if (static_cast<size_t>(oend - op) < match_len) return -1;
    const uint8_t* match = op - offset;
    // byte-wise copy: overlapping matches are the RLE case and must
    // replay already-written bytes
    for (size_t i = 0; i < match_len; ++i) op[i] = match[i];
    op += match_len;
  }
  return op - dst;
}

// Greedy single-pass LZ4 block compressor (hash-chain-free: 64Ki entry
// hash table, last match wins). Always emits a valid block; worst case
// expands by ~0.4% + 15 bytes.
int64_t block_compress(const uint8_t* src, size_t src_len, uint8_t* dst,
                       size_t dst_cap) {
  constexpr size_t kMinMatch = 4;
  constexpr size_t kHashLog = 16;
  uint32_t table[1u << kHashLog];
  std::memset(table, 0xFF, sizeof(table));

  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  // spec: last match must start at least 12 bytes before block end and
  // last 5 bytes are always literals
  const uint8_t* const mflimit = src_len > 12 ? iend - 12 : src;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_cap;
  const uint8_t* anchor = src;

  auto hash4 = [](const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return (v * 2654435761u) >> (32 - kHashLog);
  };

  auto emit = [&](const uint8_t* lit, size_t lit_len, size_t offset,
                  size_t match_len) -> bool {
    // token + extended literal lengths
    size_t need = 1 + lit_len / 255 + 1 + lit_len + (offset ? 2 + match_len / 255 + 1 : 0);
    if (static_cast<size_t>(oend - op) < need) return false;
    uint8_t* token = op++;
    size_t ll = lit_len;
    if (ll >= 15) {
      *token = 15 << 4;
      ll -= 15;
      while (ll >= 255) { *op++ = 255; ll -= 255; }
      *op++ = static_cast<uint8_t>(ll);
    } else {
      *token = static_cast<uint8_t>(ll << 4);
    }
    std::memcpy(op, lit, lit_len);
    op += lit_len;
    if (offset) {
      write_le16(op, static_cast<uint16_t>(offset));
      op += 2;
      size_t ml = match_len - kMinMatch;
      if (ml >= 15) {
        *token |= 15;
        ml -= 15;
        while (ml >= 255) { *op++ = 255; ml -= 255; }
        *op++ = static_cast<uint8_t>(ml);
      } else {
        *token |= static_cast<uint8_t>(ml);
      }
    }
    return true;
  };

  while (ip < mflimit) {
    const uint32_t h = hash4(ip);
    const uint32_t cand = table[h];
    table[h] = static_cast<uint32_t>(ip - src);
    if (cand != 0xFFFFFFFFu && ip - src - cand <= 65535 &&
        std::memcmp(src + cand, ip, kMinMatch) == 0) {
      const uint8_t* match = src + cand;
      size_t match_len = kMinMatch;
      const size_t max_len = static_cast<size_t>(iend - 5 - ip);
      while (match_len < max_len && ip[match_len] == match[match_len]) ++match_len;
      if (!emit(anchor, ip - anchor, ip - match, match_len)) return -1;
      ip += match_len;
      anchor = ip;
    } else {
      ++ip;
    }
  }
  if (!emit(anchor, iend - anchor, 0, 0)) return -1;
  return op - dst;
}

}  // namespace

extern "C" {

// ---- raw blocks ----
int64_t spe_lz4_block_decompress(const uint8_t* src, size_t src_len,
                                 uint8_t* dst, size_t dst_cap) {
  return block_decompress(src, src_len, dst, dst_cap, 0);
}

int64_t spe_lz4_block_compress(const uint8_t* src, size_t src_len,
                               uint8_t* dst, size_t dst_cap) {
  return block_compress(src, src_len, dst, dst_cap);
}

// ---- LZ4 frame format (magic 0x184D2204) ----
// Decompresses a whole frame. Skippable frames are skipped; block and
// content checksums are ignored (xxhash not implemented — tolerated by
// the format: checksums are verification-only). Handles both
// block-independent and block-LINKED frames (matches may reach into
// previously decompressed blocks of the same frame). Returns bytes
// written, -1 if ``dst_cap`` is insufficient, or -2 on malformed input.
int64_t spe_lz4_frame_decompress(const uint8_t* src, size_t src_len,
                                 uint8_t* dst, size_t dst_cap) {
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dst;

  while (ip + 4 <= iend) {
    const uint32_t magic = read_le32(ip);
    if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) {  // skippable frame
      ip += 4;
      if (ip + 4 > iend) return -2;
      const uint32_t sz = read_le32(ip);
      ip += 4 + sz;
      continue;
    }
    if (magic != kFrameMagic) return -2;
    ip += 4;
    if (ip + 2 > iend) return -2;
    const uint8_t flg = *ip++;
    ip++;  // BD byte (block max size) — we size from dst_cap instead
    const bool content_size = flg & 0x08;
    const bool content_checksum = flg & 0x04;
    const bool block_checksum = flg & 0x10;
    const bool dict_id = flg & 0x01;
    if (content_size) ip += 8;
    if (dict_id) ip += 4;
    ip += 1;  // HC header checksum byte
    if (ip > iend) return -2;

    uint8_t* const frame_dst = op;  // match window start for linked blocks

    // data blocks
    for (;;) {
      if (ip + 4 > iend) return -2;
      const uint32_t bsz_raw = read_le32(ip);
      ip += 4;
      if (bsz_raw == 0) break;  // EndMark
      const bool uncompressed = bsz_raw & 0x80000000u;
      const size_t bsz = bsz_raw & 0x7FFFFFFFu;
      if (ip + bsz > iend) return -2;
      if (uncompressed) {
        if (static_cast<size_t>(dst + dst_cap - op) < bsz) return -1;
        std::memcpy(op, ip, bsz);
        op += bsz;
      } else {
        const int64_t n = block_decompress(ip, bsz, op, dst + dst_cap - op,
                                           static_cast<size_t>(op - frame_dst));
        if (n < 0) return n;
        op += n;
      }
      ip += bsz;
      if (block_checksum) ip += 4;
    }
    if (content_checksum) ip += 4;
  }
  return op - dst;
}

// Compresses src into an LZ4 frame (no checksums, no content size).
// Inputs larger than the declared 4 MiB max block size are split into
// multiple INDEPENDENT blocks (each chunk compressed stand-alone, so
// the FLG block-independence bit stays truthful). Returns frame length
// or -1 if dst too small.
int64_t spe_lz4_frame_compress(const uint8_t* src, size_t src_len,
                               uint8_t* dst, size_t dst_cap) {
  constexpr size_t kMaxBlock = 4u << 20;  // must match the BD byte below
  if (dst_cap < 15) return -1;
  uint8_t* op = dst;
  write_le32(op, kFrameMagic);
  op += 4;
  const uint8_t descriptor[2] = {0x60, 0x70};  // FLG: v01, independent
                                               // blocks, no checksums;
                                               // BD: 4 MiB max block
  *op++ = descriptor[0];
  *op++ = descriptor[1];
  *op++ = static_cast<uint8_t>(xxh32(descriptor, 2, 0) >> 8);  // HC byte

  size_t done = 0;
  do {
    const size_t chunk = src_len - done < kMaxBlock ? src_len - done : kMaxBlock;
    if (static_cast<size_t>(dst + dst_cap - op) < 4) return -1;
    uint8_t* const blk_hdr = op;
    op += 4;
    int64_t n = block_compress(src + done, chunk, op, dst + dst_cap - op - 4);
    if (n < 0 || static_cast<size_t>(n) >= chunk) {
      // store uncompressed (also the incompressible-data path)
      if (static_cast<size_t>(dst + dst_cap - op) < chunk + 4) return -1;
      std::memcpy(op, src + done, chunk);
      write_le32(blk_hdr, static_cast<uint32_t>(chunk) | 0x80000000u);
      op += chunk;
    } else {
      write_le32(blk_hdr, static_cast<uint32_t>(n));
      op += n;
    }
    done += chunk;
  } while (done < src_len);
  if (static_cast<size_t>(dst + dst_cap - op) < 4) return -1;
  write_le32(op, 0);  // EndMark
  op += 4;
  return op - dst;
}

}  // extern "C"
