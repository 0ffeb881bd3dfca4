// Native buffer codec for iris_lama_tpu — LZ4 block format, from scratch.
//
// TPU-native counterpart of the reference's BufferCompressor
// (reference: include/lama/buffer_compressor.h:43-80,
// src/buffer_compressor.cpp — LZ4_compress_fast level 1 / zstd level 1
// behind an LRU). On TPU the patch pool lives in HBM, so compression is a
// *host-memory* concern: map checkpoints, .smd snapshots and host-side
// patch eviction. This implements the LZ4 block format (the same wire
// format the reference's vendored lz4 emits), so compressed payloads
// interoperate, without vendoring any third-party code.
//
// Format (LZ4 block spec): sequences of
//   [token: hi=literal_len lo=match_len-4] [literal_len ext bytes of 255]
//   [literals] [offset u16 LE] [match_len ext bytes of 255]
// Final sequence is literals-only; the last 5 bytes of output are literals
// and no match may cover the last 12 input bytes.
//
// Exposed C ABI (ctypes):
//   int64 lama_lz4_compress(const uint8_t*, int64, uint8_t*, int64)
//   int64 lama_lz4_decompress(const uint8_t*, int64, uint8_t*, int64)
//   int64 lama_lz4_compress_bound(int64)

#include <cstdint>
#include <cstring>

namespace {

constexpr int MIN_MATCH = 4;
constexpr int LAST_LITERALS = 5;
constexpr int MFLIMIT = 12;
constexpr int HASH_LOG = 16;

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint32_t hash4(uint32_t v) {
  return (v * 2654435761u) >> (32 - HASH_LOG);
}

}  // namespace

extern "C" {

int64_t lama_lz4_compress_bound(int64_t n) {
  return n + n / 255 + 16;
}

int64_t lama_lz4_compress(const uint8_t* src, int64_t src_len, uint8_t* dst,
                          int64_t dst_cap) {
  if (src_len < 0 || dst_cap <= 0) return -1;
  uint32_t table[1u << HASH_LOG];
  std::memset(table, 0xFF, sizeof(table));

  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  const uint8_t* const mflimit =
      (src_len > MFLIMIT) ? iend - MFLIMIT : src;
  const uint8_t* anchor = src;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_cap;

  auto emit = [&](const uint8_t* lit, int64_t lit_len, int64_t match_len,
                  int64_t offset) -> bool {
    // worst-case size check
    int64_t need = 1 + lit_len / 255 + 1 + lit_len + 2 + match_len / 255 + 1;
    if (op + need > oend) return false;
    uint8_t* token = op++;
    int64_t ll = lit_len;
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
    if (offset == 0) return true;  // final literal-only sequence
    op[0] = static_cast<uint8_t>(offset & 0xFF);
    op[1] = static_cast<uint8_t>((offset >> 8) & 0xFF);
    op += 2;
    int64_t ml = match_len - MIN_MATCH;
    if (ml >= 15) {
      *token |= 15;
      ml -= 15;
      while (ml >= 255) { *op++ = 255; ml -= 255; }
      *op++ = static_cast<uint8_t>(ml);
    } else {
      *token |= static_cast<uint8_t>(ml);
    }
    return true;
  };

  if (src_len >= MFLIMIT + MIN_MATCH) {
    while (ip < mflimit) {
      uint32_t h = hash4(read32(ip));
      uint32_t cand = table[h];
      table[h] = static_cast<uint32_t>(ip - src);
      if (cand != 0xFFFFFFFFu && (ip - src) - cand <= 0xFFFF &&
          read32(src + cand) == read32(ip)) {
        // extend the match forward
        const uint8_t* match = src + cand;
        const uint8_t* p = ip + MIN_MATCH;
        const uint8_t* m = match + MIN_MATCH;
        const uint8_t* const match_limit = iend - LAST_LITERALS;
        while (p < match_limit && *p == *m) { ++p; ++m; }
        int64_t match_len = p - ip;
        int64_t offset = ip - match;
        if (!emit(anchor, ip - anchor, match_len, offset)) return -1;
        ip = p;
        anchor = ip;
        // refresh a couple of table entries inside the match for ratio
        if (ip < mflimit) {
          table[hash4(read32(ip - 2))] = static_cast<uint32_t>(ip - 2 - src);
        }
      } else {
        ++ip;
      }
    }
  }
  // final literals
  if (!emit(anchor, iend - anchor, 0, 0)) return -1;
  return op - dst;
}

int64_t lama_lz4_decompress(const uint8_t* src, int64_t src_len, uint8_t* dst,
                            int64_t dst_cap) {
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_cap;

  while (ip < iend) {
    uint8_t token = *ip++;
    int64_t lit_len = token >> 4;
    if (lit_len == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit_len += b;
      } while (b == 255);
    }
    if (ip + lit_len > iend || op + lit_len > oend) return -1;
    std::memcpy(op, ip, lit_len);
    ip += lit_len;
    op += lit_len;
    if (ip >= iend) break;  // final literal-only sequence

    if (ip + 2 > iend) return -1;
    int64_t offset = ip[0] | (ip[1] << 8);
    ip += 2;
    if (offset == 0 || op - dst < offset) return -1;
    int64_t match_len = (token & 0x0F) + MIN_MATCH;
    if ((token & 0x0F) == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        match_len += b;
      } while (b == 255);
    }
    if (op + match_len > oend) return -1;
    const uint8_t* match = op - offset;
    // overlapping copy must be byte-by-byte
    for (int64_t i = 0; i < match_len; ++i) op[i] = match[i];
    op += match_len;
  }
  return op - dst;
}

}  // extern "C"
