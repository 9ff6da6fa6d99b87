// Single-file database storage — native IO engine.
//
// TPU-native analog of the reference's single-file block storage
// (reference: src/storage/single_file_block_manager.cpp — 256KiB blocks,
// dual-header checkpoint swap; serializer in src/common/serializer/).
// Simplifications for the columnar in-memory engine: one contiguous blob
// region addressed by a JSON catalog, FNV-1a checksums per blob and for
// the catalog, and atomic replace via write-to-temp + rename (the
// equivalent of the reference's header swap for whole-file checkpoints).
//
// Layout:
//   [0]    magic "DDBTPU01" (8 bytes)
//   [8]    u64 version
//   [16]   u64 catalog_len
//   [24]   u64 catalog_checksum (FNV-1a over catalog bytes)
//   [32]   catalog JSON (catalog_len bytes)
//   [..]   blob region (each blob's offset/length/checksum recorded in
//          the catalog by the Python layer)
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <cmath>

extern "C" {

static const char MAGIC[8] = {'D', 'D', 'B', 'T', 'P', 'U', '0', '1'};
static const uint64_t VERSION = 1;

uint64_t dtb_checksum(const uint8_t *data, uint64_t len) {
  // FNV-1a 64
  uint64_t h = 1469598103934665603ULL;
  for (uint64_t i = 0; i < len; i++) {
    h ^= data[i];
    h *= 1099511628211ULL;
  }
  return h;
}

// Writes a complete database file atomically (temp + rename).
// blobs: array of pointers; sizes: array of lengths.
// Returns 0 on success, negative errno-style codes on failure.
int dtb_write(const char *path, const char *catalog_json,
              uint64_t catalog_len, const uint8_t **blobs,
              const uint64_t *blob_sizes, uint64_t n_blobs) {
  std::string tmp = std::string(path) + ".tmp";
  FILE *f = fopen(tmp.c_str(), "wb");
  if (!f) return -1;
  uint64_t cat_sum =
      dtb_checksum(reinterpret_cast<const uint8_t *>(catalog_json),
                   catalog_len);
  if (fwrite(MAGIC, 1, 8, f) != 8) goto fail;
  if (fwrite(&VERSION, 8, 1, f) != 1) goto fail;
  if (fwrite(&catalog_len, 8, 1, f) != 1) goto fail;
  if (fwrite(&cat_sum, 8, 1, f) != 1) goto fail;
  if (catalog_len &&
      fwrite(catalog_json, 1, catalog_len, f) != catalog_len)
    goto fail;
  for (uint64_t i = 0; i < n_blobs; i++) {
    if (blob_sizes[i] &&
        fwrite(blobs[i], 1, blob_sizes[i], f) != blob_sizes[i])
      goto fail;
  }
  if (fflush(f) != 0) goto fail;
  if (fclose(f) != 0) { remove(tmp.c_str()); return -3; }
  if (rename(tmp.c_str(), path) != 0) { remove(tmp.c_str()); return -4; }
  return 0;
fail:
  fclose(f);
  remove(tmp.c_str());
  return -2;
}

// Reads the header; returns malloc'd catalog JSON (caller frees via
// dtb_free) and sets *catalog_len.  Validates magic/version/checksum.
char *dtb_read_catalog(const char *path, uint64_t *catalog_len,
                       uint64_t *data_offset) {
  FILE *f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  uint64_t version, clen, csum;
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, MAGIC, 8) != 0 ||
      fread(&version, 8, 1, f) != 1 || version != VERSION ||
      fread(&clen, 8, 1, f) != 1 || fread(&csum, 8, 1, f) != 1) {
    fclose(f);
    return nullptr;
  }
  char *buf = static_cast<char *>(malloc(clen + 1));
  if (!buf) { fclose(f); return nullptr; }
  if (clen && fread(buf, 1, clen, f) != clen) {
    free(buf);
    fclose(f);
    return nullptr;
  }
  fclose(f);
  if (dtb_checksum(reinterpret_cast<uint8_t *>(buf), clen) != csum) {
    free(buf);
    return nullptr;
  }
  buf[clen] = '\0';
  *catalog_len = clen;
  *data_offset = 32 + clen;
  return buf;
}

// Reads `size` bytes at absolute file offset into dest.
int dtb_read_blob(const char *path, uint64_t offset, uint64_t size,
                  uint8_t *dest) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    return -2;
  }
  if (size && fread(dest, 1, size, f) != size) {
    fclose(f);
    return -3;
  }
  fclose(f);
  return 0;
}

void dtb_free(void *p) { free(p); }

// ---------------------------------------------------------------------
// Lightweight column compression codecs (reference: the compression
// function registry src/storage/compression/ — RLE, bitpacking, dictionary;
// here: byte-RLE for masks, delta+zigzag varint for int lanes, deflate for
// text payloads).  Codec ids: 0 raw, 1 byte-RLE, 2 delta-varint, 3 zlib.
// All calls return the output length, or -1 when the output would exceed
// dst_cap (callers then store raw).
// ---------------------------------------------------------------------

// codec 1: byte-level RLE, (run_len u8, byte) pairs.  Ideal for null
// masks and constant regions; worst case 2x (caller falls back to raw).
int64_t dtb_rle_compress(const uint8_t *src, uint64_t len, uint8_t *dst,
                         uint64_t dst_cap) {
  uint64_t o = 0, i = 0;
  while (i < len) {
    uint8_t b = src[i];
    uint64_t run = 1;
    while (i + run < len && src[i + run] == b && run < 255) run++;
    if (o + 2 > dst_cap) return -1;
    dst[o++] = static_cast<uint8_t>(run);
    dst[o++] = b;
    i += run;
  }
  return static_cast<int64_t>(o);
}

int64_t dtb_rle_decompress(const uint8_t *src, uint64_t len, uint8_t *dst,
                           uint64_t raw_len) {
  uint64_t o = 0, i = 0;
  while (i + 2 <= len) {
    uint8_t run = src[i], b = src[i + 1];
    i += 2;
    if (o + run > raw_len) return -1;
    memset(dst + o, b, run);
    o += run;
  }
  return o == raw_len ? static_cast<int64_t>(o) : -1;
}

// codec 2: per-lane delta + zigzag + LEB128 varint.  elem = 4 or 8.
static inline uint64_t zigzag64(int64_t v) {
  return (static_cast<uint64_t>(v) << 1) ^
         static_cast<uint64_t>(v >> 63);
}
static inline int64_t unzigzag64(uint64_t v) {
  return static_cast<int64_t>(v >> 1) ^ -static_cast<int64_t>(v & 1);
}

int64_t dtb_delta_compress(const uint8_t *src, uint64_t len, uint32_t elem,
                           uint8_t *dst, uint64_t dst_cap) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t n = len / elem, o = 0;
  int64_t prev = 0;
  for (uint64_t i = 0; i < n; i++) {
    int64_t v;
    if (elem == 4) {
      int32_t x;
      memcpy(&x, src + i * 4, 4);
      v = x;
    } else {
      memcpy(&v, src + i * 8, 8);
    }
    uint64_t z = zigzag64(v - prev);
    prev = v;
    while (z >= 0x80) {
      if (o >= dst_cap) return -1;
      dst[o++] = static_cast<uint8_t>(z) | 0x80;
      z >>= 7;
    }
    if (o >= dst_cap) return -1;
    dst[o++] = static_cast<uint8_t>(z);
  }
  return static_cast<int64_t>(o);
}

int64_t dtb_delta_decompress(const uint8_t *src, uint64_t len,
                             uint32_t elem, uint8_t *dst,
                             uint64_t raw_len) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t n = raw_len / elem, i = 0;
  int64_t prev = 0;
  for (uint64_t k = 0; k < n; k++) {
    uint64_t z = 0;
    int shift = 0;
    while (true) {
      if (i >= len || shift > 63) return -1;
      uint8_t b = src[i++];
      z |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) break;
      shift += 7;
    }
    prev += unzigzag64(z);
    if (elem == 4) {
      int32_t x = static_cast<int32_t>(prev);
      memcpy(dst + k * 4, &x, 4);
    } else {
      memcpy(dst + k * 8, &prev, 8);
    }
  }
  return static_cast<int64_t>(n * elem);
}


// codec 4: FSST-style digram symbol table for string payloads
// (reference: src/storage/compression/fsst.cpp backed by
// third_party/fsst — ours is an original single-pass digram coder:
// the 255 most frequent byte pairs become 1-byte symbols; byte 0xFF
// escapes literals that collide with symbol codes).
int64_t dtb_fsst_compress(const uint8_t *src, uint64_t len, uint8_t *dst,
                          uint64_t dst_cap) {
  if (len < 16) return -1;
  // frequency of byte pairs
  static thread_local uint32_t freq[65536];
  memset(freq, 0, sizeof(freq));
  for (uint64_t i = 0; i + 1 < len; i++)
    freq[(src[i] << 8) | src[i + 1]]++;
  // pick top 254 pairs with freq >= 4 (symbol codes 0x01..0xFE; 0x00
  // stays literal-safe for terminators, 0xFF is the escape)
  uint16_t pairs[254];
  int npairs = 0;
  for (int it = 0; it < 254; it++) {
    uint32_t best = 0, bi = 0;
    for (uint32_t p = 0; p < 65536; p++)
      if (freq[p] > best) { best = freq[p]; bi = p; }
    if (best < 4) break;
    pairs[npairs++] = (uint16_t)bi;
    freq[bi] = 0;
  }
  if (npairs == 0) return -1;
  // symbol lookup: pair -> code (1..npairs)
  static thread_local int16_t code_of[65536];
  memset(code_of, -1, sizeof(code_of));
  for (int k = 0; k < npairs; k++) code_of[pairs[k]] = (int16_t)(k + 1);
  // header: u16 npairs + 2 bytes per pair
  uint64_t o = 0;
  if (o + 2 + 2 * (uint64_t)npairs > dst_cap) return -1;
  dst[o++] = (uint8_t)npairs;
  dst[o++] = 0;
  for (int k = 0; k < npairs; k++) {
    dst[o++] = (uint8_t)(pairs[k] >> 8);
    dst[o++] = (uint8_t)(pairs[k] & 0xFF);
  }
  for (uint64_t i = 0; i < len;) {
    int16_t c = (i + 1 < len) ? code_of[(src[i] << 8) | src[i + 1]] : -1;
    if (c > 0) {
      if (o >= dst_cap) return -1;
      dst[o++] = (uint8_t)c;
      i += 2;
    } else {
      uint8_t b = src[i];
      if (b >= 1 && b <= (uint8_t)npairs) {
        if (o + 2 > dst_cap) return -1;   // escape collided literal
        dst[o++] = 0xFF;
        dst[o++] = b;
      } else if (b == 0xFF) {
        if (o + 2 > dst_cap) return -1;
        dst[o++] = 0xFF;
        dst[o++] = 0xFF;
      } else {
        if (o >= dst_cap) return -1;
        dst[o++] = b;
      }
      i += 1;
    }
  }
  return (int64_t)o;
}

int64_t dtb_fsst_decompress(const uint8_t *src, uint64_t len, uint8_t *dst,
                            uint64_t dst_cap) {
  if (len < 2) return -1;
  int npairs = src[0];
  uint64_t i = 2;
  uint16_t pairs[255];
  for (int k = 0; k < npairs; k++) {
    if (i + 1 >= len) return -1;
    pairs[k] = (uint16_t)((src[i] << 8) | src[i + 1]);
    i += 2;
  }
  uint64_t o = 0;
  while (i < len) {
    uint8_t b = src[i++];
    if (b == 0xFF) {
      if (i >= len || o >= dst_cap) return -1;
      dst[o++] = src[i++];
    } else if (b >= 1 && b <= (uint8_t)npairs) {
      if (o + 2 > dst_cap) return -1;
      dst[o++] = (uint8_t)(pairs[b - 1] >> 8);
      dst[o++] = (uint8_t)(pairs[b - 1] & 0xFF);
    } else {
      if (o >= dst_cap) return -1;
      dst[o++] = b;
    }
  }
  return (int64_t)o;
}

// codec 5: Chimp-class XOR float compression (reference:
// src/storage/compression/chimp/ + alp/ — XOR with the previous value,
// then store only the non-zero prefix bytes; similar consecutive floats
// share sign/exponent/mantissa-head so the XOR is mostly trailing
// zeros).  Byte-aligned original variant: per value a length nibble-pair
// packs two values' prefix-byte counts.
int64_t dtb_xorf_compress(const uint8_t *src, uint64_t len, uint32_t elem,
                          uint8_t *dst, uint64_t dst_cap) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t n = len / elem;
  if (n == 0 || len % elem) return -1;
  uint64_t o = 0;
  uint64_t prev = 0;
  // layout: per value u8 nbytes then nbytes of the XOR little-end prefix
  for (uint64_t k = 0; k < n; k++) {
    uint64_t cur = 0;
    memcpy(&cur, src + k * elem, elem);
    uint64_t x = cur ^ prev;
    uint32_t nb = 0;
    while (nb < elem && (x >> (8 * nb)) != 0) nb++;
    if (o + 1 + nb > dst_cap) return -1;
    dst[o++] = (uint8_t)nb;
    for (uint32_t b = 0; b < nb; b++)
      dst[o++] = (uint8_t)(x >> (8 * b));
    prev = cur;
  }
  return (int64_t)o;
}

int64_t dtb_xorf_decompress(const uint8_t *src, uint64_t len,
                            uint32_t elem, uint8_t *dst,
                            uint64_t dst_cap) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t i = 0, o = 0;
  uint64_t prev = 0;
  while (i < len) {
    uint32_t nb = src[i++];
    if (nb > elem || i + nb > len || o + elem > dst_cap) return -1;
    uint64_t x = 0;
    for (uint32_t b = 0; b < nb; b++)
      x |= ((uint64_t)src[i++]) << (8 * b);
    uint64_t cur = prev ^ x;
    memcpy(dst + o, &cur, elem);
    o += elem;
    prev = cur;
  }
  return (int64_t)o;
}

}  // extern "C"

// codec 3: deflate (zlib) for text/dictionary payloads
#include <zlib.h>

extern "C" {

int64_t dtb_zlib_compress(const uint8_t *src, uint64_t len, uint8_t *dst,
                          uint64_t dst_cap) {
  uLongf out = static_cast<uLongf>(dst_cap);
  if (compress2(dst, &out, src, static_cast<uLong>(len), 6) != Z_OK)
    return -1;
  return static_cast<int64_t>(out);
}

int64_t dtb_zlib_decompress(const uint8_t *src, uint64_t len, uint8_t *dst,
                            uint64_t raw_len) {
  uLongf out = static_cast<uLongf>(raw_len);
  if (uncompress(dst, &out, src, static_cast<uLong>(len)) != Z_OK)
    return -1;
  return static_cast<int64_t>(out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// codec 6: frame-of-reference bitpacking for fixed-width ints
// (reference: src/storage/compression/bitpacking.cpp — FOR + per-group
// bit width).  Blocks of 1024 values; per block header: min value
// (elem bytes LE) + bit width (1 byte), then the LSB-first packed
// deltas.  elem in {4, 8}.
// ---------------------------------------------------------------------------

static inline int64_t bp_read_val(const uint8_t *p, uint32_t elem) {
  if (elem == 4) {
    int32_t v;
    memcpy(&v, p, 4);
    return (int64_t)v;
  }
  int64_t v;
  memcpy(&v, p, 8);
  return v;
}

static inline void bp_write_val(uint8_t *p, uint32_t elem, int64_t v) {
  if (elem == 4) {
    int32_t t = (int32_t)v;
    memcpy(p, &t, 4);
  } else {
    memcpy(p, &v, 8);
  }
}

extern "C" int64_t dtb_bitpack_compress(const uint8_t *src, uint64_t len,
                                        uint32_t elem, uint8_t *dst,
                                        uint64_t cap) {
  if (elem != 4 && elem != 8) return -1;
  if (len % elem) return -1;
  uint64_t n = len / elem;
  uint64_t out = 0;
  const uint64_t BLOCK = 1024;
  for (uint64_t b = 0; b < n; b += BLOCK) {
    uint64_t cnt = (n - b < BLOCK) ? (n - b) : BLOCK;
    int64_t mn = bp_read_val(src + b * elem, elem);
    int64_t mx = mn;
    for (uint64_t i = 1; i < cnt; i++) {
      int64_t v = bp_read_val(src + (b + i) * elem, elem);
      if (v < mn) mn = v;
      if (v > mx) mx = v;
    }
    uint64_t range = (uint64_t)(mx - mn);
    uint32_t width = 0;
    while (width < 64 && (range >> width)) width++;
    uint64_t bits = cnt * (uint64_t)width;
    uint64_t bytes = (bits + 7) / 8;
    if (out + elem + 1 + bytes > cap) return -1;
    bp_write_val(dst + out, elem, mn);
    out += elem;
    dst[out++] = (uint8_t)width;
    memset(dst + out, 0, bytes);
    uint64_t bitpos = 0;
    for (uint64_t i = 0; i < cnt; i++) {
      uint64_t d = (uint64_t)(bp_read_val(src + (b + i) * elem, elem)
                              - mn);
      for (uint32_t k = 0; k < width; k++) {
        if ((d >> k) & 1)
          dst[out + (bitpos >> 3)] |= (uint8_t)(1u << (bitpos & 7));
        bitpos++;
      }
    }
    out += bytes;
  }
  return (int64_t)out;
}

extern "C" int64_t dtb_bitpack_decompress(const uint8_t *src,
                                          uint64_t len, uint32_t elem,
                                          uint8_t *dst, uint64_t cap) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t n = cap / elem;
  uint64_t in = 0;
  uint64_t outn = 0;
  const uint64_t BLOCK = 1024;
  while (outn < n) {
    uint64_t cnt = (n - outn < BLOCK) ? (n - outn) : BLOCK;
    if (in + elem + 1 > len) return -1;
    int64_t mn = bp_read_val(src + in, elem);
    in += elem;
    uint32_t width = src[in++];
    if (width > 64) return -1;
    uint64_t bytes = (cnt * (uint64_t)width + 7) / 8;
    if (in + bytes > len) return -1;
    uint64_t bitpos = 0;
    for (uint64_t i = 0; i < cnt; i++) {
      uint64_t d = 0;
      for (uint32_t k = 0; k < width; k++) {
        if (src[in + (bitpos >> 3)] >> (bitpos & 7) & 1)
          d |= (1ull << k);
        bitpos++;
      }
      bp_write_val(dst + (outn + i) * elem, elem, mn + (int64_t)d);
    }
    in += bytes;
    outn += cnt;
  }
  return (int64_t)(outn * elem);
}

// ---------------------------------------------------------------------------
// codec 7: ALP-class float compression (reference:
// src/storage/compression/alp/ — adaptive lossless decimal scaling).
// Per 1024-block: find the smallest decimal exponent e (0..18) whose
// scaled values round-trip EXACTLY for >= 90% of values; those become
// FOR-bitpacked int64s; exceptions carry an index + raw value.
// Header per block: e (1 byte, 0xFF = raw block), exception count (u16),
// then the bitpacked ints (via the codec-6 layout for one block),
// then exceptions [(u16 idx, raw elem)].
// ---------------------------------------------------------------------------

static const double ALP_P10[19] = {
    1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11,
    1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18};

extern "C" int64_t dtb_alp_compress(const uint8_t *src, uint64_t len,
                                    uint32_t elem, uint8_t *dst,
                                    uint64_t cap) {
  if (elem != 4 && elem != 8) return -1;
  if (len % elem) return -1;
  uint64_t n = len / elem;
  uint64_t out = 0;
  const uint64_t BLOCK = 1024;
  std::vector<int64_t> ints(BLOCK);
  std::vector<uint16_t> exc;
  for (uint64_t b = 0; b < n; b += BLOCK) {
    uint64_t cnt = (n - b < BLOCK) ? (n - b) : BLOCK;
    int best_e = -1;
    uint64_t best_exc = cnt;
    for (int e = 0; e <= 18; e++) {
      uint64_t bad = 0;
      for (uint64_t i = 0; i < cnt && bad * 10 <= cnt; i++) {
        double v = (elem == 8)
                       ? ((const double *)(src))[b + i]
                       : (double)((const float *)(src))[b + i];
        double scaled = v * ALP_P10[e];
        if (scaled != scaled || scaled > 9.2e18 || scaled < -9.2e18) {
          bad++;
          continue;
        }
        int64_t iv = (int64_t)std::llround(scaled);
        double back = (double)iv / ALP_P10[e];
        bool ok = (elem == 8) ? (back == v) : ((float)back == (float)v);
        if (!ok) bad++;
      }
      if (bad * 10 <= cnt) {  // <= 10% exceptions
        best_e = e;
        best_exc = bad;
        break;
      }
    }
    if (best_e < 0) {
      // raw block
      if (out + 1 + cnt * elem > cap) return -1;
      dst[out++] = 0xFF;
      memcpy(dst + out, src + b * elem, cnt * elem);
      out += cnt * elem;
      continue;
    }
    exc.clear();
    for (uint64_t i = 0; i < cnt; i++) {
      double v = (elem == 8) ? ((const double *)(src))[b + i]
                             : (double)((const float *)(src))[b + i];
      double scaled = v * ALP_P10[best_e];
      int64_t iv = 0;
      bool ok = false;
      if (scaled == scaled && scaled <= 9.2e18 && scaled >= -9.2e18) {
        iv = (int64_t)std::llround(scaled);
        double back = (double)iv / ALP_P10[best_e];
        ok = (elem == 8) ? (back == v) : ((float)back == (float)v);
      }
      if (!ok) {
        exc.push_back((uint16_t)i);
        iv = 0;
      }
      ints[i] = iv;
    }
    if (out + 3 > cap) return -1;
    dst[out++] = (uint8_t)best_e;
    uint16_t ne = (uint16_t)exc.size();
    memcpy(dst + out, &ne, 2);
    out += 2;
    int64_t packed = dtb_bitpack_compress(
        (const uint8_t *)ints.data(), cnt * 8, 8, dst + out, cap - out);
    if (packed < 0) return -1;
    out += (uint64_t)packed;
    for (uint16_t idx : exc) {
      if (out + 2 + elem > cap) return -1;
      memcpy(dst + out, &idx, 2);
      out += 2;
      memcpy(dst + out, src + (b + idx) * elem, elem);
      out += elem;
    }
  }
  return (int64_t)out;
}

extern "C" int64_t dtb_alp_decompress(const uint8_t *src, uint64_t len,
                                      uint32_t elem, uint8_t *dst,
                                      uint64_t cap) {
  if (elem != 4 && elem != 8) return -1;
  uint64_t n = cap / elem;
  uint64_t in = 0;
  uint64_t outn = 0;
  const uint64_t BLOCK = 1024;
  std::vector<int64_t> ints(BLOCK);
  while (outn < n) {
    uint64_t cnt = (n - outn < BLOCK) ? (n - outn) : BLOCK;
    if (in + 1 > len) return -1;
    uint8_t e = src[in++];
    if (e == 0xFF) {
      if (in + cnt * elem > len) return -1;
      memcpy(dst + outn * elem, src + in, cnt * elem);
      in += cnt * elem;
      outn += cnt;
      continue;
    }
    if (e > 18 || in + 2 > len) return -1;
    uint16_t ne;
    memcpy(&ne, src + in, 2);
    in += 2;
    // bitpacked ints: one codec-6 block of cnt int64s
    if (in + 9 > len) return -1;
    int64_t mn;
    memcpy(&mn, src + in, 8);
    uint32_t width = src[in + 8];
    uint64_t bytes = (cnt * (uint64_t)width + 7) / 8;
    if (width > 64 || in + 9 + bytes > len) return -1;
    {
      uint64_t bitpos = 0;
      const uint8_t *pp = src + in + 9;
      for (uint64_t i = 0; i < cnt; i++) {
        uint64_t d = 0;
        for (uint32_t k = 0; k < width; k++) {
          if (pp[bitpos >> 3] >> (bitpos & 7) & 1) d |= (1ull << k);
          bitpos++;
        }
        ints[i] = mn + (int64_t)d;
      }
    }
    in += 9 + bytes;
    for (uint64_t i = 0; i < cnt; i++) {
      double v = (double)ints[i] / ALP_P10[e];
      if (elem == 8)
        ((double *)dst)[outn + i] = v;
      else
        ((float *)dst)[outn + i] = (float)v;
    }
    for (uint16_t k = 0; k < ne; k++) {
      if (in + 2 + elem > len) return -1;
      uint16_t idx;
      memcpy(&idx, src + in, 2);
      in += 2;
      memcpy(dst + (outn + idx) * elem, src + in, elem);
      in += elem;
    }
    outn += cnt;
  }
  return (int64_t)(outn * elem);
}

// ---------------------------------------------------------------------------
// codec 8: roaring-class validity compression (reference:
// src/storage/compression/roaring/ — per-64Ki-chunk container choice).
// Input is a byte-per-bool mask.  Per chunk: mode byte + u16 count,
// then mode 0 = u16 indexes of SET bytes, mode 1 = u16 indexes of
// CLEAR bytes, mode 2 = (u16 start, u16 len) runs of SET bytes,
// mode 3 = raw 8KiB bitmap.
// ---------------------------------------------------------------------------

extern "C" int64_t dtb_roaring_compress(const uint8_t *src, uint64_t len,
                                        uint8_t *dst, uint64_t cap) {
  uint64_t out = 0;
  const uint64_t CHUNK = 65536;
  std::vector<uint16_t> set_idx, clr_idx, runs;
  for (uint64_t c = 0; c < len; c += CHUNK) {
    uint64_t cnt = (len - c < CHUNK) ? (len - c) : CHUNK;
    set_idx.clear();
    clr_idx.clear();
    runs.clear();
    bool in_run = false;
    for (uint64_t i = 0; i < cnt; i++) {
      bool s = src[c + i] != 0;
      if (s) {
        set_idx.push_back((uint16_t)i);
        if (!in_run) {
          runs.push_back((uint16_t)i);
          runs.push_back(1);
          in_run = true;
        } else {
          runs[runs.size() - 1]++;
        }
      } else {
        clr_idx.push_back((uint16_t)i);
        in_run = false;
      }
      if (set_idx.size() > 20000 && clr_idx.size() > 20000 &&
          runs.size() > 20000)
        break;  // dense + unrunnable: bitmap wins, stop counting
    }
    uint64_t bm_bytes = (cnt + 7) / 8;
    uint64_t best_bytes = bm_bytes;
    uint8_t mode = 3;
    if (set_idx.size() * 2 < best_bytes && set_idx.size() <= 0xFFFF) {
      best_bytes = set_idx.size() * 2;
      mode = 0;
    }
    if (clr_idx.size() * 2 < best_bytes && clr_idx.size() <= 0xFFFF) {
      best_bytes = clr_idx.size() * 2;
      mode = 1;
    }
    if (runs.size() * 2 < best_bytes && runs.size() / 2 <= 0xFFFF) {
      best_bytes = runs.size() * 2;
      mode = 2;
    }
    if (out + 3 + best_bytes > cap) return -1;
    dst[out++] = mode;
    uint16_t m16;
    if (mode == 0) {
      m16 = (uint16_t)set_idx.size();
      memcpy(dst + out, &m16, 2);
      out += 2;
      memcpy(dst + out, set_idx.data(), set_idx.size() * 2);
      out += set_idx.size() * 2;
    } else if (mode == 1) {
      m16 = (uint16_t)clr_idx.size();
      memcpy(dst + out, &m16, 2);
      out += 2;
      memcpy(dst + out, clr_idx.data(), clr_idx.size() * 2);
      out += clr_idx.size() * 2;
    } else if (mode == 2) {
      m16 = (uint16_t)(runs.size() / 2);
      memcpy(dst + out, &m16, 2);
      out += 2;
      memcpy(dst + out, runs.data(), runs.size() * 2);
      out += runs.size() * 2;
    } else {
      m16 = 0;
      memcpy(dst + out, &m16, 2);
      out += 2;
      memset(dst + out, 0, bm_bytes);
      for (uint64_t i = 0; i < cnt; i++)
        if (src[c + i]) dst[out + (i >> 3)] |= (uint8_t)(1u << (i & 7));
      out += bm_bytes;
    }
  }
  return (int64_t)out;
}

extern "C" int64_t dtb_roaring_decompress(const uint8_t *src,
                                          uint64_t len, uint8_t *dst,
                                          uint64_t cap) {
  uint64_t in = 0;
  uint64_t outn = 0;
  const uint64_t CHUNK = 65536;
  while (outn < cap) {
    uint64_t cnt = (cap - outn < CHUNK) ? (cap - outn) : CHUNK;
    if (in + 3 > len) return -1;
    uint8_t mode = src[in++];
    uint16_t m16;
    memcpy(&m16, src + in, 2);
    in += 2;
    if (mode == 0) {
      memset(dst + outn, 0, cnt);
      if (in + (uint64_t)m16 * 2 > len) return -1;
      for (uint16_t k = 0; k < m16; k++) {
        uint16_t idx;
        memcpy(&idx, src + in + (uint64_t)k * 2, 2);
        if (idx < cnt) dst[outn + idx] = 1;
      }
      in += (uint64_t)m16 * 2;
    } else if (mode == 1) {
      memset(dst + outn, 1, cnt);
      if (in + (uint64_t)m16 * 2 > len) return -1;
      for (uint16_t k = 0; k < m16; k++) {
        uint16_t idx;
        memcpy(&idx, src + in + (uint64_t)k * 2, 2);
        if (idx < cnt) dst[outn + idx] = 0;
      }
      in += (uint64_t)m16 * 2;
    } else if (mode == 2) {
      memset(dst + outn, 0, cnt);
      if (in + (uint64_t)m16 * 4 > len) return -1;
      for (uint16_t k = 0; k < m16; k++) {
        uint16_t start, rl;
        memcpy(&start, src + in + (uint64_t)k * 4, 2);
        memcpy(&rl, src + in + (uint64_t)k * 4 + 2, 2);
        for (uint64_t j = 0; j < rl && start + j < cnt; j++)
          dst[outn + start + j] = 1;
      }
      in += (uint64_t)m16 * 4;
    } else if (mode == 3) {
      uint64_t bm = (cnt + 7) / 8;
      if (in + bm > len) return -1;
      for (uint64_t i = 0; i < cnt; i++)
        dst[outn + i] = (src[in + (i >> 3)] >> (i & 7)) & 1;
      in += bm;
    } else {
      return -1;
    }
    outn += cnt;
  }
  return (int64_t)outn;
}
