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

}  // extern "C"
