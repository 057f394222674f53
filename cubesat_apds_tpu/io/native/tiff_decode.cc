// Native TIFF decoder: multithreaded strip/tile decode for the host
// ingestion path.
//
// Role: the GDAL raster-read replacement's hot loop (reference:
// geotiff_extractor reads via GDAL C FFI; our PIL fallback is
// single-threaded Python). Scope: classic TIFF (version 42) AND BigTIFF
// (version 43, 64-bit offsets — what io/cog.py emits past 4 GB, the
// reference's BIGTIFF=IF_SAFER leg), both endiannesses, strips or
// tiles, compression none(1) / zlib deflate (8, 32946), horizontal
// differencing predictor(2), floating-point predictor(3, TIFF TechNote
// 3 — what io/cog.py writes for f32), uint8/uint16/float32, contiguous
// (chunky) sample layout. Anything else → caller falls back to PIL
// (the wrapper checks tiff_supported()).
//
// Build: g++ -O3 -march=native -shared -fPIC tiff_decode.cc -o libtiff_decode.so -lz -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  bool swap;  // file endianness != host (host assumed little-endian)

  uint16_t u16(size_t off) const {
    uint16_t v;
    std::memcpy(&v, p + off, 2);
    if (swap) v = __builtin_bswap16(v);
    return v;
  }
  uint32_t u32(size_t off) const {
    uint32_t v;
    std::memcpy(&v, p + off, 4);
    if (swap) v = __builtin_bswap32(v);
    return v;
  }
  uint64_t u64(size_t off) const {
    uint64_t v;
    std::memcpy(&v, p + off, 8);
    if (swap) v = __builtin_bswap64(v);
    return v;
  }
};

struct Tiff {
  std::vector<uint8_t> file;
  // mmap-backed open (tiff_open_path): pixels stream from the page cache
  // instead of a heap copy — the out-of-RAM ingestion path.
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  Reader r;
  // Geometry
  uint32_t width = 0, height = 0;
  uint16_t samples = 1, bits = 8, compression = 1, predictor = 1;
  uint16_t sample_format = 1;  // 1 uint, 3 float
  uint16_t planar = 1;
  // Chunk layout (strips or tiles)
  bool tiled = false;
  uint32_t tile_w = 0, tile_h = 0;      // for strips: tile_w=width
  std::vector<uint64_t> offsets;
  std::vector<uint64_t> counts;
};

// Read a tag's value array as uint64s (SHORT=3, LONG=4, LONG8=16
// supported; `big` selects the BigTIFF 20-byte entry layout with an
// 8-byte count field and 8-byte inline value slot).
bool tag_values(const Reader& r, size_t entry, bool big,
                std::vector<uint64_t>* out) {
  uint16_t type = r.u16(entry + 2);
  uint64_t count = big ? r.u64(entry + 4) : r.u32(entry + 4);
  size_t elem = (type == 3) ? 2 : (type == 4) ? 4 : (type == 16) ? 8 : 0;
  if (elem == 0) return false;
  size_t val_at = entry + (big ? 12 : 8);
  size_t inline_cap = big ? 8 : 4;
  size_t total = elem * count;
  size_t src = (total <= inline_cap)
                   ? val_at
                   : (big ? r.u64(val_at) : r.u32(val_at));
  if (src + total > r.n) return false;
  out->resize(count);
  for (uint64_t i = 0; i < count; ++i) {
    (*out)[i] = (elem == 2)   ? r.u16(src + 2 * i)
                : (elem == 4) ? r.u32(src + 4 * i)
                              : r.u64(src + 8 * i);
  }
  return true;
}

bool parse(Tiff* t) {
  const Reader& r = t->r;
  if (r.n < 8) return false;
  bool le = (r.p[0] == 'I' && r.p[1] == 'I');
  bool be = (r.p[0] == 'M' && r.p[1] == 'M');
  if (!le && !be) return false;
  const_cast<Reader&>(t->r).swap = be;  // host assumed little-endian
  uint16_t version = t->r.u16(2);
  bool big = false;
  size_t ifd;
  if (version == 42) {
    ifd = t->r.u32(4);
  } else if (version == 43) {  // BigTIFF
    if (r.n < 16) return false;
    if (t->r.u16(4) != 8 || t->r.u16(6) != 0) return false;
    big = true;
    ifd = t->r.u64(8);
  } else {
    return false;
  }
  size_t entry_sz = big ? 20 : 12;
  size_t head_sz = big ? 8 : 2;
  if (ifd + head_sz > r.n) return false;
  uint64_t n_entries = big ? t->r.u64(ifd) : t->r.u16(ifd);
  std::vector<uint64_t> v;
  uint32_t rows_per_strip = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < n_entries; ++i) {
    size_t e = ifd + head_sz + entry_sz * i;
    if (e + entry_sz > r.n) return false;
    uint16_t tag = t->r.u16(e);
    switch (tag) {
      case 256: if (tag_values(t->r, e, big, &v)) t->width = v[0]; break;
      case 257: if (tag_values(t->r, e, big, &v)) t->height = v[0]; break;
      case 258: if (tag_values(t->r, e, big, &v)) t->bits = v[0]; break;
      case 259: if (tag_values(t->r, e, big, &v)) t->compression = v[0]; break;
      case 273: if (tag_values(t->r, e, big, &v)) t->offsets = v; break;
      case 277: if (tag_values(t->r, e, big, &v)) t->samples = v[0]; break;
      case 278: if (tag_values(t->r, e, big, &v)) rows_per_strip = v[0]; break;
      case 279: if (tag_values(t->r, e, big, &v)) t->counts = v; break;
      case 284: if (tag_values(t->r, e, big, &v)) t->planar = v[0]; break;
      case 317: if (tag_values(t->r, e, big, &v)) t->predictor = v[0]; break;
      case 322: if (tag_values(t->r, e, big, &v)) { t->tile_w = v[0]; t->tiled = true; } break;
      case 323: if (tag_values(t->r, e, big, &v)) t->tile_h = v[0]; break;
      case 324: if (tag_values(t->r, e, big, &v)) { t->offsets = v; t->tiled = true; } break;
      case 325: if (tag_values(t->r, e, big, &v)) t->counts = v; break;
      case 339: if (tag_values(t->r, e, big, &v)) t->sample_format = v[0]; break;
      default: break;
    }
  }
  if (!t->tiled) {
    t->tile_w = t->width;
    t->tile_h = rows_per_strip == 0xFFFFFFFFu ? t->height : rows_per_strip;
  }
  return t->width && t->height && !t->offsets.empty() &&
         t->offsets.size() == t->counts.size();
}

bool supported(const Tiff& t) {
  if (t.planar != 1) return false;
  if (t.compression != 1 && t.compression != 8 && t.compression != 32946)
    return false;
  if (t.predictor != 1 && t.predictor != 2 && t.predictor != 3)
    return false;
  if (t.predictor == 3 && t.bits != 32) return false;  // fp predictor
  if (!(t.bits == 8 || t.bits == 16 || t.bits == 32)) return false;
  if (t.bits == 32 && t.sample_format != 3) return false;  // f32 only
  return true;
}

// Decode one chunk (strip or tile) into a destination WINDOW
// [wx0, wx0+ww) × [wy0, wy0+wh) of the image; dst has ww×wh pixels.
// Chunks that do not intersect the window are skipped before any
// decompression work (the windowed-read fast path).
bool decode_chunk(const Tiff& t, size_t idx, uint8_t* dst,
                  uint32_t wx0, uint32_t wy0, uint32_t ww, uint32_t wh) {
  size_t bpp = (t.bits / 8) * t.samples;        // bytes per pixel
  uint32_t tiles_across = t.tiled ? (t.width + t.tile_w - 1) / t.tile_w : 1;
  uint32_t tx = t.tiled ? (idx % tiles_across) : 0;
  uint32_t ty = t.tiled ? (idx / tiles_across) : idx;
  uint32_t y0 = ty * t.tile_h;
  uint32_t x0 = tx * t.tile_w;
  if (y0 >= t.height) return true;
  uint32_t rows = std::min<uint32_t>(t.tile_h, t.height - y0);
  uint32_t cols = t.tiled ? t.tile_w : t.width;  // tiles are padded
  // Window intersection (in image coords).
  uint32_t ix0 = std::max(x0, wx0);
  uint32_t iy0 = std::max(y0, wy0);
  uint32_t ix1 = std::min<uint32_t>(x0 + std::min<uint32_t>(cols, t.width - x0),
                                    wx0 + ww);
  uint32_t iy1 = std::min<uint32_t>(y0 + rows, wy0 + wh);
  if (ix0 >= ix1 || iy0 >= iy1) return true;
  size_t row_bytes = size_t(cols) * bpp;
  size_t raw_size = row_bytes * (t.tiled ? t.tile_h : rows);

  const uint8_t* src = t.r.p + t.offsets[idx];
  size_t src_n = t.counts[idx];
  if (t.offsets[idx] + src_n > t.r.n) return false;

  std::vector<uint8_t> buf;
  const uint8_t* data;
  if (t.compression == 1) {
    if (src_n < row_bytes * rows) return false;
    data = src;
  } else {
    buf.resize(raw_size);
    uLongf out_n = raw_size;
    if (uncompress(buf.data(), &out_n, src, src_n) != Z_OK) return false;
    // A truncated/corrupt stream can inflate to less than the rows we
    // copy below and still return Z_OK; fail instead of reading the
    // uninitialized tail of buf.
    if (out_n < row_bytes * rows) return false;
    data = buf.data();
  }

  // Horizontal differencing predictor (per row, per sample channel).
  // Multi-byte samples must be in HOST byte order before the sums
  // accumulate, so big-endian files are swapped here (and not again
  // after the copy below).
  std::vector<uint8_t> pred;
  bool swapped_in_pred = false;
  if (t.predictor == 2) {
    pred.assign(data, data + row_bytes * rows);
    size_t sb = t.bits / 8;
    if (t.r.swap && sb == 2) {
      uint16_t* all = reinterpret_cast<uint16_t*>(pred.data());
      size_t n_all = row_bytes * rows / 2;
      for (size_t i = 0; i < n_all; ++i) all[i] = __builtin_bswap16(all[i]);
      swapped_in_pred = true;
    }
    for (uint32_t y = 0; y < rows; ++y) {
      uint8_t* row = pred.data() + y * row_bytes;
      if (sb == 1) {
        for (size_t i = t.samples; i < row_bytes; ++i) row[i] += row[i - t.samples];
      } else if (sb == 2) {
        uint16_t* r16 = reinterpret_cast<uint16_t*>(row);
        size_t n16 = row_bytes / 2;
        for (size_t i = t.samples; i < n16; ++i) r16[i] += r16[i - t.samples];
      } else {
        return false;  // pred2 + f32 is nonstandard; f32 uses pred3
      }
    }
    data = pred.data();
  } else if (t.predictor == 3) {
    // Floating-point predictor (TIFF TechNote 3, mirrors libtiff fpAcc
    // and io/cog.py's _predict3): per row, byte-wise horizontal
    // accumulation with stride = samples, then reassemble each value
    // from its MSB-first byte planes. The plane order fixes byte
    // significance, so the output is host-endian regardless of the
    // file's byte-order flag (no post-swap needed).
    pred.assign(data, data + row_bytes * rows);
    swapped_in_pred = true;  // suppress the f32 swap below
    size_t wc = size_t(cols) * t.samples;  // values per row
    std::vector<uint8_t> tmp(row_bytes);
    for (uint32_t y = 0; y < rows; ++y) {
      uint8_t* row = pred.data() + y * row_bytes;
      for (size_t i = t.samples; i < row_bytes; ++i) row[i] += row[i - t.samples];
      std::memcpy(tmp.data(), row, row_bytes);
      for (size_t v = 0; v < wc; ++v)
        for (size_t b = 0; b < 4; ++b)
          row[4 * v + b] = tmp[(3 - b) * wc + v];  // LE host
    }
    data = pred.data();
  }

  // Copy the window intersection into the destination (tile padding at
  // right/bottom edges is excluded by the intersection bounds).
  uint32_t copy_cols = ix1 - ix0;
  for (uint32_t y = iy0; y < iy1; ++y) {
    std::memcpy(dst + (size_t(y - wy0) * ww + (ix0 - wx0)) * bpp,
                data + size_t(y - y0) * row_bytes + size_t(ix0 - x0) * bpp,
                size_t(copy_cols) * bpp);
  }

  // Byte-swap multi-byte samples for big-endian files (unless the
  // predictor path already swapped them pre-accumulation).
  if (t.r.swap && t.bits == 16 && !swapped_in_pred) {
    for (uint32_t y = iy0; y < iy1; ++y) {
      uint16_t* row = reinterpret_cast<uint16_t*>(
          dst + (size_t(y - wy0) * ww + (ix0 - wx0)) * bpp);
      for (size_t i = 0; i < size_t(copy_cols) * t.samples; ++i)
        row[i] = __builtin_bswap16(row[i]);
    }
  } else if (t.r.swap && t.bits == 32 && !swapped_in_pred) {
    for (uint32_t y = iy0; y < iy1; ++y) {
      uint32_t* row = reinterpret_cast<uint32_t*>(
          dst + (size_t(y - wy0) * ww + (ix0 - wx0)) * bpp);
      for (size_t i = 0; i < size_t(copy_cols) * t.samples; ++i)
        row[i] = __builtin_bswap32(row[i]);
    }
  }
  return true;
}

int fill_info(Tiff* t, int64_t* info_out) {
  info_out[0] = t->width;
  info_out[1] = t->height;
  info_out[2] = t->samples;
  info_out[3] = t->bits;
  info_out[4] = t->sample_format;
  info_out[5] = static_cast<int64_t>(t->offsets.size());
  info_out[6] = supported(*t) ? 1 : 0;
  return 0;
}

// Shared multithreaded window decode over intersecting chunks.
int decode_window(Tiff* t, uint8_t* out, uint32_t wx0, uint32_t wy0,
                  uint32_t ww, uint32_t wh, int n_threads) {
  if (!supported(*t)) return 1;
  if (wx0 + ww > t->width || wy0 + wh > t->height) return 3;
  // Collect intersecting chunk indices (geometry only — cheap).
  uint32_t tiles_across = t->tiled ? (t->width + t->tile_w - 1) / t->tile_w : 1;
  std::vector<size_t> work;
  for (size_t i = 0; i < t->offsets.size(); ++i) {
    uint32_t tx = t->tiled ? (i % tiles_across) : 0;
    uint32_t ty = t->tiled ? (i / tiles_across) : i;
    uint32_t cy0 = ty * t->tile_h, cx0 = tx * t->tile_w;
    if (cy0 >= wy0 + wh || cy0 + t->tile_h <= wy0) continue;
    if (cx0 >= wx0 + ww || cx0 + (t->tiled ? t->tile_w : t->width) <= wx0)
      continue;
    work.push_back(i);
  }
  if (n_threads < 1) n_threads = 1;
  if (static_cast<size_t>(n_threads) > work.size() && !work.empty())
    n_threads = static_cast<int>(work.size());
  std::vector<std::thread> threads;
  std::vector<int> ok(n_threads, 1);
  size_t per = work.empty() ? 0 : (work.size() + n_threads - 1) / n_threads;
  for (int w = 0; w < n_threads; ++w) {
    threads.emplace_back([&, w]() {
      size_t lo = w * per, hi = std::min(work.size(), lo + per);
      for (size_t i = lo; i < hi; ++i)
        if (!decode_chunk(*t, work[i], out, wx0, wy0, ww, wh)) {
          ok[w] = 0;
          return;
        }
    });
  }
  for (auto& th : threads) th.join();
  for (int w = 0; w < n_threads; ++w)
    if (!ok[w]) return 2;
  return 0;
}

}  // namespace

extern "C" {

// Parse the header from an in-memory file. Returns an opaque handle
// (heap Tiff*) or null. info_out[0..6] = width, height, samples, bits,
// sample_format (1 uint/3 float), n_chunks, supported(0/1).
void* tiff_open(const uint8_t* data, int64_t n, int64_t* info_out) {
  Tiff* t = new Tiff();
  t->file.assign(data, data + n);
  t->r = Reader{t->file.data(), static_cast<size_t>(n), false};
  if (!parse(t)) {
    delete t;
    return nullptr;
  }
  fill_info(t, info_out);
  return t;
}

// mmap-based open: pixels stream from the page cache — windowed reads
// of mosaics larger than RAM never materialize the whole file.
void* tiff_open_path(const char* path, int64_t* info_out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping keeps its own reference
  if (map == MAP_FAILED) return nullptr;
  Tiff* t = new Tiff();
  t->map = static_cast<const uint8_t*>(map);
  t->map_len = st.st_size;
  t->r = Reader{t->map, t->map_len, false};
  if (!parse(t)) {
    munmap(const_cast<uint8_t*>(t->map), t->map_len);
    delete t;
    return nullptr;
  }
  fill_info(t, info_out);
  return t;
}

// Decode the full image into out (width*height*samples elements of the
// natural dtype). Multithreaded over chunks. Returns 0 on success.
int tiff_decode(void* handle, uint8_t* out, int n_threads) {
  Tiff* t = static_cast<Tiff*>(handle);
  return decode_window(t, out, 0, 0, t->width, t->height, n_threads);
}

// Decode only the [x0, x0+w) × [y0, y0+h) window into out (w*h*samples
// elements); chunks outside the window are never touched.
int tiff_decode_window(void* handle, uint8_t* out, int64_t x0, int64_t y0,
                       int64_t w, int64_t h, int n_threads) {
  Tiff* t = static_cast<Tiff*>(handle);
  if (x0 < 0 || y0 < 0 || w <= 0 || h <= 0) return 3;
  return decode_window(t, out, static_cast<uint32_t>(x0),
                       static_cast<uint32_t>(y0), static_cast<uint32_t>(w),
                       static_cast<uint32_t>(h), n_threads);
}

void tiff_close(void* handle) {
  Tiff* t = static_cast<Tiff*>(handle);
  if (t->map) munmap(const_cast<uint8_t*>(t->map), t->map_len);
  delete t;
}

}  // extern "C"
