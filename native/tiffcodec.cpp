// Fast baseline-TIFF codec for 3D microscopy stacks (grayscale 8/16-bit,
// uncompressed strips).  The host-side I/O hot path of the framework: the
// reference loads/saves whole 900^3 uint16 stacks (singlevolume_dataset.py,
// test_dice.py:151); PIL decodes page-by-page in Python, this codec does
// O(1) parsing per page + bulk memcpy/pread.
//
// Exposed via ctypes (see neuroclear_tpu/utils/tiffio.py).  Anything this
// codec can't parse (compressed, tiled, BigTIFF) falls back to PIL.
//
// Build: scripts/build_native.sh  ->  neuroclear_tpu/native/libtiffcodec.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

#pragma pack(push, 1)
struct TiffHeader {
  uint16_t byte_order;  // 'II' little-endian only
  uint16_t magic;       // 42
  uint32_t first_ifd;
};
struct IfdEntry {
  uint16_t tag;
  uint16_t type;
  uint32_t count;
  uint32_t value;
};
#pragma pack(pop)

constexpr uint16_t kImageWidth = 256;
constexpr uint16_t kImageLength = 257;
constexpr uint16_t kBitsPerSample = 258;
constexpr uint16_t kCompression = 259;
constexpr uint16_t kPhotometric = 262;
constexpr uint16_t kStripOffsets = 273;
constexpr uint16_t kSamplesPerPixel = 277;
constexpr uint16_t kRowsPerStrip = 278;
constexpr uint16_t kStripByteCounts = 279;
constexpr uint16_t kSampleFormat = 339;

struct PageInfo {
  uint32_t width = 0, height = 0, bits = 0, compression = 1, spp = 1;
  uint32_t rows_per_strip = 0xFFFFFFFF;
  std::vector<uint64_t> strip_offsets;
  std::vector<uint64_t> strip_counts;
};

uint32_t type_size(uint16_t type) {
  switch (type) {
    case 1: case 2: case 6: case 7: return 1;  // BYTE/ASCII/SBYTE/UNDEF
    case 3: case 8: return 2;                  // SHORT/SSHORT
    case 4: case 9: case 11: return 4;         // LONG/SLONG/FLOAT
    case 5: case 10: case 12: return 8;        // RATIONAL/SRATIONAL/DOUBLE
    default: return 0;
  }
}

bool read_values(FILE* f, const IfdEntry& e, std::vector<uint64_t>* out) {
  uint32_t ts = type_size(e.type);
  if (ts == 0 || (ts != 2 && ts != 4)) return false;
  uint64_t total = static_cast<uint64_t>(ts) * e.count;
  std::vector<uint8_t> buf(total);
  if (total <= 4) {
    std::memcpy(buf.data(), &e.value, total);
  } else {
    long save = ftell(f);
    if (fseek(f, e.value, SEEK_SET) != 0) return false;
    if (fread(buf.data(), 1, total, f) != total) return false;
    fseek(f, save, SEEK_SET);
  }
  out->clear();
  for (uint32_t i = 0; i < e.count; ++i) {
    uint64_t v = 0;
    std::memcpy(&v, buf.data() + static_cast<size_t>(i) * ts, ts);
    out->push_back(v);
  }
  return true;
}

// Parse all IFDs; return false on anything non-baseline.
bool parse(FILE* f, std::vector<PageInfo>* pages) {
  TiffHeader hdr;
  if (fread(&hdr, sizeof(hdr), 1, f) != 1) return false;
  if (hdr.byte_order != 0x4949 || hdr.magic != 42) return false;  // 'II', 42
  uint32_t ifd_off = hdr.first_ifd;
  while (ifd_off != 0) {
    if (fseek(f, ifd_off, SEEK_SET) != 0) return false;
    uint16_t n;
    if (fread(&n, 2, 1, f) != 1) return false;
    std::vector<IfdEntry> entries(n);
    if (fread(entries.data(), sizeof(IfdEntry), n, f) != n) return false;
    uint32_t next;
    if (fread(&next, 4, 1, f) != 1) return false;

    PageInfo pg;
    for (const auto& e : entries) {
      std::vector<uint64_t> vals;
      switch (e.tag) {
        case kImageWidth: read_values(f, e, &vals); pg.width = vals.empty() ? 0 : vals[0]; break;
        case kImageLength: read_values(f, e, &vals); pg.height = vals.empty() ? 0 : vals[0]; break;
        case kBitsPerSample: read_values(f, e, &vals); pg.bits = vals.empty() ? 0 : vals[0]; break;
        case kCompression: read_values(f, e, &vals); pg.compression = vals.empty() ? 1 : vals[0]; break;
        case kSamplesPerPixel: read_values(f, e, &vals); pg.spp = vals.empty() ? 1 : vals[0]; break;
        case kRowsPerStrip: read_values(f, e, &vals); pg.rows_per_strip = vals.empty() ? 0xFFFFFFFF : vals[0]; break;
        case kStripOffsets:
          if (!read_values(f, e, &pg.strip_offsets)) return false;
          break;
        case kStripByteCounts:
          if (!read_values(f, e, &pg.strip_counts)) return false;
          break;
        default: break;
      }
    }
    if (pg.compression != 1 || pg.spp != 1) return false;
    if (pg.bits != 8 && pg.bits != 16 && pg.bits != 32) return false;
    if (pg.strip_offsets.empty()) return false;
    pages->push_back(std::move(pg));
    ifd_off = next;
  }
  return !pages->empty();
}

}  // namespace

extern "C" {

// Probe: returns 0 on success; shape = {pages, height, width}, bits out.
int tiff_probe(const char* path, int64_t* shape, int32_t* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<PageInfo> pages;
  bool ok = parse(f, &pages);
  fclose(f);
  if (!ok) return -2;
  const PageInfo& p0 = pages[0];
  for (const auto& p : pages)
    if (p.width != p0.width || p.height != p0.height || p.bits != p0.bits)
      return -3;
  shape[0] = static_cast<int64_t>(pages.size());
  shape[1] = p0.height;
  shape[2] = p0.width;
  *bits = p0.bits;
  return 0;
}

// Read the full stack into `out` (caller allocates pages*h*w*bits/8 bytes).
int tiff_read(const char* path, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 8 << 20);
  std::vector<PageInfo> pages;
  if (!parse(f, &pages)) { fclose(f); return -2; }
  uint8_t* dst = out;
  for (const auto& p : pages) {
    for (size_t s = 0; s < p.strip_offsets.size(); ++s) {
      uint64_t cnt = s < p.strip_counts.size()
          ? p.strip_counts[s]
          : static_cast<uint64_t>(p.width) * p.height * (p.bits / 8);
      if (fseek(f, static_cast<long>(p.strip_offsets[s]), SEEK_SET) != 0 ||
          fread(dst, 1, cnt, f) != cnt) {
        fclose(f);
        return -4;
      }
      dst += cnt;
    }
  }
  fclose(f);
  return 0;
}

// Read pages [z0, z1) into `out` (caller allocates (z1-z0)*h*w*bits/8).
// Powers the streaming-inference input path: decode of chunk i+1 overlaps
// the device upload/compute of chunk i (parallel/dice_infer.py).
int tiff_read_pages(const char* path, int64_t z0, int64_t z1, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 8 << 20);
  std::vector<PageInfo> pages;
  if (!parse(f, &pages)) { fclose(f); return -2; }
  if (z0 < 0 || z1 > static_cast<int64_t>(pages.size()) || z0 >= z1) {
    fclose(f);
    return -3;
  }
  uint8_t* dst = out;
  for (int64_t i = z0; i < z1; ++i) {
    const PageInfo& p = pages[i];
    for (size_t s = 0; s < p.strip_offsets.size(); ++s) {
      uint64_t cnt = s < p.strip_counts.size()
          ? p.strip_counts[s]
          : static_cast<uint64_t>(p.width) * p.height * (p.bits / 8);
      if (fseek(f, static_cast<long>(p.strip_offsets[s]), SEEK_SET) != 0 ||
          fread(dst, 1, cnt, f) != cnt) {
        fclose(f);
        return -4;
      }
      dst += cnt;
    }
  }
  fclose(f);
  return 0;
}

// Write a z*h*w stack as a multi-page baseline TIFF (one strip per page).
// bits: 8, 16 or 32 (32 = IEEE float, SampleFormat=3).
int tiff_write(const char* path, const uint8_t* data, int64_t z, int64_t h,
               int64_t w, int32_t bits, int32_t is_float) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 8 << 20);
  const uint64_t page_bytes = static_cast<uint64_t>(h) * w * (bits / 8);
  // layout: header | page0 data | ifd0 | page1 data | ifd1 | ...
  TiffHeader hdr{0x4949, 42, 0};
  const uint32_t n_entries = 10;
  const uint32_t ifd_size = 2 + n_entries * sizeof(IfdEntry) + 4;

  uint64_t pos = sizeof(hdr);
  // precompute offsets
  std::vector<uint64_t> data_off(z), ifd_off(z);
  for (int64_t i = 0; i < z; ++i) {
    data_off[i] = pos;
    pos += page_bytes;
    ifd_off[i] = pos;
    pos += ifd_size;
  }
  if (pos > 0xFFFFFFF0ull) { fclose(f); return -5; }  // classic TIFF limit

  hdr.first_ifd = static_cast<uint32_t>(ifd_off[0]);
  if (fwrite(&hdr, sizeof(hdr), 1, f) != 1) { fclose(f); return -2; }

  for (int64_t i = 0; i < z; ++i) {
    if (fwrite(data + static_cast<uint64_t>(i) * page_bytes, 1, page_bytes, f)
        != page_bytes) { fclose(f); return -3; }
    uint16_t n = n_entries;
    fwrite(&n, 2, 1, f);
    auto put = [&](uint16_t tag, uint16_t type, uint32_t count, uint32_t value) {
      IfdEntry e{tag, type, count, value};
      fwrite(&e, sizeof(e), 1, f);
    };
    put(kImageWidth, 4, 1, static_cast<uint32_t>(w));
    put(kImageLength, 4, 1, static_cast<uint32_t>(h));
    put(kBitsPerSample, 3, 1, static_cast<uint32_t>(bits));
    put(kCompression, 3, 1, 1);
    put(kPhotometric, 3, 1, 1);  // BlackIsZero
    put(kStripOffsets, 4, 1, static_cast<uint32_t>(data_off[i]));
    put(kSamplesPerPixel, 3, 1, 1);
    put(kRowsPerStrip, 4, 1, static_cast<uint32_t>(h));
    put(kStripByteCounts, 4, 1, static_cast<uint32_t>(page_bytes));
    put(kSampleFormat, 3, 1, is_float ? 3u : 1u);
    uint32_t next = (i + 1 < z) ? static_cast<uint32_t>(ifd_off[i + 1]) : 0u;
    fwrite(&next, 4, 1, f);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
