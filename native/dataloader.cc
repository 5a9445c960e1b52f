// High-throughput data-loading core for cross_attention_renderer_tpu.
//
// The training input pipeline (per-scene .npz frame archives -> uint8 frames
// -> resize/crop -> normalized float32) is pure Python in the reference
// (dataset/realestate10k_dataio.py __getitem__ + torch DataLoader workers).
// Here the hot path is native: a zip/npy reader (stored + deflate entries),
// a bilinear uint8 resizer, and a std::thread fan-out that decodes and
// processes a whole batch of frames in one call. Exposed via a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: make -C native   (g++ -O3 -fPIC -shared -lz)

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

#pragma pack(push, 1)
struct CentralDirEntry {
  uint32_t sig;
  uint16_t version_made, version_needed, flags, method;
  uint16_t mtime, mdate;
  uint32_t crc32, comp_size, uncomp_size;
  uint16_t name_len, extra_len, comment_len;
  uint16_t disk_start, internal_attr;
  uint32_t external_attr, local_offset;
};
struct LocalHeader {
  uint32_t sig;
  uint16_t version, flags, method, mtime, mdate;
  uint32_t crc32, comp_size, uncomp_size;
  uint16_t name_len, extra_len;
};
struct EndOfCentralDir {
  uint32_t sig;
  uint16_t disk, cd_disk, n_entries_disk, n_entries;
  uint32_t cd_size, cd_offset;
  uint16_t comment_len;
};
#pragma pack(pop)

struct ZipEntry {
  std::string name;          // npy member name (without .npy)
  uint64_t data_offset = 0;  // resolved lazily
  uint32_t comp_size = 0, uncomp_size = 0;
  uint16_t method = 0;       // 0 stored, 8 deflate
  uint32_t local_offset = 0;
  bool resolved = false;
};

struct NpzFile {
  std::string path;
  std::vector<ZipEntry> entries;
  std::unordered_map<std::string, size_t> index;
  std::mutex mu;
};

bool read_central_directory(NpzFile* z) {
  std::ifstream f(z->path, std::ios::binary);
  if (!f) return false;
  f.seekg(0, std::ios::end);
  int64_t size = f.tellg();
  // scan backwards for EOCD signature (0x06054b50)
  int64_t scan = std::min<int64_t>(size, 66000);
  std::vector<char> tail(scan);
  f.seekg(size - scan);
  f.read(tail.data(), scan);
  int64_t eocd_pos = -1;
  for (int64_t i = scan - 22; i >= 0; --i) {
    if (memcmp(tail.data() + i, "PK\x05\x06", 4) == 0) {
      eocd_pos = i;
      break;
    }
  }
  if (eocd_pos < 0) return false;
  EndOfCentralDir eocd;
  memcpy(&eocd, tail.data() + eocd_pos, sizeof(eocd));

  std::vector<char> cd(eocd.cd_size);
  f.seekg(eocd.cd_offset);
  f.read(cd.data(), eocd.cd_size);
  size_t off = 0;
  for (int i = 0; i < eocd.n_entries; ++i) {
    CentralDirEntry e;
    memcpy(&e, cd.data() + off, sizeof(e));
    if (e.sig != 0x02014b50) return false;
    std::string name(cd.data() + off + sizeof(e), e.name_len);
    ZipEntry ze;
    // strip ".npy" suffix for the member key, like numpy does
    ze.name = (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
                  ? name.substr(0, name.size() - 4)
                  : name;
    ze.comp_size = e.comp_size;
    ze.uncomp_size = e.uncomp_size;
    ze.method = e.method;
    ze.local_offset = e.local_offset;
    z->index[ze.name] = z->entries.size();
    z->entries.push_back(std::move(ze));
    off += sizeof(e) + e.name_len + e.extra_len + e.comment_len;
  }
  return true;
}

bool read_entry_raw(NpzFile* z, ZipEntry* e, std::vector<uint8_t>* out) {
  std::ifstream f(z->path, std::ios::binary);
  if (!f) return false;
  if (!e->resolved) {
    LocalHeader lh;
    f.seekg(e->local_offset);
    f.read(reinterpret_cast<char*>(&lh), sizeof(lh));
    if (lh.sig != 0x04034b50) return false;
    e->data_offset =
        e->local_offset + sizeof(lh) + lh.name_len + lh.extra_len;
    e->resolved = true;
  }
  std::vector<uint8_t> comp(e->comp_size);
  f.seekg(e->data_offset);
  f.read(reinterpret_cast<char*>(comp.data()), e->comp_size);
  if (e->method == 0) {
    *out = std::move(comp);
    return true;
  }
  if (e->method == 8) {
    out->resize(e->uncomp_size);
    z_stream zs{};
    inflateInit2(&zs, -15);  // raw deflate
    zs.next_in = comp.data();
    zs.avail_in = e->comp_size;
    zs.next_out = out->data();
    zs.avail_out = e->uncomp_size;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END;
  }
  return false;
}

// Minimal .npy parser for contiguous little-endian arrays.
// Returns pointer to data within `raw` plus dims; supports |u1 and <f4.
bool parse_npy(const std::vector<uint8_t>& raw, const uint8_t** data,
               int64_t dims[4], int* ndim, char* dtype) {
  if (raw.size() < 10 || memcmp(raw.data(), "\x93NUMPY", 6) != 0)
    return false;
  uint16_t header_len;
  memcpy(&header_len, raw.data() + 8, 2);
  std::string header(reinterpret_cast<const char*>(raw.data()) + 10,
                     header_len);
  if (header.find("'fortran_order': False") == std::string::npos)
    return false;
  if (header.find("|u1") != std::string::npos) {
    *dtype = 'u';
  } else if (header.find("<f4") != std::string::npos) {
    *dtype = 'f';
  } else {
    return false;
  }
  auto p = header.find("'shape': (");
  if (p == std::string::npos) return false;
  p += 10;
  *ndim = 0;
  while (*ndim < 4) {
    auto q = header.find_first_of(",)", p);
    std::string num = header.substr(p, q - p);
    if (!num.empty() && num != " ") dims[(*ndim)++] = std::stoll(num);
    if (header[q] == ')') break;
    p = q + 1;
  }
  *data = raw.data() + 10 + header_len;
  return true;
}

// Bilinear resize HWC uint8 (align with cv2.resize: half-pixel centers).
void resize_bilinear_u8(const uint8_t* in, int h, int w, int c, uint8_t* out,
                        int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy < 0 ? 0 : fy);
    if (y0 > h - 2) y0 = h - 2;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    if (wy > 1) wy = 1;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx < 0 ? 0 : fx);
      if (x0 > w - 2) x0 = w - 2;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      if (wx > 1) wx = 1;
      const uint8_t* p00 = in + ((int64_t)y0 * w + x0) * c;
      const uint8_t* p01 = p00 + c;
      const uint8_t* p10 = p00 + (int64_t)w * c;
      const uint8_t* p11 = p10 + c;
      uint8_t* o = out + ((int64_t)y * ow + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        o[k] = static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

struct FrameJob {
  NpzFile* file;
  const char* entry;
  float* out;       // (out_h, out_w, 3) normalized to [-1, 1]
  int out_h, out_w;
  int resize_h, resize_w;  // pre-crop resize target (0 = keep)
  int square_crop;
  int ok;
};

void process_frame(FrameJob* job) {
  job->ok = 0;
  auto it = job->file->index.find(job->entry);
  if (it == job->file->index.end()) return;
  ZipEntry* e = &job->file->entries[it->second];
  std::vector<uint8_t> raw;
  {
    std::lock_guard<std::mutex> lock(job->file->mu);
    if (!read_entry_raw(job->file, e, &raw)) return;
  }
  const uint8_t* data;
  int64_t dims[4];
  int ndim;
  char dtype;
  if (!parse_npy(raw, &data, dims, &ndim, &dtype) || ndim != 3 ||
      dtype != 'u')
    return;
  int h = dims[0], w = dims[1], c = dims[2];
  if (c != 3) return;

  std::vector<uint8_t> resized;
  if (job->resize_h && (h != job->resize_h || w != job->resize_w)) {
    resized.resize((int64_t)job->resize_h * job->resize_w * c);
    resize_bilinear_u8(data, h, w, c, resized.data(), job->resize_h,
                       job->resize_w);
    data = resized.data();
    h = job->resize_h;
    w = job->resize_w;
  }
  int x0 = 0, y0 = 0, ch = h, cw = w;
  if (job->square_crop) {
    int m = h < w ? h : w;
    y0 = h / 2 - m / 2;
    x0 = w / 2 - m / 2;
    ch = cw = m;
  }
  // final resize to out size if needed, else direct crop copy
  std::vector<uint8_t> cropped((int64_t)ch * cw * c);
  for (int y = 0; y < ch; ++y)
    memcpy(cropped.data() + (int64_t)y * cw * c,
           data + (((int64_t)(y + y0)) * w + x0) * c, (int64_t)cw * c);
  const uint8_t* final_u8 = cropped.data();
  std::vector<uint8_t> final_buf;
  if (ch != job->out_h || cw != job->out_w) {
    final_buf.resize((int64_t)job->out_h * job->out_w * c);
    resize_bilinear_u8(cropped.data(), ch, cw, c, final_buf.data(),
                       job->out_h, job->out_w);
    final_u8 = final_buf.data();
  }
  const int64_t n = (int64_t)job->out_h * job->out_w * c;
  for (int64_t i = 0; i < n; ++i)
    job->out[i] = final_u8[i] / 127.5f - 1.0f;
  job->ok = 1;
}

}  // namespace

extern "C" {

void* dl_open(const char* path) {
  auto* z = new NpzFile();
  z->path = path;
  if (!read_central_directory(z)) {
    delete z;
    return nullptr;
  }
  return z;
}

void dl_close(void* handle) { delete static_cast<NpzFile*>(handle); }

int dl_num_entries(void* handle) {
  return static_cast<NpzFile*>(handle)->entries.size();
}

const char* dl_entry_name(void* handle, int i) {
  return static_cast<NpzFile*>(handle)->entries[i].name.c_str();
}

// Decode + resize + square-crop + normalize a batch of frames in parallel.
// entries: array of n entry-name pointers; out: (n, out_h, out_w, 3) f32.
// Returns the number of successfully decoded frames.
int dl_load_frames(void* handle, const char** entries, int n, float* out,
                   int out_h, int out_w, int resize_h, int resize_w,
                   int square_crop, int n_threads) {
  auto* z = static_cast<NpzFile*>(handle);
  std::vector<FrameJob> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i] = FrameJob{z, entries[i],
                       out + (int64_t)i * out_h * out_w * 3, out_h, out_w,
                       resize_h, resize_w, square_crop, 0};
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      process_frame(&jobs[i]);
    }
  };
  int nt = n_threads < 1 ? 1 : n_threads;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  int ok = 0;
  for (auto& j : jobs) ok += j.ok;
  return ok;
}

}  // extern "C"
