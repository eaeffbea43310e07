// Packed cine-clip (PCK) reader — the native host-side data path.
//
// The throughput target (>=2000 frames/sec/chip streaming) puts real
// pressure on host decode (SURVEY.md §7.3 item 4): PNG/AVI codecs cannot
// feed that rate from Python.  The production answer is decode-once: clips
// are converted offline to a fixed-record packed file (frames + masks +
// validity, uint8/float32), and training/serving streams raw bytes.
//
// This library mmaps the file and assembles batches with a std::thread
// pool — gather + optional horizontal-flip augmentation run outside the
// Python GIL.  Exposed as a C ABI consumed via ctypes
// (gdkvm_tpu/data/packed.py); no pybind11 dependency.
//
// File layout (little-endian, fixed-size records => O(1) random access):
//   header: magic 'GDKV' | u32 version | u32 num_clips | u32 clip_len
//           u32 height | u32 width | u32 flags | u32 reserved
//   per clip: frames u8[T*H*W] | masks u8[T*H*W] | valid f32[T]

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x564B4447;  // 'GDKV'

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t num_clips;
  uint32_t clip_len;
  uint32_t height;
  uint32_t width;
  uint32_t flags;
  uint32_t reserved;
};

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  size_t frames_bytes = 0;  // per clip
  size_t masks_bytes = 0;
  size_t valid_bytes = 0;
  size_t record_bytes = 0;
};

inline const uint8_t* clip_ptr(const Handle* h, uint32_t idx) {
  return h->base + sizeof(Header) +
         static_cast<size_t>(idx) * h->record_bytes;
}

void flip_rows_h(uint8_t* dst, const uint8_t* src, uint32_t t, uint32_t hh,
                 uint32_t ww) {
  for (uint32_t f = 0; f < t * hh; ++f) {
    const uint8_t* s = src + static_cast<size_t>(f) * ww;
    uint8_t* d = dst + static_cast<size_t>(f) * ww;
    for (uint32_t x = 0; x < ww; ++x) d[x] = s[ww - 1 - x];
  }
}

}  // namespace

extern "C" {

// Returns an opaque handle, or nullptr on failure.
void* pck_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle();
  h->fd = fd;
  h->base = static_cast<const uint8_t*>(base);
  h->size = st.st_size;
  std::memcpy(&h->hdr, base, sizeof(Header));
  if (h->hdr.magic != kMagic || h->hdr.version != 1) {
    ::munmap(base, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  const size_t thw = static_cast<size_t>(h->hdr.clip_len) * h->hdr.height *
                     h->hdr.width;
  h->frames_bytes = thw;
  h->masks_bytes = thw;
  h->valid_bytes = static_cast<size_t>(h->hdr.clip_len) * sizeof(float);
  h->record_bytes = h->frames_bytes + h->masks_bytes + h->valid_bytes;
  const size_t expect = sizeof(Header) +
                        static_cast<size_t>(h->hdr.num_clips) * h->record_bytes;
  if (h->size < expect) {
    ::munmap(base, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  // Readahead hint: clip records are accessed randomly but whole.
  ::madvise(base, st.st_size, MADV_WILLNEED);
  return h;
}

void pck_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (!h) return;
  ::munmap(const_cast<uint8_t*>(h->base), h->size);
  ::close(h->fd);
  delete h;
}

// Header accessors (return 0 on null handle).
uint32_t pck_num_clips(void* h) {
  return h ? static_cast<Handle*>(h)->hdr.num_clips : 0;
}
uint32_t pck_clip_len(void* h) {
  return h ? static_cast<Handle*>(h)->hdr.clip_len : 0;
}
uint32_t pck_height(void* h) {
  return h ? static_cast<Handle*>(h)->hdr.height : 0;
}
uint32_t pck_width(void* h) {
  return h ? static_cast<Handle*>(h)->hdr.width : 0;
}

// Gather a batch of clips into caller-owned buffers.
//   indices:  int32[batch] clip ids
//   flips:    uint8[batch] — 1 = horizontal flip (augmentation), may be null
//   frames:   uint8[batch*T*H*W]   masks: uint8[batch*T*H*W]
//   valid:    float32[batch*T]
//   threads:  worker count (<=0 => hardware_concurrency, capped at batch)
// Returns 0 on success, -1 on bad args / out-of-range index.
int pck_gather(void* handle, const int32_t* indices, const uint8_t* flips,
               int32_t batch, uint8_t* frames, uint8_t* masks, float* valid,
               int32_t threads) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || !indices || !frames || !masks || !valid || batch <= 0) return -1;
  const uint32_t n = h->hdr.num_clips;
  for (int32_t i = 0; i < batch; ++i) {
    if (indices[i] < 0 || static_cast<uint32_t>(indices[i]) >= n) return -1;
  }
  int nt = threads > 0 ? threads
                       : static_cast<int>(std::thread::hardware_concurrency());
  if (nt > batch) nt = batch;
  if (nt < 1) nt = 1;

  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= batch) return;
      const uint8_t* src = clip_ptr(h, indices[i]);
      uint8_t* f_dst = frames + static_cast<size_t>(i) * h->frames_bytes;
      uint8_t* m_dst = masks + static_cast<size_t>(i) * h->masks_bytes;
      float* v_dst = valid + static_cast<size_t>(i) * h->hdr.clip_len;
      const bool flip = flips && flips[i];
      if (flip) {
        flip_rows_h(f_dst, src, h->hdr.clip_len, h->hdr.height, h->hdr.width);
        flip_rows_h(m_dst, src + h->frames_bytes, h->hdr.clip_len,
                    h->hdr.height, h->hdr.width);
      } else {
        std::memcpy(f_dst, src, h->frames_bytes);
        std::memcpy(m_dst, src + h->frames_bytes, h->masks_bytes);
      }
      std::memcpy(v_dst, src + h->frames_bytes + h->masks_bytes,
                  h->valid_bytes);
    }
  };
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
