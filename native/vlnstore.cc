// Native mmap reader for the VLN feature store (see
// youtube_vln_tpu/data/store.py for the format).  Exposed to Python via
// ctypes; gives O(1) key lookup over a preparsed index and hands back raw
// record pointers so numpy can wrap the mmap'd floats zero-copy.
//
// Replaces the role of the LMDB C library in the reference stack
// (reference utils/dataset/features_reader.py:16-66).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#if defined(__F16C__)
#include <immintrin.h>
#endif

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'V', 'L', 'N', 'S', 'T', 'O', 'R', '1'};

#pragma pack(push, 1)
struct Header {
  char magic[8];
  uint32_t version;
  uint32_t flags;
  uint64_t n_records;
  uint64_t index_offset;
};

struct RecHeader {
  uint32_t num_boxes;
  uint32_t image_w;
  uint32_t image_h;
  uint32_t flags;
};
#pragma pack(pop)

struct Handle {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  uint64_t body_end = 0;                       // = index_offset: records
                                               // live in [32, body_end)
  std::vector<std::string> keys;               // insertion order
  std::unordered_map<std::string, uint64_t> offsets;
  std::vector<uint64_t> sorted_offs;           // record starts, ascending

  // Tightest provable end for the record starting at `off`: the next
  // record's start (records are laid out back to back), else the index
  // start.  Bounding extents by body_end alone lets a moderately corrupt
  // num_boxes silently serve the NEXT record's bytes as this record's
  // features.
  uint64_t record_end(uint64_t off) const {
    auto it = std::upper_bound(sorted_offs.begin(), sorted_offs.end(), off);
    return it == sorted_offs.end() ? body_end : *it;
  }
};

}  // namespace

extern "C" {

void* vlnstore_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle;
  h->fd = fd;
  h->data = static_cast<const uint8_t*>(map);
  h->size = st.st_size;

  Header hdr;
  std::memcpy(&hdr, h->data, sizeof(hdr));
  if (std::memcmp(hdr.magic, kMagic, 8) != 0 || hdr.version != 1 ||
      hdr.index_offset > h->size) {  // truncated/corrupt index
    ::munmap(map, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  h->body_end = hdr.index_offset;
  const uint8_t* p = h->data + hdr.index_offset;
  const uint8_t* end = h->data + h->size;
  // Each index entry occupies >= 10 bytes (u16 klen + key + u64 offset), so
  // an n_records the index region cannot hold is provably corrupt.  Check
  // BEFORE reserve(): a garbage 64-bit count would make reserve throw
  // std::length_error/bad_alloc through the extern "C" boundary
  // (std::terminate) instead of declining like every other corruption path.
  if (hdr.n_records > (h->size - hdr.index_offset) / 10) {
    ::munmap(map, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  h->keys.reserve(hdr.n_records);
  h->offsets.reserve(hdr.n_records);
  bool ok = true;
  for (uint64_t i = 0; i < hdr.n_records; ++i) {
    if (p + 2 > end) { ok = false; break; }     // truncated index
    uint16_t klen;
    std::memcpy(&klen, p, 2);
    p += 2;
    if (p + klen + 8 > end) { ok = false; break; }
    std::string key(reinterpret_cast<const char*>(p), klen);
    p += klen;
    uint64_t off;
    std::memcpy(&off, p, 8);
    p += 8;
    // a record offset must land its header inside the body region
    // [sizeof(Header), index_offset) or every later pointer derived from
    // it is out of bounds — fail the whole open rather than hand out a
    // half-index that segfaults at pack time.  Subtraction form: the
    // addition `off + sizeof(RecHeader)` wraps for offsets near
    // UINT64_MAX and would pass the check.
    if (off < sizeof(Header) ||
        hdr.index_offset < sizeof(RecHeader) ||
        off > hdr.index_offset - sizeof(RecHeader)) {
      ok = false;
      break;
    }
    h->keys.push_back(key);
    h->offsets.emplace(std::move(key), off);
  }
  if (ok) {
    h->sorted_offs.reserve(h->offsets.size());
    for (const auto& kv : h->offsets) h->sorted_offs.push_back(kv.second);
    std::sort(h->sorted_offs.begin(), h->sorted_offs.end());
  }
  if (!ok) {
    ::munmap(map, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  return h;
}

void vlnstore_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (!h) return;
  ::munmap(const_cast<uint8_t*>(h->data), h->size);
  ::close(h->fd);
  delete h;
}

// ---------------------------------------------------------------------------
// Path-feature packer: the training hot loop's gather+normalize+pad+concat
// (youtube_vln_tpu/data/features_reader.py:RegionFeaturesReader.__getitem__
// + datasets.py:_PathFeatureAssembler) in one C pass per step, writing
// straight into the caller's [max_steps*max_boxes, ...] buffers.
// ---------------------------------------------------------------------------

namespace {

constexpr int kFeatDim = 2048;
constexpr int kBoxDim = 4;
constexpr int kProbDim = 1601;
constexpr int kLocDim = 12;

// Bytes of the non-pano record body after RecHeader; pano records carry an
// additional (36+36+3k)*4-byte orientation tail (store.py:12-17).
inline uint64_t region_body_bytes(uint32_t k) {
  return (uint64_t)k * (kFeatDim + kBoxDim + kProbDim) * sizeof(float);
}

struct RecView {
  uint32_t k;
  float w, h;
  const float* features;  // [k, 2048]
  const float* boxes;     // [k, 4]
  const float* probs;     // [k, 1601]
};

bool view_record(const Handle* h, const char* key, RecView* out) {
  auto it = h->offsets.find(key);
  if (it == h->offsets.end()) return false;
  const uint8_t* p = h->data + it->second;
  RecHeader rh;
  std::memcpy(&rh, p, sizeof(rh));
  // a corrupt num_boxes would derive feature/box/prob pointers past the
  // record region and turn the pack memcpys into an OOB read
  if (it->second + sizeof(rh) + region_body_bytes(rh.num_boxes) >
      h->record_end(it->second))
    return false;
  p += sizeof(rh);
  out->k = rh.num_boxes;
  out->w = static_cast<float>(rh.image_w);
  out->h = static_cast<float>(rh.image_h);
  out->features = reinterpret_cast<const float*>(p);
  out->boxes = out->features + (size_t)rh.num_boxes * kFeatDim;
  out->probs = out->boxes + (size_t)rh.num_boxes * kBoxDim;
  return true;
}

}  // namespace

// f32 -> IEEE f16 with round-to-nearest-even, bit-matching numpy's
// astype(float16).  F16C (vcvtps2ph) on any x86-64 from ~2012 on; the
// scalar fallback goes through the compiler's _Float16 conversion.
#if defined(__F16C__)
static void cvt_f32_to_f16(const float* src, uint16_t* dst, size_t n) {
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    __m128i half = _mm256_cvtps_ph(_mm256_loadu_ps(src + i),
                                   _MM_FROUND_TO_NEAREST_INT);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + i), half);
  }
  if (i < n) {  // tail via a padded 8-lane pass
    float tmp[8] = {0};
    uint16_t out8[8];
    size_t rem = n - i;
    std::memcpy(tmp, src + i, rem * sizeof(float));
    __m128i half = _mm256_cvtps_ph(_mm256_loadu_ps(tmp),
                                   _MM_FROUND_TO_NEAREST_INT);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out8), half);
    std::memcpy(dst + i, out8, rem * sizeof(uint16_t));
  }
}
#else
static void cvt_f32_to_f16(const float* src, uint16_t* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    _Float16 half = static_cast<_Float16>(src[i]);
    std::memcpy(dst + i, &half, sizeof(half));
  }
}
#endif

namespace {

// Shared body of the path packers.  Exactly one of feats32/feats16 is
// non-null; probs may be null (skipped — the dedup transport gathers
// target rows on demand via vlnstore_gather_probs instead of
// materializing the [S, 1601] block).
int pack_path_impl(void* handle, const char** keys,
                   const int64_t* key_offsets, int n_steps, int max_steps,
                   int max_boxes, float* feats32, uint16_t* feats16,
                   float* locs, float* probs, int32_t* mask) {
  auto* h = static_cast<Handle*>(handle);
  for (int step = 0; step < max_steps; ++step) {
    float* f32 = feats32
        ? feats32 + (size_t)step * max_boxes * kFeatDim : nullptr;
    uint16_t* f16 = feats16
        ? feats16 + (size_t)step * max_boxes * kFeatDim : nullptr;
    float* l = locs + (size_t)step * max_boxes * kLocDim;
    float* pr = probs
        ? probs + (size_t)step * max_boxes * kProbDim : nullptr;
    int32_t* m = mask + (size_t)step * max_boxes;
    if (f32)
      std::memset(f32, 0, sizeof(float) * (size_t)max_boxes * kFeatDim);
    if (f16)
      std::memset(f16, 0, sizeof(uint16_t) * (size_t)max_boxes * kFeatDim);
    std::memset(l, 0, sizeof(float) * (size_t)max_boxes * kLocDim);
    if (pr)
      std::memset(pr, 0, sizeof(float) * (size_t)max_boxes * kProbDim);
    std::memset(m, 0, sizeof(int32_t) * (size_t)max_boxes);
    for (int b = 0; b < max_boxes; ++b) l[b * kLocDim + 11] = (float)step;
    if (step >= n_steps) continue;

    // first pass: total region count + the mean feature (float64
    // accumulation, matching numpy's f32-mean precision closely enough)
    int64_t lo = key_offsets[step], hi = key_offsets[step + 1];
    uint64_t total_k = 0;
    static thread_local std::vector<double> acc;
    acc.assign(kFeatDim, 0.0);
    static thread_local std::vector<RecView> views;
    views.clear();
    for (int64_t i = lo; i < hi; ++i) {
      RecView v;
      if (!view_record(h, keys[i], &v)) return -1;
      views.push_back(v);
      for (uint32_t r = 0; r < v.k; ++r) {
        const float* row = v.features + (size_t)r * kFeatDim;
        for (int c = 0; c < kFeatDim; ++c) acc[c] += row[c];
      }
      total_k += v.k;
    }
    if (total_k == 0) return -1;

    // region 0: the synthesized global region
    static thread_local std::vector<float> mean_row;
    mean_row.resize(kFeatDim);
    for (int c = 0; c < kFeatDim; ++c)
      mean_row[c] = (float)(acc[c] / (double)total_k);
    if (f32) std::memcpy(f32, mean_row.data(), sizeof(float) * kFeatDim);
    if (f16) cvt_f32_to_f16(mean_row.data(), f16, kFeatDim);
    // [0,0,1,1,1, sin0,cos0, sin0,cos0, sin0,cos0] — the synthesized
    // global region's location (features_reader.py:102, reference :171)
    l[0] = 0.0f; l[1] = 0.0f; l[2] = 1.0f; l[3] = 1.0f; l[4] = 1.0f;
    l[5] = 0.0f; l[6] = 1.0f; l[7] = 0.0f; l[8] = 1.0f;
    l[9] = 0.0f; l[10] = 1.0f;
    l[11] = (float)step;
    if (pr) {
      const float uniform = 1.0f / (float)kProbDim;
      for (int c = 0; c < kProbDim; ++c) pr[c] = uniform;
    }
    m[0] = 1;

    // remaining rows: concatenated photo regions, truncated at max_boxes
    int row = 1;
    for (const RecView& v : views) {
      for (uint32_t r = 0; r < v.k && row < max_boxes; ++r, ++row) {
        if (f32)
          std::memcpy(f32 + (size_t)row * kFeatDim,
                      v.features + (size_t)r * kFeatDim,
                      sizeof(float) * kFeatDim);
        if (f16)
          cvt_f32_to_f16(v.features + (size_t)r * kFeatDim,
                         f16 + (size_t)row * kFeatDim, kFeatDim);
        const float* box = v.boxes + (size_t)r * kBoxDim;
        float* lr = l + (size_t)row * kLocDim;
        lr[0] = box[0] / v.w;
        lr[1] = box[1] / v.h;
        lr[2] = box[2] / v.w;
        lr[3] = box[3] / v.h;
        lr[4] = (box[2] - box[0]) * (box[3] - box[1]) / (v.w * v.h);
        for (int c = 5; c < 11; ++c) lr[c] = 1.0f;
        lr[11] = (float)step;
        if (pr)
          std::memcpy(pr + (size_t)row * kProbDim,
                      v.probs + (size_t)r * kProbDim,
                      sizeof(float) * kProbDim);
        m[row] = 1;
      }
      if (row >= max_boxes) break;
    }
  }
  return 0;
}

}  // namespace

// Pack one path of n_steps step groups into preallocated buffers shaped
// [max_steps * max_boxes, {2048 | 12 | 1601}] (+ int32 mask
// [max_steps * max_boxes]).  Step i reads keys
// keys[key_offsets[i] .. key_offsets[i+1]); its regions are the synthesized
// global region (mean feature, location [0,0,1,1,1,1..], uniform probs)
// followed by the concatenated per-photo regions, truncated to max_boxes
// and zero-padded; location column 11 carries the step index for ALL rows
// (datasets.py pad_step).  Steps beyond n_steps are zeroed except col 11.
// probs may be NULL (skipped).  Returns 0 on success, -1 on a missing key.
int vlnstore_pack_path(void* handle, const char** keys,
                       const int64_t* key_offsets, int n_steps,
                       int max_steps, int max_boxes, float* feats,
                       float* locs, float* probs, int32_t* mask) {
  return pack_path_impl(handle, keys, key_offsets, n_steps, max_steps,
                        max_boxes, feats, nullptr, locs, probs, mask);
}

// f16-feature variant for the dedup transport: features are written as
// IEEE half (the H2D dtype) straight from the store — one converting
// copy instead of an f32 copy plus a python-side cast — and probs are
// not materialized at all (use vlnstore_gather_probs for target rows).
int vlnstore_pack_path_f16(void* handle, const char** keys,
                           const int64_t* key_offsets, int n_steps,
                           int max_steps, int max_boxes, uint16_t* feats,
                           float* locs, int32_t* mask) {
  return pack_path_impl(handle, keys, key_offsets, n_steps, max_steps,
                        max_boxes, nullptr, feats, locs, nullptr, mask);
}

// Gather class-probability rows for specific packed-region ids of a path
// (region id = step * max_boxes + box, the row index pack_path would
// have used).  Box 0 is the synthesized uniform row; out-of-range ids
// (padded steps / truncated boxes) come back zeroed.  ids SHOULD be
// ascending (per-step record views are rebuilt when the step changes).
// out is [n_ids, 1601].  Returns 0 on success, -1 on a missing key.
int vlnstore_gather_probs(void* handle, const char** keys,
                          const int64_t* key_offsets, int n_steps,
                          int max_boxes, const int32_t* region_ids,
                          int n_ids, float* out) {
  auto* h = static_cast<Handle*>(handle);
  static thread_local std::vector<RecView> views;
  int cached_step = -1;
  for (int i = 0; i < n_ids; ++i) {
    float* dst = out + (size_t)i * kProbDim;
    std::memset(dst, 0, sizeof(float) * kProbDim);
    int id = region_ids[i];
    if (id < 0) continue;
    int step = id / max_boxes;
    int box = id % max_boxes;
    if (step >= n_steps) continue;
    if (box == 0) {
      const float uniform = 1.0f / (float)kProbDim;
      for (int c = 0; c < kProbDim; ++c) dst[c] = uniform;
      continue;
    }
    if (step != cached_step) {
      views.clear();
      for (int64_t k = key_offsets[step]; k < key_offsets[step + 1]; ++k) {
        RecView v;
        if (!view_record(h, keys[k], &v)) return -1;
        views.push_back(v);
      }
      cached_step = step;
    }
    // (box - 1)-th concatenated region across the step's records
    uint32_t want = (uint32_t)(box - 1);
    for (const RecView& v : views) {
      if (want < v.k) {
        std::memcpy(dst, v.probs + (size_t)want * kProbDim,
                    sizeof(float) * kProbDim);
        break;
      }
      want -= v.k;
    }
  }
  return 0;
}

}  // extern "C"

namespace {

// One pano step block (the per-step body of the pano packers): zeroes the
// block, writes the synthesized global region (f64-accumulated feature
// mean, sin/cos orientation vs the heading query) then the per-region
// rows, with location column 11 = step_label on every row.  Exactly one
// of f32/f16 is non-null (f16 goes through cvt_f32_to_f16, bit-matching
// numpy astype(float16) of the f32 block); pr may be null (the
// ranking-only eval path never reads class probabilities).  A null/empty
// key emits the empty-step block (all zero except column 11 — matching
// datasets.py:_PathFeatureAssembler.empty_step).  Returns 0 on success,
// -1 on missing key / non-pano record.
int pack_pano_block(const Handle* h, const char* key, double hd, double nh,
                    int step_label, int max_boxes, float* f32, uint16_t* f16,
                    float* l, float* pr, int32_t* m) {
  if (key == nullptr || key[0] == '\0') {  // empty-step block
    if (f32)
      std::memset(f32, 0, sizeof(float) * (size_t)max_boxes * kFeatDim);
    if (f16)
      std::memset(f16, 0, sizeof(uint16_t) * (size_t)max_boxes * kFeatDim);
    std::memset(l, 0, sizeof(float) * (size_t)max_boxes * kLocDim);
    if (pr)
      std::memset(pr, 0, sizeof(float) * (size_t)max_boxes * kProbDim);
    std::memset(m, 0, sizeof(int32_t) * (size_t)max_boxes);
    for (int b = 0; b < max_boxes; ++b)
      l[b * kLocDim + 11] = (float)step_label;
    return 0;
  }

  auto it = h->offsets.find(key);
  if (it == h->offsets.end()) return -1;
  const uint8_t* p = h->data + it->second;
  RecHeader rh;
  std::memcpy(&rh, p, sizeof(rh));
  if (!(rh.flags & 1u)) return -1;  // FLAG_PANO (store.py:38)
  // full pano extent: region body + orientation tail (36+36+3k floats) —
  // a corrupt num_boxes must fail here, not OOB-read in the copy loop
  if (it->second + sizeof(rh) + region_body_bytes(rh.num_boxes) +
          (uint64_t)(72 + 3 * (uint64_t)rh.num_boxes) * sizeof(float) >
      h->record_end(it->second))
    return -1;
  p += sizeof(rh);
  const uint32_t k = rh.num_boxes;
  const float w = (float)rh.image_w, ih = (float)rh.image_h;
  const float* features = reinterpret_cast<const float*>(p);
  const float* boxes = features + (size_t)k * kFeatDim;
  const float* cls_prob = boxes + (size_t)k * kBoxDim;
  const float* after_probs = cls_prob + (size_t)k * kProbDim;
  // pano tail: viewHeading[36], viewElevation[36], featHeading[k],
  // featElevation[k], featViewIndex[k] (store.py:92-97)
  const float* feat_heading = after_probs + 36 + 36;
  const float* feat_elev = feat_heading + k;

  // global region 0
  double acc_local[kFeatDim];
  std::memset(acc_local, 0, sizeof(acc_local));
  for (uint32_t r = 0; r < k; ++r) {
    const float* row = features + (size_t)r * kFeatDim;
    for (int c = 0; c < kFeatDim; ++c) acc_local[c] += row[c];
  }
  if (k == 0) return -1;
  static thread_local std::vector<float> mean_row;
  mean_row.resize(kFeatDim);
  for (int c = 0; c < kFeatDim; ++c)
    mean_row[c] = (float)(acc_local[c] / (double)k);
  if (f32) std::memcpy(f32, mean_row.data(), sizeof(float) * kFeatDim);
  if (f16) cvt_f32_to_f16(mean_row.data(), f16, kFeatDim);
  l[0] = 0.0f; l[1] = 0.0f; l[2] = 1.0f; l[3] = 1.0f; l[4] = 1.0f;
  l[5] = (float)std::sin(0.0 - hd);
  l[6] = (float)std::cos(0.0 - hd);
  l[7] = 0.0f; l[8] = 1.0f;
  l[9] = (float)std::sin(0.0 - nh);
  l[10] = (float)std::cos(0.0 - nh);
  l[11] = (float)step_label;
  if (pr) {
    const float uniform = 1.0f / (float)kProbDim;
    for (int c = 0; c < kProbDim; ++c) pr[c] = uniform;
  }
  m[0] = 1;

  int row = 1;
  for (uint32_t r = 0; r < k && row < max_boxes; ++r, ++row) {
    if (f32)
      std::memcpy(f32 + (size_t)row * kFeatDim,
                  features + (size_t)r * kFeatDim, sizeof(float) * kFeatDim);
    if (f16)
      cvt_f32_to_f16(features + (size_t)r * kFeatDim,
                     f16 + (size_t)row * kFeatDim, kFeatDim);
    const float* box = boxes + (size_t)r * kBoxDim;
    float* lr = l + (size_t)row * kLocDim;
    lr[0] = box[0] / w;
    lr[1] = box[1] / ih;
    lr[2] = box[2] / w;
    lr[3] = box[3] / ih;
    lr[4] = (box[2] - box[0]) * (box[3] - box[1]) / (w * ih);
    const double fh = (double)feat_heading[r];
    const double fe = (double)feat_elev[r];
    lr[5] = (float)std::sin(fh - hd);
    lr[6] = (float)std::cos(fh - hd);
    lr[7] = (float)std::sin(fe);
    lr[8] = (float)std::cos(fe);
    lr[9] = (float)std::sin(fh - nh);
    lr[10] = (float)std::cos(fh - nh);
    lr[11] = (float)step_label;
    if (pr)
      std::memcpy(pr + (size_t)row * kProbDim,
                  cls_prob + (size_t)r * kProbDim, sizeof(float) * kProbDim);
    m[row] = 1;
  }

  // zero ONLY the unwritten padding tail (rows >= row): at eval geometry
  // (k=100 regions + the global row = max_boxes) blocks are full, and a
  // whole-block memset-then-overwrite would double the write traffic of
  // the packer's dominant cost
  size_t tail = (size_t)(max_boxes - row);
  if (tail) {
    if (f32)
      std::memset(f32 + (size_t)row * kFeatDim, 0,
                  sizeof(float) * tail * kFeatDim);
    if (f16)
      std::memset(f16 + (size_t)row * kFeatDim, 0,
                  sizeof(uint16_t) * tail * kFeatDim);
    std::memset(l + (size_t)row * kLocDim, 0,
                sizeof(float) * tail * kLocDim);
    if (pr)
      std::memset(pr + (size_t)row * kProbDim, 0,
                  sizeof(float) * tail * kProbDim);
    std::memset(m + row, 0, sizeof(int32_t) * tail);
    for (int b = row; b < max_boxes; ++b)
      l[b * kLocDim + 11] = (float)step_label;
  }
  return 0;
}

}  // namespace

extern "C" {

// Pano variant (the R2R fine-tune hot loop,
// features_reader.py:PanoFeaturesReader + datasets.py:_path_features):
// one key per step with (heading, next_heading) queries; location columns
// 5..10 carry sin/cos of the feature orientation relative to the query.
// Returns 0 on success, -1 on missing key / non-pano record.
int vlnstore_pack_pano_path(void* handle, const char** keys,
                            const double* headings,
                            const double* next_headings, int n_steps,
                            int max_steps, int max_boxes, float* feats,
                            float* locs, float* probs, int32_t* mask) {
  auto* h = static_cast<Handle*>(handle);
  for (int step = 0; step < max_steps; ++step) {
    int ret = pack_pano_block(
        h, step < n_steps ? keys[step] : nullptr,
        step < n_steps ? headings[step] : 0.0,
        step < n_steps ? next_headings[step] : 0.0, step, max_boxes,
        feats + (size_t)step * max_boxes * kFeatDim, nullptr,
        locs + (size_t)step * max_boxes * kLocDim,
        probs + (size_t)step * max_boxes * kProbDim,
        mask + (size_t)step * max_boxes);
    if (ret != 0) return ret;
  }
  return 0;
}

// Batched f16 pano STEP packer for the beam-eval/serving host path
// (datasets.py:BeamDataset — both the dense per-beam layout and the
// --dedup_beam_steps unique-block layout are lists of independent
// (key, heading, next_heading, step-position) blocks): n_blocks blocks
// written contiguously, block j -> rows [j*max_boxes, (j+1)*max_boxes),
// features as IEEE half (the H2D transport dtype) straight from the
// store, class probabilities never materialized (the ranking-only eval
// batch carries no vision targets).  An empty key string emits the
// empty-step block.  One C call replaces per-block ctypes dispatch +
// stack + astype + pad on the python side.
int vlnstore_pack_pano_steps_f16(void* handle, const char** keys,
                                 const double* headings,
                                 const double* next_headings,
                                 const int32_t* step_labels, int n_blocks,
                                 int max_boxes, uint16_t* feats, float* locs,
                                 int32_t* mask) {
  auto* h = static_cast<Handle*>(handle);
  for (int j = 0; j < n_blocks; ++j) {
    int ret = pack_pano_block(
        h, keys[j], headings[j], next_headings[j], step_labels[j], max_boxes,
        nullptr, feats + (size_t)j * max_boxes * kFeatDim,
        locs + (size_t)j * max_boxes * kLocDim, nullptr,
        mask + (size_t)j * max_boxes);
    if (ret != 0) return ret;
  }
  return 0;
}

}  // extern "C"
