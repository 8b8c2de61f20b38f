// Native mmap reader for the VLN feature store (see
// youtube_vln_tpu/data/store.py for the format).  Exposed to Python via
// ctypes; gives O(1) key lookup over a preparsed index and hands back raw
// record pointers so numpy can wrap the mmap'd floats zero-copy.
//
// Replaces the role of the LMDB C library in the reference stack
// (reference utils/dataset/features_reader.py:16-66).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

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
#pragma pack(pop)

struct Handle {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<std::string> keys;               // insertion order
  std::unordered_map<std::string, uint64_t> offsets;
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
  if (std::memcmp(hdr.magic, kMagic, 8) != 0 || hdr.version != 1) {
    ::munmap(map, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  const uint8_t* p = h->data + hdr.index_offset;
  const uint8_t* end = h->data + h->size;
  h->keys.reserve(hdr.n_records);
  h->offsets.reserve(hdr.n_records);
  for (uint64_t i = 0; i < hdr.n_records; ++i) {
    if (p + 2 > end) break;
    uint16_t klen;
    std::memcpy(&klen, p, 2);
    p += 2;
    if (p + klen + 8 > end) break;
    std::string key(reinterpret_cast<const char*>(p), klen);
    p += klen;
    uint64_t off;
    std::memcpy(&off, p, 8);
    p += 8;
    h->keys.push_back(key);
    h->offsets.emplace(std::move(key), off);
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

uint64_t vlnstore_num_records(void* handle) {
  return static_cast<Handle*>(handle)->keys.size();
}

const char* vlnstore_key_at(void* handle, uint64_t i) {
  auto* h = static_cast<Handle*>(handle);
  if (i >= h->keys.size()) return nullptr;
  return h->keys[i].c_str();
}

// Returns byte offset of the record body, or -1 if absent.
int64_t vlnstore_lookup(void* handle, const char* key) {
  auto* h = static_cast<Handle*>(handle);
  auto it = h->offsets.find(key);
  if (it == h->offsets.end()) return -1;
  return static_cast<int64_t>(it->second);
}

// Raw pointer into the mmap at the given offset (for zero-copy wrapping).
void* vlnstore_record_ptr(void* handle, int64_t offset) {
  auto* h = static_cast<Handle*>(handle);
  if (offset < 0 || (uint64_t)offset >= h->size) return nullptr;
  return const_cast<uint8_t*>(h->data + offset);
}

}  // extern "C"
