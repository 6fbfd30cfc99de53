// Native persistence core for vectordb_tpu.
//
// Byte-level / syscall-sensitive host pieces the reference implements in
// Rust (src/persistence/wal.rs: frame = [len:u32 LE][crc32:u32 LE][payload]
// with fsync per append; src/persistence/mmap.rs: header [dim:u32][count:u32]
// + packed LE f32 rows), rebuilt as a small C++ library driven from Python
// via ctypes. A pure-Python fallback with the identical on-disk format lives
// beside it; files written by either are readable by both.
//
// Exposed surface (all extern "C"):
//   crc32                         - CRC-32 (IEEE, zlib-compatible)
//   wal_open/append/sync/truncate/close
//   wal_scan                      - validate frames, return valid prefix
//   durable_write                 - tmp + rename + fsync (atomic snapshot)
//   mmf_create/open/append/get/read_range/count/dim/close

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------- crc32 ---

uint32_t g_crc_table[256];
bool g_crc_init = false;

void crc_init() {
    if (g_crc_init) return;
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        g_crc_table[i] = c;
    }
    g_crc_init = true;
}

uint32_t crc32_impl(const uint8_t* buf, size_t len) {
    crc_init();
    uint32_t c = 0xFFFFFFFFu;
    for (size_t i = 0; i < len; i++)
        c = g_crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

bool write_all(int fd, const uint8_t* buf, size_t len) {
    size_t off = 0;
    while (off < len) {
        ssize_t n = ::write(fd, buf + off, len - off);
        if (n < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        off += static_cast<size_t>(n);
    }
    return true;
}

bool read_exact(int fd, uint8_t* buf, size_t len) {
    size_t off = 0;
    while (off < len) {
        ssize_t n = ::read(fd, buf + off, len - off);
        if (n <= 0) {
            if (n < 0 && errno == EINTR) continue;
            return false;
        }
        off += static_cast<size_t>(n);
    }
    return true;
}

void put_u32le(uint8_t* p, uint32_t v) {
    p[0] = v & 0xFF; p[1] = (v >> 8) & 0xFF;
    p[2] = (v >> 16) & 0xFF; p[3] = (v >> 24) & 0xFF;
}

uint32_t get_u32le(const uint8_t* p) {
    return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
           (static_cast<uint32_t>(p[2]) << 16) |
           (static_cast<uint32_t>(p[3]) << 24);
}

struct WalHandle {
    int fd;
};

struct MmfHandle {
    int fd;
    uint32_t dim;
    uint32_t count;
};

constexpr size_t kMmfHeader = 8;  // [dim:u32 LE][count:u32 LE]

}  // namespace

extern "C" {

// ---------------------------------------------------------------- crc32 ---

uint32_t vdb_crc32(const uint8_t* buf, uint64_t len) {
    return crc32_impl(buf, static_cast<size_t>(len));
}

// ------------------------------------------------------------------ WAL ---

void* vdb_wal_open(const char* path) {
    int fd = ::open(path, O_WRONLY | O_CREAT | O_APPEND, 0644);
    if (fd < 0) return nullptr;
    WalHandle* h = new WalHandle{fd};
    return h;
}

// Append one frame ([len][crc32][payload]) and fsync. Returns 0 on success.
int vdb_wal_append(void* handle, const uint8_t* payload, uint32_t len) {
    WalHandle* h = static_cast<WalHandle*>(handle);
    if (!h) return -1;
    uint8_t header[8];
    put_u32le(header, len);
    put_u32le(header + 4, crc32_impl(payload, len));
    if (!write_all(h->fd, header, 8)) return -1;
    if (!write_all(h->fd, payload, len)) return -1;
    if (::fsync(h->fd) != 0) return -1;
    return 0;
}

// Append pre-framed bytes (a batch of [len][crc][payload] frames built by
// the caller) with a single fsync — the group-commit fast path.
int vdb_wal_append_raw(void* handle, const uint8_t* data, uint64_t len) {
    WalHandle* h = static_cast<WalHandle*>(handle);
    if (!h) return -1;
    if (!write_all(h->fd, data, static_cast<size_t>(len))) return -1;
    return ::fsync(h->fd) == 0 ? 0 : -1;
}

int vdb_wal_sync(void* handle) {
    WalHandle* h = static_cast<WalHandle*>(handle);
    if (!h) return -1;
    return ::fsync(h->fd) == 0 ? 0 : -1;
}

// Truncate the log (post-checkpoint); keeps the handle appendable.
int vdb_wal_truncate(void* handle) {
    WalHandle* h = static_cast<WalHandle*>(handle);
    if (!h) return -1;
    if (::ftruncate(h->fd, 0) != 0) return -1;
    return ::fsync(h->fd) == 0 ? 0 : -1;
}

void vdb_wal_close(void* handle) {
    WalHandle* h = static_cast<WalHandle*>(handle);
    if (!h) return;
    ::close(h->fd);
    delete h;
}

// Scan the log, validating frame structure and CRCs. Writes the number of
// valid frames to *n_frames and returns the byte length of the valid prefix
// (replay must stop at the first corrupt/truncated frame, like reference
// wal.rs:66-110). Returns -1 if the file cannot be opened.
int64_t vdb_wal_scan(const char* path, int64_t* n_frames) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) { if (n_frames) *n_frames = 0; return -1; }
    int64_t valid_end = 0;
    int64_t frames = 0;
    uint8_t header[8];
    // Bound payload reads by the actual file size so a corrupt length field
    // can't trigger a huge allocation.
    struct stat st;
    if (::fstat(fd, &st) != 0) { ::close(fd); if (n_frames) *n_frames = 0; return -1; }
    const int64_t fsize = static_cast<int64_t>(st.st_size);
    uint8_t* payload = nullptr;
    size_t payload_cap = 0;
    while (true) {
        if (!read_exact(fd, header, 8)) break;
        uint32_t len = get_u32le(header);
        uint32_t expect_crc = get_u32le(header + 4);
        if (valid_end + 8 + static_cast<int64_t>(len) > fsize) break;
        if (len > payload_cap) {
            delete[] payload;
            payload = new uint8_t[len];
            payload_cap = len;
        }
        if (len > 0 && !read_exact(fd, payload, len)) break;
        if (crc32_impl(payload, len) != expect_crc) break;
        valid_end += 8 + static_cast<int64_t>(len);
        frames += 1;
    }
    delete[] payload;
    ::close(fd);
    if (n_frames) *n_frames = frames;
    return valid_end;
}

// ------------------------------------------------- durable atomic write ---

// Write buf to <path>.tmp, fsync, rename over <path>, fsync the directory.
// Crash-safe snapshot replacement. Returns 0 on success.
int vdb_durable_write(const char* path, const uint8_t* buf, uint64_t len) {
    char tmp[4096];
    if (std::snprintf(tmp, sizeof(tmp), "%s.tmp", path) >=
        static_cast<int>(sizeof(tmp)))
        return -1;
    int fd = ::open(tmp, O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) return -1;
    bool ok = write_all(fd, buf, static_cast<size_t>(len)) && ::fsync(fd) == 0;
    ::close(fd);
    if (!ok) { ::unlink(tmp); return -1; }
    if (::rename(tmp, path) != 0) { ::unlink(tmp); return -1; }
    // fsync the containing directory so the rename itself is durable
    char dirbuf[4096];
    std::strncpy(dirbuf, path, sizeof(dirbuf) - 1);
    dirbuf[sizeof(dirbuf) - 1] = '\0';
    char* slash = std::strrchr(dirbuf, '/');
    const char* dirpath = ".";
    if (slash) { *slash = '\0'; dirpath = dirbuf[0] ? dirbuf : "/"; }
    int dfd = ::open(dirpath, O_RDONLY | O_DIRECTORY);
    if (dfd >= 0) { ::fsync(dfd); ::close(dfd); }
    return 0;
}

// ------------------------------------------------ mmap vector file ------ --

// File layout (reference src/persistence/mmap.rs:13-15):
//   [dim: u32 LE][count: u32 LE] then count rows of dim LE f32s.

void* vdb_mmf_create(const char* path, uint32_t dim) {
    int fd = ::open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) return nullptr;
    uint8_t header[kMmfHeader];
    put_u32le(header, dim);
    put_u32le(header + 4, 0);
    if (!write_all(fd, header, kMmfHeader) || ::fsync(fd) != 0) {
        ::close(fd);
        return nullptr;
    }
    return new MmfHandle{fd, dim, 0};
}

void* vdb_mmf_open(const char* path) {
    int fd = ::open(path, O_RDWR);
    if (fd < 0) return nullptr;
    uint8_t header[kMmfHeader];
    if (!read_exact(fd, header, kMmfHeader)) { ::close(fd); return nullptr; }
    return new MmfHandle{fd, get_u32le(header), get_u32le(header + 4)};
}

uint32_t vdb_mmf_dim(void* handle) {
    return handle ? static_cast<MmfHandle*>(handle)->dim : 0;
}

uint32_t vdb_mmf_count(void* handle) {
    return handle ? static_cast<MmfHandle*>(handle)->count : 0;
}

// Append one row; writes data then the updated header, then fsync
// (reference mmap.rs:66-95). Returns new count or -1.
int64_t vdb_mmf_append(void* handle, const float* row) {
    MmfHandle* h = static_cast<MmfHandle*>(handle);
    if (!h) return -1;
    const int64_t offset = static_cast<int64_t>(kMmfHeader) +
        static_cast<int64_t>(h->count) * h->dim * 4;
    if (::lseek(h->fd, offset, SEEK_SET) < 0) return -1;
    if (!write_all(h->fd, reinterpret_cast<const uint8_t*>(row),
                   static_cast<size_t>(h->dim) * 4))
        return -1;
    uint8_t cnt[4];
    put_u32le(cnt, h->count + 1);
    if (::lseek(h->fd, 4, SEEK_SET) < 0) return -1;
    if (!write_all(h->fd, cnt, 4)) return -1;
    if (::fsync(h->fd) != 0) return -1;
    h->count += 1;
    return h->count;
}

// Random-access read of one row via pread (reference mmap.rs:98-120).
int vdb_mmf_get(void* handle, uint32_t index, float* out) {
    MmfHandle* h = static_cast<MmfHandle*>(handle);
    if (!h || index >= h->count) return -1;
    const int64_t offset = static_cast<int64_t>(kMmfHeader) +
        static_cast<int64_t>(index) * h->dim * 4;
    size_t want = static_cast<size_t>(h->dim) * 4;
    ssize_t n = ::pread(h->fd, out, want, offset);
    return (n == static_cast<ssize_t>(want)) ? 0 : -1;
}

// Bulk zero-copy-ish read through mmap: rows [start, start+count) into out.
// The mmap path is the fast bulk-hydration route (reference mmap.rs:124-149);
// falls back to pread if mmap fails.
int vdb_mmf_read_range(void* handle, uint32_t start, uint32_t count,
                       float* out) {
    MmfHandle* h = static_cast<MmfHandle*>(handle);
    if (!h || start + count > h->count) return -1;
    const size_t row_bytes = static_cast<size_t>(h->dim) * 4;
    const size_t total = kMmfHeader + static_cast<size_t>(h->count) * row_bytes;
    void* mapped = ::mmap(nullptr, total, PROT_READ, MAP_SHARED, h->fd, 0);
    if (mapped != MAP_FAILED) {
        const uint8_t* base = static_cast<const uint8_t*>(mapped) + kMmfHeader +
            static_cast<size_t>(start) * row_bytes;
        std::memcpy(out, base, static_cast<size_t>(count) * row_bytes);
        ::munmap(mapped, total);
        return 0;
    }
    // graceful fallback to pread, mirroring the reference's get() fallback
    for (uint32_t i = 0; i < count; i++) {
        if (vdb_mmf_get(handle, start + i, out + static_cast<size_t>(i) * h->dim) != 0)
            return -1;
    }
    return 0;
}

void vdb_mmf_close(void* handle) {
    MmfHandle* h = static_cast<MmfHandle*>(handle);
    if (!h) return;
    ::close(h->fd);
    delete h;
}

}  // extern "C"
