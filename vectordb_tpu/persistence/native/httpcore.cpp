// Native HTTP/1.1 front-end for the vectordb_tpu server.
//
// The reference serves with a native (Rust axum/tokio) stack
// (src/server/mod.rs:19-51); the TPU build's Python stdlib server tops out
// a few hundred req/s on this single-core host. This C++ front-end owns
// the sockets: an epoll event loop accepts connections, parses HTTP/1.1
// with keep-alive, and hands complete requests to Python through a drained
// job queue — so concurrent /search requests arrive at the Python worker
// as one batch and become ONE fused device call (the drain IS the dynamic
// batcher; no artificial time window). Responses flow back through
// vdb_http_respond, which frames JSON bodies and schedules writes via an
// eventfd wakeup.
//
// Exposed through ctypes (see server/native_http.py). Job wire format, all
// little-endian:
//   [conn_id u64][method u8][path_len u16][path][body_len u32][body]
// method: 0=GET 1=POST 2=DELETE 3=PUT 4=other 5=pre-parsed POST /search
//
// Method 5 is the hot-path optimization: simple {"vector":[...], "k":n}
// search bodies are parsed here in C++ (the Python worker shares this
// single core with everything else; json.loads alone costs ~150 us per
// 768-d request) and delivered as packed [k i32][n u32][f32*n]. Anything
// unexpected — a filter, an extra key, a syntax oddity — falls back to
// the raw body so the Python router keeps full semantics.

#include <arpa/inet.h>
#include <atomic>
#include <clocale>
#include <cstdlib>
#include <locale.h>
#include <chrono>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>
#include <charconv>

namespace {

constexpr size_t kMaxHeader = 64 * 1024;
constexpr size_t kMaxBody = 48u * 1024 * 1024;

struct Conn {
    int fd = -1;
    uint64_t id = 0;
    std::string in;       // accumulated request bytes
    std::string out;      // pending response bytes
    size_t out_off = 0;
    bool want_close = false;
    bool processing = false;  // request handed to Python, EPOLLIN parked
};

struct Job {
    uint64_t conn_id;
    uint8_t method;
    std::string path;
    std::string body;
};

struct Resp {
    uint64_t conn_id;
    int status;
    std::string body;
};

// Locale-independent strtof: a host process may setlocale() to a comma-
// decimal LC_NUMERIC, under which plain strtof("0.75") stops at the dot
// and returns 0 — wrong results with status 200. Parse under a pinned
// "C" locale instead.
float strtof_c(const char* s, char** endp) {
    static locale_t c_loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
    if (c_loc != (locale_t)0) return strtof_l(s, endp, c_loc);
    return strtof(s, endp);  // newlocale failed: degraded but functional
}

// Strict JSON-number span: '-'? int ('.' digits)? ([eE][+-]? digits)?.
// Returns the end of the token, or nullptr if it isn't a JSON number
// (rejects the hex/inf/nan spellings strtof would otherwise accept).
const char* json_number_end(const char* p, const char* end) {
    if (p < end && *p == '-') p++;
    if (p >= end || *p < '0' || *p > '9') return nullptr;
    if (*p == '0') { p++; }
    else { while (p < end && *p >= '0' && *p <= '9') p++; }
    if (p < end && *p == '.') {
        p++;
        if (p >= end || *p < '0' || *p > '9') return nullptr;
        while (p < end && *p >= '0' && *p <= '9') p++;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        p++;
        if (p < end && (*p == '+' || *p == '-')) p++;
        if (p >= end || *p < '0' || *p > '9') return nullptr;
        while (p < end && *p >= '0' && *p <= '9') p++;
    }
    return p;
}

// Shared scanner state for the fast JSON parsers below.
struct Scan {
    const char* p;
    const char* end;
    void ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r')) p++;
    }
};

// One {"vector":[numbers...]} object with optional "k":int and
// "filter":null, keys in any order; advances s past the closing '}'.
// Any other shape -> false.
bool parse_query_object(Scan& s, std::vector<float>& out, int32_t& k) {
    s.ws();
    if (s.p >= s.end || *s.p != '{') return false;
    s.p++;
    k = 10;
    size_t start_count = out.size();
    bool have_vector = false;
    for (;;) {
        s.ws();
        if (s.p < s.end && *s.p == '}') { s.p++; break; }
        if (s.p >= s.end || *s.p != '"') return false;
        const char* ks = ++s.p;
        while (s.p < s.end && *s.p != '"') {
            if (*s.p == '\\') return false;
            s.p++;
        }
        if (s.p >= s.end) return false;
        size_t klen = (size_t)(s.p - ks);
        s.p++;
        s.ws();
        if (s.p >= s.end || *s.p != ':') return false;
        s.p++;
        s.ws();
        if (klen == 6 && memcmp(ks, "vector", 6) == 0) {
            if (have_vector || s.p >= s.end || *s.p != '[') return false;
            s.p++;
            for (;;) {
                s.ws();
                if (s.p < s.end && *s.p == ']') { s.p++; break; }
                const char* tok_end = json_number_end(s.p, s.end);
                if (!tok_end) return false;
                char buf[64];
                size_t tl = (size_t)(tok_end - s.p);
                if (tl >= sizeof buf) return false;
                memcpy(buf, s.p, tl);
                buf[tl] = 0;
                char* fend = nullptr;
                float v = strtof_c(buf, &fend);
                // a short parse means the locale or grammar disagreed
                // with json_number_end — bail to the Python path
                if (fend != buf + tl) return false;
                out.push_back(v);
                s.p = tok_end;
                s.ws();
                if (s.p < s.end && *s.p == ',') { s.p++; continue; }
                if (s.p < s.end && *s.p == ']') { s.p++; break; }
                return false;
            }
            have_vector = true;
        } else if (klen == 1 && *ks == 'k') {
            const char* tok_end = json_number_end(s.p, s.end);
            if (!tok_end) return false;
            char* q = nullptr;
            long kv = strtol(s.p, &q, 10);
            if (q != tok_end || kv < 0 || kv > 1000000000L) return false;
            k = (int32_t)kv;
            s.p = tok_end;
        } else if (klen == 6 && memcmp(ks, "filter", 6) == 0) {
            if (s.end - s.p >= 4 && memcmp(s.p, "null", 4) == 0) s.p += 4;
            else return false;
        } else {
            return false;
        }
        s.ws();
        if (s.p < s.end && *s.p == ',') { s.p++; continue; }
        if (s.p < s.end && *s.p == '}') { s.p++; break; }
        return false;
    }
    return have_vector && out.size() > start_count;
}

// Parse exactly one {"vector":[...], "k"?, "filter":null?} body.
bool parse_search_fast(const std::string& b, std::vector<float>& out,
                       int32_t& k) {
    Scan s{b.data(), b.data() + b.size()};
    if (!parse_query_object(s, out, k)) return false;
    s.ws();
    return s.p == s.end;
}

// Parse {"queries":[obj, obj, ...]} with optional "filter":null; each obj
// as in parse_query_object. Outputs per-query (k, float count) plus one
// flat float buffer. Any surprise -> false (Python path).
bool parse_batch_search_fast(const std::string& b, std::vector<float>& out,
                             std::vector<int32_t>& ks,
                             std::vector<uint32_t>& lens) {
    Scan s{b.data(), b.data() + b.size()};
    s.ws();
    if (s.p >= s.end || *s.p != '{') return false;
    s.p++;
    bool have_queries = false;
    for (;;) {
        s.ws();
        if (s.p < s.end && *s.p == '}') { s.p++; break; }
        if (s.p >= s.end || *s.p != '"') return false;
        const char* ks_ = ++s.p;
        while (s.p < s.end && *s.p != '"') {
            if (*s.p == '\\') return false;
            s.p++;
        }
        if (s.p >= s.end) return false;
        size_t klen = (size_t)(s.p - ks_);
        s.p++;
        s.ws();
        if (s.p >= s.end || *s.p != ':') return false;
        s.p++;
        s.ws();
        if (klen == 7 && memcmp(ks_, "queries", 7) == 0) {
            if (have_queries || s.p >= s.end || *s.p != '[') return false;
            s.p++;
            for (;;) {
                s.ws();
                if (s.p < s.end && *s.p == ']') { s.p++; break; }
                size_t before = out.size();
                int32_t k = 10;
                if (!parse_query_object(s, out, k)) return false;
                ks.push_back(k);
                lens.push_back((uint32_t)(out.size() - before));
                s.ws();
                if (s.p < s.end && *s.p == ',') { s.p++; continue; }
                if (s.p < s.end && *s.p == ']') { s.p++; break; }
                return false;
            }
            have_queries = true;
        } else if (klen == 6 && memcmp(ks_, "filter", 6) == 0) {
            if (s.end - s.p >= 4 && memcmp(s.p, "null", 4) == 0) s.p += 4;
            else return false;
        } else {
            return false;
        }
        s.ws();
        if (s.p < s.end && *s.p == ',') { s.p++; continue; }
        if (s.p < s.end && *s.p == '}') { s.p++; break; }
        return false;
    }
    s.ws();
    if (s.p != s.end) return false;
    return have_queries && !ks.empty();
}

const char* reason_of(int status) {
    switch (status) {
        case 200: return "OK";
        case 201: return "Created";
        case 400: return "Bad Request";
        case 404: return "Not Found";
        case 411: return "Length Required";
        case 413: return "Payload Too Large";
        case 500: return "Internal Server Error";
        default: return "OK";
    }
}

struct Server {
    int listen_fd = -1;
    int epoll_fd = -1;
    int wake_fd = -1;
    int port = 0;
    std::thread loop_thread;
    std::atomic<bool> running{false};

    std::mutex jobs_mu;
    std::condition_variable jobs_cv;
    std::deque<Job> jobs;

    std::mutex resp_mu;
    std::deque<Resp> resps;

    uint64_t next_conn_id = 1;
    std::unordered_map<uint64_t, Conn*> conns;
    std::unordered_map<int, uint64_t> fd_to_id;

    void close_conn(Conn* c) {
        epoll_ctl(epoll_fd, EPOLL_CTL_DEL, c->fd, nullptr);
        close(c->fd);
        fd_to_id.erase(c->fd);
        conns.erase(c->id);
        delete c;
    }

    void arm(Conn* c, uint32_t events) {
        epoll_event ev{};
        ev.events = events;
        ev.data.u64 = c->id;
        epoll_ctl(epoll_fd, EPOLL_CTL_MOD, c->fd, &ev);
    }

    // try to parse one complete request from c->in; returns true if a job
    // was queued (conn moves to processing state)
    bool try_parse(Conn* c) {
        size_t hdr_end = c->in.find("\r\n\r\n");
        if (hdr_end == std::string::npos) {
            if (c->in.size() > kMaxHeader) { c->want_close = true; }
            return false;
        }
        size_t line_end = c->in.find("\r\n");
        std::string line = c->in.substr(0, line_end);
        size_t sp1 = line.find(' ');
        size_t sp2 = line.rfind(' ');
        if (sp1 == std::string::npos || sp2 == sp1) {
            send_simple(c, 400, "{\"error\": \"malformed request\"}");
            c->want_close = true;
            return false;
        }
        std::string method = line.substr(0, sp1);
        std::string path = line.substr(sp1 + 1, sp2 - sp1 - 1);
        // headers we care about: content-length, connection
        size_t body_len = 0;
        bool close_conn_hdr = false;
        size_t pos = line_end + 2;
        while (pos < hdr_end) {
            size_t eol = c->in.find("\r\n", pos);
            std::string h = c->in.substr(pos, eol - pos);
            pos = eol + 2;
            size_t colon = h.find(':');
            if (colon == std::string::npos) continue;
            std::string name = h.substr(0, colon);
            for (auto& ch : name) ch = (char)tolower((unsigned char)ch);
            size_t vstart = h.find_first_not_of(" \t", colon + 1);
            std::string val = vstart == std::string::npos ? ""
                                                          : h.substr(vstart);
            if (name == "content-length") {
                body_len = (size_t)strtoull(val.c_str(), nullptr, 10);
            } else if (name == "connection") {
                for (auto& ch : val) ch = (char)tolower((unsigned char)ch);
                if (val.find("close") != std::string::npos)
                    close_conn_hdr = true;
            }
        }
        if (body_len > kMaxBody) {
            send_simple(c, 413, "{\"error\": \"body too large\"}");
            c->want_close = true;
            return false;
        }
        size_t total = hdr_end + 4 + body_len;
        if (c->in.size() < total) return false;  // need more bytes

        Job job;
        job.conn_id = c->id;
        job.method = method == "GET" ? 0 : method == "POST" ? 1
                   : method == "DELETE" ? 2 : method == "PUT" ? 3 : 4;
        job.path = std::move(path);
        job.body = c->in.substr(hdr_end + 4, body_len);
        if (job.method == 1) {
            // strip query string + trailing slash for the hot-path match
            std::string route = job.path.substr(0, job.path.find('?'));
            while (route.size() > 1 && route.back() == '/')
                route.pop_back();
            if (route == "/search") {
                std::vector<float> floats;
                int32_t kval = 10;
                if (parse_search_fast(job.body, floats, kval)) {
                    std::string packed;
                    packed.resize(8 + floats.size() * 4);
                    uint32_t n = (uint32_t)floats.size();
                    memcpy(&packed[0], &kval, 4);
                    memcpy(&packed[4], &n, 4);
                    memcpy(&packed[8], floats.data(), floats.size() * 4);
                    job.method = 5;
                    job.body = std::move(packed);
                }
            } else if (route == "/search/batch") {
                std::vector<float> floats;
                std::vector<int32_t> ks;
                std::vector<uint32_t> lens;
                if (parse_batch_search_fast(job.body, floats, ks, lens)) {
                    // [nq u32] then nq x [k i32][n u32], then the floats
                    std::string packed;
                    packed.resize(4 + ks.size() * 8 + floats.size() * 4);
                    uint32_t nq = (uint32_t)ks.size();
                    size_t off = 0;
                    memcpy(&packed[off], &nq, 4); off += 4;
                    for (size_t i = 0; i < ks.size(); i++) {
                        memcpy(&packed[off], &ks[i], 4); off += 4;
                        memcpy(&packed[off], &lens[i], 4); off += 4;
                    }
                    memcpy(&packed[off], floats.data(), floats.size() * 4);
                    job.method = 6;
                    job.body = std::move(packed);
                }
            }
        }
        c->in.erase(0, total);
        c->want_close = c->want_close || close_conn_hdr;
        c->processing = true;  // park reads until the response is sent
        {
            std::lock_guard<std::mutex> g(jobs_mu);
            jobs.push_back(std::move(job));
        }
        jobs_cv.notify_one();
        return true;
    }

    void send_simple(Conn* c, int status, const std::string& body) {
        append_response(c, status, body);
        flush_out(c);
    }

    void append_response(Conn* c, int status, const std::string& body) {
        char head[256];
        int n = snprintf(head, sizeof head,
                         "HTTP/1.1 %d %s\r\n"
                         "Content-Type: application/json\r\n"
                         "Content-Length: %zu\r\n"
                         "Connection: %s\r\n\r\n",
                         status, reason_of(status), body.size(),
                         c->want_close ? "close" : "keep-alive");
        c->out.append(head, (size_t)n);
        c->out.append(body);
    }

    // write as much of c->out as the socket accepts; manage epoll interest
    void flush_out(Conn* c) {
        while (c->out_off < c->out.size()) {
            ssize_t n = ::send(c->fd, c->out.data() + c->out_off,
                               c->out.size() - c->out_off, MSG_NOSIGNAL);
            if (n > 0) {
                c->out_off += (size_t)n;
            } else if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
                arm(c, EPOLLOUT);
                return;
            } else {
                close_conn(c);
                return;
            }
        }
        c->out.clear();
        c->out_off = 0;
        if (c->want_close) {
            close_conn(c);
            return;
        }
        c->processing = false;
        // a pipelined request may already be buffered
        if (try_parse(c)) return;
        arm(c, EPOLLIN);
    }

    void on_readable(Conn* c) {
        char buf[64 * 1024];
        for (;;) {
            ssize_t n = ::recv(c->fd, buf, sizeof buf, 0);
            if (n > 0) {
                c->in.append(buf, (size_t)n);
                if ((size_t)n < sizeof buf) break;
            } else if (n == 0) {
                close_conn(c);
                return;
            } else if (errno == EAGAIN || errno == EWOULDBLOCK) {
                break;
            } else {
                close_conn(c);
                return;
            }
        }
        if (!c->processing) try_parse(c);
        if (c->want_close && !c->processing && c->out.empty())
            close_conn(c);
    }

    void drain_responses() {
        std::deque<Resp> batch;
        {
            std::lock_guard<std::mutex> g(resp_mu);
            batch.swap(resps);
        }
        for (auto& r : batch) {
            auto it = conns.find(r.conn_id);
            if (it == conns.end()) continue;  // client went away
            Conn* c = it->second;
            append_response(c, r.status, r.body);
            flush_out(c);
        }
    }

    void loop() {
        epoll_event evs[256];
        while (running.load(std::memory_order_relaxed)) {
            int n = epoll_wait(epoll_fd, evs, 256, 500);
            if (n < 0) {
                if (errno == EINTR) continue;
                break;
            }
            for (int i = 0; i < n; i++) {
                uint64_t tag = evs[i].data.u64;
                if (tag == 0) {  // listen fd
                    for (;;) {
                        int fd = accept4(listen_fd, nullptr, nullptr,
                                         SOCK_NONBLOCK);
                        if (fd < 0) break;
                        int one = 1;
                        setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one,
                                   sizeof one);
                        Conn* c = new Conn();
                        c->fd = fd;
                        c->id = next_conn_id++;
                        conns[c->id] = c;
                        fd_to_id[fd] = c->id;
                        epoll_event ev{};
                        ev.events = EPOLLIN;
                        ev.data.u64 = c->id;
                        epoll_ctl(epoll_fd, EPOLL_CTL_ADD, fd, &ev);
                    }
                } else if (tag == UINT64_MAX) {  // eventfd wakeup
                    uint64_t v;
                    while (read(wake_fd, &v, 8) == 8) {}
                    drain_responses();
                } else {
                    auto it = conns.find(tag);
                    if (it == conns.end()) continue;
                    Conn* c = it->second;
                    if (evs[i].events & (EPOLLHUP | EPOLLERR)) {
                        close_conn(c);
                    } else if (evs[i].events & EPOLLOUT) {
                        flush_out(c);
                    } else if (evs[i].events & EPOLLIN) {
                        on_readable(c);
                    }
                }
            }
        }
        // shutdown: close everything
        for (auto& kv : conns) {
            close(kv.second->fd);
            delete kv.second;
        }
        conns.clear();
    }
};

}  // namespace

extern "C" {

void* vdb_http_start(const char* host, int port) {
    Server* s = new Server();
    s->listen_fd = socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK, 0);
    if (s->listen_fd < 0) { delete s; return nullptr; }
    int one = 1;
    setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    if (!host || !*host || strcmp(host, "0.0.0.0") == 0) {
        addr.sin_addr.s_addr = INADDR_ANY;
    } else if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
        close(s->listen_fd); delete s; return nullptr;
    }
    if (bind(s->listen_fd, (sockaddr*)&addr, sizeof addr) != 0 ||
        listen(s->listen_fd, 512) != 0) {
        close(s->listen_fd); delete s; return nullptr;
    }
    socklen_t alen = sizeof addr;
    getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
    s->port = ntohs(addr.sin_port);

    s->epoll_fd = epoll_create1(0);
    s->wake_fd = eventfd(0, EFD_NONBLOCK);
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.u64 = 0;  // listen tag
    epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->listen_fd, &ev);
    ev.events = EPOLLIN;
    ev.data.u64 = UINT64_MAX;  // wake tag
    epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->wake_fd, &ev);

    s->running.store(true);
    s->loop_thread = std::thread([s] { s->loop(); });
    return s;
}

int vdb_http_port(void* h) {
    return h ? ((Server*)h)->port : -1;
}

void vdb_http_stop(void* h) {
    if (!h) return;
    Server* s = (Server*)h;
    s->running.store(false);
    uint64_t one = 1;
    (void)!write(s->wake_fd, &one, 8);
    s->jobs_cv.notify_all();
    if (s->loop_thread.joinable()) s->loop_thread.join();
    close(s->listen_fd);
    close(s->epoll_fd);
    close(s->wake_fd);
    delete s;
}

// Drain all pending jobs (blocking up to timeout_ms for the first one) into
// buf. Returns bytes written; 0 on timeout; -1 when the server is stopped.
int64_t vdb_http_next_jobs(void* h, uint8_t* buf, int64_t cap,
                           int timeout_ms) {
    Server* s = (Server*)h;
    std::unique_lock<std::mutex> lk(s->jobs_mu);
    if (s->jobs.empty()) {
        s->jobs_cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                            [s] { return !s->jobs.empty() ||
                                         !s->running.load(); });
    }
    if (s->jobs.empty())
        return s->running.load() ? 0 : -1;
    int64_t off = 0;
    while (!s->jobs.empty()) {
        Job& j = s->jobs.front();
        int64_t need = 8 + 1 + 2 + (int64_t)j.path.size() + 4
                       + (int64_t)j.body.size();
        if (off + need > cap) break;  // caller's buffer is full; redeliver
        memcpy(buf + off, &j.conn_id, 8); off += 8;
        buf[off++] = j.method;
        uint16_t plen = (uint16_t)j.path.size();
        memcpy(buf + off, &plen, 2); off += 2;
        memcpy(buf + off, j.path.data(), plen); off += plen;
        uint32_t blen = (uint32_t)j.body.size();
        memcpy(buf + off, &blen, 4); off += 4;
        memcpy(buf + off, j.body.data(), blen); off += blen;
        s->jobs.pop_front();
    }
    return off;
}

// C++-side search-response formatting (round-2: the Python loop built
// n dicts + json.dumps per response; here the worker ships packed ids +
// distances and the body is assembled in C++). Output matches Python's
// json.dumps textually: ", "/": " separators and shortest-round-trip
// doubles via std::to_chars.
static void json_escape_append(std::string& out, const char* p, size_t n) {
    for (size_t i = 0; i < n; i++) {
        unsigned char c = (unsigned char)p[i];
        switch (c) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\b': out += "\\b"; break;
            case '\f': out += "\\f"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            default:
                if (c < 0x20) {
                    char tmp[8];
                    snprintf(tmp, sizeof tmp, "\\u%04x", c);
                    out += tmp;
                } else if (c < 0x80) {
                    out += (char)c;
                } else {
                    // non-ASCII: \u-escape like json.dumps(ensure_ascii)
                    // so responses are byte-identical to the Python
                    // fallback router. Decode the UTF-8 sequence; emit a
                    // surrogate pair above the BMP; pass malformed bytes
                    // through raw (the Python path would have rejected
                    // such an id at insert time).
                    uint32_t cp = 0; size_t len = 0;
                    if ((c & 0xE0) == 0xC0) { cp = c & 0x1F; len = 1; }
                    else if ((c & 0xF0) == 0xE0) { cp = c & 0x0F; len = 2; }
                    else if ((c & 0xF8) == 0xF0) { cp = c & 0x07; len = 3; }
                    if (len == 0 || i + len >= n) {
                        out += (char)c;
                        continue;
                    }
                    bool ok = true;
                    for (size_t j = 1; j <= len; j++) {
                        unsigned char cc = (unsigned char)p[i + j];
                        if ((cc & 0xC0) != 0x80) { ok = false; break; }
                        cp = (cp << 6) | (cc & 0x3F);
                    }
                    if (!ok) { out += (char)c; continue; }
                    char tmp[16];
                    if (cp >= 0x10000) {
                        uint32_t v = cp - 0x10000;
                        snprintf(tmp, sizeof tmp, "\\u%04x\\u%04x",
                                 0xD800 + (v >> 10), 0xDC00 + (v & 0x3FF));
                    } else {
                        snprintf(tmp, sizeof tmp, "\\u%04x", cp);
                    }
                    out += tmp;
                    i += len;
                }
        }
    }
}

static void append_double(std::string& out, double v) {
    char buf[32];
    auto res = std::to_chars(buf, buf + sizeof buf, v);
    size_t len = (size_t)(res.ptr - buf);
    out.append(buf, len);
    // json.dumps renders integral floats with a trailing ".0"
    // (repr(2.0) == "2.0"); to_chars emits "2" — restore the suffix so
    // responses stay byte-identical to the Python router
    for (size_t i = 0; i < len; i++)
        if (buf[i] == '.' || buf[i] == 'e' || buf[i] == 'n') return;
    out += ".0";
}

static void append_search_results(std::string& body, const char*& p,
                                  const uint32_t* id_lens,
                                  const double* dists, int32_t lo,
                                  int32_t hi) {
    body += '[';
    for (int32_t i = lo; i < hi; i++) {
        if (i > lo) body += ", ";
        body += "{\"id\": \"";
        json_escape_append(body, p, id_lens[i]);
        p += id_lens[i];
        body += "\", \"distance\": ";
        append_double(body, dists[i]);
        body += '}';
    }
    body += ']';
}

static int push_resp(Server* s, uint64_t conn_id, int status,
                     std::string&& body) {
    {
        std::lock_guard<std::mutex> g(s->resp_mu);
        s->resps.push_back(Resp{conn_id, status, std::move(body)});
    }
    uint64_t one = 1;
    (void)!write(s->wake_fd, &one, 8);
    return 0;
}

// /search response: [{"id": ..., "distance": ...}, ...]
int vdb_http_respond_search(void* h, uint64_t conn_id, int status,
                            const uint8_t* ids, const uint32_t* id_lens,
                            const double* dists, int32_t n) {
    Server* s = (Server*)h;
    std::string body;
    body.reserve((size_t)n * 48 + 2);
    const char* p = (const char*)ids;
    append_search_results(body, p, id_lens, dists, 0, n);
    return push_resp(s, conn_id, status, std::move(body));
}

// /search/batch response: [[...], [...], ...] with group_sizes[i] hits in
// group i (sum(group_sizes) == total entries in ids/id_lens/dists).
int vdb_http_respond_search_batch(void* h, uint64_t conn_id, int status,
                                  const uint8_t* ids,
                                  const uint32_t* id_lens,
                                  const double* dists,
                                  const int32_t* group_sizes,
                                  int32_t n_groups) {
    Server* s = (Server*)h;
    std::string body;
    int64_t total = 0;
    for (int32_t g = 0; g < n_groups; g++) total += group_sizes[g];
    body.reserve((size_t)total * 48 + (size_t)n_groups * 4 + 2);
    body += '[';
    const char* p = (const char*)ids;
    int32_t off = 0;
    for (int32_t g = 0; g < n_groups; g++) {
        if (g) body += ", ";
        append_search_results(body, p, id_lens, dists, off,
                              off + group_sizes[g]);
        off += group_sizes[g];
    }
    body += ']';
    return push_resp(s, conn_id, status, std::move(body));
}

int vdb_http_respond(void* h, uint64_t conn_id, int status,
                     const uint8_t* body, int64_t len) {
    Server* s = (Server*)h;
    {
        std::lock_guard<std::mutex> g(s->resp_mu);
        s->resps.push_back(Resp{conn_id, status,
                                std::string((const char*)body, (size_t)len)});
    }
    uint64_t one = 1;
    (void)!write(s->wake_fd, &one, 8);
    return 0;
}

}  // extern "C"
