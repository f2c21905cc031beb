// Native host-side graph tooling for kgat_tpu.
//
// TPU-native counterpart of DGL's C++ graph-index layer (SURVEY.md §2.2:
// `src/graph/unit_graph.cc` COO/CSR storage + format conversion — the
// reference stack's native components; locations reconstructed, the
// reference mount was empty). On TPU the *device* side of the graph is a
// pytree of arrays (kgat_tpu/graph.py) consumed by XLA/Pallas, so the
// native layer's job is the host side: parsing multi-GB dataset text files
// and building the sorted/CSR/aligned edge layouts fast. Everything here
// has a pure-numpy fallback with identical output (kgat_tpu/graph.py,
// kgat_tpu/data.py); this library is the production fast path.
//
// C ABI only (consumed via ctypes; pybind11 is not available in the build
// image). All buffers are caller-allocated numpy arrays.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Dataset parsing: "uid iid iid ..." lines -> (u, i) pairs.
// Pass 1: kgat_count_pairs returns the pair count (-1 on IO error).
// Pass 2: kgat_parse_pairs fills caller buffers, returns pairs written.
// ---------------------------------------------------------------------------

static bool read_file(const char* path, std::vector<char>& buf) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(sz) + 1);
    size_t rd = std::fread(buf.data(), 1, static_cast<size_t>(sz), f);
    std::fclose(f);
    if (rd != static_cast<size_t>(sz)) return false;
    buf[rd] = '\0';
    return true;
}

// Parses the file once; if out_u/out_i are null just counts.
static int64_t parse_pairs_impl(const char* path, int64_t* out_u,
                                int64_t* out_i, int64_t cap) {
    std::vector<char> buf;
    if (!read_file(path, buf)) return -1;
    const char* p = buf.data();
    const char* end = p + buf.size() - 1;
    int64_t n = 0;
    while (p < end) {
        // parse one line: first token = uid, rest = item ids
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        char* next = nullptr;
        long long uid = std::strtoll(p, &next, 10);
        if (next == p) { while (p < end && *p != '\n') ++p; continue; }
        p = next;
        bool first = true;
        while (p < end && *p != '\n') {
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
            if (p >= end || *p == '\n') break;
            long long item = std::strtoll(p, &next, 10);
            if (next == p) break;
            p = next;
            (void)first;
            if (out_u) {
                if (n >= cap) return -2;  // caller buffer too small
                out_u[n] = uid;
                out_i[n] = item;
            }
            ++n;
        }
    }
    return n;
}

int64_t kgat_count_pairs(const char* path) {
    return parse_pairs_impl(path, nullptr, nullptr, 0);
}

int64_t kgat_parse_pairs(const char* path, int64_t* out_u, int64_t* out_i,
                         int64_t cap) {
    return parse_pairs_impl(path, out_u, out_i, cap);
}

// ---------------------------------------------------------------------------
// Triple file parsing: "h r t" per line -> three columns.
// ---------------------------------------------------------------------------

int64_t kgat_parse_triples(const char* path, int64_t* out, int64_t cap3) {
    std::vector<char> buf;
    if (!read_file(path, buf)) return -1;
    const char* p = buf.data();
    const char* end = p + buf.size() - 1;
    int64_t n = 0;
    while (p < end) {
        char* next = nullptr;
        long long v[3];
        int got = 0;
        for (; got < 3; ++got) {
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\r'
                               || *p == '\n')) ++p;
            if (p >= end) break;
            v[got] = std::strtoll(p, &next, 10);
            if (next == p) { ++p; break; }
            p = next;
        }
        if (got == 3) {
            if (out) {
                if (n >= cap3) return -2;
                out[n * 3 + 0] = v[0];
                out[n * 3 + 1] = v[1];
                out[n * 3 + 2] = v[2];
            }
            ++n;
        }
    }
    return n;
}

int64_t kgat_count_triples(const char* path) {
    std::vector<char> buf;
    if (!read_file(path, buf)) return -1;
    // Upper bound: whitespace-separated token count / 3.
    int64_t tokens = 0;
    bool in_tok = false;
    for (char c : buf) {
        bool ws = (c == ' ' || c == '\t' || c == '\r' || c == '\n'
                   || c == '\0');
        if (!ws && !in_tok) { ++tokens; in_tok = true; }
        if (ws) in_tok = false;
    }
    return tokens / 3;
}

// ---------------------------------------------------------------------------
// Graph indexing: stable counting sort + CSR offsets (DGL coo2csr analog).
// ---------------------------------------------------------------------------

// Stable counting sort of edge ids by int32 key; writes the permutation.
void kgat_sort_perm(const int32_t* keys, int64_t n, int32_t n_keys,
                    int64_t* perm) {
    std::vector<int64_t> count(static_cast<size_t>(n_keys) + 1, 0);
    for (int64_t e = 0; e < n; ++e) count[keys[e] + 1]++;
    for (int32_t k = 0; k < n_keys; ++k) count[k + 1] += count[k];
    for (int64_t e = 0; e < n; ++e) perm[count[keys[e]]++] = e;
}

// CSR offsets over sorted keys: offsets[k] = first index with key >= k.
void kgat_csr_offsets(const int32_t* sorted_keys, int64_t n,
                      int32_t n_segments, int64_t* offsets) {
    int64_t pos = 0;
    for (int32_t k = 0; k <= n_segments; ++k) {
        while (pos < n && sorted_keys[pos] < k) ++pos;
        offsets[k] = pos;
    }
}

}  // extern "C"
