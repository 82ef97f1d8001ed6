// npge_native — C++ host-runtime kernels for the TPU-native pangenome engine.
//
// The reference (NPGe) is an all-C++ program; its TPU-native successor keeps
// the *compute* path in JAX/XLA/Pallas and reimplements the host-side hot
// paths natively here (SURVEY.md §2.6): FASTA ingest + base encoding
// (Sequence readers ⚠[B]), 2-bit packed storage (CompactSequence ⚠[B]), and
// the occupancy/interval primitives backing Rest/OverlapsResolver ⚠[B].
//
// C ABI only (consumed via ctypes — no pybind11 in this image). All buffers
// are caller-allocated numpy arrays; functions return element counts or
// negative error codes.

#include <cstdint>
#include <cstring>

namespace {

// base codes: A=0 C=1 G=2 T=3 N=4 (matches npge_tpu.util.codes)
struct CodeTable {
    unsigned char t[256];
    CodeTable() {
        std::memset(t, 4, sizeof(t));
        t[(unsigned char)'A'] = 0; t[(unsigned char)'a'] = 0;
        t[(unsigned char)'C'] = 1; t[(unsigned char)'c'] = 1;
        t[(unsigned char)'G'] = 2; t[(unsigned char)'g'] = 2;
        t[(unsigned char)'T'] = 3; t[(unsigned char)'t'] = 3;
        t[(unsigned char)'-'] = 5;
    }
};
const CodeTable kCodes;

}  // namespace

extern "C" {

// Translate raw bytes to base codes. out must hold n bytes.
void npge_encode_bytes(const char* s, int64_t n, unsigned char* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = kCodes.t[(unsigned char)s[i]];
    }
}

// One-pass FASTA parser.
//   data/n:        raw file bytes
//   codes_out:     caller buffer (>= n bytes); sequence codes, concatenated
//   seq_offsets:   [max_seqs+1]; seq_offsets[i]..seq_offsets[i+1] in codes_out
//   hdr_starts/hdr_ends: [max_seqs]; byte ranges of each header's first word
// Returns number of sequences parsed, or -1 if max_seqs exceeded.
int64_t npge_fasta_encode(const char* data, int64_t n,
                          unsigned char* codes_out, int64_t* seq_offsets,
                          int64_t* hdr_starts, int64_t* hdr_ends,
                          int64_t max_seqs) {
    int64_t nseq = 0;
    int64_t w = 0;
    int64_t i = 0;
    bool in_seq = false;
    seq_offsets[0] = 0;
    while (i < n) {
        if (data[i] == '>') {
            if (nseq >= max_seqs) return -1;
            if (in_seq) seq_offsets[nseq] = w;
            ++i;
            int64_t hs = i;
            while (i < n && data[i] != '\n' && data[i] != ' ' &&
                   data[i] != '\t' && data[i] != '\r')
                ++i;
            hdr_starts[nseq] = hs;
            hdr_ends[nseq] = i;
            while (i < n && data[i] != '\n') ++i;  // rest of header line
            ++nseq;
            in_seq = true;
        } else {
            char c = data[i];
            if (c != '\n' && c != '\r' && c != ' ' && c != '\t') {
                codes_out[w++] = kCodes.t[(unsigned char)c];
            }
            ++i;
        }
        if (in_seq) seq_offsets[nseq] = w;
    }
    return nseq;
}

// 2-bit pack: 16 bases per uint32 (base i at bits 2*(i%16)), N positions
// packed as A with nmask bit set (nmask: 1 byte per base, could be bitset
// later). packed must hold ceil(n/16) words.
void npge_pack2(const unsigned char* codes, int64_t n, uint32_t* packed,
                unsigned char* nmask) {
    int64_t words = (n + 15) / 16;
    for (int64_t wi = 0; wi < words; ++wi) packed[wi] = 0;
    for (int64_t i = 0; i < n; ++i) {
        unsigned char c = codes[i];
        unsigned char b = c < 4 ? c : 0;
        nmask[i] = c >= 4 ? 1 : 0;
        packed[i / 16] |= (uint32_t)b << (2 * (i % 16));
    }
}

void npge_unpack2(const uint32_t* packed, const unsigned char* nmask,
                  int64_t n, unsigned char* out) {
    for (int64_t i = 0; i < n; ++i) {
        unsigned char b = (packed[i / 16] >> (2 * (i % 16))) & 3;
        out[i] = nmask[i] ? 4 : b;
    }
}

// Occupancy: set occ[start[k] .. start[k]+len[k]) for every interval.
void npge_mark_intervals(unsigned char* occ, int64_t occ_len,
                         const int32_t* start, const int32_t* len,
                         int64_t n_intervals) {
    for (int64_t k = 0; k < n_intervals; ++k) {
        int64_t a = start[k];
        int64_t b = a + len[k];
        if (a < 0) a = 0;
        if (b > occ_len) b = occ_len;
        for (int64_t i = a; i < b; ++i) occ[i] = 1;
    }
}

// Maximal zero-runs of occ -> (starts, ends). Returns count (<= max_runs)
// or -1 on overflow.
int64_t npge_uncovered_runs(const unsigned char* occ, int64_t n,
                            int32_t* starts, int32_t* ends,
                            int64_t max_runs) {
    int64_t cnt = 0;
    int64_t i = 0;
    while (i < n) {
        if (!occ[i]) {
            int64_t j = i;
            while (j < n && !occ[j]) ++j;
            if (cnt >= max_runs) return -1;
            starts[cnt] = (int32_t)i;
            ends[cnt] = (int32_t)j;
            ++cnt;
            i = j;
        } else {
            ++i;
        }
    }
    return cnt;
}

// Free-mask for one candidate block: free_cols[c] = 1 iff no present
// fragment occupies an occupied position at column c. Gapless fast path:
// fragments described by (seq_occ pointer chosen by caller per fragment).
// Here: one fragment at a time; caller ANDs across fragments.
//   ori=+1: position of column c = start + c
//   ori=-1: position of column c = start + len - 1 - c
void npge_free_mask_and(const unsigned char* occ, int64_t occ_len,
                        int32_t start, int32_t len, int32_t ori,
                        int64_t n_cols, unsigned char* free_cols) {
    if (ori == 1) {
        for (int64_t c = 0; c < n_cols; ++c) {
            int64_t p = start + c;
            if (p >= 0 && p < occ_len && occ[p]) free_cols[c] = 0;
        }
    } else {
        for (int64_t c = 0; c < n_cols; ++c) {
            int64_t p = (int64_t)start + len - 1 - c;
            if (p >= 0 && p < occ_len && occ[p]) free_cols[c] = 0;
        }
    }
}

}  // extern "C"
