// Batch BLAKE3 for Merkle-leaf and node hashing, written from the public
// specification.  Hashes N equal-length messages; OpenMP-parallel across
// messages.  Only the plain (unkeyed) mode, which is all the protocol uses.

#include <cstdint>
#include <cstring>
#include <cstdlib>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr uint32_t IV[8] = {
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
};
constexpr int PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8};

constexpr uint32_t CHUNK_START = 1, CHUNK_END = 2, PARENT = 4, ROOT = 8;
constexpr size_t CHUNK_LEN = 1024, BLOCK_LEN = 64;

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

inline void g(uint32_t* s, int a, int b, int c, int d, uint32_t mx, uint32_t my) {
    s[a] = s[a] + s[b] + mx;
    s[d] = rotr(s[d] ^ s[a], 16);
    s[c] = s[c] + s[d];
    s[b] = rotr(s[b] ^ s[c], 12);
    s[a] = s[a] + s[b] + my;
    s[d] = rotr(s[d] ^ s[a], 8);
    s[c] = s[c] + s[d];
    s[b] = rotr(s[b] ^ s[c], 7);
}

void compress(const uint32_t cv[8], const uint32_t block[16], uint64_t counter,
              uint32_t block_len, uint32_t flags, uint32_t out[8]) {
    uint32_t s[16];
    memcpy(s, cv, 32);
    s[8] = IV[0]; s[9] = IV[1]; s[10] = IV[2]; s[11] = IV[3];
    s[12] = (uint32_t)counter;
    s[13] = (uint32_t)(counter >> 32);
    s[14] = block_len;
    s[15] = flags;
    uint32_t m[16];
    memcpy(m, block, 64);
    for (int r = 0; r < 7; r++) {
        g(s, 0, 4, 8, 12, m[0], m[1]);
        g(s, 1, 5, 9, 13, m[2], m[3]);
        g(s, 2, 6, 10, 14, m[4], m[5]);
        g(s, 3, 7, 11, 15, m[6], m[7]);
        g(s, 0, 5, 10, 15, m[8], m[9]);
        g(s, 1, 6, 11, 12, m[10], m[11]);
        g(s, 2, 7, 8, 13, m[12], m[13]);
        g(s, 3, 4, 9, 14, m[14], m[15]);
        if (r < 6) {
            uint32_t t[16];
            for (int i = 0; i < 16; i++) t[i] = m[PERM[i]];
            memcpy(m, t, 64);
        }
    }
    for (int i = 0; i < 8; i++) out[i] = s[i] ^ s[i + 8];
}

void chunk_cv(const uint8_t* chunk, size_t len, uint64_t chunk_index,
              bool is_root, uint32_t out[8]) {
    uint32_t cv[8];
    memcpy(cv, IV, 32);
    size_t nblocks = len == 0 ? 1 : (len + BLOCK_LEN - 1) / BLOCK_LEN;
    for (size_t i = 0; i < nblocks; i++) {
        uint8_t block[BLOCK_LEN] = {0};
        size_t blen = (i == nblocks - 1) ? len - i * BLOCK_LEN : BLOCK_LEN;
        memcpy(block, chunk + i * BLOCK_LEN, blen);
        uint32_t words[16];
        memcpy(words, block, 64);  // little-endian host
        uint32_t flags = 0;
        if (i == 0) flags |= CHUNK_START;
        if (i == nblocks - 1) {
            flags |= CHUNK_END;
            if (is_root) flags |= ROOT;
        }
        compress(cv, words, chunk_index, (uint32_t)blen, flags, cv);
    }
    memcpy(out, cv, 32);
}

void tree_cv(const uint8_t* data, size_t len, uint64_t first_chunk,
             size_t num_chunks, bool is_root, uint32_t out[8]) {
    if (num_chunks == 1) {
        chunk_cv(data, len, first_chunk, is_root, out);
        return;
    }
    size_t left_n = 1;
    while (left_n * 2 < num_chunks) left_n *= 2;
    uint32_t lr[16];
    tree_cv(data, left_n * CHUNK_LEN, first_chunk, left_n, false, lr);
    tree_cv(data + left_n * CHUNK_LEN, len - left_n * CHUNK_LEN,
            first_chunk + left_n, num_chunks - left_n, false, lr + 8);
    uint32_t flags = PARENT | (is_root ? ROOT : 0);
    compress(IV, lr, 0, BLOCK_LEN, flags, out);
}

void blake3_one(const uint8_t* data, size_t len, uint8_t out[32]) {
    size_t num_chunks = len == 0 ? 1 : (len + CHUNK_LEN - 1) / CHUNK_LEN;
    uint32_t cv[8];
    tree_cv(data, len, 0, num_chunks, true, cv);
    memcpy(out, cv, 32);
}

}  // namespace

extern "C" {

// Hash `n` messages of `msg_len` bytes each (contiguous) into n x 32 bytes.
void dt_blake3_batch(const uint8_t* data, size_t n, size_t msg_len, uint8_t* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (size_t i = 0; i < n; i++) {
        blake3_one(data + i * msg_len, msg_len, out + i * 32);
    }
}

void dt_blake3_single(const uint8_t* data, size_t len, uint8_t* out) {
    blake3_one(data, len, out);
}

// Merkle internal-node construction: hash sibling pairs level by level.
// leaves: n x 32 bytes; nodes_out: 2n x 32 bytes (nodes_out[1] = root).
void dt_merkle_nodes(const uint8_t* leaves, size_t n, uint8_t* nodes_out) {
    memset(nodes_out, 0, 32);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (size_t i = 0; i < n / 2; i++) {
        blake3_one(leaves + i * 64, 64, nodes_out + (n / 2 + i) * 32);
    }
    for (size_t size = n / 2; size > 1; size /= 2) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
        for (size_t i = size / 2; i < size; i++) {
            blake3_one(nodes_out + 2 * i * 32, 64, nodes_out + i * 32);
        }
    }
}

}  // extern "C"
