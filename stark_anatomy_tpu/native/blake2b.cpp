// Batched blake2b-512 hashing for Merkle commitments.
//
// The reference hashes every Merkle leaf and node one at a time through
// Python hashlib (merkle.py:6-27).  Committing a 2^20-entry codeword that
// way costs millions of interpreter round-trips; this extension does the
// whole batch in C++ (optionally OpenMP-parallel), including the
// consensus-critical leaf encoding: the decimal-string form of the
// canonical field element (algebra.py:56-57 semantics).
//
// Implements blake2b per RFC 7693 (unkeyed, 64-byte digests, single-depth
// parameter block) — bit-identical to hashlib.blake2b(data).digest().
//
// Build: make -C stark_anatomy_tpu/native

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

constexpr uint64_t IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

constexpr uint8_t SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

inline uint64_t rotr64(uint64_t x, int n) { return (x >> n) | (x << (64 - n)); }

struct Blake2bState {
  uint64_t h[8];
  uint8_t buf[128];
  size_t buflen;
  uint64_t t;  // total bytes (128-bit counter's low word; fine for our sizes)
  size_t outlen;

  void init(size_t digest_len) {
    memcpy(h, IV, sizeof(h));
    // param block word 0: digest_length | key<<8 | fanout<<16 | depth<<24
    h[0] ^= 0x01010000ULL | (uint64_t)digest_len;
    buflen = 0;
    t = 0;
    outlen = digest_len;
  }

  void compress(const uint8_t *block, bool last) {
    uint64_t m[16];
    for (int i = 0; i < 16; i++) {
      uint64_t w;
      memcpy(&w, block + 8 * i, 8);  // little-endian host assumed (x86/ARM)
      m[i] = w;
    }
    uint64_t v[16];
    memcpy(v, h, sizeof(h));
    memcpy(v + 8, IV, sizeof(IV));
    v[12] ^= t;
    // v[13] ^= t_hi (always 0 here)
    if (last) v[14] = ~v[14];

#define G(a, b, c, d, x, y)                         \
  v[a] = v[a] + v[b] + (x);                         \
  v[d] = rotr64(v[d] ^ v[a], 32);                   \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr64(v[b] ^ v[c], 24);                   \
  v[a] = v[a] + v[b] + (y);                         \
  v[d] = rotr64(v[d] ^ v[a], 16);                   \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr64(v[b] ^ v[c], 63);

    for (int r = 0; r < 12; r++) {
      const uint8_t *s = SIGMA[r];
      G(0, 4, 8, 12, m[s[0]], m[s[1]]);
      G(1, 5, 9, 13, m[s[2]], m[s[3]]);
      G(2, 6, 10, 14, m[s[4]], m[s[5]]);
      G(3, 7, 11, 15, m[s[6]], m[s[7]]);
      G(0, 5, 10, 15, m[s[8]], m[s[9]]);
      G(1, 6, 11, 12, m[s[10]], m[s[11]]);
      G(2, 7, 8, 13, m[s[12]], m[s[13]]);
      G(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
#undef G
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
  }

  void update(const uint8_t *data, size_t len) {
    while (len > 0) {
      if (buflen == 128) {
        t += 128;
        compress(buf, false);
        buflen = 0;
      }
      size_t take = 128 - buflen;
      if (take > len) take = len;
      memcpy(buf + buflen, data, take);
      buflen += take;
      data += take;
      len -= take;
    }
  }

  void final(uint8_t *out) {
    t += buflen;
    memset(buf + buflen, 0, 128 - buflen);
    compress(buf, true);
    memcpy(out, h, outlen);  // little-endian words, truncated to outlen
  }
};

void hash_one(const uint8_t *data, size_t len, uint8_t *out, size_t outlen) {
  Blake2bState s;
  s.init(outlen);
  s.update(data, len);
  s.final(out);
}

// canonical 8x16-bit-limb (stored as uint32) -> decimal string; returns length
int limbs_to_decimal(const uint32_t *limbs, char *out) {
  // value = sum limbs[k] << 16k ; convert via repeated division by 10^9
  uint32_t words[4];  // little-endian 32-bit words
  for (int k = 0; k < 4; k++)
    words[k] = (limbs[2 * k] & 0xffffu) | ((limbs[2 * k + 1] & 0xffffu) << 16);
  char tmp[48];
  int pos = 0;
  bool zero;
  do {
    // divide words by 10^9, collecting remainder
    uint64_t rem = 0;
    zero = true;
    for (int k = 3; k >= 0; k--) {
      uint64_t cur = (rem << 32) | words[k];
      words[k] = (uint32_t)(cur / 1000000000ULL);
      if (words[k]) zero = false;
      rem = cur % 1000000000ULL;
    }
    if (zero) {
      // most significant chunk: no left padding
      do {
        tmp[pos++] = '0' + (int)(rem % 10);
        rem /= 10;
      } while (rem);
    } else {
      for (int i = 0; i < 9; i++) {
        tmp[pos++] = '0' + (int)(rem % 10);
        rem /= 10;
      }
    }
  } while (!zero);
  // reverse into out
  for (int i = 0; i < pos; i++) out[i] = tmp[pos - 1 - i];
  return pos;
}

// ---------------------------------------------------------------------------
// blake2s-256 (RFC 7693, unkeyed) — the framework's commitment hash.
// 32-bit words make it implementable as native uint32 TPU vector ops
// (commit/device_merkle.py is the device twin; both must stay bit-exact
// with hashlib.blake2s).  Element encoding for leaves is the FIXED-WIDTH
// 16-byte little-endian canonical value — i.e. the 8 uint16 limbs verbatim.
// ---------------------------------------------------------------------------

constexpr uint32_t IV_S[8] = {0x6a09e667u, 0xbb67ae85u, 0x3c6ef372u,
                              0xa54ff53au, 0x510e527fu, 0x9b05688cu,
                              0x1f83d9abu, 0x5be0cd19u};

constexpr uint8_t SIGMA_S[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0}};

inline uint32_t rotr32(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

// Single-block blake2s-256: message m (16 words, zero-padded), t = byte
// length (<= 64), always final.  Covers every commitment hash: paired
// leaves are 32 bytes, nodes 64.
void blake2s_block(const uint32_t m[16], uint32_t t, uint8_t *out) {
  uint32_t h[8];
  memcpy(h, IV_S, sizeof(h));
  h[0] ^= 0x01010020u;  // digest_length=32, fanout=1, depth=1
  uint32_t v[16];
  memcpy(v, h, sizeof(h));
  memcpy(v + 8, IV_S, sizeof(IV_S));
  v[12] ^= t;
  v[14] = ~v[14];

#define GS(a, b, c, d, x, y)                        \
  v[a] = v[a] + v[b] + (x);                         \
  v[d] = rotr32(v[d] ^ v[a], 16);                   \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 12);                   \
  v[a] = v[a] + v[b] + (y);                         \
  v[d] = rotr32(v[d] ^ v[a], 8);                    \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 7);

  for (int r = 0; r < 10; r++) {
    const uint8_t *s = SIGMA_S[r];
    GS(0, 4, 8, 12, m[s[0]], m[s[1]]);
    GS(1, 5, 9, 13, m[s[2]], m[s[3]]);
    GS(2, 6, 10, 14, m[s[4]], m[s[5]]);
    GS(3, 7, 11, 15, m[s[6]], m[s[7]]);
    GS(0, 5, 10, 15, m[s[8]], m[s[9]]);
    GS(1, 6, 11, 12, m[s[10]], m[s[11]]);
    GS(2, 7, 8, 13, m[s[12]], m[s[13]]);
    GS(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
#undef GS
  for (int i = 0; i < 8; i++) {
    uint32_t w = h[i] ^ v[i] ^ v[i + 8];
    memcpy(out + 4 * i, &w, 4);  // little-endian host
  }
}

// General (multi-block) blake2s-256 for variable-length leaf encodings.
void blake2s_any(const uint8_t *data, size_t len, uint8_t *out) {
  uint32_t h[8];
  memcpy(h, IV_S, sizeof(h));
  h[0] ^= 0x01010020u;
  uint32_t t = 0;
  size_t off = 0;
  while (len - off > 64) {
    uint32_t m[16];
    memcpy(m, data + off, 64);
    t += 64;
    uint32_t v[16];
    memcpy(v, h, sizeof(h));
    memcpy(v + 8, IV_S, sizeof(IV_S));
    v[12] ^= t;
#define GS(a, b, c, d, x, y)                        \
  v[a] = v[a] + v[b] + (x);                         \
  v[d] = rotr32(v[d] ^ v[a], 16);                   \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 12);                   \
  v[a] = v[a] + v[b] + (y);                         \
  v[d] = rotr32(v[d] ^ v[a], 8);                    \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 7);
    for (int r = 0; r < 10; r++) {
      const uint8_t *s = SIGMA_S[r];
      GS(0, 4, 8, 12, m[s[0]], m[s[1]]);
      GS(1, 5, 9, 13, m[s[2]], m[s[3]]);
      GS(2, 6, 10, 14, m[s[4]], m[s[5]]);
      GS(3, 7, 11, 15, m[s[6]], m[s[7]]);
      GS(0, 5, 10, 15, m[s[8]], m[s[9]]);
      GS(1, 6, 11, 12, m[s[10]], m[s[11]]);
      GS(2, 7, 8, 13, m[s[12]], m[s[13]]);
      GS(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
#undef GS
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
    off += 64;
  }
  // final block
  uint8_t buf[64];
  size_t rem = len - off;
  memcpy(buf, data + off, rem);
  memset(buf + rem, 0, 64 - rem);
  uint32_t m[16];
  memcpy(m, buf, 64);
  t += (uint32_t)rem;
  uint32_t v[16];
  memcpy(v, h, sizeof(h));
  memcpy(v + 8, IV_S, sizeof(IV_S));
  v[12] ^= t;
  v[14] = ~v[14];
#define GS(a, b, c, d, x, y)                        \
  v[a] = v[a] + v[b] + (x);                         \
  v[d] = rotr32(v[d] ^ v[a], 16);                   \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 12);                   \
  v[a] = v[a] + v[b] + (y);                         \
  v[d] = rotr32(v[d] ^ v[a], 8);                    \
  v[c] = v[c] + v[d];                               \
  v[b] = rotr32(v[b] ^ v[c], 7);
  for (int r = 0; r < 10; r++) {
    const uint8_t *s = SIGMA_S[r];
    GS(0, 4, 8, 12, m[s[0]], m[s[1]]);
    GS(1, 5, 9, 13, m[s[2]], m[s[3]]);
    GS(2, 6, 10, 14, m[s[4]], m[s[5]]);
    GS(3, 7, 11, 15, m[s[6]], m[s[7]]);
    GS(0, 5, 10, 15, m[s[8]], m[s[9]]);
    GS(1, 6, 11, 12, m[s[10]], m[s[11]]);
    GS(2, 7, 8, 13, m[s[12]], m[s[13]]);
    GS(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
#undef GS
  for (int i = 0; i < 8; i++) {
    uint32_t w = h[i] ^ v[i] ^ v[i + 8];
    memcpy(out + 4 * i, &w, 4);
  }
}

}  // namespace

extern "C" {

// ---- blake2s-256 commitment scheme (32-byte digests) ----------------------

// Hash n variable-length messages (generic object-leaf Merkle).
void stark_hash_batch_s(const uint8_t *data, const uint64_t *offsets,
                        uint64_t n, uint8_t *out) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n; i++) {
    blake2s_any(data + offsets[i], offsets[i + 1] - offsets[i], out + 32 * i);
  }
}

// One Merkle level: n 32-byte digests (n even) -> n/2 parents.
void stark_merkle_level_s(const uint8_t *digests, uint64_t n, uint8_t *out) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n / 2; i++) {
    uint32_t m[16];
    memcpy(m, digests + 64 * i, 64);
    blake2s_block(m, 64, out + 32 * i);
  }
}

// Leaf digests from a canonical limb array (n rows x 8 uint32 limbs,
// each holding a 16-bit limb): message = the 16-byte little-endian value.
void stark_leaves_from_limbs_s(const uint32_t *limbs, uint64_t n,
                               uint8_t *out) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n; i++) {
    uint32_t m[16] = {0};
    const uint32_t *row = limbs + 8 * i;
    for (int k = 0; k < 4; k++)
      m[k] = (row[2 * k] & 0xffffu) | ((row[2 * k + 1] & 0xffffu) << 16);
    blake2s_block(m, 16, out + 32 * i);
  }
}

// Paired leaves: leaf i covers rows i and i + n/2; message = LE16(row_i)
// || LE16(row_{i+n/2}) (32 bytes).
void stark_leaves_from_limb_pairs_s(const uint32_t *limbs, uint64_t n,
                                    uint8_t *out) {
  const uint64_t half = n / 2;
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < half; i++) {
    uint32_t m[16] = {0};
    const uint32_t *lo = limbs + 8 * i;
    const uint32_t *hi = limbs + 8 * (i + half);
    for (int k = 0; k < 4; k++) {
      m[k] = (lo[2 * k] & 0xffffu) | ((lo[2 * k + 1] & 0xffffu) << 16);
      m[4 + k] = (hi[2 * k] & 0xffffu) | ((hi[2 * k + 1] & 0xffffu) << 16);
    }
    blake2s_block(m, 32, out + 32 * i);
  }
}

// Hash n variable-length messages; offsets has n+1 entries into data.
// dlen selects the blake2b digest length (e.g. 32 or 64 bytes).
void stark_hash_batch(const uint8_t *data, const uint64_t *offsets, uint64_t n,
                      uint8_t *out, uint64_t dlen) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n; i++) {
    hash_one(data + offsets[i], offsets[i + 1] - offsets[i], out + dlen * i,
             (size_t)dlen);
  }
}

// One Merkle level: n digests (dlen bytes each, n even) -> n/2 parents.
void stark_merkle_level(const uint8_t *digests, uint64_t n, uint8_t *out,
                        uint64_t dlen) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n / 2; i++) {
    hash_one(digests + 2 * dlen * i, 2 * (size_t)dlen, out + dlen * i,
             (size_t)dlen);
  }
}

// Leaf digests straight from a canonical limb array (n rows x 8 uint32
// limbs): decimal-encode each field element and blake2b it.
void stark_leaves_from_limbs(const uint32_t *limbs, uint64_t n, uint8_t *out,
                             uint64_t dlen) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n; i++) {
    char dec[48];
    int len = limbs_to_decimal(limbs + 8 * i, dec);
    hash_one((const uint8_t *)dec, (size_t)len, out + dlen * i, (size_t)dlen);
  }
}

// Paired leaf digests: leaf i of a codeword of n rows covers rows i and
// i + n/2 (the FRI split-and-fold pairing), encoded as
// "dec(row_i)|dec(row_{i+n/2})".  Halves tree depth and lets one opening
// authenticate both halves of a fold pair.
void stark_leaves_from_limb_pairs(const uint32_t *limbs, uint64_t n,
                                  uint8_t *out, uint64_t dlen) {
  const uint64_t half = n / 2;
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < half; i++) {
    char dec[100];
    int len = limbs_to_decimal(limbs + 8 * i, dec);
    dec[len++] = '|';
    len += limbs_to_decimal(limbs + 8 * (i + half), dec + len);
    hash_one((const uint8_t *)dec, (size_t)len, out + dlen * i, (size_t)dlen);
  }
}

// Decimal-encode a batch of canonical limb rows; out rows are 40 bytes,
// left-padded with spaces?  No: fixed stride, length written to lens.
void stark_limbs_to_decimal(const uint32_t *limbs, uint64_t n, char *out,
                            uint64_t stride, uint32_t *lens) {
#pragma omp parallel for schedule(static)
  for (uint64_t i = 0; i < n; i++) {
    lens[i] = (uint32_t)limbs_to_decimal(limbs + 8 * i, out + stride * i);
  }
}

}  // extern "C"
