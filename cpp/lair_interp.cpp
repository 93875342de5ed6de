// Native Lair interpreter: the memoizing evaluator hot loop in C++.
//
// Mirrors lurk_tpu/lair/execute.py exactly (which in turn mirrors the
// reference's src/lair/execute.rs:419-783): explicit-stack execution with
// memoized call queries, provide/require records, width-segregated memory
// tables, byte-table records, depth provenance for partial functions, and
// dense per-query hint streams for vectorized witness generation.
//
// Exposed as a C ABI consumed through ctypes (lurk_tpu/lair/native.py).
// Build: see cpp/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>
#include <thread>
#include <atomic>
#include <condition_variable>
#include <deque>
#include <functional>
#include <mutex>

namespace {

using u32 = uint32_t;
using u64 = uint64_t;

constexpr u64 P = 2013265921;

inline u32 fadd(u32 a, u32 b) { u64 s = (u64)a + b; return s >= P ? (u32)(s - P) : (u32)s; }
inline u32 fsub(u32 a, u32 b) { return a >= b ? a - b : (u32)(a + P - b); }
inline u32 fmul(u32 a, u32 b) { return (u32)((u64)a * b % P); }

u32 fpow(u32 a, u64 e) {
  u64 r = 1, b = a;
  while (e) {
    if (e & 1) r = r * b % P;
    b = b * b % P;
    e >>= 1;
  }
  return (u32)r;
}

inline u32 finv(u32 a) { return fpow(a, P - 2); }

// ---------------------------------------------------------------------------
// bytecode structures
// ---------------------------------------------------------------------------

enum OpTag : u32 {
  OP_ASSERT_EQ = 0, OP_ASSERT_NE, OP_CONTAINS, OP_CONST, OP_ADD, OP_SUB,
  OP_MUL, OP_INV, OP_NOT, OP_CALL, OP_PREIMG, OP_STORE, OP_LOAD, OP_EXTERN,
  OP_EMIT, OP_RANGE_U8, OP_BREAKPOINT, OP_DEBUG,
};
enum CtrlTag : u32 { CTRL_RETURN = 0, CTRL_CHOOSE, CTRL_CHOOSE_MANY };
enum ChipKind : u32 {
  CHIP_HASH24 = 0, CHIP_HASH32, CHIP_HASH40, CHIP_U64_ADD, CHIP_U64_SUB,
  CHIP_U64_MUL, CHIP_U64_DIVREM, CHIP_U64_LESSTHAN, CHIP_U64_ISZERO,
  CHIP_BIGNUM_LESSTHAN,
};

struct Op {
  u32 tag;
  u32 a = 0, b = 0;              // scalar operands
  std::vector<u32> xs, ys;       // list operands
};

struct Block;

struct Ctrl {
  u32 tag;
  u32 ident = 0;                      // Return
  std::vector<u32> vals;              // Return vals / ChooseMany vars
  u32 var = 0;                        // Choose var
  std::vector<std::unique_ptr<Block>> branches;
  std::vector<std::vector<u32>> branch_keys;  // per branch: keys or pattern
  std::unique_ptr<Block> dflt;
};

struct Block {
  std::vector<Op> ops;
  Ctrl ctrl;
};

struct ChipInfo {
  u32 kind, input_size, output_size, witness_size, require_size;
};

struct Func {
  bool invertible, partial;
  u32 input_size, output_size;
  Block body;
};

// Poseidon2 configuration (constants injected from Python)
struct PoseidonCfg {
  u32 width, r_f, r_p;
  std::vector<u32> full_rc;   // r_f * width
  std::vector<u32> part_rc;   // r_p
  std::vector<u32> diag;      // width
};

struct Toplevel {
  std::vector<Func> funcs;
  std::vector<ChipInfo> chips;
  PoseidonCfg pcfg[3];        // widths 24, 32, 40
  std::string error;
};

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct Reader {
  const u32* p;
  const u32* end;
  u32 next() { return *p++; }
  std::vector<u32> list() {
    u32 n = next();
    std::vector<u32> v(n);
    for (u32 i = 0; i < n; i++) v[i] = next();
    return v;
  }
};

void decode_block(Reader& r, Block& blk);

void decode_ctrl(Reader& r, Ctrl& c) {
  c.tag = r.next();
  switch (c.tag) {
    case CTRL_RETURN:
      c.ident = r.next();
      c.vals = r.list();
      break;
    case CTRL_CHOOSE: {
      c.var = r.next();
      u32 nb = r.next();
      for (u32 i = 0; i < nb; i++) {
        c.branch_keys.push_back(r.list());
        c.branches.emplace_back(new Block());
        decode_block(r, *c.branches.back());
      }
      if (r.next()) {
        c.dflt.reset(new Block());
        decode_block(r, *c.dflt);
      }
      break;
    }
    case CTRL_CHOOSE_MANY: {
      c.vals = r.list();  // vars
      u32 nb = r.next();
      for (u32 i = 0; i < nb; i++) {
        c.branch_keys.push_back(r.list());
        c.branches.emplace_back(new Block());
        decode_block(r, *c.branches.back());
      }
      if (r.next()) {
        c.dflt.reset(new Block());
        decode_block(r, *c.dflt);
      }
      break;
    }
  }
}

void decode_block(Reader& r, Block& blk) {
  u32 n_ops = r.next();
  blk.ops.resize(n_ops);
  for (u32 i = 0; i < n_ops; i++) {
    Op& op = blk.ops[i];
    op.tag = r.next();
    switch (op.tag) {
      case OP_ASSERT_EQ:
      case OP_ASSERT_NE:
        op.xs = r.list();
        op.ys = r.list();
        break;
      case OP_CONTAINS:
        op.xs = r.list();
        op.a = r.next();
        break;
      case OP_CONST: op.a = r.next(); break;
      case OP_ADD: case OP_SUB: case OP_MUL:
        op.a = r.next(); op.b = r.next();
        break;
      case OP_INV: case OP_NOT: op.a = r.next(); break;
      case OP_CALL: case OP_PREIMG: case OP_EXTERN:
        op.a = r.next();
        op.xs = r.list();
        break;
      case OP_STORE: op.xs = r.list(); break;
      case OP_LOAD: op.a = r.next(); op.b = r.next(); break;
      case OP_EMIT: case OP_RANGE_U8: op.xs = r.list(); break;
      case OP_BREAKPOINT: case OP_DEBUG: break;
    }
  }
  decode_ctrl(r, blk.ctrl);
}

// ---------------------------------------------------------------------------
// poseidon2 (canonical-domain scalar, mirrors lurk_tpu/poseidon/ref.py)
// ---------------------------------------------------------------------------

void ext_layer(u32* s, u32 w) {
  // blockwise M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] + column sums
  for (u32 c = 0; c < w; c += 4) {
    u32 x0 = s[c], x1 = s[c+1], x2 = s[c+2], x3 = s[c+3];
    u32 t01 = fadd(x0, x1), t23 = fadd(x2, x3);
    u32 t0123 = fadd(t01, t23);
    u32 t01123 = fadd(t0123, x1), t01233 = fadd(t0123, x3);
    s[c+3] = fadd(t01233, fadd(x0, x0));
    s[c+1] = fadd(t01123, fadd(x2, x2));
    s[c]   = fadd(t01123, t01);
    s[c+2] = fadd(t01233, t23);
  }
  u32 sums[4] = {0, 0, 0, 0};
  for (u32 k = 0; k < 4; k++)
    for (u32 c = k; c < w; c += 4) sums[k] = fadd(sums[k], s[c]);
  for (u32 i = 0; i < w; i++) s[i] = fadd(s[i], sums[i & 3]);
}

inline u32 sbox7(u32 x) {
  u32 x2 = fmul(x, x);
  u32 x3 = fmul(x2, x);
  return fmul(fmul(x3, x3), x);
}

void poseidon2(const PoseidonCfg& cfg, u32* s) {
  u32 w = cfg.width;
  ext_layer(s, w);
  for (u32 r = 0; r < cfg.r_f / 2; r++) {
    for (u32 i = 0; i < w; i++) s[i] = sbox7(fadd(s[i], cfg.full_rc[r * w + i]));
    ext_layer(s, w);
  }
  for (u32 r = 0; r < cfg.r_p; r++) {
    s[0] = sbox7(fadd(s[0], cfg.part_rc[r]));
    u64 sum = 0;
    for (u32 i = 0; i < w; i++) sum += s[i];
    u32 sum_f = (u32)(sum % P);
    for (u32 i = 0; i < w; i++) s[i] = fadd(fmul(s[i], cfg.diag[i]), sum_f);
  }
  for (u32 r = cfg.r_f / 2; r < cfg.r_f; r++) {
    for (u32 i = 0; i < w; i++) s[i] = sbox7(fadd(s[i], cfg.full_rc[r * w + i]));
    ext_layer(s, w);
  }
}

// ---------------------------------------------------------------------------
// Poseidon2, 8 states at a time (AVX-512 Montgomery lanes)
//
// Identical mod-p math to the scalar path - values are carried in
// Montgomery form (an exact bijection) through the rounds, so canonical
// outputs are bit-identical. ~10-20x the scalar throughput; guarded so
// non-AVX512 builds keep the scalar path.
// ---------------------------------------------------------------------------

#if defined(__AVX512F__) && defined(__AVX512DQ__)
#define LAIR_P2_AVX512 1
#include <immintrin.h>

namespace p2v {

constexpr u64 PINV32 = 0x77ffffffull;   // -P^-1 mod 2^32
constexpr u64 R2 = 0x45dddde3ull;       // 2^64 mod P

inline __m512i vset(u64 x) { return _mm512_set1_epi64((long long)x); }

inline __m512i mont_mul(__m512i a, __m512i b) {
  const __m512i vp = vset(P), m32 = vset(0xffffffffull),
                vpinv = vset(PINV32);
  __m512i t = _mm512_mullo_epi64(a, b);           // < 2^62 (a, b < P)
  __m512i m = _mm512_and_epi64(
      _mm512_mullo_epi64(_mm512_and_epi64(t, m32), vpinv), m32);
  __m512i u = _mm512_srli_epi64(
      _mm512_add_epi64(t, _mm512_mullo_epi64(m, vp)), 32);
  __mmask8 ge = _mm512_cmpge_epu64_mask(u, vp);
  return _mm512_mask_sub_epi64(u, ge, u, vp);
}

inline __m512i addm(__m512i a, __m512i b) {
  const __m512i vp = vset(P);
  __m512i s = _mm512_add_epi64(a, b);
  __mmask8 ge = _mm512_cmpge_epu64_mask(s, vp);
  return _mm512_mask_sub_epi64(s, ge, s, vp);
}

inline __m512i sbox7(__m512i x) {
  __m512i x2 = mont_mul(x, x);
  __m512i x3 = mont_mul(x2, x);
  return mont_mul(mont_mul(x3, x3), x);
}

inline u64 to_mont_s(u64 x) { return (x << 32) % P; }

// PoseidonCfg with all constants pre-converted to Montgomery form.
struct CfgMont {
  u32 width, r_f, r_p;
  std::vector<u64> full_rc, part_rc, diag;
  explicit CfgMont(const PoseidonCfg& c)
      : width(c.width), r_f(c.r_f), r_p(c.r_p) {
    for (u32 x : c.full_rc) full_rc.push_back(to_mont_s(x));
    for (u32 x : c.part_rc) part_rc.push_back(to_mont_s(x));
    for (u32 x : c.diag) diag.push_back(to_mont_s(x));
  }
};

inline void ext_layer_v(__m512i* s, u32 w) {
  for (u32 c = 0; c < w; c += 4) {
    __m512i x0 = s[c], x1 = s[c + 1], x2 = s[c + 2], x3 = s[c + 3];
    __m512i t01 = addm(x0, x1), t23 = addm(x2, x3);
    __m512i t0123 = addm(t01, t23);
    __m512i t01123 = addm(t0123, x1), t01233 = addm(t0123, x3);
    s[c + 3] = addm(t01233, addm(x0, x0));
    s[c + 1] = addm(t01123, addm(x2, x2));
    s[c] = addm(t01123, t01);
    s[c + 2] = addm(t01233, t23);
  }
  __m512i sums[4];
  for (u32 k = 0; k < 4; k++) {
    sums[k] = s[k];
    for (u32 c = k + 4; c < w; c += 4) sums[k] = addm(sums[k], s[c]);
  }
  for (u32 i = 0; i < w; i++) s[i] = addm(s[i], sums[i & 3]);
}

// permute 8 states held as w column vectors (Montgomery domain, in place)
inline void perm8(const CfgMont& cfg, __m512i* s) {
  u32 w = cfg.width;
  ext_layer_v(s, w);
  for (u32 r = 0; r < cfg.r_f / 2; r++) {
    for (u32 i = 0; i < w; i++)
      s[i] = sbox7(addm(s[i], vset(cfg.full_rc[r * w + i])));
    ext_layer_v(s, w);
  }
  for (u32 r = 0; r < cfg.r_p; r++) {
    s[0] = sbox7(addm(s[0], vset(cfg.part_rc[r])));
    __m512i sum = s[0];
    for (u32 i = 1; i < w; i++) sum = addm(sum, s[i]);
    for (u32 i = 0; i < w; i++)
      s[i] = addm(mont_mul(s[i], vset(cfg.diag[i])), sum);
  }
  for (u32 r = cfg.r_f / 2; r < cfg.r_f; r++) {
    for (u32 i = 0; i < w; i++)
      s[i] = sbox7(addm(s[i], vset(cfg.full_rc[r * w + i])));
    ext_layer_v(s, w);
  }
}

}  // namespace p2v
#endif  // AVX512

// ---------------------------------------------------------------------------
// Poseidon2, 4 states at a time (SSE4.1 packed-u32 Montgomery lanes)
//
// The serving hosts here expose SSE4.2/AVX but no AVX2/AVX-512, so the
// 8-wide path above compiles out. This 4-wide path packs four states into
// u32 lanes of one __m128i per state column; Montgomery multiply splits
// even/odd lanes through pmuludq (the only 32x32->64 vector multiply
// pre-AVX2) exactly like Plonky3's AVX2 kernel does at twice the width.
// Same mod-p math as the scalar path; canonical outputs bit-identical.
// ---------------------------------------------------------------------------

#if !defined(LAIR_P2_AVX512) && defined(__SSE4_1__)
#define LAIR_P2_SSE 1
#include <smmintrin.h>

namespace p2s {

constexpr u32 PINV32 = 0x77ffffffu;   // -P^-1 mod 2^32
constexpr u32 R2 = 0x45dddde3u;       // 2^64 mod P

inline __m128i vset(u32 x) { return _mm_set1_epi32((int)x); }

// 4-lane packed-u32 Montgomery multiply; inputs < P, output < P.
inline __m128i mont_mul(__m128i a, __m128i b) {
  const __m128i vp = vset(P), vpinv = vset(PINV32);
  __m128i te = _mm_mul_epu32(a, b);                    // lanes 0,2 (u64)
  __m128i to = _mm_mul_epu32(_mm_srli_epi64(a, 32),
                             _mm_srli_epi64(b, 32));   // lanes 1,3 (u64)
  // m = (t mod 2^32) * pinv mod 2^32 (pmuludq reads the low halves)
  __m128i me = _mm_mul_epu32(te, vpinv);
  __m128i mo = _mm_mul_epu32(to, vpinv);
  // u = (t + m*P) >> 32 < 2P; exact division (low half cancels)
  __m128i ue = _mm_srli_epi64(_mm_add_epi64(te, _mm_mul_epu32(me, vp)), 32);
  __m128i uo = _mm_srli_epi64(_mm_add_epi64(to, _mm_mul_epu32(mo, vp)), 32);
  __m128i u = _mm_or_si128(ue, _mm_slli_epi64(uo, 32));
  // canonical reduce: if u >= P then u-P (in [0,P)) is the unsigned min
  return _mm_min_epu32(u, _mm_sub_epi32(u, vp));
}

inline __m128i addm(__m128i a, __m128i b) {
  const __m128i vp = vset(P);
  __m128i s = _mm_add_epi32(a, b);    // a, b < P < 2^31: no u32 overflow
  return _mm_min_epu32(s, _mm_sub_epi32(s, vp));
}

inline __m128i sbox7(__m128i x) {
  __m128i x2 = mont_mul(x, x);
  __m128i x3 = mont_mul(x2, x);
  return mont_mul(mont_mul(x3, x3), x);
}

inline u32 to_mont_s(u64 x) { return (u32)((x << 32) % P); }

// constants pre-converted to Montgomery form (u32 packed lanes)
struct CfgMont {
  u32 width, r_f, r_p;
  std::vector<u32> full_rc, part_rc, diag;
  explicit CfgMont(const PoseidonCfg& c)
      : width(c.width), r_f(c.r_f), r_p(c.r_p) {
    for (u32 x : c.full_rc) full_rc.push_back(to_mont_s(x));
    for (u32 x : c.part_rc) part_rc.push_back(to_mont_s(x));
    for (u32 x : c.diag) diag.push_back(to_mont_s(x));
  }
};

inline void ext_layer_v(__m128i* s, u32 w) {
  for (u32 c = 0; c < w; c += 4) {
    __m128i x0 = s[c], x1 = s[c + 1], x2 = s[c + 2], x3 = s[c + 3];
    __m128i t01 = addm(x0, x1), t23 = addm(x2, x3);
    __m128i t0123 = addm(t01, t23);
    __m128i t01123 = addm(t0123, x1), t01233 = addm(t0123, x3);
    s[c + 3] = addm(t01233, addm(x0, x0));
    s[c + 1] = addm(t01123, addm(x2, x2));
    s[c] = addm(t01123, t01);
    s[c + 2] = addm(t01233, t23);
  }
  __m128i sums[4];
  for (u32 k = 0; k < 4; k++) {
    sums[k] = s[k];
    for (u32 c = k + 4; c < w; c += 4) sums[k] = addm(sums[k], s[c]);
  }
  for (u32 i = 0; i < w; i++) s[i] = addm(s[i], sums[i & 3]);
}

// permute 4 states held as w column vectors (Montgomery domain, in place)
inline void perm4(const CfgMont& cfg, __m128i* s) {
  u32 w = cfg.width;
  ext_layer_v(s, w);
  for (u32 r = 0; r < cfg.r_f / 2; r++) {
    for (u32 i = 0; i < w; i++)
      s[i] = sbox7(addm(s[i], vset(cfg.full_rc[r * w + i])));
    ext_layer_v(s, w);
  }
  for (u32 r = 0; r < cfg.r_p; r++) {
    s[0] = sbox7(addm(s[0], vset(cfg.part_rc[r])));
    __m128i sum = s[0];
    for (u32 i = 1; i < w; i++) sum = addm(sum, s[i]);
    for (u32 i = 0; i < w; i++)
      s[i] = addm(mont_mul(s[i], vset(cfg.diag[i])), sum);
  }
  for (u32 r = cfg.r_f / 2; r < cfg.r_f; r++) {
    for (u32 i = 0; i < w; i++)
      s[i] = sbox7(addm(s[i], vset(cfg.full_rc[r * w + i])));
    ext_layer_v(s, w);
  }
}

}  // namespace p2s
#endif  // SSE4.1

// ---------------------------------------------------------------------------
// interpreter state
// ---------------------------------------------------------------------------

struct Record { u32 nonce = 0, count = 0; };

// ---------------------------------------------------------------------------
// flat query storage
//
// The interpreter's memo tables were node-based unordered_map<vector<u32>,.>
// keyed by freshly allocated vectors; the profile showed the hot loop
// dominated by per-call key allocation, double hashing (find then insert)
// and QueryResult reallocation moves. Keys of any one table share a fixed
// stride (a Lair function's input arity / a memory table's width), so the
// tables are now open-addressing maps over a flat key arena with cached
// 32-bit hashes, and the per-query values live in structure-of-arrays form
// with the variable-length streams (requires / depth-requires / hints) in
// shared arenas. Same data, same insertion order (index == nonce), no
// per-query allocations.
// ---------------------------------------------------------------------------

struct FlatMap {
  u32 stride = 1;
  u32 mask = 0;
  u32 count = 0;
  std::vector<u32> keys;      // count * stride, insertion order
  std::vector<u32> slots;     // mask+1 entries: index+1, 0 = empty
  std::vector<u32> hashes;    // cached key hash per occupied slot

  void init(u32 s) {
    stride = s;
    mask = 255;
    slots.assign(mask + 1, 0);
    hashes.assign(mask + 1, 0);
  }

  static u32 hash_key(const u32* k, u32 stride) {
    u64 h = 0xcbf29ce484222325ull;
    for (u32 i = 0; i < stride; i++) {
      h ^= k[i];
      h *= 0x100000001b3ull;
    }
    h ^= h >> 32;
    return (u32)h;
  }

  void grow() {
    u32 new_mask = mask * 2 + 1;
    std::vector<u32> ns(new_mask + 1, 0), nh(new_mask + 1, 0);
    for (u32 i = 0; i <= mask; i++) {
      u32 v = slots[i];
      if (!v) continue;
      u32 j = hashes[i] & new_mask;
      while (ns[j]) j = (j + 1) & new_mask;
      ns[j] = v;
      nh[j] = hashes[i];
    }
    slots.swap(ns);
    hashes.swap(nh);
    mask = new_mask;
  }

  const u32* key(u32 i) const { return keys.data() + (size_t)i * stride; }

  // find-or-insert in one probe sequence; returns (index, inserted)
  std::pair<u32, bool> get_or_insert(const u32* k) {
    if ((u64)(count + 1) * 4 > (u64)(mask + 1) * 3) grow();
    u32 h = hash_key(k, stride);
    u32 j = h & mask;
    while (true) {
      u32 v = slots[j];
      if (!v) break;
      if (hashes[j] == h &&
          std::memcmp(key(v - 1), k, (size_t)stride * sizeof(u32)) == 0)
        return {v - 1, false};
      j = (j + 1) & mask;
    }
    u32 idx = count++;
    slots[j] = idx + 1;
    hashes[j] = h;
    keys.insert(keys.end(), k, k + stride);
    return {idx, true};
  }

  int64_t find(const u32* k) const {
    u32 h = hash_key(k, stride);
    u32 j = h & mask;
    while (true) {
      u32 v = slots[j];
      if (!v) return -1;
      if (hashes[j] == h &&
          std::memcmp(key(v - 1), k, (size_t)stride * sizeof(u32)) == 0)
        return (int64_t)(v - 1);
      j = (j + 1) & mask;
    }
  }
};

// Per-function memo table: FlatMap keyed by input + SoA query results.
// Index into the map IS the nonce (insertion order), as in execute.py.
struct FuncQueries {
  FlatMap map;
  u32 out_stride = 0;
  std::vector<u32> out;         // count * out_stride (valid once done)
  std::vector<Record> provide;
  std::vector<u32> depth, path;
  std::vector<uint8_t> done;
  // variable-length per-query streams, appended at Return time
  std::vector<u32> req_off, req_len, dreq_off, dreq_len, hint_off, hint_len;
  std::vector<u32> req_arena, dreq_arena, hint_arena;

  u32 insert_row(const u32* k) {
    auto [idx, inserted] = map.get_or_insert(k);
    if (inserted) push_defaults();
    return idx;
  }

  void push_defaults() {
    out.resize(out.size() + out_stride);
    provide.push_back({});
    depth.push_back(0);
    path.push_back(0);
    done.push_back(0);
    req_off.push_back(0);
    req_len.push_back(0);
    dreq_off.push_back(0);
    dreq_len.push_back(0);
    hint_off.push_back(0);
    hint_len.push_back(0);
  }
};

constexpr u32 MEM_SIZES[6] = {2, 3, 4, 5, 6, 8};
int mem_index_from_len(size_t n) {
  for (int i = 0; i < 6; i++) if (MEM_SIZES[i] == n) return i;
  return -1;
}

struct ByteRecords {
  // direct-indexed by the u16 byte-pair input (was a per-input hash map)
  std::vector<std::array<Record, 6>> recs;
  std::vector<u32>* requires_ = nullptr;
  u32 nonce = 0;

  ByteRecords() : recs(1 << 16) {}

  void lookup(u32 input, int slot) {
    Record& rec = recs[input][slot];
    requires_->push_back(rec.nonce);
    requires_->push_back(rec.count);
    rec.nonce = nonce;
    rec.count += 1;
  }
  void range_u8_pair(u32 a, u32 b) { lookup(a | (b << 8), 0); }
  void range_u16(u32 x) { lookup(x, 1); }
  bool less_than(u32 a, u32 b) { lookup(a | (b << 8), 2); return a < b; }
};

struct Interp {
  Toplevel* tl;
  std::vector<FuncQueries> func_queries;
  // inverse maps for invertible funcs: keyed by output, value = input row
  std::vector<FlatMap> inv_maps;
  std::vector<std::vector<u32>> inv_inps;   // count * input_size
  FlatMap mem_maps[6];
  std::vector<Record> mem_provide[6];
  ByteRecords bytes;
  std::vector<std::vector<u32>> emitted;
  std::vector<u32> public_values;
  std::string error;

  Interp(Toplevel* t) : tl(t) {
    func_queries.resize(t->funcs.size());
    inv_maps.resize(t->funcs.size());
    inv_inps.resize(t->funcs.size());
    for (size_t f = 0; f < t->funcs.size(); f++) {
      func_queries[f].map.init(t->funcs[f].input_size);
      func_queries[f].out_stride = t->funcs[f].output_size;
      // init every inverse map (not just invertible funcs): find() on a
      // default-constructed FlatMap would probe an empty slot vector
      inv_maps[f].init(t->funcs[f].output_size);
    }
    for (int m = 0; m < 6; m++) mem_maps[m].init(MEM_SIZES[m]);
  }

  // inject: keep-existing semantics (matches unordered_map::emplace)
  void inv_inject(u32 fi, const u32* out_key, const u32* inp, u32 in_sz) {
    auto [idx, inserted] = inv_maps[fi].get_or_insert(out_key);
    (void)idx;
    auto& arena = inv_inps[fi];
    if (inserted) arena.insert(arena.end(), inp, inp + in_sz);
  }

  // runtime: overwrite semantics (matches map[out] = inp)
  void inv_set(u32 fi, const u32* out_key, const u32* inp, u32 in_sz) {
    auto [idx, inserted] = inv_maps[fi].get_or_insert(out_key);
    auto& arena = inv_inps[fi];
    if (inserted) {
      arena.insert(arena.end(), inp, inp + in_sz);
    } else {
      std::memcpy(arena.data() + (size_t)idx * in_sz, inp,
                  (size_t)in_sz * sizeof(u32));
    }
  }
};

// execution-side DepthLessThan byte lookups (execute.py:_populate_depth_less_than)
void depth_less_than_lookups(u32 lhs, u32 rhs, ByteRecords& bytes) {
  u32 i1 = 0, i2 = 0;
  for (int i = 3; i >= 0; i--) {
    u32 a = (lhs >> (8 * i)) & 0xFF, b = (rhs >> (8 * i)) & 0xFF;
    if (a != b) { i1 = a; i2 = b; break; }
  }
  bytes.less_than(i1, i2);
}

bool run_extern(Interp& st, u32 chip_idx, const u32* inp,
                u32 nonce, std::vector<u32>& requires_, std::vector<u32>& out) {
  const ChipInfo& ci = st.tl->chips[chip_idx];
  switch (ci.kind) {
    case CHIP_HASH24: case CHIP_HASH32: case CHIP_HASH40: {
      const PoseidonCfg& cfg = st.tl->pcfg[ci.kind - CHIP_HASH24];
      u32 s[48];
      std::memcpy(s, inp, ci.input_size * sizeof(u32));
      poseidon2(cfg, s);
      out.assign(s, s + 8);
      return true;
    }
    default: break;
  }
  st.bytes.requires_ = &requires_;
  st.bytes.nonce = nonce;
  auto get_u64 = [&](size_t off) {
    u64 v = 0;
    for (int i = 0; i < 8; i++) v |= (u64)inp[off + i] << (8 * i);
    return v;
  };
  auto push_bytes = [&](u64 v) {
    for (int i = 0; i < 8; i++) out.push_back((v >> (8 * i)) & 0xFF);
  };
  auto range8 = [&](u64 v) {
    for (int i = 0; i < 8; i += 2)
      st.bytes.range_u8_pair((v >> (8 * i)) & 0xFF, (v >> (8 * (i + 1))) & 0xFF);
  };
  switch (ci.kind) {
    case CHIP_U64_ADD: {
      u64 a = get_u64(0), b = get_u64(8), c = a + b;
      range8(c); push_bytes(c); return true;
    }
    case CHIP_U64_SUB: {
      u64 a = get_u64(0), b = get_u64(8), c = a - b;
      range8(c); push_bytes(c); return true;
    }
    case CHIP_U64_MUL: {
      u64 a = get_u64(0), b = get_u64(8);
      // schoolbook carries, mirroring ProductGadget.execute
      u32 la[8], lb[8];
      for (int i = 0; i < 8; i++) { la[i] = (a >> (8*i)) & 0xFF; lb[i] = (b >> (8*i)) & 0xFF; }
      u32 products[8] = {0};
      for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++)
          if (i + j < 8) products[i + j] += la[i] * lb[j];
      u32 carry = 0;
      u32 result[8];
      for (int k = 0; k < 8; k++) {
        u32 o = products[k] + carry;
        result[k] = o & 0xFF;
        carry = o >> 8;
        st.bytes.range_u16(carry);
      }
      for (int i = 0; i < 8; i += 2) st.bytes.range_u8_pair(result[i], result[i+1]);
      for (int i = 0; i < 8; i++) out.push_back(result[i]);
      return true;
    }
    case CHIP_U64_DIVREM: {
      u64 a = get_u64(0), b = get_u64(8);
      if (b == 0) { st.error = "division by zero"; return false; }
      u64 q = a / b, r = a % b;
      range8(q);
      // qb product carries + range
      {
        u32 la[8], lb[8];
        for (int i = 0; i < 8; i++) { la[i] = (q >> (8*i)) & 0xFF; lb[i] = (b >> (8*i)) & 0xFF; }
        u32 products[8] = {0};
        for (int i = 0; i < 8; i++)
          for (int j = 0; j < 8; j++)
            if (i + j < 8) products[i + j] += la[i] * lb[j];
        u32 carry = 0;
        u32 result[8];
        for (int k = 0; k < 8; k++) {
          u32 o = products[k] + carry;
          result[k] = o & 0xFF;
          carry = o >> 8;
          st.bytes.range_u16(carry);
        }
        for (int i = 0; i < 8; i += 2) st.bytes.range_u8_pair(result[i], result[i+1]);
      }
      range8(r);
      // r < b: ms differing byte
      {
        u32 i1 = 0, i2 = 0;
        bool found = false;
        for (int i = 7; i >= 0; i--) {
          u32 x = (r >> (8*i)) & 0xFF, y = (b >> (8*i)) & 0xFF;
          if (x != y) { i1 = x; i2 = y; found = true; break; }
        }
        if (!found) { st.error = "r == b in divrem"; return false; }
        st.bytes.less_than(i1, i2);
      }
      // qb <= a
      {
        u64 qb = q * b;
        u32 i1 = 0, i2 = 0;
        for (int i = 7; i >= 0; i--) {
          u32 x = (qb >> (8*i)) & 0xFF, y = (a >> (8*i)) & 0xFF;
          if (x != y) { i1 = x; i2 = y; break; }
        }
        st.bytes.less_than(i1, i2);
      }
      push_bytes(q); push_bytes(r);
      return true;
    }
    case CHIP_U64_LESSTHAN: {
      u64 a = get_u64(0), b = get_u64(8);
      u32 i1 = 0, i2 = 0;
      for (int i = 7; i >= 0; i--) {
        u32 x = (a >> (8*i)) & 0xFF, y = (b >> (8*i)) & 0xFF;
        if (x != y) { i1 = x; i2 = y; break; }
      }
      out.push_back(st.bytes.less_than(i1, i2) ? 1 : 0);
      return true;
    }
    case CHIP_U64_ISZERO: {
      u64 a = get_u64(0);
      out.push_back(a == 0 ? 1 : 0);
      return true;
    }
    case CHIP_BIGNUM_LESSTHAN: {
      // mirrors BigNumChip.execute (lurk_tpu/core/chipset.py)
      u32 lv = 0, rv = 0;
      for (int i = 7; i >= 0; i--) {
        if (inp[i] != inp[8 + i]) { lv = inp[i]; rv = inp[8 + i]; break; }
      }
      auto word_lookups = [&](u32 v) {
        u32 bs[4];
        for (int i = 0; i < 4; i++) bs[i] = (v >> (8 * i)) & 0xFF;
        st.bytes.less_than(bs[3], 0x78);
        st.bytes.range_u8_pair(bs[0], bs[1]);
        st.bytes.range_u8_pair(bs[2], bs[3]);
      };
      word_lookups(lv);
      word_lookups(rv);
      u32 i1 = 0, i2 = 0;
      for (int i = 3; i >= 0; i--) {
        u32 x = (lv >> (8*i)) & 0xFF, y = (rv >> (8*i)) & 0xFF;
        if (x != y) { i1 = x; i2 = y; break; }
      }
      out.push_back(st.bytes.less_than(i1, i2) ? 1 : 0);
      return true;
    }
    default:
      st.error = "unknown chip kind";
      return false;
  }
}

// The interpreter main loop. Returns false + st.error on failure.
//
// One Frame per active function call (Choose REPLACES the top frame, so
// each activation owns exactly one). The per-activation value map and the
// requires / depths / depth-requires / hints streams live as segments of
// five shared stacks with per-frame base offsets (CallerCtx) - no per-call
// vector allocation, no CallerState moves.
bool execute_func(Interp& st, u32 entry_idx, const std::vector<u32>& args) {
  Toplevel& tl = *st.tl;
  u32 func_index = entry_idx;
  FuncQueries* fq = &st.func_queries[func_index];
  u32 nonce = fq->insert_row(args.data());
  fq->provide[nonce].count = 1;
  bool partial = tl.funcs[func_index].partial;

  struct Frame { const Op* op; const Op* end; const Ctrl* ctrl; };
  struct CallerCtx {
    u32 preimg, func_index, nonce;
    u32 vbase, rbase, dbase, qbase, hbase;
  };

  std::vector<u32> vstack(args);   // value maps
  std::vector<u32> rstack;         // requires (nonce,count pairs)
  std::vector<u32> dstack;         // callee depths (partial funcs)
  std::vector<u32> qstack;         // depth-requires
  std::vector<u32> hstack;         // hints
  u32 vbase = 0, rbase = 0, dbase = 0, qbase = 0, hbase = 0;

  std::vector<Frame> frames;
  std::vector<CallerCtx> callers;
  std::vector<u32> scratch, outbuf;
  frames.reserve(256);
  callers.reserve(256);

  auto enter_block = [&](const Block& b) {
    frames.push_back({b.ops.data(), b.ops.data() + b.ops.size(), &b.ctrl});
  };
  auto replace_block = [&](const Block& b) {
    frames.back() = {b.ops.data(), b.ops.data() + b.ops.size(), &b.ctrl};
  };
  enter_block(tl.funcs[func_index].body);

  while (!frames.empty()) {
    Frame& f = frames.back();
    if (f.op != f.end) {
      const Op& op = *f.op++;
      const u32* V = vstack.data() + vbase;
      switch (op.tag) {
        case OP_CONST: vstack.push_back(op.a); break;
        case OP_ADD: vstack.push_back(fadd(V[op.a], V[op.b])); break;
        case OP_SUB: vstack.push_back(fsub(V[op.a], V[op.b])); break;
        case OP_MUL: vstack.push_back(fmul(V[op.a], V[op.b])); break;
        case OP_INV: {
          if (V[op.a] == 0) { st.error = "inverse of 0"; return false; }
          vstack.push_back(finv(V[op.a]));
          break;
        }
        case OP_NOT: vstack.push_back(V[op.a] == 0 ? 1 : 0); break;
        case OP_ASSERT_EQ:
          for (size_t i = 0; i < op.xs.size(); i++)
            if (V[op.xs[i]] != V[op.ys[i]]) { st.error = "AssertEq failed"; return false; }
          break;
        case OP_ASSERT_NE: {
          bool unequal = false;
          for (size_t i = 0; i < op.xs.size(); i++)
            if (V[op.xs[i]] != V[op.ys[i]]) { unequal = true; break; }
          if (!unequal) { st.error = "AssertNe failed"; return false; }
          break;
        }
        case OP_CONTAINS: {
          u32 b = V[op.a];
          bool found = false;
          for (u32 x : op.xs) if (V[x] == b) { found = true; break; }
          if (!found) { st.error = "Contains failed"; return false; }
          break;
        }
        case OP_CALL: case OP_PREIMG: {
          u32 callee = op.a;
          FuncQueries& cq = st.func_queries[callee];
          u32 in_sz = cq.map.stride;
          scratch.clear();
          for (u32 v : op.xs) scratch.push_back(V[v]);
          if (op.tag == OP_PREIMG) {
            int64_t ii = st.inv_maps[callee].find(scratch.data());
            if (ii < 0) { st.error = "Preimg not found"; return false; }
            const u32* inp = st.inv_inps[callee].data() + (size_t)ii * in_sz;
            scratch.assign(inp, inp + in_sz);
          }
          auto [qi, inserted] = cq.map.get_or_insert(scratch.data());
          if (!inserted) {
            if (!cq.done[qi]) { st.error = "Loop detected"; return false; }
            const u32* ext;
            u32 ext_n;
            if (op.tag == OP_PREIMG) {
              ext = cq.map.key(qi);
              ext_n = in_sz;
            } else {
              ext = cq.out.data() + (size_t)qi * cq.out_stride;
              ext_n = cq.out_stride;
            }
            vstack.insert(vstack.end(), ext, ext + ext_n);
            hstack.insert(hstack.end(), ext, ext + ext_n);
            Record& pr = cq.provide[qi];
            rstack.push_back(pr.nonce);
            rstack.push_back(pr.count);
            pr.nonce = nonce;
            pr.count += 1;
            if (partial && tl.funcs[callee].partial) {
              dstack.push_back(cq.depth[qi]);
              hstack.push_back(cq.depth[qi]);
            }
          } else {
            cq.push_defaults();
            callers.push_back(CallerCtx{op.tag == OP_PREIMG, func_index,
                                        nonce, vbase, rbase, dbase, qbase,
                                        hbase});
            func_index = callee;
            nonce = qi;
            partial = tl.funcs[callee].partial;
            vbase = (u32)vstack.size();
            rbase = (u32)rstack.size();
            dbase = (u32)dstack.size();
            qbase = (u32)qstack.size();
            hbase = (u32)hstack.size();
            vstack.insert(vstack.end(), scratch.begin(), scratch.end());
            enter_block(tl.funcs[callee].body);
          }
          break;
        }
        case OP_STORE: {
          scratch.clear();
          for (u32 v : op.xs) scratch.push_back(V[v]);
          int mi = mem_index_from_len(scratch.size());
          if (mi < 0) { st.error = "bad mem width"; return false; }
          auto [i, inserted] = st.mem_maps[mi].get_or_insert(scratch.data());
          if (inserted) st.mem_provide[mi].push_back({});
          Record& res = st.mem_provide[mi][i];
          vstack.push_back(i + 1);
          hstack.push_back(i + 1);
          rstack.push_back(res.nonce);
          rstack.push_back(res.count);
          res.nonce = nonce;
          res.count += 1;
          break;
        }
        case OP_LOAD: {
          u32 ptr = V[op.b];
          int mi = mem_index_from_len(op.a);
          FlatMap& mm = st.mem_maps[mi];
          if (ptr == 0 || ptr > mm.count) { st.error = "Unbound pointer"; return false; }
          const u32* vals = mm.key(ptr - 1);
          Record& res = st.mem_provide[mi][ptr - 1];
          vstack.insert(vstack.end(), vals, vals + mm.stride);
          hstack.insert(hstack.end(), vals, vals + mm.stride);
          rstack.push_back(res.nonce);
          rstack.push_back(res.count);
          res.nonce = nonce;
          res.count += 1;
          break;
        }
        case OP_EXTERN: {
          scratch.clear();
          for (u32 v : op.xs) scratch.push_back(V[v]);
          outbuf.clear();
          if (!run_extern(st, op.a, scratch.data(), nonce, rstack, outbuf))
            return false;
          vstack.insert(vstack.end(), outbuf.begin(), outbuf.end());
          break;
        }
        case OP_EMIT: {
          std::vector<u32> vals;
          for (u32 v : op.xs) vals.push_back(V[v]);
          st.emitted.push_back(std::move(vals));
          break;
        }
        case OP_RANGE_U8: {
          st.bytes.requires_ = &rstack;
          st.bytes.nonce = nonce;
          for (size_t i = 0; i < op.xs.size(); i += 2) {
            u32 a = V[op.xs[i]];
            u32 b = i + 1 < op.xs.size() ? V[op.xs[i + 1]] : 0;
            if (a > 255 || b > 255) { st.error = "not in u8 range"; return false; }
            st.bytes.range_u8_pair(a, b);
          }
          break;
        }
        case OP_BREAKPOINT: case OP_DEBUG: break;
      }
    } else {
      const Ctrl& c = *f.ctrl;
      const u32* V = vstack.data() + vbase;
      if (c.tag == CTRL_RETURN) {
        outbuf.clear();
        for (u32 v : c.vals) outbuf.push_back(V[v]);
        FuncQueries& q = st.func_queries[func_index];
        if (tl.funcs[func_index].invertible)
          st.inv_set(func_index, outbuf.data(), q.map.key(nonce),
                     q.map.stride);
        if (partial) {
          st.bytes.requires_ = &qstack;
          st.bytes.nonce = nonce;
          u32 depth = 0;
          for (size_t i = dbase; i < dstack.size(); i++)
            depth = std::max(depth, dstack[i] + 1);
          for (int i = 0; i < 4; i += 2)
            st.bytes.range_u8_pair((depth >> (8 * i)) & 0xFF,
                                   (depth >> (8 * (i + 1))) & 0xFF);
          for (size_t i = dbase; i < dstack.size(); i++)
            depth_less_than_lookups(dstack[i], depth, st.bytes);
          q.depth[nonce] = depth;
        }
        std::memcpy(q.out.data() + (size_t)nonce * q.out_stride,
                    outbuf.data(), outbuf.size() * sizeof(u32));
        q.done[nonce] = 1;
        q.path[nonce] = c.ident;
        q.req_off[nonce] = (u32)q.req_arena.size();
        q.req_len[nonce] = (u32)(rstack.size() - rbase);
        q.req_arena.insert(q.req_arena.end(), rstack.begin() + rbase,
                           rstack.end());
        q.dreq_off[nonce] = (u32)q.dreq_arena.size();
        q.dreq_len[nonce] = (u32)(qstack.size() - qbase);
        q.dreq_arena.insert(q.dreq_arena.end(), qstack.begin() + qbase,
                            qstack.end());
        q.hint_off[nonce] = (u32)q.hint_arena.size();
        q.hint_len[nonce] = (u32)(hstack.size() - hbase);
        q.hint_arena.insert(q.hint_arena.end(), hstack.begin() + hbase,
                            hstack.end());
        frames.pop_back();
        if (!callers.empty()) {
          CallerCtx cs = callers.back();
          callers.pop_back();
          bool callee_partial = partial;
          u32 callee_idx = func_index, callee_nonce = nonce;
          // drop the callee's stack segments, restore the caller's bases
          vstack.resize(vbase);
          rstack.resize(rbase);
          dstack.resize(dbase);
          qstack.resize(qbase);
          hstack.resize(hbase);
          func_index = cs.func_index;
          nonce = cs.nonce;
          vbase = cs.vbase;
          rbase = cs.rbase;
          dbase = cs.dbase;
          qbase = cs.qbase;
          hbase = cs.hbase;
          partial = tl.funcs[func_index].partial;
          FuncQueries& cq = st.func_queries[callee_idx];
          const u32* ext;
          u32 ext_n;
          if (cs.preimg) {
            ext = cq.map.key(callee_nonce);
            ext_n = cq.map.stride;
          } else {
            ext = cq.out.data() + (size_t)callee_nonce * cq.out_stride;
            ext_n = cq.out_stride;
          }
          vstack.insert(vstack.end(), ext, ext + ext_n);
          hstack.insert(hstack.end(), ext, ext + ext_n);
          Record& pr = cq.provide[callee_nonce];
          rstack.push_back(pr.nonce);
          rstack.push_back(pr.count);
          pr.nonce = nonce;
          pr.count += 1;
          if (partial && callee_partial) {
            dstack.push_back(cq.depth[callee_nonce]);
            hstack.push_back(cq.depth[callee_nonce]);
          }
        } else {
          // entry function returned
          u32 final_depth = 0;
          for (size_t i = dbase; i < dstack.size(); i++)
            final_depth = std::max(final_depth, dstack[i] + 1);
          st.public_values = args;
          st.public_values.insert(st.public_values.end(), outbuf.begin(),
                                  outbuf.end());
          if (tl.funcs[entry_idx].partial)
            for (int i = 0; i < 4; i++)
              st.public_values.push_back((final_depth >> (8 * i)) & 0xFF);
          return true;
        }
      } else if (c.tag == CTRL_CHOOSE) {
        u32 v = V[c.var];
        const Block* blk = nullptr;
        for (size_t i = 0; i < c.branch_keys.size(); i++) {
          for (u32 k : c.branch_keys[i])
            if (k == v) { blk = c.branches[i].get(); break; }
          if (blk) break;
        }
        if (!blk) blk = c.dflt.get();
        if (!blk) { st.error = "No match"; return false; }
        replace_block(*blk);
      } else {  // CHOOSE_MANY
        const Block* blk = nullptr;
        for (size_t i = 0; i < c.branch_keys.size(); i++) {
          bool eq = true;
          for (size_t j = 0; j < c.vals.size(); j++)
            if (V[c.vals[j]] != c.branch_keys[i][j]) { eq = false; break; }
          if (eq) { blk = c.branches[i].get(); break; }
        }
        if (!blk) blk = c.dflt.get();
        if (!blk) { st.error = "No match"; return false; }
        replace_block(*blk);
      }
    }
  }
  st.error = "exec stack drained without return";
  return false;
}

}  // namespace

// ---------------------------------------------------------------------------
// persistent worker pool
//
// Thread creation on the shared 4-vCPU serving hosts measures ~0.5-1ms -
// spawning per parallel_for call made mid-sized kernels SLOWER than serial
// (ext_emul at 4096 rows: 3.8ms spawned vs 0.2ms serial work). Workers are
// created once on first use and parked on a condition variable; dispatch
// cost is one lock + notify (~5us). The pool object is intentionally
// leaked so no destructor races python interpreter shutdown; the threads
// die with the process.
// ---------------------------------------------------------------------------

class WorkerPool {
  struct Job {
    std::function<void(u64)> fn;   // fn(chunk_index)
    u64 nchunks = 0;
    std::atomic<u64> next{0};
    std::atomic<u64> done{0};
    std::mutex m;
    std::condition_variable cv;

    void work() {
      for (;;) {
        u64 i = next.fetch_add(1, std::memory_order_relaxed);
        if (i >= nchunks) return;
        fn(i);
        if (done.fetch_add(1, std::memory_order_acq_rel) + 1 == nchunks) {
          std::lock_guard<std::mutex> lk(m);
          cv.notify_all();
        }
      }
    }
  };

 public:
  static WorkerPool& inst() {
    static WorkerPool* p = new WorkerPool();   // leaked on purpose
    return *p;
  }

  u64 size() const { return n_workers_ + 1; }  // caller lends a hand

  // run fn(chunk_index) for i in [0, nchunks); blocks until all complete
  void run_chunks(u64 nchunks, std::function<void(u64)> fn) {
    auto job = std::make_shared<Job>();
    job->fn = std::move(fn);
    job->nchunks = nchunks;
    u64 helpers = std::min<u64>(n_workers_, nchunks - 1);
    if (helpers) {
      std::lock_guard<std::mutex> lk(m_);
      for (u64 t = 0; t < helpers; t++) q_.push_back(job);
    }
    if (helpers) cv_.notify_all();
    job->work();   // caller participates
    std::unique_lock<std::mutex> lk(job->m);
    job->cv.wait(lk, [&] {
      return job->done.load(std::memory_order_acquire) >= nchunks;
    });
  }

 private:
  WorkerPool() {
    u64 n = std::min<u64>(std::thread::hardware_concurrency(), 8);
    n_workers_ = n > 1 ? n - 1 : 0;
    for (u64 i = 0; i < n_workers_; i++) {
      std::thread([this]() {
        for (;;) {
          std::shared_ptr<Job> job;
          {
            std::unique_lock<std::mutex> lk(m_);
            cv_.wait(lk, [&] { return !q_.empty(); });
            job = std::move(q_.front());
            q_.pop_front();
          }
          job->work();
        }
      }).detach();
    }
  }

  u64 n_workers_ = 0;
  std::mutex m_;
  std::condition_variable cv_;
  std::deque<std::shared_ptr<Job>> q_;
};

// Helper: run fn(lo, hi) over [0, n) across the worker pool.
template <typename F>
void parallel_for(u64 n, u64 min_serial, F fn) {
  static thread_local bool in_pool_task = false;
  u64 nthreads = std::min<u64>(std::thread::hardware_concurrency(), 8);
  if (nthreads <= 1 || n < min_serial || in_pool_task) {
    fn((u64)0, n);
    return;
  }
  WorkerPool& pool = WorkerPool::inst();
  // 2x oversubscription: chunks are claimed via an atomic counter, so
  // extra chunks give load balance at negligible dispatch cost. n >=
  // min_serial already says the job is worth threading - don't let a
  // small n (of expensive items, e.g. wide sponge rows) under-split.
  u64 nchunks = std::min<u64>(2 * pool.size(), n);
  if (nchunks <= 1) {
    fn((u64)0, n);
    return;
  }
  u64 chunk = (n + nchunks - 1) / nchunks;
  pool.run_chunks(nchunks, [&](u64 i) {
    u64 lo = i * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) return;
    in_pool_task = true;
    fn(lo, hi);
    in_pool_task = false;
  });
}

// ---------------------------------------------------------------------------
// record serialization (see native_codec.py docstring for layout)
//
// The size is computed arithmetically (the SoA layout makes every section
// length known up front) and the record is written directly into the
// caller's buffer in one pass - the old path built a 100M+ element
// std::vector by push_back and then memcpy'd it, which cost more than the
// execution itself on large records.
// ---------------------------------------------------------------------------

static u64 record_total_size(const Interp& st) {
  const Toplevel& tl = *st.tl;
  u64 sz = 1;
  for (size_t f = 0; f < tl.funcs.size(); f++) {
    const FuncQueries& q = st.func_queries[f];
    u64 n = q.map.count;
    // n; keys n*in; outs n*out; provide 2n; depth n; path n;
    // three var streams: (n+1) offsets + arena each
    sz += 1 + n * ((u64)q.map.stride + q.out_stride + 4)
        + 3 * (n + 1) + q.req_arena.size() + q.dreq_arena.size()
        + q.hint_arena.size();
  }
  for (int m = 0; m < 6; m++)
    sz += 1 + (u64)st.mem_maps[m].count * (st.mem_maps[m].stride + 2);
  u64 touched = 0;
  for (const auto& a : st.bytes.recs)
    for (int s = 0; s < 6; s++)
      if (a[s].count) { touched++; break; }
  sz += 1 + touched * 13;
  u64 em = 0;
  for (const auto& v : st.emitted) em += v.size();
  sz += 1 + (st.emitted.size() + 1) + em;
  sz += 1 + st.public_values.size();
  return sz;
}

static void record_write(const Interp& st, u32* w) {
  const Toplevel& tl = *st.tl;
  auto put = [&](u32 v) { *w++ = v; };
  auto put_block = [&](const u32* src, u64 n) {
    std::memcpy(w, src, n * sizeof(u32));
    w += n;
  };
  put((u32)tl.funcs.size());
  for (size_t f = 0; f < tl.funcs.size(); f++) {
    const FuncQueries& q = st.func_queries[f];
    u64 n = q.map.count;
    put((u32)n);
    put_block(q.map.keys.data(), n * q.map.stride);
    put_block(q.out.data(), n * q.out_stride);
    // Record is two u32s; the vector is exactly the (nonce,count) stream
    put_block((const u32*)q.provide.data(), n * 2);
    // variable-length stream: [0, cum lens...] then data gathered from the
    // return-order arena into index order (parallel - the hints stream is
    // the bulk of the record)
    auto emit_var = [&](const std::vector<u32>& offs,
                        const std::vector<u32>& lens,
                        const std::vector<u32>& arena) {
      u32* offs_out = w;
      u32 acc = 0;
      put(0);
      for (u64 i = 0; i < n; i++) {
        acc += lens[i];
        put(acc);
      }
      u32* data_out = w;
      const u32* src = arena.data();
      parallel_for(n, 1 << 14, [&](u64 lo, u64 hi) {
        for (u64 i = lo; i < hi; i++)
          std::memcpy(data_out + offs_out[i], src + offs[i],
                      (u64)lens[i] * sizeof(u32));
      });
      w += arena.size();
    };
    emit_var(q.req_off, q.req_len, q.req_arena);
    put_block(q.depth.data(), n);
    emit_var(q.dreq_off, q.dreq_len, q.dreq_arena);
    put_block(q.path.data(), n);
    emit_var(q.hint_off, q.hint_len, q.hint_arena);
  }
  for (int m = 0; m < 6; m++) {
    const FlatMap& mm = st.mem_maps[m];
    put(mm.count);
    put_block(mm.keys.data(), (u64)mm.count * mm.stride);
    put_block((const u32*)st.mem_provide[m].data(), (u64)mm.count * 2);
  }
  // bytes: ascending input order (direct-indexed table is already sorted)
  {
    u32* count_slot = w++;
    u32 touched = 0;
    for (u32 in = 0; in < (u32)st.bytes.recs.size(); in++) {
      const auto& recs = st.bytes.recs[in];
      bool any = false;
      for (int s = 0; s < 6; s++) any = any || recs[s].count;
      if (!any) continue;
      touched++;
      put(in);
      put_block((const u32*)recs.data(), 12);
    }
    *count_slot = touched;
  }
  // emitted
  {
    put((u32)st.emitted.size());
    u32 off = 0;
    put(off);
    for (const auto& v : st.emitted) {
      off += (u32)v.size();
      put(off);
    }
    for (const auto& v : st.emitted) put_block(v.data(), v.size());
  }
  put((u32)st.public_values.size());
  put_block(st.public_values.data(), st.public_values.size());
}

extern "C" {

void* lair_toplevel_new(const u32* code, u64 code_len,
                        const u32* pconsts, u64 pconsts_len) {
  auto* tl = new Toplevel();
  Reader r{code, code + code_len};
  u32 n_funcs = r.next();
  u32 n_chips = r.next();
  tl->chips.resize(n_chips);
  for (u32 i = 0; i < n_chips; i++) {
    tl->chips[i].kind = r.next();
    tl->chips[i].input_size = r.next();
    tl->chips[i].output_size = r.next();
    tl->chips[i].witness_size = r.next();
    tl->chips[i].require_size = r.next();
  }
  tl->funcs.resize(n_funcs);
  for (u32 i = 0; i < n_funcs; i++) {
    Func& f = tl->funcs[i];
    f.invertible = r.next() != 0;
    f.partial = r.next() != 0;
    f.input_size = r.next();
    f.output_size = r.next();
    decode_block(r, f.body);
  }
  // poseidon constants stream: per width (3x): width, r_f, r_p, full, part, diag
  Reader pr{pconsts, pconsts + pconsts_len};
  for (int k = 0; k < 3; k++) {
    PoseidonCfg& c = tl->pcfg[k];
    c.width = pr.next();
    c.r_f = pr.next();
    c.r_p = pr.next();
    c.full_rc.resize((size_t)c.r_f * c.width);
    for (auto& x : c.full_rc) x = pr.next();
    c.part_rc.resize(c.r_p);
    for (auto& x : c.part_rc) x = pr.next();
    c.diag.resize(c.width);
    for (auto& x : c.diag) x = pr.next();
  }
  return tl;
}

void lair_toplevel_free(void* tl) { delete (Toplevel*)tl; }

// inv_inject stream: [n_blocks, per block: func_idx, n_entries, out_size,
// in_size, then n_entries * (out..., in...)]
void* lair_execute(void* tl_ptr, u32 func_idx, const u32* args, u64 n_args,
                   const u32* inv_inject, u64 inv_len, int* status) {
  auto* tl = (Toplevel*)tl_ptr;
  auto* st = new Interp(tl);
  if (inv_len) {
    Reader r{inv_inject, inv_inject + inv_len};
    u32 n_blocks = r.next();
    for (u32 b = 0; b < n_blocks; b++) {
      u32 fi = r.next(), n = r.next(), osz = r.next(), isz = r.next();
      for (u32 i = 0; i < n; i++) {
        const u32* o = r.p;
        r.p += osz;
        const u32* in = r.p;
        r.p += isz;
        st->inv_inject(fi, o, in, isz);
      }
    }
  }
  std::vector<u32> argv(args, args + n_args);
  bool ok = execute_func(*st, func_idx, argv);
  *status = ok ? 0 : 1;
  return st;
}

u64 lair_record_size(void* st_ptr) {
  return record_total_size(*(Interp*)st_ptr);
}

void lair_record_copy(void* st_ptr, u32* out) {
  record_write(*(Interp*)st_ptr, out);
}

const char* lair_error(void* st_ptr) { return ((Interp*)st_ptr)->error.c_str(); }

void lair_record_free(void* st_ptr) { delete (Interp*)st_ptr; }

// Componentwise degree-4 extension product over F_p[x]/(x^4 - 11):
// a, b, out are (n, 4) row-major canonical u32 (out may alias a).
// 4 partial products per coefficient stay under 2^64 (4 * (p-1)^2).
void lair_ext_emul(const u32* a, const u32* b, u32* out, u64 n) {
  constexpr u64 W = 11;
  parallel_for(n, 1 << 12, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++) {
      const u32* x = a + r * 4;
      const u32* y = b + r * 4;
      u64 c[7] = {0, 0, 0, 0, 0, 0, 0};
      for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++)
          c[i + j] += (u64)x[i] * y[j];
      u32* o = out + r * 4;
      for (int i = 0; i < 3; i++)
        o[i] = (u32)((c[i] % P + W * (c[i + 4] % P)) % P);
      o[3] = (u32)(c[3] % P);
    }
  });
}

// Extension element times base scalar: a (n,4), s (n), out (n,4).
void lair_ext_escale(const u32* a, const u32* s, u32* out, u64 n) {
  parallel_for(n, 1 << 13, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++)
      for (int i = 0; i < 4; i++)
        out[r * 4 + i] = fmul(a[r * 4 + i], s[r]);
  });
}

// (n,k) @ (k,m) mod p with a 128-bit accumulator, threaded over rows.
void lair_matmul_mod(const u32* a, const u32* b, u32* out, u64 n, u64 k,
                     u64 m) {
  parallel_for(n, 64, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++) {
      const u32* row = a + r * k;
      for (u64 c = 0; c < m; c++) {
        unsigned __int128 acc = 0;
        for (u64 i = 0; i < k; i++) acc += (u64)row[i] * b[i * m + c];
        out[r * m + c] = (u32)(acc % P);
      }
    }
  });
}

// u64-I/O variants of the extension kernels: numpy's ext arrays are
// uint64, so reading/writing u64 directly avoids two full converting
// copies per call.
void lair_ext_emul64(const u64* a, const u64* b, u64* out, u64 n) {
  constexpr u64 W = 11;
  parallel_for(n, 1 << 12, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++) {
      const u64* x = a + r * 4;
      const u64* y = b + r * 4;
      u64 c[7] = {0, 0, 0, 0, 0, 0, 0};
      for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++)
          c[i + j] += (u64)(u32)x[i] * (u32)y[j];
      u64* o = out + r * 4;
      for (int i = 0; i < 3; i++)
        o[i] = (c[i] % P + W * (c[i + 4] % P)) % P;
      o[3] = c[3] % P;
    }
  });
}

void lair_ext_escale64(const u64* a, const u64* s, u64* out, u64 n) {
  parallel_for(n, 1 << 13, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++)
      for (int i = 0; i < 4; i++)
        out[r * 4 + i] = (a[r * 4 + i] * s[r]) % P;
  });
}

void lair_ext_eadd64(const u64* a, const u64* b, u64* out, u64 n_elems) {
  parallel_for(n_elems, 1 << 15, [=](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; i++) out[i] = (a[i] + b[i]) % P;
  });
}

// Batched Fermat inversion: out[i] = a[i]^(p-2) mod p (0 -> 0).
void lair_batch_inv64(const u64* a, u64* out, u64 n) {
  parallel_for(n, 1 << 10, [=](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; i++) out[i] = fpow((u32)(a[i] % P), P - 2);
  });
}

// Row-wise scaling: out[r][c] = mat[r][c] * scales[r % n_scales] mod p
// (n_scales == 1 broadcasts a constant). u64 I/O, threaded.
void lair_scale_rows64(const u64* mat, const u64* scales, u64* out, u64 n,
                       u64 w, u64 n_scales) {
  parallel_for(n, 1 << 12, [=](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; r++) {
      u64 s = scales[n_scales == 1 ? 0 : r];
      for (u64 c = 0; c < w; c++)
        out[r * w + c] = (mat[r * w + c] * s) % P;
    }
  });
}

// Full sponge hashing of rows: each (w)-felt row absorbed in rate-8
// chunks (zero-padded) through the width-16 permutation; out = (n, 8).
void lair_hash_rows(const u32* consts, u64 consts_len, const u64* mat,
                    u64 n, u64 w, u32* out) {
  PoseidonCfg cfg;
  Reader pr{consts, consts + consts_len};
  cfg.width = pr.next();
  cfg.r_f = pr.next();
  cfg.r_p = pr.next();
  cfg.full_rc.resize((size_t)cfg.r_f * cfg.width);
  for (auto& x : cfg.full_rc) x = pr.next();
  cfg.part_rc.resize(cfg.r_p);
  for (auto& x : cfg.part_rc) x = pr.next();
  cfg.diag.resize(cfg.width);
  for (auto& x : cfg.diag) x = pr.next();
#ifdef LAIR_P2_AVX512
  p2v::CfgMont mcfg(cfg);
  parallel_for(n, 64, [&, n, w](u64 lo, u64 hi) {
    const u32 W = cfg.width;
    __m512i s[48];                 // max config width; stack = aligned
    alignas(64) u64 tmp[8];
    const __m512i r2 = p2v::vset(p2v::R2), one = p2v::vset(1);
    u64 r = lo;
    for (; r + 8 <= hi && w; r += 8) {
      for (u32 c = 0; c < W; c++) s[c] = _mm512_setzero_si512();
      for (u64 c = 0; c < w; c += 8) {
        for (u64 j = 0; j < 8; j++) {
          if (c + j < w) {
            for (u32 q = 0; q < 8; q++)
              tmp[q] = mat[(r + q) * w + c + j] % P;
            s[j] = p2v::mont_mul(_mm512_load_si512(tmp), r2);
          } else {
            s[j] = _mm512_setzero_si512();
          }
        }
        p2v::perm8(mcfg, s);
      }
      for (u32 j = 0; j < 8; j++) {
        _mm512_store_si512(tmp, p2v::mont_mul(s[j], one));
        for (u32 q = 0; q < 8; q++) out[(r + q) * 8 + j] = (u32)tmp[q];
      }
    }
    std::vector<u32> sc(cfg.width);
    for (; r < hi; r++) {
      std::fill(sc.begin(), sc.end(), 0);
      if (w == 0) {
        poseidon2(cfg, sc.data());
      } else {
        for (u64 c = 0; c < w; c += 8) {
          for (u64 j = 0; j < 8; j++)
            sc[j] = c + j < w ? (u32)(mat[r * w + c + j] % P) : 0;
          poseidon2(cfg, sc.data());
        }
      }
      for (int j = 0; j < 8; j++) out[r * 8 + j] = sc[j];
    }
  });
#elif defined(LAIR_P2_SSE)
  p2s::CfgMont mcfg(cfg);
  parallel_for(n, 64, [&, n, w](u64 lo, u64 hi) {
    const u32 W = cfg.width;
    __m128i s[48];
    alignas(16) u32 tmp[4];
    const __m128i r2 = p2s::vset(p2s::R2), one = p2s::vset(1);
    u64 r = lo;
    for (; r + 4 <= hi && w; r += 4) {
      for (u32 c = 0; c < W; c++) s[c] = _mm_setzero_si128();
      for (u64 c = 0; c < w; c += 8) {
        for (u64 j = 0; j < 8; j++) {
          if (c + j < w) {
            for (u32 q = 0; q < 4; q++)
              tmp[q] = (u32)(mat[(r + q) * w + c + j] % P);
            s[j] = p2s::mont_mul(_mm_load_si128((const __m128i*)tmp), r2);
          } else {
            s[j] = _mm_setzero_si128();
          }
        }
        p2s::perm4(mcfg, s);
      }
      for (u32 j = 0; j < 8; j++) {
        _mm_store_si128((__m128i*)tmp, p2s::mont_mul(s[j], one));
        for (u32 q = 0; q < 4; q++) out[(r + q) * 8 + j] = tmp[q];
      }
    }
    std::vector<u32> sc(cfg.width);
    for (; r < hi; r++) {
      std::fill(sc.begin(), sc.end(), 0);
      if (w == 0) {
        poseidon2(cfg, sc.data());
      } else {
        for (u64 c = 0; c < w; c += 8) {
          for (u64 j = 0; j < 8; j++)
            sc[j] = c + j < w ? (u32)(mat[r * w + c + j] % P) : 0;
          poseidon2(cfg, sc.data());
        }
      }
      for (int j = 0; j < 8; j++) out[r * 8 + j] = sc[j];
    }
  });
#else
  parallel_for(n, 64, [&, n, w](u64 lo, u64 hi) {
    std::vector<u32> s(cfg.width);
    for (u64 r = lo; r < hi; r++) {
      std::fill(s.begin(), s.end(), 0);
      if (w == 0) {
        poseidon2(cfg, s.data());
      } else {
        for (u64 c = 0; c < w; c += 8) {
          for (u64 j = 0; j < 8; j++)
            s[j] = c + j < w ? (u32)(mat[r * w + c + j] % P) : 0;
          poseidon2(cfg, s.data());
        }
      }
      for (int j = 0; j < 8; j++) out[r * 8 + j] = s[j];
    }
  });
#endif
}

// Merkle path walk for a batch of opening-verification jobs (the verifier's
// MultiVerifier.run hot loop, stark/merkle.py). Jobs are pre-sorted by depth
// descending and concatenated, so the rows active at level k form the prefix
// [0, active[k]). Per level, each active row compresses
// [left || right] = parity-select(idx, digest, sibling) through the width-16
// permutation, keeping the first 8 limbs. dig (n, 8) u32 holds leaf digests
// in and final (per-job root candidates) out; paths is (n, max_depth, 8) u64
// (rows beyond a job's depth are ignored); idx (n,) is shifted in place.
// Sibling u64 values truncate to u32 exactly like lair_poseidon_batch's
// callers do (np.uint32 cast), preserving the python path's acceptance set.
void lair_merkle_walk(const u32* consts, u64 consts_len, u32* dig,
                      const u64* paths, u64* idx, const u64* active,
                      u64 n, u64 max_depth) {
  PoseidonCfg cfg;
  Reader pr{consts, consts + consts_len};
  cfg.width = pr.next();
  cfg.r_f = pr.next();
  cfg.r_p = pr.next();
  cfg.full_rc.resize((size_t)cfg.r_f * cfg.width);
  for (auto& x : cfg.full_rc) x = pr.next();
  cfg.part_rc.resize(cfg.r_p);
  for (auto& x : cfg.part_rc) x = pr.next();
  cfg.diag.resize(cfg.width);
  for (auto& x : cfg.diag) x = pr.next();
  if (cfg.width != 16) return;   // STARK config hasher is width 16
#ifdef LAIR_P2_AVX512
  p2v::CfgMont mcfg(cfg);
#elif defined(LAIR_P2_SSE)
  p2s::CfgMont mcfg(cfg);
#endif
  for (u64 k = 0; k < max_depth; k++) {
    u64 m = active[k];
    auto level = [&, k](u64 lo, u64 hi) {
      u32 in[8][16];
      u64 r = lo;
#ifdef LAIR_P2_AVX512
      alignas(64) u64 tmp[8];
      __m512i s[16];
      const __m512i r2 = p2v::vset(p2v::R2), one = p2v::vset(1);
      for (; r + 8 <= hi; r += 8) {
        for (u32 q = 0; q < 8; q++) {
          const u64* sib = paths + ((r + q) * max_depth + k) * 8;
          const u32* d = dig + (r + q) * 8;
          bool odd = idx[r + q] & 1;
          for (int j = 0; j < 8; j++) {
            in[q][j] = odd ? (u32)sib[j] : d[j];
            in[q][8 + j] = odd ? d[j] : (u32)sib[j];
          }
        }
        for (u32 c = 0; c < 16; c++) {
          for (u32 q = 0; q < 8; q++) tmp[q] = in[q][c];
          s[c] = p2v::mont_mul(_mm512_load_si512(tmp), r2);
        }
        p2v::perm8(mcfg, s);
        for (u32 c = 0; c < 8; c++) {
          _mm512_store_si512(tmp, p2v::mont_mul(s[c], one));
          for (u32 q = 0; q < 8; q++) dig[(r + q) * 8 + c] = (u32)tmp[q];
        }
      }
#elif defined(LAIR_P2_SSE)
      alignas(16) u32 tmp[4];
      __m128i s[16];
      const __m128i r2 = p2s::vset(p2s::R2), one = p2s::vset(1);
      for (; r + 4 <= hi; r += 4) {
        for (u32 q = 0; q < 4; q++) {
          const u64* sib = paths + ((r + q) * max_depth + k) * 8;
          const u32* d = dig + (r + q) * 8;
          bool odd = idx[r + q] & 1;
          for (int j = 0; j < 8; j++) {
            in[q][j] = odd ? (u32)sib[j] : d[j];
            in[q][8 + j] = odd ? d[j] : (u32)sib[j];
          }
        }
        for (u32 c = 0; c < 16; c++) {
          for (u32 q = 0; q < 4; q++) tmp[q] = in[q][c];
          s[c] = p2s::mont_mul(_mm_load_si128((const __m128i*)tmp), r2);
        }
        p2s::perm4(mcfg, s);
        for (u32 c = 0; c < 8; c++) {
          _mm_store_si128((__m128i*)tmp, p2s::mont_mul(s[c], one));
          for (u32 q = 0; q < 4; q++) dig[(r + q) * 8 + c] = tmp[q];
        }
      }
#endif
      for (; r < hi; r++) {
        const u64* sib = paths + (r * max_depth + k) * 8;
        const u32* d = dig + r * 8;
        bool odd = idx[r] & 1;
        for (int j = 0; j < 8; j++) {
          in[0][j] = odd ? (u32)sib[j] : d[j];
          in[0][8 + j] = odd ? d[j] : (u32)sib[j];
        }
        poseidon2(cfg, in[0]);
        for (int j = 0; j < 8; j++) dig[r * 8 + j] = in[0][j];
      }
    };
    parallel_for(m, 128, level);
    for (u64 r = 0; r < m; r++) idx[r] >>= 1;
  }
}

// In-place radix-2 DIT NTT stages over a (n, w) row-major matrix whose rows
// were already bit-reverse permuted by the caller. `twiddles` is the
// concatenation of per-stage canonical twiddle tables (stage s has 2^s
// entries), matching lurk_tpu/field/ntt.py::_stage_twiddles. Butterflies
// run along rows (all w columns per pair), threaded over butterfly blocks.
void lair_ntt_stages(u32* data, u64 n, u64 w, const u32* twiddles) {
  u64 nthreads = std::min<u64>(std::thread::hardware_concurrency(), 8);
  const u32* stage_tw = twiddles;
  for (u64 m = 1; m < n; m <<= 1) {
    // blocks of size 2m: rows [blk, blk+m) pair with [blk+m, blk+2m);
    // parallelize over the n/2 independent butterflies (blk, j)
    u64 n_bfly = n / 2;
    auto run = [&](u64 lo, u64 hi) {
      for (u64 idx = lo; idx < hi; idx++) {
        u64 blk = idx / m, j = idx % m;
        u32 tw = stage_tw[j];
        u32* a = data + (blk * 2 * m + j) * w;
        u32* b = a + m * w;
        for (u64 c = 0; c < w; c++) {
          u32 tb = fmul(b[c], tw);
          u32 top = fadd(a[c], tb);
          b[c] = fsub(a[c], tb);
          a[c] = top;
        }
      }
    };
    if (nthreads <= 1 || n_bfly * w < (1u << 15)) {
      run(0, n_bfly);
    } else {
      parallel_for(n_bfly, 1, run);
    }
    stage_tw += m;
  }
}

// Standalone batched Poseidon2 permutation (any width), used by the python
// prover's Merkle hashing / challenger host paths. `consts` stream:
// width, r_f, r_p, full_rc (r_f*width), part_rc (r_p), diag (width).
// input/output: n rows of `width` canonical u32 felts (may alias).
void lair_poseidon_batch(const u32* consts, u64 consts_len, const u32* input,
                         u32* output, u64 n) {
  PoseidonCfg cfg;
  Reader pr{consts, consts + consts_len};
  cfg.width = pr.next();
  cfg.r_f = pr.next();
  cfg.r_p = pr.next();
  cfg.full_rc.resize((size_t)cfg.r_f * cfg.width);
  for (auto& x : cfg.full_rc) x = pr.next();
  cfg.part_rc.resize(cfg.r_p);
  for (auto& x : cfg.part_rc) x = pr.next();
  cfg.diag.resize(cfg.width);
  for (auto& x : cfg.diag) x = pr.next();

  u32 w = cfg.width;
#ifdef LAIR_P2_AVX512
  p2v::CfgMont mcfg(cfg);
  auto run = [&](u64 lo, u64 hi) {
    __m512i s[48];                 // max config width; stack = aligned
    alignas(64) u64 tmp[8];
    u64 i = lo;
    const __m512i r2 = p2v::vset(p2v::R2), one = p2v::vset(1);
    for (; i + 8 <= hi; i += 8) {
      for (u32 c = 0; c < w; c++) {
        for (u32 r = 0; r < 8; r++) tmp[r] = input[(i + r) * w + c];
        s[c] = p2v::mont_mul(_mm512_load_si512(tmp), r2);
      }
      p2v::perm8(mcfg, s);
      for (u32 c = 0; c < w; c++) {
        _mm512_store_si512(tmp, p2v::mont_mul(s[c], one));
        for (u32 r = 0; r < 8; r++) output[(i + r) * w + c] = (u32)tmp[r];
      }
    }
    std::vector<u32> sc(w);
    for (; i < hi; i++) {
      std::copy(input + i * w, input + (i + 1) * w, sc.begin());
      poseidon2(cfg, sc.data());
      std::copy(sc.begin(), sc.end(), output + i * w);
    }
  };
#elif defined(LAIR_P2_SSE)
  p2s::CfgMont mcfg(cfg);
  auto run = [&](u64 lo, u64 hi) {
    __m128i s[48];                 // max config width
    alignas(16) u32 tmp[4];
    u64 i = lo;
    const __m128i r2 = p2s::vset(p2s::R2), one = p2s::vset(1);
    for (; i + 4 <= hi; i += 4) {
      for (u32 c = 0; c < w; c++) {
        for (u32 r = 0; r < 4; r++) tmp[r] = input[(i + r) * w + c];
        s[c] = p2s::mont_mul(_mm_load_si128((const __m128i*)tmp), r2);
      }
      p2s::perm4(mcfg, s);
      for (u32 c = 0; c < w; c++) {
        _mm_store_si128((__m128i*)tmp, p2s::mont_mul(s[c], one));
        for (u32 r = 0; r < 4; r++) output[(i + r) * w + c] = tmp[r];
      }
    }
    std::vector<u32> sc(w);
    for (; i < hi; i++) {
      std::copy(input + i * w, input + (i + 1) * w, sc.begin());
      poseidon2(cfg, sc.data());
      std::copy(sc.begin(), sc.end(), output + i * w);
    }
  };
#else
  auto run = [&](u64 lo, u64 hi) {
    std::vector<u32> s(w);
    for (u64 i = lo; i < hi; i++) {
      std::copy(input + i * w, input + (i + 1) * w, s.begin());
      poseidon2(cfg, s.data());
      std::copy(s.begin(), s.end(), output + i * w);
    }
  };
#endif
  parallel_for(n, 256, run);
}

// Duplex-sponge challenger absorb (width 16, rate 8), the Fiat-Shamir
// hot loop (stark/challenger.py): writes `n` canonical values into the
// sponge, permuting on each full rate block. state: u32[16] in/out;
// inbuf: u32[8] partial-block buffer in/out; *inbuf_len in/out.
// Returns 1 if the LAST value absorbed completed a rate block (the
// python wrapper then exposes state[:8] as the output buffer), else 0.
u32 lair_challenger_observe(const u32* consts, u64 consts_len, u32* state,
                            u32* inbuf, u64* inbuf_len, const u32* values,
                            u64 n) {
  PoseidonCfg cfg;
  Reader pr{consts, consts + consts_len};
  cfg.width = pr.next();
  cfg.r_f = pr.next();
  cfg.r_p = pr.next();
  cfg.full_rc.resize((size_t)cfg.r_f * cfg.width);
  for (auto& x : cfg.full_rc) x = pr.next();
  cfg.part_rc.resize(cfg.r_p);
  for (auto& x : cfg.part_rc) x = pr.next();
  cfg.diag.resize(cfg.width);
  for (auto& x : cfg.diag) x = pr.next();
  const u64 RATE = 8;
  u64 k = *inbuf_len;
  u32 duplexed_last = 0;
  for (u64 i = 0; i < n; i++) {
    inbuf[k++] = values[i] % P;
    if (k == RATE) {
      for (u64 j = 0; j < RATE; j++) state[j] = inbuf[j];
      poseidon2(cfg, state);
      k = 0;
      duplexed_last = (i == n - 1);
    }
  }
  *inbuf_len = k;
  return duplexed_last;
}

// Constraint-VM evaluation over k extension-field instances (the
// verifier's batched zeta check - stark/machine.py): executes the same
// register program the device prover runs (stark/constraint_vm.py),
// with every value a degree-4 extension element. buf is (C, k, 4) u64
// canonical, ops (K, 4) i32 [opcode, dst, a, b]; opcodes 0=add 1=sub
// 2=mul (ext mul over F_p[x]/(x^4 - 11)).
void lair_vm_eval_ext(const int32_t* ops, u64 n_ops, u64* buf, u64 ncols,
                      u64 k) {
  constexpr u64 W = 11;
  const u64 lane = k * 4;
  for (u64 s = 0; s < n_ops; s++) {
    const int32_t* op = ops + s * 4;
    u64* d = buf + (u64)op[1] * lane;
    const u64* x = buf + (u64)op[2] * lane;
    const u64* y = buf + (u64)op[3] * lane;
    switch (op[0]) {
      case 0:
        for (u64 i = 0; i < lane; i++) {
          u64 v = x[i] + y[i];
          d[i] = v >= P ? v - P : v;
        }
        break;
      case 1:
        for (u64 i = 0; i < lane; i++)
          d[i] = x[i] >= y[i] ? x[i] - y[i] : x[i] + P - y[i];
        break;
      default:
        for (u64 r = 0; r < k; r++) {
          const u64* a = x + r * 4;
          const u64* b = y + r * 4;
          u64 c[7] = {0, 0, 0, 0, 0, 0, 0};
          for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++)
              c[i + j] += a[i] * b[j] % P;
          u64* o = d + r * 4;
          for (int i = 0; i < 3; i++)
            o[i] = (c[i] + W * (c[i + 4] % P)) % P;
          o[3] = c[3] % P;
        }
        break;
    }
  }
}

}  // extern "C"

// --- degree-4 extension helpers (F_p[x]/(x^4 - 11), canonical u64) -------

namespace ext4 {

inline void mul(const u64* a, const u64* b, u64* o) {
  constexpr u64 W = 11;
  u64 c[7] = {0, 0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++)
      c[i + j] += a[i] * b[j] % P;     // each term < P^2 pre-mod; sum < 2^33
  for (int i = 0; i < 3; i++) o[i] = (c[i] + W * (c[i + 4] % P)) % P;
  o[3] = c[3] % P;
}

inline void scale(const u64* a, u64 s, u64* o) {
  for (int i = 0; i < 4; i++) o[i] = a[i] * s % P;
}

inline u64 inv_base(u64 x) {           // Fermat x^(P-2)
  u64 r = 1, b = x % P, e = P - 2;
  while (e) {
    if (e & 1) r = r * b % P;
    b = b * b % P;
    e >>= 1;
  }
  return r;
}

// inverse via Frobenius conjugates: b = a^p * a^(p^2) * a^(p^3) (each a
// diagonal scale by frob[k]), a^-1 = b / N(a) with N(a) = (a*b)[0] in F_p.
// frob: (3, 4) scales for k = 1, 2, 3 (passed from field/ext.py so the
// constant lives in one place).
inline void inv(const u64* a, const u64* frob, u64* o) {
  u64 a1[4], a2[4], a3[4], b[4], n[4];
  for (int i = 0; i < 4; i++) {
    a1[i] = a[i] * frob[i] % P;
    a2[i] = a[i] * frob[4 + i] % P;
    a3[i] = a[i] * frob[8 + i] % P;
  }
  ext4::mul(a2, a3, b);
  ext4::mul(a1, b, b);
  ext4::mul(a, b, n);
  u64 ninv = inv_base(n[0]);
  for (int i = 0; i < 4; i++) o[i] = b[i] * ninv % P;
}

}  // namespace ext4

extern "C" {

// LogUp fingerprint/multiplicity row kernel from an affine interaction
// plan in CSR form (lurk_tpu/logup/affine.py), threaded over row blocks.
//   X (h, wx) u64 canonical columns [main | prep | first | last | trans]
//   dconst (nI, 4); term_off (nI+1) i32 into term_col (T) / term_w (T, 4)
//   mconst (nI) u64 (sign folded in); mt_off/mt_col/mt_w likewise
//   frob (3, 4) Frobenius scales (mode 0 only)
// mode 0 (perm trace):   out (h, nb*4), nb = (nI+1)/2:
//   phi_b = inv(d_{2b}) * m_{2b} + inv(d_{2b+1}) * m_{2b+1}
// mode 1 (quotient):     phi_in (h, nb*4) read, out (h, nb*4):
//   out_b = phi_b * d0 * d1 - (m0 * d1 + m1 * d0); an odd tail uses the
//   unit partner d1 = 1, m1 = 0 (the DAG path's singleton batch).
// Bit-exact vs the per-interaction numpy walk: every op is the same
// exact mod-p operation, and values are association-free.
void lair_logup_rows(const u64* X, u64 h, u64 wx, u64 n_inter,
                     const u64* dconst, const int32_t* term_off,
                     const int32_t* term_col, const u64* term_w,
                     const u64* mconst, const int32_t* mt_off,
                     const int32_t* mt_col, const u64* mt_w,
                     const u64* frob, const u64* phi_in, int32_t mode,
                     u64* out) {
  const u64 nI = n_inter;
  const u64 nb = (nI + 1) / 2;
  parallel_for(h, 256, [&](u64 lo, u64 hi) {
    std::vector<u64> d(nI * 4), m(nI), pre(nI * 4), inv_d(nI * 4);
    for (u64 r = lo; r < hi; r++) {
      const u64* xr = X + r * wx;
      for (u64 i = 0; i < nI; i++) {
        u64* di = &d[i * 4];
        for (int l = 0; l < 4; l++) di[l] = dconst[i * 4 + l];
        for (int32_t t = term_off[i]; t < term_off[i + 1]; t++) {
          u64 xv = xr[term_col[t]];
          const u64* w4 = term_w + (u64)t * 4;
          for (int l = 0; l < 4; l++)
            di[l] = (di[l] + w4[l] * xv) % P;
        }
        u64 mv = mconst[i];
        for (int32_t t = mt_off[i]; t < mt_off[i + 1]; t++)
          mv = (mv + mt_w[t] * xr[mt_col[t]]) % P;
        m[i] = mv;
      }
      u64* orow = out + r * nb * 4;
      if (mode == 0) {
        // batched inversion of all nI fingerprints (Montgomery trick)
        for (int l = 0; l < 4; l++) pre[l] = d[l];
        for (u64 i = 1; i < nI; i++)
          ext4::mul(&pre[(i - 1) * 4], &d[i * 4], &pre[i * 4]);
        u64 t4[4];
        ext4::inv(&pre[(nI - 1) * 4], frob, t4);
        for (u64 i = nI; i-- > 1;) {
          ext4::mul(t4, &pre[(i - 1) * 4], &inv_d[i * 4]);
          ext4::mul(t4, &d[i * 4], t4);
        }
        for (int l = 0; l < 4; l++) inv_d[l] = t4[l];
        for (u64 b = 0; b < nb; b++) {
          u64 acc[4];
          ext4::scale(&inv_d[(2 * b) * 4], m[2 * b], acc);
          if (2 * b + 1 < nI) {
            u64 c2[4];
            ext4::scale(&inv_d[(2 * b + 1) * 4], m[2 * b + 1], c2);
            for (int l = 0; l < 4; l++) acc[l] = (acc[l] + c2[l]) % P;
          }
          for (int l = 0; l < 4; l++) orow[b * 4 + l] = acc[l];
        }
      } else {
        const u64* prow = phi_in + r * nb * 4;
        for (u64 b = 0; b < nb; b++) {
          const u64* d0 = &d[(2 * b) * 4];
          u64 lhs[4], rhs[4], t0[4];
          ext4::mul(prow + b * 4, d0, lhs);
          if (2 * b + 1 < nI) {
            const u64* d1 = &d[(2 * b + 1) * 4];
            ext4::mul(lhs, d1, lhs);
            ext4::scale(d1, m[2 * b], rhs);
            ext4::scale(d0, m[2 * b + 1], t0);
            for (int l = 0; l < 4; l++) rhs[l] = (rhs[l] + t0[l]) % P;
          } else {
            rhs[0] = m[2 * b];
            rhs[1] = rhs[2] = rhs[3] = 0;
          }
          for (int l = 0; l < 4; l++)
            orow[b * 4 + l] = (lhs[l] + P - rhs[l]) % P;
        }
      }
    }
  });
}

// LogUp constraint values AT A POINT for k shard instances of one chip
// (the verifier's zeta check - machine._batched_zeta_checks). Same CSR
// plan as lair_logup_rows, but every value is a degree-4 extension
// element: X (k, wx, 4) opened column values, phi/phi_next (k, nb, 4)
// recombined batch columns, s_val/s_next/cums and the three selectors
// (k, 4). out (k, nb+3, 4) in host constraint order
// (batches..., first, transition, last). Bit-exact vs the numpy
// eval_perm_at_point_plan path (exact mod-p ops, association-free).
void lair_logup_point(const u64* X, u64 k, u64 wx, u64 n_inter,
                      const u64* dconst, const int32_t* term_off,
                      const int32_t* term_col, const u64* term_w,
                      const u64* mconst, const int32_t* mt_off,
                      const int32_t* mt_col, const u64* mt_w,
                      const u64* phi, const u64* phi_next,
                      const u64* s_val, const u64* s_next, const u64* cums,
                      const u64* sel_first, const u64* sel_trans,
                      const u64* sel_last, u64* out) {
  const u64 nI = n_inter;
  const u64 nb = (nI + 1) / 2;
  std::vector<u64> d(nI * 4), m(nI * 4);
  for (u64 j = 0; j < k; j++) {
    const u64* xj = X + j * wx * 4;
    for (u64 i = 0; i < nI; i++) {
      u64* di = &d[i * 4];
      u64* mi = &m[i * 4];
      for (int l = 0; l < 4; l++) di[l] = dconst[i * 4 + l];
      for (int32_t t = term_off[i]; t < term_off[i + 1]; t++) {
        const u64* xv = xj + (u64)term_col[t] * 4;
        const u64* w4 = term_w + (u64)t * 4;
        u64 prod[4];
        ext4::mul(w4, xv, prod);
        for (int l = 0; l < 4; l++) di[l] = (di[l] + prod[l]) % P;
      }
      mi[0] = mconst[i];
      mi[1] = mi[2] = mi[3] = 0;
      for (int32_t t = mt_off[i]; t < mt_off[i + 1]; t++) {
        const u64* xv = xj + (u64)mt_col[t] * 4;
        for (int l = 0; l < 4; l++)
          mi[l] = (mi[l] + mt_w[t] * xv[l]) % P;
      }
    }
    const u64* pj = phi + j * nb * 4;
    const u64* pnj = phi_next + j * nb * 4;
    u64* oj = out + j * (nb + 3) * 4;
    for (u64 b = 0; b < nb; b++) {
      const u64* d0 = &d[(2 * b) * 4];
      const u64* m0 = &m[(2 * b) * 4];
      u64 lhs[4], rhs[4], t0[4];
      ext4::mul(pj + b * 4, d0, lhs);
      if (2 * b + 1 < nI) {
        const u64* d1 = &d[(2 * b + 1) * 4];
        const u64* m1 = &m[(2 * b + 1) * 4];
        ext4::mul(lhs, d1, lhs);
        ext4::mul(m0, d1, rhs);
        ext4::mul(m1, d0, t0);
        for (int l = 0; l < 4; l++) rhs[l] = (rhs[l] + t0[l]) % P;
      } else {
        for (int l = 0; l < 4; l++) rhs[l] = m0[l];
      }
      for (int l = 0; l < 4; l++)
        oj[b * 4 + l] = (lhs[l] + P - rhs[l]) % P;
    }
    // running-sum rows: first*(s - sum phi), trans*(s' - s - sum phi'),
    // last*(s - cum)
    u64 tp[4] = {0, 0, 0, 0}, tpn[4] = {0, 0, 0, 0};
    for (u64 b = 0; b < nb; b++)
      for (int l = 0; l < 4; l++) {
        tp[l] = (tp[l] + pj[b * 4 + l]) % P;
        tpn[l] = (tpn[l] + pnj[b * 4 + l]) % P;
      }
    u64 v[4];
    for (int l = 0; l < 4; l++)
      v[l] = (s_val[j * 4 + l] + P - tp[l]) % P;
    ext4::mul(sel_first + j * 4, v, oj + nb * 4);
    for (int l = 0; l < 4; l++)
      v[l] = ((s_next[j * 4 + l] + P - s_val[j * 4 + l]) + P - tpn[l]) % P;
    ext4::mul(sel_trans + j * 4, v, oj + (nb + 1) * 4);
    for (int l = 0; l < 4; l++)
      v[l] = (s_val[j * 4 + l] + P - cums[j * 4 + l]) % P;
    ext4::mul(sel_last + j * 4, v, oj + (nb + 2) * 4);
  }
}

}  // extern "C"

extern "C" {

// Constraint-VM evaluation over k BASE-field lanes (the host prover's
// quotient fold over an LDE domain): same register program / buf layout
// as lair_vm_eval_ext but each value is one canonical u64 (< P), buf is
// (C, k). Threaded over lane blocks - the program is row-independent.
void lair_vm_eval_base(const int32_t* ops, u64 n_ops, u64* buf, u64 ncols,
                       u64 k) {
  parallel_for(k, 1 << 12, [&](u64 lo, u64 hi) {
    for (u64 s = 0; s < n_ops; s++) {
      const int32_t* op = ops + s * 4;
      u64* d = buf + (u64)op[1] * k;
      const u64* x = buf + (u64)op[2] * k;
      const u64* y = buf + (u64)op[3] * k;
      switch (op[0]) {
        case 0:
          for (u64 i = lo; i < hi; i++) {
            u64 v = x[i] + y[i];
            d[i] = v >= P ? v - P : v;
          }
          break;
        case 1:
          for (u64 i = lo; i < hi; i++)
            d[i] = x[i] >= y[i] ? x[i] - y[i] : x[i] + P - y[i];
          break;
        default:
          for (u64 i = lo; i < hi; i++) d[i] = x[i] * y[i] % P;
          break;
      }
    }
  });
}

}  // extern "C"

