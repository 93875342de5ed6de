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
// interpreter state
// ---------------------------------------------------------------------------

struct Record { u32 nonce = 0, count = 0; };

struct VecHash {
  size_t operator()(const std::vector<u32>& v) const {
    size_t h = 0xcbf29ce484222325ull;
    for (u32 x : v) { h ^= x; h *= 0x100000001b3ull; }
    return h;
  }
};

struct QueryResult {
  std::vector<u32> output;
  bool has_output = false;
  Record provide;
  std::vector<u32> requires_;        // (nonce,count) pairs flattened
  u32 depth = 0;
  std::vector<u32> depth_requires;   // pairs flattened
  u32 path = 0;
  std::vector<u32> hints;
};

struct IndexMap {
  std::unordered_map<std::vector<u32>, u32, VecHash> idx;
  std::vector<std::vector<u32>> keys;
  std::vector<QueryResult> values;

  int64_t find(const std::vector<u32>& k) const {
    auto it = idx.find(k);
    return it == idx.end() ? -1 : (int64_t)it->second;
  }
  u32 insert(const std::vector<u32>& k) {
    u32 i = (u32)keys.size();
    idx.emplace(k, i);
    keys.push_back(k);
    values.emplace_back();
    return i;
  }
};

constexpr u32 MEM_SIZES[6] = {2, 3, 4, 5, 6, 8};
int mem_index_from_len(size_t n) {
  for (int i = 0; i < 6; i++) if (MEM_SIZES[i] == n) return i;
  return -1;
}

struct ByteRecords {
  // input u16 -> 6 Records (range_u8, range_u16, less_than, and, xor, or)
  std::unordered_map<u32, std::array<Record, 6>> records;
  std::vector<u32>* requires_ = nullptr;
  u32 nonce = 0;

  void lookup(u32 input, int slot) {
    auto& rec = records[input][slot];
    requires_->push_back(rec.nonce);
    requires_->push_back(rec.count);
    rec.nonce = nonce;
    rec.count += 1;
  }
  void range_u8_pair(u32 a, u32 b) { lookup(a | (b << 8), 0); }
  void range_u16(u32 x) { lookup(x, 1); }
  bool less_than(u32 a, u32 b) { lookup(a | (b << 8), 2); return a < b; }
};

struct Interp;

struct CallerState {
  bool preimg;
  u32 func_index, nonce;
  std::vector<u32> map, requires_, depths, depth_requires, hints;
};

struct Interp {
  Toplevel* tl;
  std::vector<IndexMap> func_queries;
  std::vector<std::unordered_map<std::vector<u32>, std::vector<u32>, VecHash>>
      inv_func_queries;  // only for invertible funcs
  IndexMap mem_queries[6];
  ByteRecords bytes;
  std::vector<std::vector<u32>> emitted;
  std::vector<u32> public_values;
  std::string error;

  Interp(Toplevel* t) : tl(t) {
    func_queries.resize(t->funcs.size());
    inv_func_queries.resize(t->funcs.size());
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

bool run_extern(Interp& st, u32 chip_idx, const std::vector<u32>& inp,
                u32 nonce, std::vector<u32>& requires_, std::vector<u32>& out) {
  const ChipInfo& ci = st.tl->chips[chip_idx];
  switch (ci.kind) {
    case CHIP_HASH24: case CHIP_HASH32: case CHIP_HASH40: {
      const PoseidonCfg& cfg = st.tl->pcfg[ci.kind - CHIP_HASH24];
      std::vector<u32> s(inp);
      poseidon2(cfg, s.data());
      out.assign(s.begin(), s.begin() + 8);
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
bool execute_func(Interp& st, u32 entry_idx, const std::vector<u32>& args) {
  Toplevel& tl = *st.tl;
  u32 func_index = entry_idx;
  u32 nonce = st.func_queries[func_index].insert(args);
  st.func_queries[func_index].values[nonce].provide.count = 1;

  std::vector<u32> map(args), requires_, depths, depth_requires, hints;
  bool partial = tl.funcs[func_index].partial;

  struct Entry { bool is_op; const Op* op; const Ctrl* ctrl; };
  std::vector<Entry> stack;
  std::vector<CallerState> callers;

  auto push_block = [&](const Block& b) {
    stack.push_back({false, nullptr, &b.ctrl});
    for (auto it = b.ops.rbegin(); it != b.ops.rend(); ++it)
      stack.push_back({true, &*it, nullptr});
  };
  push_block(tl.funcs[func_index].body);

  while (!stack.empty()) {
    Entry e = stack.back();
    stack.pop_back();
    if (e.is_op) {
      const Op& op = *e.op;
      switch (op.tag) {
        case OP_CONST: map.push_back(op.a); break;
        case OP_ADD: map.push_back(fadd(map[op.a], map[op.b])); break;
        case OP_SUB: map.push_back(fsub(map[op.a], map[op.b])); break;
        case OP_MUL: map.push_back(fmul(map[op.a], map[op.b])); break;
        case OP_INV: {
          if (map[op.a] == 0) { st.error = "inverse of 0"; return false; }
          map.push_back(finv(map[op.a]));
          break;
        }
        case OP_NOT: map.push_back(map[op.a] == 0 ? 1 : 0); break;
        case OP_ASSERT_EQ:
          for (size_t i = 0; i < op.xs.size(); i++)
            if (map[op.xs[i]] != map[op.ys[i]]) { st.error = "AssertEq failed"; return false; }
          break;
        case OP_ASSERT_NE: {
          bool unequal = false;
          for (size_t i = 0; i < op.xs.size(); i++)
            if (map[op.xs[i]] != map[op.ys[i]]) { unequal = true; break; }
          if (!unequal) { st.error = "AssertNe failed"; return false; }
          break;
        }
        case OP_CONTAINS: {
          u32 b = map[op.a];
          bool found = false;
          for (u32 x : op.xs) if (map[x] == b) { found = true; break; }
          if (!found) { st.error = "Contains failed"; return false; }
          break;
        }
        case OP_CALL: case OP_PREIMG: {
          u32 callee = op.a;
          std::vector<u32> inp;
          if (op.tag == OP_CALL) {
            inp.reserve(op.xs.size());
            for (u32 v : op.xs) inp.push_back(map[v]);
          } else {
            std::vector<u32> outv;
            outv.reserve(op.xs.size());
            for (u32 v : op.xs) outv.push_back(map[v]);
            auto& inv = st.inv_func_queries[callee];
            auto it = inv.find(outv);
            if (it == inv.end()) { st.error = "Preimg not found"; return false; }
            inp = it->second;
          }
          int64_t qi = st.func_queries[callee].find(inp);
          if (qi >= 0) {
            QueryResult& res = st.func_queries[callee].values[qi];
            if (!res.has_output) { st.error = "Loop detected"; return false; }
            const std::vector<u32>& ext =
                op.tag == OP_PREIMG ? st.func_queries[callee].keys[qi] : res.output;
            map.insert(map.end(), ext.begin(), ext.end());
            hints.insert(hints.end(), ext.begin(), ext.end());
            requires_.push_back(res.provide.nonce);
            requires_.push_back(res.provide.count);
            res.provide.nonce = nonce;
            res.provide.count += 1;
            if (partial && tl.funcs[callee].partial) {
              depths.push_back(res.depth);
              hints.push_back(res.depth);
            }
          } else {
            u32 callee_nonce = st.func_queries[callee].insert(inp);
            callers.push_back(CallerState{op.tag == OP_PREIMG, func_index, nonce,
                                          std::move(map), std::move(requires_),
                                          std::move(depths), std::move(depth_requires),
                                          std::move(hints)});
            // stash partial flag inside caller via func_index lookup on pop
            func_index = callee;
            nonce = callee_nonce;
            partial = tl.funcs[callee].partial;
            map = inp;
            requires_.clear();
            depths.clear();
            depth_requires.clear();
            hints.clear();
            push_block(tl.funcs[callee].body);
          }
          break;
        }
        case OP_STORE: {
          std::vector<u32> vals;
          vals.reserve(op.xs.size());
          for (u32 v : op.xs) vals.push_back(map[v]);
          int mi = mem_index_from_len(vals.size());
          if (mi < 0) { st.error = "bad mem width"; return false; }
          IndexMap& mm = st.mem_queries[mi];
          int64_t i = mm.find(vals);
          if (i < 0) i = mm.insert(vals);
          QueryResult& res = mm.values[i];
          map.push_back((u32)(i + 1));
          hints.push_back((u32)(i + 1));
          requires_.push_back(res.provide.nonce);
          requires_.push_back(res.provide.count);
          res.provide.nonce = nonce;
          res.provide.count += 1;
          break;
        }
        case OP_LOAD: {
          u32 ptr = map[op.b];
          int mi = mem_index_from_len(op.a);
          IndexMap& mm = st.mem_queries[mi];
          if (ptr == 0 || ptr > mm.keys.size()) { st.error = "Unbound pointer"; return false; }
          const std::vector<u32>& vals = mm.keys[ptr - 1];
          QueryResult& res = mm.values[ptr - 1];
          map.insert(map.end(), vals.begin(), vals.end());
          hints.insert(hints.end(), vals.begin(), vals.end());
          requires_.push_back(res.provide.nonce);
          requires_.push_back(res.provide.count);
          res.provide.nonce = nonce;
          res.provide.count += 1;
          break;
        }
        case OP_EXTERN: {
          std::vector<u32> inp, out;
          inp.reserve(op.xs.size());
          for (u32 v : op.xs) inp.push_back(map[v]);
          if (!run_extern(st, op.a, inp, nonce, requires_, out)) return false;
          map.insert(map.end(), out.begin(), out.end());
          break;
        }
        case OP_EMIT: {
          std::vector<u32> vals;
          for (u32 v : op.xs) vals.push_back(map[v]);
          st.emitted.push_back(std::move(vals));
          break;
        }
        case OP_RANGE_U8: {
          st.bytes.requires_ = &requires_;
          st.bytes.nonce = nonce;
          for (size_t i = 0; i < op.xs.size(); i += 2) {
            u32 a = map[op.xs[i]];
            u32 b = i + 1 < op.xs.size() ? map[op.xs[i + 1]] : 0;
            if (a > 255 || b > 255) { st.error = "not in u8 range"; return false; }
            st.bytes.range_u8_pair(a, b);
          }
          break;
        }
        case OP_BREAKPOINT: case OP_DEBUG: break;
      }
    } else {
      const Ctrl& c = *e.ctrl;
      if (c.tag == CTRL_RETURN) {
        std::vector<u32> out;
        out.reserve(c.vals.size());
        for (u32 v : c.vals) out.push_back(map[v]);
        IndexMap& fq = st.func_queries[func_index];
        QueryResult& res = fq.values[nonce];
        if (tl.funcs[func_index].invertible)
          st.inv_func_queries[func_index][out] = fq.keys[nonce];
        if (partial) {
          st.bytes.requires_ = &depth_requires;
          st.bytes.nonce = nonce;
          u32 depth = 0;
          for (u32 d : depths) depth = std::max(depth, d + 1);
          for (int i = 0; i < 4; i += 2)
            st.bytes.range_u8_pair((depth >> (8 * i)) & 0xFF,
                                   (depth >> (8 * (i + 1))) & 0xFF);
          for (u32 d : depths) depth_less_than_lookups(d, depth, st.bytes);
          res.depth = depth;
        }
        res.output = out;
        res.has_output = true;
        res.requires_ = std::move(requires_);
        res.depth_requires = std::move(depth_requires);
        res.path = c.ident;
        res.hints = std::move(hints);
        if (!callers.empty()) {
          CallerState cs = std::move(callers.back());
          callers.pop_back();
          bool callee_partial = partial;
          const std::vector<u32>& inp = fq.keys[nonce];
          func_index = cs.func_index;
          nonce = cs.nonce;
          map = std::move(cs.map);
          requires_ = std::move(cs.requires_);
          depths = std::move(cs.depths);
          depth_requires = std::move(cs.depth_requires);
          hints = std::move(cs.hints);
          partial = tl.funcs[func_index].partial;
          const std::vector<u32>& ext = cs.preimg ? inp : res.output;
          map.insert(map.end(), ext.begin(), ext.end());
          hints.insert(hints.end(), ext.begin(), ext.end());
          requires_.push_back(res.provide.nonce);
          requires_.push_back(res.provide.count);
          res.provide.nonce = nonce;
          res.provide.count += 1;
          if (partial && callee_partial) {
            depths.push_back(res.depth);
            hints.push_back(res.depth);
          }
        } else {
          // entry function returned
          u32 final_depth = 0;
          for (u32 d : depths) final_depth = std::max(final_depth, d + 1);
          st.public_values = args;
          st.public_values.insert(st.public_values.end(), out.begin(), out.end());
          if (tl.funcs[entry_idx].partial)
            for (int i = 0; i < 4; i++)
              st.public_values.push_back((final_depth >> (8 * i)) & 0xFF);
          return true;
        }
      } else if (c.tag == CTRL_CHOOSE) {
        u32 v = map[c.var];
        const Block* blk = nullptr;
        for (size_t i = 0; i < c.branch_keys.size(); i++) {
          for (u32 k : c.branch_keys[i])
            if (k == v) { blk = c.branches[i].get(); break; }
          if (blk) break;
        }
        if (!blk) blk = c.dflt.get();
        if (!blk) { st.error = "No match"; return false; }
        push_block(*blk);
      } else {  // CHOOSE_MANY
        const Block* blk = nullptr;
        for (size_t i = 0; i < c.branch_keys.size(); i++) {
          bool eq = true;
          for (size_t j = 0; j < c.vals.size(); j++)
            if (map[c.vals[j]] != c.branch_keys[i][j]) { eq = false; break; }
          if (eq) { blk = c.branches[i].get(); break; }
        }
        if (!blk) blk = c.dflt.get();
        if (!blk) { st.error = "No match"; return false; }
        push_block(*blk);
      }
    }
  }
  st.error = "exec stack drained without return";
  return false;
}

// ---------------------------------------------------------------------------
// record serialization (see native_codec.py docstring for layout)
// ---------------------------------------------------------------------------

void serialize_record(const Interp& st, std::vector<u32>& out) {
  const Toplevel& tl = *st.tl;
  out.push_back((u32)tl.funcs.size());
  for (size_t f = 0; f < tl.funcs.size(); f++) {
    const IndexMap& fq = st.func_queries[f];
    u32 n = (u32)fq.keys.size();
    out.push_back(n);
    for (u32 i = 0; i < n; i++)
      out.insert(out.end(), fq.keys[i].begin(), fq.keys[i].end());
    for (u32 i = 0; i < n; i++)
      out.insert(out.end(), fq.values[i].output.begin(), fq.values[i].output.end());
    for (u32 i = 0; i < n; i++) {
      out.push_back(fq.values[i].provide.nonce);
      out.push_back(fq.values[i].provide.count);
    }
    auto emit_var = [&](auto getter) {
      u32 off = 0;
      out.push_back(off);
      for (u32 i = 0; i < n; i++) {
        off += (u32)getter(fq.values[i]).size();
        out.push_back(off);
      }
      for (u32 i = 0; i < n; i++) {
        const std::vector<u32>& v = getter(fq.values[i]);
        out.insert(out.end(), v.begin(), v.end());
      }
    };
    emit_var([](const QueryResult& q) -> const std::vector<u32>& { return q.requires_; });
    for (u32 i = 0; i < n; i++) out.push_back(fq.values[i].depth);
    emit_var([](const QueryResult& q) -> const std::vector<u32>& { return q.depth_requires; });
    for (u32 i = 0; i < n; i++) out.push_back(fq.values[i].path);
    emit_var([](const QueryResult& q) -> const std::vector<u32>& { return q.hints; });
  }
  for (int m = 0; m < 6; m++) {
    const IndexMap& mm = st.mem_queries[m];
    u32 n = (u32)mm.keys.size();
    out.push_back(n);
    for (u32 i = 0; i < n; i++)
      out.insert(out.end(), mm.keys[i].begin(), mm.keys[i].end());
    for (u32 i = 0; i < n; i++) {
      out.push_back(mm.values[i].provide.nonce);
      out.push_back(mm.values[i].provide.count);
    }
  }
  // bytes: sorted by input
  {
    std::vector<u32> inputs;
    inputs.reserve(st.bytes.records.size());
    for (auto& kv : st.bytes.records) inputs.push_back(kv.first);
    std::sort(inputs.begin(), inputs.end());
    out.push_back((u32)inputs.size());
    for (u32 in : inputs) {
      out.push_back(in);
      const auto& recs = st.bytes.records.at(in);
      for (int s = 0; s < 6; s++) {
        out.push_back(recs[s].nonce);
        out.push_back(recs[s].count);
      }
    }
  }
  // emitted
  {
    out.push_back((u32)st.emitted.size());
    u32 off = 0;
    out.push_back(off);
    for (auto& v : st.emitted) { off += (u32)v.size(); out.push_back(off); }
    for (auto& v : st.emitted) out.insert(out.end(), v.begin(), v.end());
  }
  out.push_back((u32)st.public_values.size());
  out.insert(out.end(), st.public_values.begin(), st.public_values.end());
}

std::unordered_map<void*, std::vector<u32>*>* g_rec_cache() {
  static auto* m = new std::unordered_map<void*, std::vector<u32>*>();
  return m;
}

}  // namespace

// Helper: run fn(lo, hi) over [0, n) across threads.
template <typename F>
void parallel_for(u64 n, u64 min_serial, F fn) {
  u64 nthreads = std::min<u64>(std::thread::hardware_concurrency(), 8);
  if (nthreads <= 1 || n < min_serial) {
    fn((u64)0, n);
    return;
  }
  std::vector<std::thread> pool;
  u64 chunk = (n + nthreads - 1) / nthreads;
  for (u64 t = 0; t < nthreads; t++) {
    u64 lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
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
      auto& inv = st->inv_func_queries[fi];
      for (u32 i = 0; i < n; i++) {
        std::vector<u32> o(osz), in(isz);
        for (auto& x : o) x = r.next();
        for (auto& x : in) x = r.next();
        inv.emplace(std::move(o), std::move(in));
      }
    }
  }
  std::vector<u32> argv(args, args + n_args);
  bool ok = execute_func(*st, func_idx, argv);
  *status = ok ? 0 : 1;
  return st;
}

u64 lair_record_size(void* st_ptr) {
  auto* st = (Interp*)st_ptr;
  auto* cached = new std::vector<u32>();
  serialize_record(*st, *cached);
  (*g_rec_cache())[st_ptr] = cached;
  return cached->size();
}

void lair_record_copy(void* st_ptr, u32* out) {
  auto& m = *g_rec_cache();
  auto it = m.find(st_ptr);
  if (it == m.end()) return;
  std::memcpy(out, it->second->data(), it->second->size() * sizeof(u32));
  delete it->second;
  m.erase(it);
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
      std::vector<std::thread> pool;
      u64 chunk = (n_bfly + nthreads - 1) / nthreads;
      for (u64 t = 0; t < nthreads; t++) {
        u64 lo = t * chunk, hi = std::min(n_bfly, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back(run, lo, hi);
      }
      for (auto& th : pool) th.join();
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
  auto run = [&](u64 lo, u64 hi) {
    std::vector<u32> s(w);
    for (u64 i = lo; i < hi; i++) {
      std::copy(input + i * w, input + (i + 1) * w, s.begin());
      poseidon2(cfg, s.data());
      std::copy(s.begin(), s.end(), output + i * w);
    }
  };
  u64 nthreads = std::min<u64>(std::thread::hardware_concurrency(), 8);
  if (nthreads <= 1 || n < 256) {
    run(0, n);
    return;
  }
  std::vector<std::thread> pool;
  u64 chunk = (n + nthreads - 1) / nthreads;
  for (u64 t = 0; t < nthreads; t++) {
    u64 lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(run, lo, hi);
  }
  for (auto& th : pool) th.join();
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

}  // extern "C"
