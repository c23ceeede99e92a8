// Native VM witness core: the Triton VM interpreter + AET accumulation.
//
// Port target: triton_vm_tpu/vm/machine.py + vm/aet.py (which themselves
// mirror /root/reference/triton-vm/src/vm.rs and aet.rs). The Python
// interpreter is the semantic oracle; tests/test_native_vm.py asserts
// bit-identical AET contents on every example program. The reference's
// native witness generator is its Rust VM (vm.rs:362-428 dispatch,
// aet.rs:229-345 recording); this is the C++ equivalent for the TPU
// framework — witness generation is inherently sequential host work and
// the per-cycle Python dispatch (~15us) would dominate 2^20+ proofs.
//
// Interface: C ABI, driven via ctypes (vm/native.py). Tip5 constants
// (lookup table, MDS first column, round constants) and the hash-table
// column layout are injected from Python so no constant derivation is
// duplicated here.
//
// Error handling: on any VM error the run aborts with an error code; the
// Python wrapper re-executes on the Python interpreter to raise the
// precise typed exception (error taxonomy stays in one place).

#include <cstdint>
#include <cstring>
#include <array>
#include <deque>
#include <unordered_map>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint16_t u16;
typedef int64_t i64;

static const u64 P = 0xFFFFFFFF00000001ULL;

static const u64 EPS0 = 0xFFFFFFFFULL;  // 2^64 mod P = 2^32 - 1

static inline u64 addmod(u64 a, u64 b) {
    // a, b < P; on u64 wrap the lost 2^64 re-enters as +EPS0
    u64 s = a + b;
    if (s < a) s += EPS0;
    if (s >= P) s -= P;
    return s;
}
static inline u64 submod(u64 a, u64 b) { return a >= b ? a - b : a + P - b; }
static const u64 EPS = EPS0;  // 2^32 - 1 = 2^64 mod P

static inline u64 reduce128(u128 x) {
    // x = lo + hi_lo*2^64 + hi_hi*2^96; 2^64 ≡ EPS, 2^96 ≡ -1 (mod P)
    u64 lo = (u64)x;
    u64 hi = (u64)(x >> 64);
    u64 hi_hi = hi >> 32;
    u64 hi_lo = hi & EPS;
    u64 t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= EPS;  // borrow: -2^64 ≡ -EPS
    u64 t1 = hi_lo * EPS;       // < 2^64
    u64 res = t0 + t1;
    if (res < t0) res += EPS;   // carry: +2^64 ≡ +EPS (cannot re-overflow)
    while (res >= P) res -= P;
    return res;
}

static inline u64 mulmod(u64 a, u64 b) { return reduce128((u128)a * b); }
static inline u64 powmod(u64 b, u64 e) {
    u64 r = 1;
    while (e) {
        if (e & 1) r = mulmod(r, b);
        b = mulmod(b, b);
        e >>= 1;
    }
    return r;
}
static inline u64 invmod(u64 x) { return x ? powmod(x, P - 2) : 0; }

// ------------------------------------------------------------------ XFE

struct Xfe { u64 c0, c1, c2; };

static inline Xfe xadd(Xfe a, Xfe b) {
    return {addmod(a.c0, b.c0), addmod(a.c1, b.c1), addmod(a.c2, b.c2)};
}
static inline Xfe xmul(Xfe a, Xfe b) {
    // F_p[x]/(x^3 - x + 1): x^3 = x - 1, x^4 = x^2 - x
    u64 d0 = mulmod(a.c0, b.c0);
    u64 d1 = addmod(mulmod(a.c0, b.c1), mulmod(a.c1, b.c0));
    u64 d2 = addmod(addmod(mulmod(a.c0, b.c2), mulmod(a.c1, b.c1)),
                    mulmod(a.c2, b.c0));
    u64 d3 = addmod(mulmod(a.c1, b.c2), mulmod(a.c2, b.c1));
    u64 d4 = mulmod(a.c2, b.c2);
    return {submod(d0, d3), addmod(d1, submod(d3, d4)), addmod(d2, d4)};
}
static inline Xfe xsq(Xfe a) { return xmul(a, a); }

// p^3 - 2 computed once (192-bit little-endian limbs)
static u64 XINV_E[3];
static bool XINV_READY = false;
static void xinv_init() {
    if (XINV_READY) return;
    // p = 2^64 - 2^32 + 1. Compute p^3 - 2 with 192-bit schoolbook.
    u64 p_lo = P;
    // p^2 = p*p -> 128 bits
    u128 p2 = (u128)p_lo * p_lo;
    // p^3 = p2 * p -> 192 bits: (p2_hi*2^64 + p2_lo) * p
    u64 p2_lo = (u64)p2, p2_hi = (u64)(p2 >> 64);
    u128 m0 = (u128)p2_lo * p_lo;                 // contributes to limbs 0,1
    u128 m1 = (u128)p2_hi * p_lo;                 // contributes to limbs 1,2
    u64 l0 = (u64)m0;
    u128 carry = (m0 >> 64) + (u64)m1;
    u64 l1 = (u64)carry;
    u64 l2 = (u64)(m1 >> 64) + (u64)(carry >> 64);
    // subtract 2
    if (l0 >= 2) { l0 -= 2; }
    else { l0 = l0 + (~(u64)1) + 1; if (--l1 == ~(u64)0) --l2; }
    XINV_E[0] = l0; XINV_E[1] = l1; XINV_E[2] = l2;
    XINV_READY = true;
}
Xfe xinv_impl(Xfe a) {
    xinv_init();
    Xfe r = {1, 0, 0};
    Xfe base = a;
    for (int limb = 0; limb < 3; ++limb) {
        u64 e = XINV_E[limb];
        for (int bit = 0; bit < 64; ++bit) {
            if (e & 1) r = xmul(r, base);
            base = xsq(base);
            e >>= 1;
        }
    }
    return r;
}

// ------------------------------------------------------------------ Tip5

static u64 TIP5_RC[80];        // round constants (canonical form)
static u64 TIP5_MDS[16];       // first column of the circulant MDS matrix
static u16 TIP5_LOOKUP[256];
static u64 TIP5_R = 0;         // 2^64 mod P (Montgomery R)
static u64 TIP5_R_INV = 0;

static inline u64 split_and_lookup(u64 x) {
    u64 raw = mulmod(x, TIP5_R);
    u64 out = 0;
    for (int b = 0; b < 8; ++b)
        out |= (u64)TIP5_LOOKUP[(raw >> (8 * b)) & 0xFF] << (8 * b);
    return mulmod(out, TIP5_R_INV);
}

static inline void tip5_round(u64* s, int r) {
    u64 t[16];
    for (int i = 0; i < 4; ++i) t[i] = split_and_lookup(s[i]);
    for (int i = 4; i < 16; ++i) {
        u64 x = s[i];
        u64 x2 = mulmod(x, x);
        u64 x4 = mulmod(x2, x2);
        t[i] = mulmod(mulmod(x4, x2), x);  // x^7
    }
    // circulant MDS: out[i] = sum_j c[(i - j) mod 16] * t[j].
    // c[j] < 2^16, t[j] < 2^64 -> each product < 2^80; 16 of them fit a
    // u128 with ~44 bits of headroom, so reduce once at the end.
    for (int i = 0; i < 16; ++i) {
        u128 acc = 0;
        for (int j = 0; j < 16; ++j)
            acc += (u128)TIP5_MDS[(i - j) & 15] * t[j];
        s[i] = addmod(reduce128(acc), TIP5_RC[r * 16 + i]);
    }
}

// writes (rounds+1)*16 states into `trace` (initial state first)
static void tip5_permutation_trace(const u64* in, u64* trace) {
    u64 s[16];
    std::memcpy(s, in, 16 * sizeof(u64));
    std::memcpy(trace, s, 16 * sizeof(u64));
    for (int r = 0; r < 5; ++r) {
        tip5_round(s, r);
        std::memcpy(trace + (r + 1) * 16, s, 16 * sizeof(u64));
    }
}

// ------------------------------------------------------- hash-table rows

// column layout injected from Python (indices into the 67-wide row):
// [0..3]   idx_lkin for parts Lowest,MidLow,MidHigh,Highest of state 0
// ... stateI base = I*8: lkin[part], then lkout at +4? -- NO:
// layout array format (from Python): for i in 0..4, for part in 0..4:
//   HCOL_LKIN[i*4+part], HCOL_LKOUT[i*4+part]; then HCOL_STATE[j-4] for
//   j in 4..16; HCOL_INV[i] for i in 0..4; HCOL_CONST[i] for 0..16;
//   HCOL_ROUNDNUM, HCOL_CI, HCOL_MODE.
static int HCOL_LKIN[16], HCOL_LKOUT[16], HCOL_STATE[12], HCOL_INV[4];
static int HCOL_CONST[16], HCOL_ROUNDNUM, HCOL_CI, HCOL_MODE, HASH_W;

struct Aet;
static void hash_row_from_state(const u64* state, int round_number, u64 ci,
                                u64* row /* HASH_W wide, zeroed */) {
    row[HCOL_ROUNDNUM] = (u64)round_number;
    row[HCOL_CI] = ci;
    for (int i = 0; i < 4; ++i) {
        u64 rx = mulmod(state[i], TIP5_R);
        u64 limbs[4] = {rx & 0xFFFF, (rx >> 16) & 0xFFFF,
                        (rx >> 32) & 0xFFFF, (rx >> 48) & 0xFFFF};
        for (int part = 0; part < 4; ++part) {
            u64 limb = limbs[part];
            u64 lo = TIP5_LOOKUP[limb & 0xFF];
            u64 hi = TIP5_LOOKUP[(limb >> 8) & 0xFF];
            row[HCOL_LKIN[i * 4 + part]] = limb;
            row[HCOL_LKOUT[i * 4 + part]] = (hi << 8) | lo;
        }
        u64 high_limbs = (limbs[3] << 16) + limbs[2];
        u64 to_invert = ((1ULL << 32) - 1 - high_limbs) % P;
        row[HCOL_INV[i]] = invmod(to_invert);
    }
    for (int i = 4; i < 16; ++i) row[HCOL_STATE[i - 4]] = state[i];
    if (round_number < 5)
        for (int i = 0; i < 16; ++i)
            row[HCOL_CONST[i]] = TIP5_RC[round_number * 16 + i];
}

// ------------------------------------------------------------ program rep

enum Op : int {
    OP_POP, OP_PUSH, OP_DIVINE, OP_PICK, OP_PLACE, OP_DUP, OP_SWAP,
    OP_HALT, OP_NOP, OP_SKIZ, OP_CALL, OP_RETURN, OP_RECURSE,
    OP_RECURSE_OR_RETURN, OP_ASSERT, OP_READ_MEM, OP_WRITE_MEM, OP_HASH,
    OP_ASSERT_VECTOR, OP_SPONGE_INIT, OP_SPONGE_ABSORB,
    OP_SPONGE_ABSORB_MEM, OP_SPONGE_SQUEEZE, OP_ADD, OP_ADDI, OP_MUL,
    OP_INVERT, OP_EQ, OP_SPLIT, OP_LT, OP_AND, OP_XOR, OP_LOG_2_FLOOR,
    OP_POW, OP_DIV_MOD, OP_POP_COUNT, OP_XX_ADD, OP_XX_MUL, OP_X_INVERT,
    OP_XB_MUL, OP_READ_IO, OP_WRITE_IO, OP_MERKLE_STEP,
    OP_MERKLE_STEP_MEM, OP_B_HORNER_STEP, OP_X_HORNER_STEP,
    OP_INVALID = -1
};

// u32 table entry instruction ids (match Python aet u32 canonical names)
enum U32Op : int { U32_SPLIT = 0, U32_LT, U32_AND, U32_LOG_2_FLOOR,
                   U32_POW, U32_POP_COUNT };

// error codes (wrapper re-runs Python VM for the precise exception)
enum Err : int {
    E_OK = 0, E_GENERIC = 1,
};

struct Insn { int op; u64 opcode; u64 arg; int size; };

// ------------------------------------------------------------------ AET

struct U32Key {
    int op; u64 lhs, rhs;
    bool operator==(const U32Key& o) const {
        return op == o.op && lhs == o.lhs && rhs == o.rhs;
    }
};
struct U32KeyHash {
    size_t operator()(const U32Key& k) const {
        u64 h = (u64)k.op * 0x9E3779B97F4A7C15ULL;
        h ^= k.lhs + 0x9E3779B97F4A7C15ULL + (h << 6) + (h >> 2);
        h ^= k.rhs + 0x9E3779B97F4A7C15ULL + (h << 6) + (h >> 2);
        return (size_t)h;
    }
};

struct Aet {
    std::vector<u64> processor_rows;             // n*39
    std::vector<u32> instruction_multiplicities; // program_len
    std::vector<u64> op_stack_rows;              // k*4 (clk, ib1, ptr, elem)
    std::vector<u64> ram_rows;                   // m*4 (clk, type, ptr, val)
    std::vector<u64> program_hash_rows;          // *67
    std::vector<u64> hash_rows;                  // *67
    std::vector<u64> sponge_rows;                // *67
    std::vector<U32Key> u32_order;
    std::unordered_map<U32Key, u64, U32KeyHash> u32_counts;
    std::vector<u32> cascade_order;              // limbs in insertion order
    std::vector<u64> cascade_counts;             // 65536
    std::vector<u64> lookup_mult;                // 256
    std::vector<u64> public_output;

    Aet() : cascade_counts(65536, 0), lookup_mult(256, 0) {}

    void record_u32(int op, u64 lhs, u64 rhs) {
        U32Key k{op, lhs, rhs};
        auto it = u32_counts.find(k);
        if (it == u32_counts.end()) {
            u32_counts.emplace(k, 1);
            u32_order.push_back(k);
        } else {
            ++it->second;
        }
    }

    void increase_lookup_multiplicities(const u64* trace) {
        // first 5 of 6 states, first 4 elements each (aet.rs:301-309)
        for (int srow = 0; srow < 5; ++srow) {
            const u64* state = trace + srow * 16;
            for (int i = 0; i < 4; ++i) {
                u64 rx = mulmod(state[i], TIP5_R);
                for (int b = 0; b < 4; ++b) {
                    u32 limb = (u32)((rx >> (16 * b)) & 0xFFFF);
                    if (cascade_counts[limb]++ == 0) {
                        cascade_order.push_back(limb);
                        lookup_mult[limb & 0xFF] += 1;
                        lookup_mult[(limb >> 8) & 0xFF] += 1;
                    }
                }
            }
        }
    }

    void append_permutation_trace(const u64* trace, std::vector<u64>& out,
                                  u64 ci) {
        increase_lookup_multiplicities(trace);
        size_t base = out.size();
        out.resize(base + 6 * HASH_W, 0);
        for (int rn = 0; rn < 6; ++rn)
            hash_row_from_state(trace + rn * 16, rn, ci, &out[base + rn * HASH_W]);
    }
};

// ------------------------------------------------------------------ VM

struct UnderflowIo { bool is_write; u64 payload; };

struct Vm {
    const Insn* prog;
    size_t prog_len;
    std::deque<u64> public_input;
    std::deque<u64> secret_tokens;
    std::deque<std::array<u64, 5>> secret_digests;
    std::unordered_map<u64, u64> ram;
    std::vector<u64> stack;                 // bottom-first, top at end
    std::vector<UnderflowIo> underflow_io;
    std::vector<std::pair<u64, u64>> jump_stack;  // (origin, dest)
    u64 cycle_count = 0;
    u64 ip = 0;
    u64 sponge[16];
    bool sponge_init_done = false;
    bool halting = false;
    Aet* aet;
    int err = E_OK;

    // ---- op stack ----
    u64 st(int i) const { return stack[stack.size() - 1 - i]; }
    void set_st(int i, u64 v) { stack[stack.size() - 1 - i] = v; }
    u64 first_underflow_element() const {
        i64 idx = (i64)stack.size() - 1 - 16;
        return idx >= 0 ? stack[idx] : 0;
    }
    void rec(bool is_write) {
        underflow_io.push_back({is_write, first_underflow_element()});
    }
    void push(u64 v) { stack.push_back(v); rec(true); }
    u64 pop() {
        rec(false);
        u64 v = stack.back();
        stack.pop_back();
        return v;
    }
    void insert_at(int index, u64 v) {
        stack.insert(stack.begin() + (stack.size() - index), v);
        rec(true);
    }
    u64 remove_at(int index) {
        rec(false);
        size_t pos = stack.size() - 1 - index;
        u64 v = stack[pos];
        stack.erase(stack.begin() + pos);
        return v;
    }
    bool pop_u32(u64* out) {
        u64 v = pop();
        if (v >> 32) return false;
        *out = v;
        return true;
    }
    bool get_u32(int i, u64* out) {
        u64 v = st(i);
        if (v >> 32) return false;
        *out = v;
        return true;
    }

    // ---- RAM with call recording ----
    std::vector<std::array<u64, 4>> ram_calls;  // clk, type, ptr, val
    u64 ram_read(u64 addr) {
        auto it = ram.find(addr);
        u64 v = it == ram.end() ? 0 : it->second;
        ram_calls.push_back(std::array<u64, 4>{cycle_count, 1, addr, v});
        return v;
    }
    void ram_write(u64 addr, u64 v) {
        ram_calls.push_back(std::array<u64, 4>{cycle_count, 0, addr, v});
        ram[addr] = v;
    }
    u64 ram_peek(u64 addr) const {
        auto it = ram.find(addr);
        return it == ram.end() ? 0 : it->second;
    }
    void flush_ram_calls() {
        for (auto& c : ram_calls)
            aet->ram_rows.insert(aet->ram_rows.end(), c.begin(), c.end());
        ram_calls.clear();
    }

    // ---- plumbing ----
    const Insn* cur() const {
        if (ip >= prog_len || prog[ip].op == OP_INVALID) return nullptr;
        return &prog[ip];
    }
    const Insn* next_insn() const {
        const Insn* c = cur();
        if (!c) return nullptr;
        u64 nip = ip + c->size;
        if (nip >= prog_len || prog[nip].op == OP_INVALID) return nullptr;
        return &prog[nip];
    }
    u64 nia() const {
        const Insn* c = cur();
        if (!c) return 0;
        if (c->size == 2) return c->arg;
        const Insn* n = next_insn();
        return n ? n->opcode : 1;  // hash-input padding separator
    }

    void derive_helper_variables(u64* hvs) {
        for (int i = 0; i < 6; ++i) hvs[i] = 0;
        const Insn* c = cur();
        if (!c) return;
        switch (c->op) {
            case OP_POP: case OP_DIVINE: case OP_PICK: case OP_PLACE:
            case OP_DUP: case OP_SWAP: case OP_READ_MEM: case OP_WRITE_MEM:
            case OP_READ_IO: case OP_WRITE_IO: {
                u64 a = c->arg;
                hvs[0] = a & 1; hvs[1] = (a >> 1) & 1;
                hvs[2] = (a >> 2) & 1; hvs[3] = (a >> 3) & 1;
                break;
            }
            case OP_SKIZ: {
                hvs[0] = invmod(st(0));
                u64 n = nia();
                hvs[1] = n & 1;
                hvs[2] = (n >> 1) & 3;
                hvs[3] = (n >> 3) & 3;
                hvs[4] = (n >> 5) & 3;
                hvs[5] = n >> 7;
                break;
            }
            case OP_RECURSE_OR_RETURN:
                hvs[0] = invmod(submod(st(6), st(5)));
                break;
            case OP_SPONGE_ABSORB_MEM:
                for (int i = 0; i < 6; ++i)
                    hvs[i] = ram_peek(addmod(st(0), (u64)(4 + i)));
                break;
            case OP_MERKLE_STEP: {
                if (!secret_digests.empty()) {
                    auto& d = secret_digests.front();
                    for (int i = 0; i < 5; ++i) hvs[i] = d[i];
                }
                hvs[5] = st(5) & 1;
                break;
            }
            case OP_MERKLE_STEP_MEM: {
                u64 ptr = st(7);
                for (int i = 0; i < 5; ++i)
                    hvs[i] = ram_peek(addmod(ptr, (u64)i));
                hvs[5] = st(5) & 1;
                break;
            }
            case OP_SPLIT: {
                u64 top = st(0);
                u64 lo = top & 0xFFFFFFFFULL;
                u64 hi = top >> 32;
                if (lo != 0) hvs[0] = invmod(submod(hi, 0xFFFFFFFFULL % P));
                break;
            }
            case OP_EQ:
                hvs[0] = invmod(submod(st(1), st(0)));
                break;
            case OP_B_HORNER_STEP:
                hvs[0] = ram_peek(st(5));
                break;
            case OP_X_HORNER_STEP: {
                u64 ptr = st(5);
                hvs[2] = ram_peek(ptr);
                hvs[1] = ram_peek(submod(ptr, 1));
                hvs[0] = ram_peek(submod(ptr, 2));
                break;
            }
            default: break;
        }
    }

    void record_processor_row() {
        const Insn* c = cur();
        u64 opcode = c ? c->opcode : 8;  // nop when no current instruction
        u64 hvs[6];
        derive_helper_variables(hvs);
        u64 jsp = jump_stack.size();
        u64 jso = 0, jsd = 0;
        if (!jump_stack.empty()) {
            jso = jump_stack.back().first;
            jsd = jump_stack.back().second;
        }
        auto& r = aet->processor_rows;
        size_t base = r.size();
        r.resize(base + 39);
        u64* row = &r[base];
        row[0] = cycle_count;
        row[1] = 0;
        row[2] = ip;
        row[3] = opcode;
        row[4] = nia();
        for (int b = 0; b < 7; ++b) row[5 + b] = (opcode >> b) & 1;
        row[12] = jsp; row[13] = jso; row[14] = jsd;
        for (int i = 0; i < 16; ++i) row[15 + i] = st(i);
        row[31] = stack.size();
        for (int i = 0; i < 6; ++i) row[32 + i] = hvs[i];
        row[38] = 0;
    }

    // op_stack_calls_from_underflow_io (machine.py:101-127)
    void flush_op_stack_calls() {
        auto& seq = underflow_io;
        // canonicalize: remove adjacent (w1 != w2, v1 == v2) pairs
        bool changed = true;
        while (changed) {
            changed = false;
            for (size_t i = 0; i + 1 < seq.size(); ++i) {
                if (seq[i].is_write != seq[i + 1].is_write &&
                    seq[i].payload == seq[i + 1].payload) {
                    seq.erase(seq.begin() + i, seq.begin() + i + 2);
                    changed = true;
                    break;
                }
            }
        }
        if (seq.empty()) return;
        bool is_writing = seq[0].is_write;
        u64 pointer_after = stack.size();
        u64 pointer = is_writing ? pointer_after - seq.size()
                                 : pointer_after + seq.size();
        for (auto& io : seq) {
            if (!io.is_write) pointer -= 1;
            aet->op_stack_rows.push_back(cycle_count);
            aet->op_stack_rows.push_back(io.is_write ? 0 : 1);
            aet->op_stack_rows.push_back(pointer % P);
            aet->op_stack_rows.push_back(io.payload);
            if (io.is_write) pointer += 1;
        }
        seq.clear();
    }

    bool fail() { err = E_GENERIC; return false; }

    bool merkle_step_shared(const u64 sibling[5]) {
        u64 node_index;
        if (!get_u32(5, &node_index)) return fail();
        u64 parent_index = node_index / 2;
        u64 acc[5];
        for (int i = 0; i < 5; ++i) acc[i] = pop();
        u64 in[16];
        if ((node_index & 1) == 0) {
            for (int i = 0; i < 5; ++i) in[i] = acc[i];
            for (int i = 0; i < 5; ++i) in[5 + i] = sibling[i];
        } else {
            for (int i = 0; i < 5; ++i) in[i] = sibling[i];
            for (int i = 0; i < 5; ++i) in[5 + i] = acc[i];
        }
        for (int i = 10; i < 16; ++i) in[i] = 1;
        u64 trace[96];
        tip5_permutation_trace(in, trace);
        for (int i = 4; i >= 0; --i) push(trace[80 + i]);
        set_st(5, parent_index);
        ip += 1;
        aet->append_permutation_trace(trace, aet->hash_rows, 18 /*hash*/);
        aet->record_u32(U32_SPLIT, node_index, parent_index);
        return true;
    }

    // one instruction; returns false on error
    bool step() {
        const Insn* c = cur();
        if (!c) return fail();
        // op-stack-too-shallow pre-check
        int infl;
        switch (c->op) {
            case OP_POP: case OP_WRITE_MEM: case OP_WRITE_IO:
                infl = -(int)c->arg; break;
            case OP_DIVINE: case OP_READ_MEM: case OP_READ_IO:
                infl = (int)c->arg; break;
            case OP_PUSH: case OP_DUP: infl = 1; break;
            case OP_SKIZ: case OP_ASSERT: case OP_ADD: case OP_MUL:
            case OP_EQ: case OP_LT: case OP_AND: case OP_XOR: case OP_POW:
            case OP_XB_MUL: infl = -1; break;
            case OP_HASH: case OP_ASSERT_VECTOR: infl = -5; break;
            case OP_SPONGE_ABSORB: infl = -10; break;
            case OP_SPONGE_SQUEEZE: infl = 10; break;
            case OP_SPLIT: infl = 1; break;
            case OP_XX_ADD: case OP_XX_MUL: infl = -3; break;
            default: infl = 0; break;
        }
        if ((i64)stack.size() + infl < 16) return fail();

        underflow_io.clear();
        switch (c->op) {
            case OP_POP:
                for (u64 i = 0; i < c->arg; ++i) pop();
                ip += 2; break;
            case OP_PUSH: push(c->arg); ip += 2; break;
            case OP_DIVINE:
                if (secret_tokens.size() < c->arg) return fail();
                for (u64 i = 0; i < c->arg; ++i) {
                    push(secret_tokens.front());
                    secret_tokens.pop_front();
                }
                ip += 2; break;
            case OP_PICK: { u64 e = remove_at((int)c->arg); push(e); ip += 2; break; }
            case OP_PLACE: { u64 e = pop(); insert_at((int)c->arg, e); ip += 2; break; }
            case OP_DUP: push(st((int)c->arg)); ip += 2; break;
            case OP_SWAP: {
                u64 a = st(0), b = st((int)c->arg);
                set_st(0, b); set_st((int)c->arg, a);
                ip += 2; break;
            }
            case OP_HALT: halting = true; ip += 1; break;
            case OP_NOP: ip += 1; break;
            case OP_SKIZ: {
                u64 top = pop();
                if (top == 0) {
                    const Insn* n = next_insn();
                    if (!n) return fail();
                    ip += 1 + n->size;
                } else ip += 1;
                break;
            }
            case OP_CALL:
                jump_stack.push_back({ip + 2, c->arg});
                ip = c->arg;
                break;
            case OP_RETURN:
                if (jump_stack.empty()) return fail();
                ip = jump_stack.back().first;
                jump_stack.pop_back();
                break;
            case OP_RECURSE:
                if (jump_stack.empty()) return fail();
                ip = jump_stack.back().second;
                break;
            case OP_RECURSE_OR_RETURN:
                if (jump_stack.empty()) return fail();
                if (st(5) == st(6)) {
                    ip = jump_stack.back().first;
                    jump_stack.pop_back();
                } else {
                    ip = jump_stack.back().second;
                }
                break;
            case OP_ASSERT:
                if (st(0) != 1) return fail();
                pop(); ip += 1; break;
            case OP_READ_MEM: {
                u64 ptr = pop();
                for (u64 i = 0; i < c->arg; ++i) {
                    push(ram_read(ptr));
                    ptr = submod(ptr, 1);
                }
                push(ptr); ip += 2;
                flush_ram_calls();
                break;
            }
            case OP_WRITE_MEM: {
                u64 ptr = pop();
                for (u64 i = 0; i < c->arg; ++i) {
                    u64 v = pop();
                    ram_write(ptr, v);
                    ptr = addmod(ptr, 1);
                }
                push(ptr); ip += 2;
                flush_ram_calls();
                break;
            }
            case OP_HASH: {
                u64 in[16];
                for (int i = 0; i < 10; ++i) in[i] = pop();
                for (int i = 10; i < 16; ++i) in[i] = 1;
                u64 trace[96];
                tip5_permutation_trace(in, trace);
                for (int i = 4; i >= 0; --i) push(trace[80 + i]);
                ip += 1;
                aet->append_permutation_trace(trace, aet->hash_rows, 18);
                break;
            }
            case OP_ASSERT_VECTOR: {
                for (int i = 0; i < 5; ++i)
                    if (st(i) != st(i + 5)) return fail();
                for (int i = 0; i < 5; ++i) pop();
                ip += 1; break;
            }
            case OP_SPONGE_INIT: {
                for (int i = 0; i < 16; ++i) sponge[i] = 0;
                sponge_init_done = true;
                ip += 1;
                // SpongeStateReset row
                u64 zero_state[16] = {0};
                size_t base = aet->sponge_rows.size();
                aet->sponge_rows.resize(base + HASH_W, 0);
                hash_row_from_state(zero_state, 0, 40 /*sponge_init*/,
                                    &aet->sponge_rows[base]);
                break;
            }
            case OP_SPONGE_ABSORB: {
                if (!sponge_init_done) return fail();
                for (int i = 0; i < 10; ++i) sponge[i] = pop();
                u64 trace[96];
                tip5_permutation_trace(sponge, trace);
                std::memcpy(sponge, trace + 80, 16 * sizeof(u64));
                ip += 1;
                aet->append_permutation_trace(trace, aet->sponge_rows,
                                              34 /*sponge_absorb*/);
                break;
            }
            case OP_SPONGE_ABSORB_MEM: {
                if (!sponge_init_done) return fail();
                u64 ptr = pop();
                for (int i = 0; i < 10; ++i) {
                    u64 e = ram_read(ptr);
                    ptr = addmod(ptr, 1);
                    sponge[i] = e;
                    if (i < 4) set_st(i, e);
                }
                push(ptr);
                u64 trace[96];
                tip5_permutation_trace(sponge, trace);
                std::memcpy(sponge, trace + 80, 16 * sizeof(u64));
                ip += 1;
                flush_ram_calls();
                aet->append_permutation_trace(trace, aet->sponge_rows, 34);
                break;
            }
            case OP_SPONGE_SQUEEZE: {
                if (!sponge_init_done) return fail();
                for (int i = 9; i >= 0; --i) push(sponge[i]);
                u64 trace[96];
                tip5_permutation_trace(sponge, trace);
                std::memcpy(sponge, trace + 80, 16 * sizeof(u64));
                ip += 1;
                aet->append_permutation_trace(trace, aet->sponge_rows,
                                              56 /*sponge_squeeze*/);
                break;
            }
            case OP_ADD: { u64 a = pop(), b = pop(); push(addmod(a, b)); ip += 1; break; }
            case OP_ADDI: set_st(0, addmod(st(0), c->arg)); ip += 2; break;
            case OP_MUL: { u64 a = pop(), b = pop(); push(mulmod(a, b)); ip += 1; break; }
            case OP_INVERT: {
                if (st(0) == 0) return fail();
                u64 v = pop(); push(invmod(v)); ip += 1; break;
            }
            case OP_EQ: { u64 a = pop(), b = pop(); push(a == b ? 1 : 0); ip += 1; break; }
            case OP_SPLIT: {
                u64 top = pop();
                u64 lo = top & 0xFFFFFFFFULL, hi = top >> 32;
                push(hi); push(lo);
                ip += 1;
                aet->record_u32(U32_SPLIT, lo, hi);
                break;
            }
            case OP_LT: {
                u64 a, b, lhs, rhs;
                if (!get_u32(0, &a) || !get_u32(1, &b)) return fail();
                if (!pop_u32(&lhs) || !pop_u32(&rhs)) return fail();
                push(lhs < rhs ? 1 : 0);
                ip += 1;
                aet->record_u32(U32_LT, lhs, rhs);
                break;
            }
            case OP_AND: {
                u64 a, b, lhs, rhs;
                if (!get_u32(0, &a) || !get_u32(1, &b)) return fail();
                if (!pop_u32(&lhs) || !pop_u32(&rhs)) return fail();
                push(lhs & rhs);
                ip += 1;
                aet->record_u32(U32_AND, lhs, rhs);
                break;
            }
            case OP_XOR: {
                u64 a, b, lhs, rhs;
                if (!get_u32(0, &a) || !get_u32(1, &b)) return fail();
                if (!pop_u32(&lhs) || !pop_u32(&rhs)) return fail();
                push(lhs ^ rhs);
                ip += 1;
                aet->record_u32(U32_AND, lhs, rhs);  // charged as `and`
                break;
            }
            case OP_LOG_2_FLOOR: {
                u64 a, top;
                if (!get_u32(0, &a)) return fail();
                if (st(0) == 0) return fail();
                if (!pop_u32(&top)) return fail();
                push(63 - __builtin_clzll(top));
                ip += 1;
                aet->record_u32(U32_LOG_2_FLOOR, top, 0);
                break;
            }
            case OP_POW: {
                u64 e;
                if (!get_u32(1, &e)) return fail();
                u64 base = pop();
                u64 expo;
                if (!pop_u32(&expo)) return fail();
                push(powmod(base, expo));
                ip += 1;
                aet->record_u32(U32_POW, base, expo);
                break;
            }
            case OP_DIV_MOD: {
                u64 a, b;
                if (!get_u32(0, &a) || !get_u32(1, &b)) return fail();
                if (st(1) == 0) return fail();
                u64 num, den;
                if (!pop_u32(&num) || !pop_u32(&den)) return fail();
                u64 q = num / den, r = num % den;
                push(q); push(r);
                ip += 1;
                aet->record_u32(U32_LT, r, den);
                aet->record_u32(U32_SPLIT, num, q);
                break;
            }
            case OP_POP_COUNT: {
                u64 a, top;
                if (!get_u32(0, &a)) return fail();
                if (!pop_u32(&top)) return fail();
                push(__builtin_popcountll(top));
                ip += 1;
                aet->record_u32(U32_POP_COUNT, top, 0);
                break;
            }
            case OP_XX_ADD: {
                Xfe l = {pop(), pop(), pop()};
                Xfe r = {pop(), pop(), pop()};
                Xfe s = xadd(l, r);
                push(s.c2); push(s.c1); push(s.c0);
                ip += 1; break;
            }
            case OP_XX_MUL: {
                Xfe l = {pop(), pop(), pop()};
                Xfe r = {pop(), pop(), pop()};
                Xfe s = xmul(l, r);
                push(s.c2); push(s.c1); push(s.c0);
                ip += 1; break;
            }
            case OP_X_INVERT: {
                Xfe top = {st(0), st(1), st(2)};
                if (top.c0 == 0 && top.c1 == 0 && top.c2 == 0) return fail();
                Xfe inv = xinv_impl(top);
                pop(); pop(); pop();
                push(inv.c2); push(inv.c1); push(inv.c0);
                ip += 1; break;
            }
            case OP_XB_MUL: {
                u64 b = pop();
                Xfe x = {pop(), pop(), pop()};
                Xfe s = {mulmod(x.c0, b), mulmod(x.c1, b), mulmod(x.c2, b)};
                push(s.c2); push(s.c1); push(s.c0);
                ip += 1; break;
            }
            case OP_WRITE_IO:
                for (u64 i = 0; i < c->arg; ++i)
                    aet->public_output.push_back(pop());
                ip += 2; break;
            case OP_READ_IO:
                if (public_input.size() < c->arg) return fail();
                for (u64 i = 0; i < c->arg; ++i) {
                    push(public_input.front());
                    public_input.pop_front();
                }
                ip += 2; break;
            case OP_MERKLE_STEP: {
                u64 a;
                if (!get_u32(5, &a)) return fail();
                if (secret_digests.empty()) return fail();
                auto d = secret_digests.front();
                secret_digests.pop_front();
                if (!merkle_step_shared(d.data())) return false;
                break;
            }
            case OP_MERKLE_STEP_MEM: {
                u64 a;
                if (!get_u32(5, &a)) return fail();
                u64 ptr = st(7);
                u64 sib[5];
                for (int i = 0; i < 5; ++i) {
                    sib[i] = ram_read(ptr);
                    ptr = addmod(ptr, 1);
                }
                set_st(7, ptr);
                if (!merkle_step_shared(sib)) return false;
                flush_ram_calls();
                break;
            }
            case OP_B_HORNER_STEP: {
                u64 ptr = st(5);
                u64 coeff = ram_read(ptr);
                set_st(5, submod(ptr, 1));
                Xfe ind = {st(0), st(1), st(2)};
                Xfe acc = {st(7), st(8), st(9)};
                acc = xmul(acc, ind);
                acc.c0 = addmod(acc.c0, coeff);
                set_st(7, acc.c0); set_st(8, acc.c1); set_st(9, acc.c2);
                ip += 1;
                flush_ram_calls();
                break;
            }
            case OP_X_HORNER_STEP: {
                u64 ptr = st(5);
                u64 coeffs[3];
                for (int i = 2; i >= 0; --i) {
                    coeffs[i] = ram_read(ptr);
                    ptr = submod(ptr, 1);
                }
                set_st(5, ptr);
                Xfe ind = {st(0), st(1), st(2)};
                Xfe acc = {st(7), st(8), st(9)};
                acc = xmul(acc, ind);
                acc = xadd(acc, Xfe{coeffs[0], coeffs[1], coeffs[2]});
                set_st(7, acc.c0); set_st(8, acc.c1); set_st(9, acc.c2);
                ip += 1;
                flush_ram_calls();
                break;
            }
            default: return fail();
        }
        flush_op_stack_calls();
        cycle_count += 1;
        return true;
    }
};

// --------------------------------------------------------------- C ABI

struct Handle {
    Aet aet;
    int err = E_OK;
    u64 err_ip = 0;
};

extern "C" {

// Host Fiat-Shamir sponge hot path: the transcript absorbs every proof
// item (proof_stream.rs:40-103) -- ~25k permutations for a 2^16 proof,
// which dominates the Python sponge. Same tip5_round as the witness
// core (bit-identical to crypto/tip5.py, pinned by test_native_vm).
void tvm_tip5_permute(u64* s) {
    for (int r = 0; r < 5; ++r) tip5_round(s, r);
}

// Variable-length overwrite-mode absorb with 1||0* padding
// (Tip5Sponge.pad_and_absorb_all semantics).
void tvm_tip5_pad_absorb(u64* state, const u64* words, u64 n) {
    u64 total = (n + 1 + 9) / 10 * 10;
    for (u64 off = 0; off < total; off += 10) {
        for (int j = 0; j < 10; ++j) {
            u64 idx = off + j;
            u64 v = idx < n ? words[idx] : (idx == n ? 1ull : 0ull);
            state[j] = v >= P ? v - P : v;
        }
        for (int r = 0; r < 5; ++r) tip5_round(state, r);
    }
}

void tvm_init_constants(const u64* round_constants /*80*/,
                        const u64* mds_first_column /*16*/,
                        const u16* lookup_table /*256*/,
                        u64 mont_r, u64 mont_r_inv,
                        const int* hash_cols /*16+16+12+4+16+3*/) {
    std::memcpy(TIP5_RC, round_constants, 80 * sizeof(u64));
    std::memcpy(TIP5_MDS, mds_first_column, 16 * sizeof(u64));
    std::memcpy(TIP5_LOOKUP, lookup_table, 256 * sizeof(u16));
    TIP5_R = mont_r;
    TIP5_R_INV = mont_r_inv;
    const int* p = hash_cols;
    for (int i = 0; i < 16; ++i) HCOL_LKIN[i] = *p++;
    for (int i = 0; i < 16; ++i) HCOL_LKOUT[i] = *p++;
    for (int i = 0; i < 12; ++i) HCOL_STATE[i] = *p++;
    for (int i = 0; i < 4; ++i) HCOL_INV[i] = *p++;
    for (int i = 0; i < 16; ++i) HCOL_CONST[i] = *p++;
    HCOL_ROUNDNUM = *p++;
    HCOL_CI = *p++;
    HCOL_MODE = *p++;
    HASH_W = 67;
    xinv_init();
}

void* tvm_trace_execution(
        const int* ops, const u64* opcodes, const u64* args,
        const int* sizes, size_t prog_len,
        const u64* program_digest /*5*/,
        const u64* pub_in, size_t n_pub_in,
        const u64* secret_in, size_t n_secret_in,
        const u64* digests /*5 each*/, size_t n_digests,
        const u64* ram_kv /*pairs*/, size_t n_ram,
        const u64* padded_program /*multiple of 10*/, size_t n_padded) {
    auto* h = new Handle();
    Aet& aet = h->aet;
    aet.instruction_multiplicities.assign(prog_len, 0);

    // program attestation hash trace (aet.rs:187-213)
    {
        u64 sponge[16] = {0};
        for (size_t i = 0; i < n_padded; i += 10) {
            for (int j = 0; j < 10; ++j) sponge[j] = padded_program[i + j];
            u64 trace[96];
            tip5_permutation_trace(sponge, trace);
            std::memcpy(sponge, trace + 80, 16 * sizeof(u64));
            aet.append_permutation_trace(trace, aet.program_hash_rows, 18);
        }
    }

    std::vector<Insn> prog(prog_len);
    for (size_t i = 0; i < prog_len; ++i)
        prog[i] = Insn{ops[i], opcodes[i], args[i], sizes[i]};

    Vm vm;
    vm.prog = prog.data();
    vm.prog_len = prog_len;
    vm.aet = &aet;
    for (size_t i = 0; i < n_pub_in; ++i) vm.public_input.push_back(pub_in[i]);
    for (size_t i = 0; i < n_secret_in; ++i)
        vm.secret_tokens.push_back(secret_in[i]);
    for (size_t i = 0; i < n_digests; ++i) {
        std::array<u64, 5> d;
        for (int j = 0; j < 5; ++j) d[j] = digests[i * 5 + j];
        vm.secret_digests.push_back(d);
    }
    for (size_t i = 0; i < n_ram; ++i)
        vm.ram[ram_kv[2 * i]] = ram_kv[2 * i + 1];
    // stack: reversed digest at the bottom + 11 zeros
    for (int i = 4; i >= 0; --i) vm.stack.push_back(program_digest[i]);
    for (int i = 0; i < 11; ++i) vm.stack.push_back(0);

    while (!vm.halting) {
        if (vm.ip >= prog_len) { h->err = E_GENERIC; h->err_ip = vm.ip; break; }
        aet.instruction_multiplicities[vm.ip] += 1;
        vm.record_processor_row();
        if (!vm.step()) { h->err = E_GENERIC; h->err_ip = vm.ip; break; }
    }
    return h;
}

int tvm_error(void* hp) { return ((Handle*)hp)->err; }

// sizes
size_t tvm_num_processor_rows(void* hp) { return ((Handle*)hp)->aet.processor_rows.size() / 39; }
size_t tvm_num_op_stack_rows(void* hp) { return ((Handle*)hp)->aet.op_stack_rows.size() / 4; }
size_t tvm_num_ram_rows(void* hp) { return ((Handle*)hp)->aet.ram_rows.size() / 4; }
size_t tvm_num_program_hash_rows(void* hp) { return ((Handle*)hp)->aet.program_hash_rows.size() / 67; }
size_t tvm_num_hash_rows(void* hp) { return ((Handle*)hp)->aet.hash_rows.size() / 67; }
size_t tvm_num_sponge_rows(void* hp) { return ((Handle*)hp)->aet.sponge_rows.size() / 67; }
size_t tvm_num_u32_entries(void* hp) { return ((Handle*)hp)->aet.u32_order.size(); }
size_t tvm_num_cascade_entries(void* hp) { return ((Handle*)hp)->aet.cascade_order.size(); }
size_t tvm_num_output(void* hp) { return ((Handle*)hp)->aet.public_output.size(); }

// copies
static void copy64(const std::vector<u64>& v, u64* out) {
    std::memcpy(out, v.data(), v.size() * sizeof(u64));
}
void tvm_copy_processor_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.processor_rows, out); }
void tvm_copy_op_stack_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.op_stack_rows, out); }
void tvm_copy_ram_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.ram_rows, out); }
void tvm_copy_program_hash_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.program_hash_rows, out); }
void tvm_copy_hash_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.hash_rows, out); }
void tvm_copy_sponge_rows(void* hp, u64* out) { copy64(((Handle*)hp)->aet.sponge_rows, out); }
void tvm_copy_output(void* hp, u64* out) { copy64(((Handle*)hp)->aet.public_output, out); }
void tvm_copy_instruction_multiplicities(void* hp, u32* out) {
    auto& v = ((Handle*)hp)->aet.instruction_multiplicities;
    std::memcpy(out, v.data(), v.size() * sizeof(u32));
}
void tvm_copy_u32_entries(void* hp, u64* out /*4 per entry*/) {
    Aet& aet = ((Handle*)hp)->aet;
    for (size_t i = 0; i < aet.u32_order.size(); ++i) {
        const U32Key& k = aet.u32_order[i];
        out[4 * i] = (u64)k.op;
        out[4 * i + 1] = k.lhs;
        out[4 * i + 2] = k.rhs;
        out[4 * i + 3] = aet.u32_counts[k];
    }
}
void tvm_copy_cascade_entries(void* hp, u64* out /*2 per entry*/) {
    Aet& aet = ((Handle*)hp)->aet;
    for (size_t i = 0; i < aet.cascade_order.size(); ++i) {
        u32 limb = aet.cascade_order[i];
        out[2 * i] = limb;
        out[2 * i + 1] = aet.cascade_counts[limb];
    }
}
void tvm_copy_lookup_multiplicities(void* hp, u64* out /*256*/) {
    copy64(((Handle*)hp)->aet.lookup_mult, out);
}

void tvm_free(void* hp) { delete (Handle*)hp; }

}  // extern "C"
