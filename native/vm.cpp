// Native VM interpreter: walks a serialized program block tree and produces
// the execution register traces.  This is the trace-generation hot path -
// inherently sequential scalar 128-bit arithmetic (one op-injecting Rescue
// round per decoder step), which is why it is native rather than JAX.
//
// The Python side serializes the block tree with all control-block hashes
// precomputed (program hashing stays in Python); this interpreter mirrors
// distaff_tpu/processor exactly and is golden-tested against it.
//
// C ABI:
//   dt_execute(blob, blob_len, pub, n_pub, tape_a, n_a, tape_b, n_b,
//              &out_buf, &n_registers, &trace_len, &ctx_depth, &loop_depth)
//   dt_free(ptr)
// All field elements cross the boundary as 16-byte little-endian u128s.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>

#include "field128.h"
#include "ark_constants.h"

using f128::u128;
namespace {

constexpr int SPONGE_WIDTH = 4;
constexpr int HASH_STATE_WIDTH = 6;
constexpr int BASE_CYCLE = 16;
constexpr int MIN_STACK_DEPTH = 8;
constexpr int MAX_STACK_DEPTH = 32;
constexpr int MAX_CTX_DEPTH = 16;
constexpr int MAX_LOOP_DEPTH = 8;
constexpr int MIN_TRACE_LENGTH = 16;
constexpr int HACC_NUM_ROUNDS = 14;

// opcodes (must match distaff_tpu/programs/opcodes.py)
enum Op : uint8_t {
    OP_ASSERT = 0b0110'0000, OP_ASSERTEQ = 0b0110'0001, OP_EQ = 0b0110'0010,
    OP_DROP = 0b0110'0011, OP_DROP4 = 0b0110'0100, OP_CHOOSE = 0b0110'0101,
    OP_CHOOSE2 = 0b0110'0110, OP_CSWAP2 = 0b0110'0111,
    OP_ADD = 0b0110'1000, OP_MUL = 0b0110'1001, OP_AND = 0b0110'1010,
    OP_OR = 0b0110'1011, OP_INV = 0b0110'1100, OP_NEG = 0b0110'1101,
    OP_NOT = 0b0110'1110,
    OP_READ = 0b0111'0000, OP_READ2 = 0b0111'0001, OP_DUP = 0b0111'0010,
    OP_DUP2 = 0b0111'0011, OP_DUP4 = 0b0111'0100, OP_PAD2 = 0b0111'0101,
    OP_SWAP = 0b0111'1000, OP_SWAP2 = 0b0111'1001, OP_SWAP4 = 0b0111'1010,
    OP_ROLL4 = 0b0111'1011, OP_ROLL8 = 0b0111'1100, OP_BINACC = 0b0111'1101,
    OP_PUSH = 0b0001'1111, OP_CMP = 0b0011'1111, OP_RESCR = 0b0101'1111,
    OP_BEGIN = 0b0000'0000, OP_NOOP = 0b0111'1111,
};

enum FlowOp : uint8_t {
    F_HACC = 0, F_BEGIN = 1, F_TEND = 2, F_FEND = 3,
    F_LOOP = 4, F_WRAP = 5, F_BREAK = 6, F_VOID = 7,
};

enum HintKind : uint8_t {
    H_NONE = 0, H_EQ = 1, H_RC = 2, H_CMP = 3, H_PMPATH = 4, H_PUSH = 5,
};

// ---------------------------------------------------------------------------------------------
// sponge / hasher
// ---------------------------------------------------------------------------------------------

inline u128 exp_inv_alpha(u128 x) { return f128::exp(x, dtc::INV_ALPHA); }

// N interleaved fixed-exponent chains: each square/multiply chain is
// serially dependent (~15-20 cycle u128-mul latency), so running the N
// independent lanes one-at-a-time left the multiplier mostly idle.  One
// pass over the exponent bits advancing all lanes per iteration gives the
// out-of-order core N-way ILP - measured ~1.5x on the whole VM at 2^20
// steps (the inverse s-box is ~85% of trace generation).
template <int N>
inline void exp_inv_alpha_lanes(u128* x) {
    u128 r[N], b[N];
    bool zero[N];
    for (int i = 0; i < N; i++) {
        zero[i] = (x[i] == 0);
        r[i] = 1;
        b[i] = x[i];
    }
    u128 e = dtc::INV_ALPHA;
    while (e > 0) {
        if (e & 1)
            for (int i = 0; i < N; i++) r[i] = f128::mul(r[i], b[i]);
        e >>= 1;
        if (e)
            for (int i = 0; i < N; i++) b[i] = f128::mul(b[i], b[i]);
    }
    for (int i = 0; i < N; i++) x[i] = zero[i] ? 0 : r[i];
}

void sponge_round(u128 s[4], u128 op_code, u128 op_value, size_t step) {
    size_t idx = step % BASE_CYCLE;
    for (int i = 0; i < 4; i++) s[i] = f128::add(s[i], dtc::SPONGE_ARK[i * 16 + idx]);
    for (int i = 0; i < 4; i++) s[i] = f128::mul(f128::mul(s[i], s[i]), s[i]);
    u128 t[4];
    for (int i = 0; i < 4; i++) {
        u128 acc = 0;
        for (int j = 0; j < 4; j++) acc = f128::add(acc, f128::mul(dtc::SPONGE_MDS[i * 4 + j], s[j]));
        t[i] = acc;
    }
    t[0] = f128::add(t[0], op_code);
    t[1] = f128::add(t[1], op_value);
    for (int i = 0; i < 4; i++) t[i] = f128::add(t[i], dtc::SPONGE_ARK[(4 + i) * 16 + idx]);
    exp_inv_alpha_lanes<4>(t);
    for (int i = 0; i < 4; i++) {
        u128 acc = 0;
        for (int j = 0; j < 4; j++) acc = f128::add(acc, f128::mul(dtc::SPONGE_MDS[i * 4 + j], t[j]));
        s[i] = acc;
    }
}

void hasher_round(u128 s[6], size_t step) {
    size_t idx = step % BASE_CYCLE;
    for (int i = 0; i < 6; i++) s[i] = f128::add(s[i], dtc::HASHER_ARK[i * 16 + idx]);
    for (int i = 0; i < 6; i++) s[i] = f128::mul(f128::mul(s[i], s[i]), s[i]);
    u128 t[6];
    for (int i = 0; i < 6; i++) {
        u128 acc = 0;
        for (int j = 0; j < 6; j++) acc = f128::add(acc, f128::mul(dtc::HASHER_MDS[i * 6 + j], s[j]));
        t[i] = acc;
    }
    for (int i = 0; i < 6; i++) t[i] = f128::add(t[i], dtc::HASHER_ARK[(6 + i) * 16 + idx]);
    exp_inv_alpha_lanes<6>(t);
    for (int i = 0; i < 6; i++) {
        u128 acc = 0;
        for (int j = 0; j < 6; j++) acc = f128::add(acc, f128::mul(dtc::HASHER_MDS[i * 6 + j], t[j]));
        s[i] = acc;
    }
}

// ---------------------------------------------------------------------------------------------
// program blob
// ---------------------------------------------------------------------------------------------

struct Hint { uint32_t step; uint8_t kind; u128 value; };

struct Block;
struct Block {
    uint8_t type;  // 0 span, 1 group, 2 switch, 3 loop
    // span
    std::vector<uint8_t> ops;
    std::vector<Hint> hints;
    // control
    u128 h0 = 0, h1 = 0, h2 = 0;  // switch: t_hash, f_hash; loop: image, body_hash, skip_hash
    std::vector<Block> body;      // group/loop body; switch true branch
    std::vector<Block> body2;     // switch false branch
};

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    bool fail = false;

    uint8_t u8() { if (p >= end) { fail = true; return 0; } return *p++; }
    uint32_t u32() {
        if (p + 4 > end) { fail = true; return 0; }
        uint32_t v; memcpy(&v, p, 4); p += 4; return v;
    }
    u128 u128v() {
        if (p + 16 > end) { fail = true; return 0; }
        uint64_t lo, hi; memcpy(&lo, p, 8); memcpy(&hi, p + 8, 8); p += 16;
        return ((u128)hi << 64) | lo;
    }
};

bool parse_blocks(Reader& r, uint32_t count, std::vector<Block>& out);

bool parse_block(Reader& r, Block& b) {
    b.type = r.u8();
    switch (b.type) {
        case 0: {  // span
            uint32_t n = r.u32();
            b.ops.resize(n);
            for (uint32_t i = 0; i < n; i++) b.ops[i] = r.u8();
            uint32_t nh = r.u32();
            b.hints.resize(nh);
            for (uint32_t i = 0; i < nh; i++) {
                b.hints[i].step = r.u32();
                b.hints[i].kind = r.u8();
                b.hints[i].value = r.u128v();
            }
            break;
        }
        case 1: {  // group
            uint32_t n = r.u32();
            if (!parse_blocks(r, n, b.body)) return false;
            break;
        }
        case 2: {  // switch
            b.h0 = r.u128v();  // true branch hash
            b.h1 = r.u128v();  // false branch hash
            uint32_t nt = r.u32();
            if (!parse_blocks(r, nt, b.body)) return false;
            uint32_t nf = r.u32();
            if (!parse_blocks(r, nf, b.body2)) return false;
            break;
        }
        case 3: {  // loop
            b.h0 = r.u128v();  // image
            b.h1 = r.u128v();  // body hash
            b.h2 = r.u128v();  // skip hash
            uint32_t n = r.u32();
            if (!parse_blocks(r, n, b.body)) return false;
            break;
        }
        default:
            return false;
    }
    return !r.fail;
}

bool parse_blocks(Reader& r, uint32_t count, std::vector<Block>& out) {
    out.resize(count);
    for (uint32_t i = 0; i < count; i++) {
        if (!parse_block(r, out[i])) return false;
    }
    return true;
}

// ---------------------------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------------------------

struct Decoder {
    size_t step = 0;
    size_t cap;
    std::vector<u128> op_counter;
    std::vector<u128> sponge_trace[4];
    u128 sponge[4] = {0, 0, 0, 0};
    std::vector<u128> cf_bits[3], ld_bits[5], hd_bits[2];
    std::vector<std::vector<u128>> ctx_stack, loop_stack;
    size_t ctx_depth = 1, loop_depth = 0;
    bool error = false;
    const char* error_msg = "";

    explicit Decoder(size_t n) : cap(n) {
        op_counter.assign(n, 0);
        for (auto& r : sponge_trace) r.assign(n, 0);
        for (auto& r : cf_bits) r.assign(n, 0);
        for (auto& r : ld_bits) r.assign(n, 0);
        for (auto& r : hd_bits) r.assign(n, 0);
        ctx_stack.emplace_back(n, 0);
    }

    void grow() {
        size_t n = cap * 2;
        op_counter.resize(n, 0);
        for (auto& r : sponge_trace) r.resize(n, 0);
        for (auto& r : cf_bits) r.resize(n, 0);
        for (auto& r : ld_bits) r.resize(n, 0);
        for (auto& r : hd_bits) r.resize(n, 0);
        for (auto& r : ctx_stack) r.resize(n, 0);
        for (auto& r : loop_stack) r.resize(n, 0);
        cap = n;
    }

    void advance(bool user_op) {
        step++;
        if (step >= cap) grow();
        op_counter[step] = user_op ? f128::add(op_counter[step - 1], 1) : op_counter[step - 1];
    }

    void set_bits(uint8_t flow_op, uint8_t user_op) {
        size_t s = step - 1;
        for (int i = 0; i < 3; i++) cf_bits[i][s] = (flow_op >> i) & 1;
        for (int i = 0; i < 5; i++) ld_bits[i][s] = (user_op >> i) & 1;
        for (int i = 0; i < 2; i++) hd_bits[i][s] = (user_op >> (i + 5)) & 1;
    }

    void set_sponge(u128 a, u128 b, u128 c, u128 d) {
        sponge[0] = a; sponge[1] = b; sponge[2] = c; sponge[3] = d;
        for (int i = 0; i < 4; i++) sponge_trace[i][step] = sponge[i];
    }

    void save_context() {
        ctx_depth++;
        if (ctx_depth > MAX_CTX_DEPTH) { error = true; error_msg = "context stack overflow"; return; }
        if (ctx_depth > ctx_stack.size()) ctx_stack.emplace_back(cap, 0);
        for (size_t i = ctx_stack.size() - 1; i >= 1; i--)
            ctx_stack[i][step] = ctx_stack[i - 1][step - 1];
        ctx_stack[0][step] = sponge[0];
    }

    u128 pop_context() {
        for (size_t i = 1; i < ctx_stack.size(); i++)
            ctx_stack[i - 1][step] = ctx_stack[i][step - 1];
        ctx_depth--;
        return ctx_stack[0][step - 1];
    }

    void copy_ctx() { for (auto& r : ctx_stack) r[step] = r[step - 1]; }
    void copy_loop() { for (auto& r : loop_stack) r[step] = r[step - 1]; }

    void save_loop_image(u128 image) {
        loop_depth++;
        if (loop_depth > MAX_LOOP_DEPTH) { error = true; error_msg = "loop stack overflow"; return; }
        if (loop_depth > loop_stack.size()) loop_stack.emplace_back(cap, 0);
        for (size_t i = loop_stack.size() - 1; i >= 1; i--)
            loop_stack[i][step] = loop_stack[i - 1][step - 1];
        loop_stack[0][step] = image;
    }

    u128 peek_loop_image() {
        copy_loop();
        return loop_stack[0][step];
    }

    u128 pop_loop_image() {
        for (size_t i = 1; i < loop_stack.size(); i++)
            loop_stack[i - 1][step] = loop_stack[i][step - 1];
        loop_depth--;
        return loop_stack[0][step - 1];
    }

    void start_block() {
        advance(false); save_context(); copy_loop();
        set_bits(F_BEGIN, OP_NOOP); set_sponge(0, 0, 0, 0);
    }

    void end_block(u128 sibling, bool true_branch) {
        advance(false);
        u128 ctx = pop_context();
        copy_loop();
        u128 bh = sponge[0];
        if (true_branch) { set_bits(F_TEND, OP_NOOP); set_sponge(ctx, bh, sibling, 0); }
        else { set_bits(F_FEND, OP_NOOP); set_sponge(ctx, sibling, bh, 0); }
    }

    void start_loop(u128 image) {
        advance(false); save_context(); save_loop_image(image);
        set_bits(F_LOOP, OP_NOOP); set_sponge(0, 0, 0, 0);
    }

    void wrap_loop() {
        advance(false); copy_ctx();
        if (sponge[0] != peek_loop_image()) { error = true; error_msg = "loop wrap image mismatch"; }
        set_bits(F_WRAP, OP_NOOP); set_sponge(0, 0, 0, 0);
    }

    void break_loop() {
        advance(false); copy_ctx();
        if (sponge[0] != pop_loop_image()) { error = true; error_msg = "loop break image mismatch"; }
        set_bits(F_BREAK, OP_NOOP);
        set_sponge(sponge[0], sponge[1], sponge[2], sponge[3]);
    }

    void decode_op(uint8_t op, u128 value) {
        advance(true); copy_ctx(); copy_loop();
        set_bits(F_HACC, op);
        sponge_round(sponge, op, value, step - 1);
        for (int i = 0; i < 4; i++) sponge_trace[i][step] = sponge[i];
    }

    void finalize() {
        u128 last = op_counter[step];
        for (size_t i = step + 1; i < cap; i++) op_counter[i] = last;
        for (auto& r : cf_bits) for (size_t i = step; i < cap; i++) r[i] = 1;
        for (auto& r : ld_bits) for (size_t i = step; i < cap; i++) r[i] = 1;
        for (auto& r : hd_bits) for (size_t i = step; i < cap; i++) r[i] = 1;
        for (auto& r : sponge_trace) for (size_t i = step + 1; i < cap; i++) r[i] = r[step];
        for (auto& r : ctx_stack) for (size_t i = step + 1; i < cap; i++) r[i] = r[step];
        for (auto& r : loop_stack) for (size_t i = step + 1; i < cap; i++) r[i] = r[step];
        step = cap - 1;
    }
};

// ---------------------------------------------------------------------------------------------
// stack
// ---------------------------------------------------------------------------------------------

struct Stack {
    size_t step = 0;
    size_t cap;
    std::vector<std::vector<u128>> regs;
    std::vector<u128> tape_a, tape_b;
    size_t max_depth, depth;
    bool error = false;
    const char* error_msg = "";

    Stack(const u128* pub, size_t n_pub, const u128* a, size_t n_a,
          const u128* b, size_t n_b, size_t n)
        : cap(n) {
        size_t init_depth = n_pub > MIN_STACK_DEPTH ? n_pub : MIN_STACK_DEPTH;
        for (size_t i = 0; i < init_depth; i++) {
            regs.emplace_back(n, 0);
            if (i < n_pub) regs[i][0] = pub[i];
        }
        tape_a.assign(a, a + n_a);
        std::reverse(tape_a.begin(), tape_a.end());
        tape_b.assign(b, b + n_b);
        std::reverse(tape_b.begin(), tape_b.end());
        max_depth = depth = n_pub;
    }

    void fail(const char* msg) { error = true; error_msg = msg; }

    void advance() {
        step++;
        if (step >= cap) {
            size_t n = cap * 2;
            for (auto& r : regs) r.resize(n, 0);
            cap = n;
        }
    }

    u128 top() const { return regs[0][step]; }
    u128 prev(size_t i) const { return regs[i][step - 1]; }

    // semantic depth guard: ops that read k items must have k on the stack
    // (mirrors the Python executor's underflow assertions)
    bool need(size_t k) {
        if (depth < k) { fail("stack underflow"); return false; }
        return true;
    }

    void copy_state(size_t start) {
        for (size_t i = start; i < depth; i++) regs[i][step] = regs[i][step - 1];
    }

    void shift_left(size_t start, size_t n) {
        if (depth < n) { fail("stack underflow"); return; }
        for (size_t i = start; i < depth; i++) regs[i - n][step] = regs[i][step - 1];
        for (size_t i = depth - n; i < depth; i++) regs[i][step] = 0;
        depth -= n;
    }

    void shift_right(size_t start, size_t n) {
        depth += n;
        if (depth > MAX_STACK_DEPTH) { fail("stack overflow"); return; }
        if (depth > max_depth) {
            max_depth += n;
            while (max_depth > regs.size()) regs.emplace_back(cap, 0);
        }
        for (size_t i = depth - n; i-- > start;) regs[i + n][step] = regs[i][step - 1];
    }

    void execute(uint8_t op, uint8_t hint_kind, u128 hint_value) {
        advance();
        if (error) return;
        switch (op) {
            case OP_BEGIN: case OP_NOOP: copy_state(0); break;
            case OP_ASSERT:
                if (!need(1)) return;
                if (prev(0) != 1) { fail("ASSERT failed"); return; }
                shift_left(1, 1); break;
            case OP_ASSERTEQ:
                if (!need(2)) return;
                if (prev(0) != prev(1)) { fail("ASSERTEQ failed"); return; }
                shift_left(2, 2); break;
            case OP_PUSH:
                shift_right(0, 1);
                regs[0][step] = hint_value; break;
            case OP_READ: {
                if (hint_kind == H_EQ) {
                    u128 x = prev(0), y = prev(1);
                    tape_a.push_back(x == y ? (u128)1 : f128::inv(f128::sub(x, y)));
                }
                if (tape_a.empty()) { fail("empty tape A"); return; }
                shift_right(0, 1);
                regs[0][step] = tape_a.back(); tape_a.pop_back();
                break;
            }
            case OP_READ2: {
                if (hint_kind == H_PMPATH) {
                    size_t n = (size_t)(uint64_t)hint_value - 1;
                    if (tape_a.size() < n || tape_b.size() < n) { fail("pmpath tapes too short"); return; }
                    u128 idx = prev(2);
                    std::vector<u128> v_a(tape_a.end() - n, tape_a.end());
                    tape_a.resize(tape_a.size() - n);
                    for (size_t i = 0; i < n; i++) {
                        tape_a.push_back((u128)((idx >> (n - i - 1)) & 1));
                        tape_a.push_back(v_a[i]);
                    }
                }
                if (tape_a.empty() || tape_b.empty()) { fail("empty tape"); return; }
                shift_right(0, 2);
                regs[0][step] = tape_b.back(); tape_b.pop_back();
                regs[1][step] = tape_a.back(); tape_a.pop_back();
                break;
            }
            case OP_DUP: if (!need(1)) return; shift_right(0, 1); regs[0][step] = regs[0][step - 1]; break;
            case OP_DUP2:
                if (!need(2)) return;
                shift_right(0, 2);
                for (int i = 0; i < 2; i++) regs[i][step] = regs[i][step - 1];
                break;
            case OP_DUP4:
                if (!need(4)) return;
                shift_right(0, 4);
                for (int i = 0; i < 4; i++) regs[i][step] = regs[i][step - 1];
                break;
            case OP_PAD2:
                shift_right(0, 2); regs[0][step] = 0; regs[1][step] = 0; break;
            case OP_DROP: shift_left(1, 1); break;
            case OP_DROP4: shift_left(4, 4); break;
            case OP_SWAP:
                if (!need(2)) return;
                regs[0][step] = prev(1); regs[1][step] = prev(0); copy_state(2); break;
            case OP_SWAP2:
                if (!need(4)) return;
                regs[0][step] = prev(2); regs[1][step] = prev(3);
                regs[2][step] = prev(0); regs[3][step] = prev(1); copy_state(4); break;
            case OP_SWAP4:
                if (!need(8)) return;
                for (int i = 0; i < 4; i++) {
                    regs[i][step] = prev(i + 4); regs[i + 4][step] = prev(i);
                }
                copy_state(8); break;
            case OP_ROLL4:
                if (!need(4)) return;
                regs[0][step] = prev(3);
                for (int i = 0; i < 3; i++) regs[i + 1][step] = prev(i);
                copy_state(4); break;
            case OP_ROLL8:
                if (!need(8)) return;
                regs[0][step] = prev(7);
                for (int i = 0; i < 7; i++) regs[i + 1][step] = prev(i);
                copy_state(8); break;
            case OP_CHOOSE: {
                if (!need(3)) return;
                u128 c = prev(2);
                if (c == 1) regs[0][step] = prev(0);
                else if (c == 0) regs[0][step] = prev(1);
                else { fail("CHOOSE non-binary"); return; }
                shift_left(3, 2); break;
            }
            case OP_CHOOSE2: {
                if (!need(6)) return;
                u128 c = prev(4);
                if (c == 1) { regs[0][step] = prev(0); regs[1][step] = prev(1); }
                else if (c == 0) { regs[0][step] = prev(2); regs[1][step] = prev(3); }
                else { fail("CHOOSE2 non-binary"); return; }
                shift_left(6, 4); break;
            }
            case OP_CSWAP2: {
                if (!need(6)) return;
                u128 c = prev(4);
                if (c == 0) { for (int i = 0; i < 4; i++) regs[i][step] = prev(i); }
                else if (c == 1) {
                    regs[0][step] = prev(2); regs[1][step] = prev(3);
                    regs[2][step] = prev(0); regs[3][step] = prev(1);
                } else { fail("CSWAP2 non-binary"); return; }
                shift_left(6, 2); break;
            }
            case OP_ADD: if (!need(2)) return; regs[0][step] = f128::add(prev(0), prev(1)); shift_left(2, 1); break;
            case OP_MUL: if (!need(2)) return; regs[0][step] = f128::mul(prev(0), prev(1)); shift_left(2, 1); break;
            case OP_INV:
                if (!need(1)) return;
                if (prev(0) == 0) { fail("INV of zero"); return; }
                regs[0][step] = f128::inv(prev(0)); copy_state(1); break;
            case OP_NEG: if (!need(1)) return; regs[0][step] = f128::neg(prev(0)); copy_state(1); break;
            case OP_NOT:
                if (!need(1)) return;
                if (prev(0) > 1) { fail("NOT non-binary"); return; }
                regs[0][step] = f128::sub(1, prev(0)); copy_state(1); break;
            case OP_AND:
                if (!need(2)) return;
                if (prev(0) > 1 || prev(1) > 1) { fail("AND non-binary"); return; }
                regs[0][step] = (prev(0) == 1 && prev(1) == 1) ? 1 : 0;
                shift_left(2, 1); break;
            case OP_OR:
                if (!need(2)) return;
                if (prev(0) > 1 || prev(1) > 1) { fail("OR non-binary"); return; }
                regs[0][step] = (prev(0) == 1 || prev(1) == 1) ? 1 : 0;
                shift_left(2, 1); break;
            case OP_EQ: {
                if (!need(3)) return;
                u128 aux = prev(0), x = prev(1), y = prev(2);
                if (x == y) regs[0][step] = 1;
                else {
                    if (aux != f128::inv(f128::sub(x, y))) { fail("bad EQ aux"); return; }
                    regs[0][step] = 0;
                }
                shift_left(3, 2); break;
            }
            case OP_CMP: {
                if (hint_kind == H_CMP) {
                    u128 a_val = prev(8), b_val = prev(9);
                    uint32_t n = (uint32_t)(uint64_t)hint_value;
                    for (uint32_t i = 0; i < n; i++) {
                        tape_a.push_back((u128)((a_val >> i) & 1));
                        tape_b.push_back((u128)((b_val >> i) & 1));
                    }
                }
                if (tape_a.empty() || tape_b.empty()) { fail("empty tape"); return; }
                u128 a_bit = tape_a.back(); tape_a.pop_back();
                u128 b_bit = tape_b.back(); tape_b.pop_back();
                if (a_bit > 1 || b_bit > 1) { fail("non-binary cmp input"); return; }
                u128 bit_gt = f128::mul(a_bit, f128::sub(1, b_bit));
                u128 bit_lt = f128::mul(b_bit, f128::sub(1, a_bit));
                u128 p2 = prev(0);
                u128 next_p2 = (p2 == 1) ? f128::inv(2) : (p2 >> 1);
                u128 gt = prev(4), lt = prev(5);
                u128 not_set = f128::mul(f128::sub(1, gt), f128::sub(1, lt));
                regs[0][step] = next_p2;
                regs[1][step] = a_bit;
                regs[2][step] = b_bit;
                regs[3][step] = not_set;
                regs[4][step] = f128::add(gt, f128::mul(bit_gt, not_set));
                regs[5][step] = f128::add(lt, f128::mul(bit_lt, not_set));
                regs[6][step] = f128::add(prev(6), f128::mul(b_bit, p2));
                regs[7][step] = f128::add(prev(7), f128::mul(a_bit, p2));
                copy_state(8); break;
            }
            case OP_BINACC: {
                if (hint_kind == H_RC) {
                    u128 val = prev(4);
                    uint32_t n = (uint32_t)(uint64_t)hint_value;
                    for (uint32_t i = 0; i < n; i++)
                        tape_a.push_back((u128)((val >> (n - i - 1)) & 1));
                }
                if (tape_a.empty()) { fail("empty tape A"); return; }
                u128 bit = tape_a.back(); tape_a.pop_back();
                if (bit > 1) { fail("non-binary binacc input"); return; }
                u128 p2 = prev(2);
                regs[0][step] = bit;
                regs[1][step] = 0;
                regs[2][step] = f128::mul(p2, 2);
                regs[3][step] = f128::add(prev(3), f128::mul(bit, p2));
                copy_state(4); break;
            }
            case OP_RESCR: {
                u128 state[6];
                for (int i = 0; i < 6; i++) state[i] = prev(i);
                hasher_round(state, step - 1);
                for (int i = 0; i < 6; i++) regs[i][step] = state[i];
                copy_state(6); break;
            }
            default:
                fail("unknown opcode");
        }
    }

    void finalize() {
        for (auto& r : regs)
            for (size_t i = step + 1; i < cap; i++) r[i] = r[step];
        step = cap - 1;
    }
};

// ---------------------------------------------------------------------------------------------
// executor
// ---------------------------------------------------------------------------------------------

struct Executor {
    Decoder dec;
    Stack stk;

    Executor(const u128* pub, size_t n_pub, const u128* a, size_t n_a,
             const u128* b, size_t n_b)
        : dec(MIN_TRACE_LENGTH), stk(pub, n_pub, a, n_a, b, n_b, MIN_TRACE_LENGTH) {}

    bool failed() const { return dec.error || stk.error; }

    void noop() {
        dec.decode_op(OP_NOOP, 0);
        stk.execute(OP_NOOP, H_NONE, 0);
    }

    void exec_span(const Block& b, bool is_first) {
        if (!is_first) noop();
        size_t hi = 0;
        for (size_t i = 0; i < b.ops.size() && !failed(); i++) {
            uint8_t kind = H_NONE;
            u128 value = 0;
            while (hi < b.hints.size() && b.hints[hi].step < i) hi++;
            if (hi < b.hints.size() && b.hints[hi].step == i) {
                kind = b.hints[hi].kind;
                value = b.hints[hi].value;
            }
            u128 op_value = (b.ops[i] == OP_PUSH && kind == H_PUSH) ? value : 0;
            dec.decode_op(b.ops[i], op_value);
            stk.execute(b.ops[i], kind, value);
        }
    }

    void start_block() {
        dec.start_block();
        stk.execute(OP_NOOP, H_NONE, 0);
    }

    void close_block(u128 sibling, bool true_branch) {
        noop();
        dec.end_block(sibling, true_branch);
        stk.execute(OP_NOOP, H_NONE, 0);
        for (int i = 0; i < HACC_NUM_ROUNDS; i++) noop();
    }

    void exec_blocks(const std::vector<Block>& blocks) {
        if (failed() || blocks.empty()) return;
        exec_span(blocks[0], true);
        for (size_t i = 1; i < blocks.size() && !failed(); i++) {
            const Block& b = blocks[i];
            if (b.type == 0) {
                exec_span(b, false);
            } else if (b.type == 1) {  // group
                start_block();
                exec_blocks(b.body);
                close_block(0, true);
            } else if (b.type == 2) {  // switch
                start_block();
                u128 c = stk.top();
                if (c == 0) {
                    exec_blocks(b.body2);
                    close_block(b.h0, false);
                } else if (c == 1) {
                    exec_blocks(b.body);
                    close_block(b.h1, true);
                } else {
                    stk.fail("non-binary switch condition");
                }
            } else if (b.type == 3) {  // loop
                u128 c = stk.top();
                if (c == 0) {
                    start_block();
                    exec_skip();
                    close_block(b.h1, false);
                } else if (c == 1) {
                    exec_loop(b);
                } else {
                    stk.fail("non-binary loop condition");
                }
            }
        }
    }

    void exec_skip() {
        Block skip;
        skip.type = 0;
        skip.ops = {OP_NOT, OP_ASSERT};
        skip.ops.resize(15, OP_NOOP);
        exec_span(skip, true);
    }

    void exec_loop(const Block& b) {
        dec.start_loop(b.h0);
        stk.execute(OP_NOOP, H_NONE, 0);
        while (!failed()) {
            exec_blocks(b.body);
            if (failed()) return;
            u128 c = stk.top();
            if (c == 0) {
                dec.break_loop();
                stk.execute(OP_NOOP, H_NONE, 0);
                break;
            } else if (c == 1) {
                dec.wrap_loop();
                stk.execute(OP_NOOP, H_NONE, 0);
            } else {
                stk.fail("non-binary loop condition");
                return;
            }
        }
        exec_skip();
        close_block(b.h2, true);
    }
};

}  // namespace

extern "C" {

// returns 0 on success; on failure returns nonzero and sets *err_msg
int dt_execute(const uint8_t* blob, size_t blob_len,
               const uint8_t* pub_bytes, size_t n_pub,
               const uint8_t* a_bytes, size_t n_a,
               const uint8_t* b_bytes, size_t n_b,
               uint8_t** out_buf, size_t* out_registers, size_t* out_trace_len,
               size_t* out_ctx_depth, size_t* out_loop_depth,
               const char** err_msg) {
    Reader r{blob, blob + blob_len};
    uint32_t n_root = r.u32();
    std::vector<Block> root;
    if (!parse_blocks(r, n_root, root)) {
        *err_msg = "malformed program blob";
        return 1;
    }

    std::vector<u128> pub(n_pub), ta(n_a), tb(n_b);
    for (size_t i = 0; i < n_pub; i++) memcpy(&pub[i], pub_bytes + 16 * i, 16);
    for (size_t i = 0; i < n_a; i++) memcpy(&ta[i], a_bytes + 16 * i, 16);
    for (size_t i = 0; i < n_b; i++) memcpy(&tb[i], b_bytes + 16 * i, 16);

    Executor ex(pub.data(), n_pub, ta.data(), n_a, tb.data(), n_b);
    ex.exec_blocks(root);
    if (!ex.failed()) ex.close_block(0, true);
    if (ex.failed()) {
        *err_msg = ex.dec.error ? ex.dec.error_msg : ex.stk.error_msg;
        return 2;
    }

    ex.dec.finalize();
    ex.stk.finalize();

    size_t n = ex.dec.cap;
    size_t ctx_regs = ex.dec.ctx_stack.size() - 1;  // outermost is always 0
    size_t loop_regs = ex.dec.loop_stack.size();
    size_t stack_regs = ex.stk.max_depth;
    size_t total = 15 + ctx_regs + loop_regs + stack_regs;

    uint8_t* buf = (uint8_t*)malloc(total * n * 16);
    if (!buf) { *err_msg = "allocation failure"; return 3; }
    size_t reg = 0;
    auto emit = [&](const std::vector<u128>& col) {
        memcpy(buf + reg * n * 16, col.data(), n * 16);
        reg++;
    };
    emit(ex.dec.op_counter);
    for (auto& c : ex.dec.sponge_trace) emit(c);
    for (auto& c : ex.dec.cf_bits) emit(c);
    for (auto& c : ex.dec.ld_bits) emit(c);
    for (auto& c : ex.dec.hd_bits) emit(c);
    for (size_t i = 0; i < ctx_regs; i++) emit(ex.dec.ctx_stack[i]);
    for (auto& c : ex.dec.loop_stack) emit(c);
    for (size_t i = 0; i < stack_regs; i++) emit(ex.stk.regs[i]);

    *out_buf = buf;
    *out_registers = total;
    *out_trace_len = n;
    *out_ctx_depth = ctx_regs;
    *out_loop_depth = loop_regs;
    *err_msg = "";
    return 0;
}

void dt_free(void* p) { free(p); }

// Apply `n` op-injecting sponge rounds (utils/sponge.py apply_round,
// reference src/utils/sponge.rs:13-30) to a 4-element state, steps
// step_offset .. step_offset+n-1.  state: 64 bytes LE in/out; op_values:
// n * 16 bytes LE.  Used for program hashing (hash_seq/hash_acc), where
// the sequential dependency makes Python big-int rounds the bottleneck.
void dt_sponge_rounds(uint8_t* state_bytes, const uint8_t* op_codes,
                      const uint8_t* op_values, size_t step_offset, size_t n) {
    u128 s[4];
    memcpy(s, state_bytes, 64);
    for (size_t k = 0; k < n; k++) {
        u128 v;
        memcpy(&v, op_values + 16 * k, 16);
        sponge_round(s, (u128)op_codes[k], v, step_offset + k);
    }
    memcpy(state_bytes, s, 64);
}

}  // extern "C"
